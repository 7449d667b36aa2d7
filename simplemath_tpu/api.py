"""User-facing factories and free functions.

Parity layer for include/UserFunctions.h: ``empty`` (:8-15), ``ones``
(:18-30; the reference parallelizes the fill above 100k elements with
``std::execution::par_unseq`` — here fills are single fused XLA broadcasts on
device, which is strictly stronger), ``zeros`` (:33-40), free ``sm::pow``
(:42-48), and the ostream pretty-printer (:54-57) which maps to
``str(Array)``.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from . import dtypes as _dtypes
from .array import Array, asarray
from .ops import engine


def _shape_args(shape):
    if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
        return tuple(int(s) for s in shape[0])
    return tuple(int(s) for s in shape)


def empty(*shape, dtype=jnp.float32) -> Array:
    """Uninitialized-array factory (UserFunctions.h:8-15).  XLA has no
    uninitialized allocation; a zero fill costs one fused kernel."""
    return zeros(*shape, dtype=dtype)


def zeros(*shape, dtype=jnp.float32) -> Array:
    return Array(jnp.zeros(_shape_args(shape), dtype=_dtypes.canonicalize(dtype)))


def ones(*shape, dtype=jnp.float32) -> Array:
    return Array(jnp.ones(_shape_args(shape), dtype=_dtypes.canonicalize(dtype)))


def full(*shape, fill_value, dtype=jnp.float32) -> Array:
    return Array(
        jnp.full(_shape_args(shape), fill_value, dtype=_dtypes.canonicalize(dtype))
    )


def arange(*args, dtype=None) -> Array:
    return Array(jnp.arange(*args, dtype=dtype))


def array(data, dtype=None) -> Array:
    return Array(data, dtype=dtype)


def pow(a, exponent) -> Array:
    """Free-function pow (UserFunctions.h:42-48) with working float pow and
    the reference's integer-pow edge semantics (tests/pow.cpp:62-99)."""
    return engine.pow(a, exponent)


def dot(a, b):
    return engine.dot(a, b)


def add(a, b) -> Array:
    return engine.binary("add", a, b)


def subtract(a, b) -> Array:
    return engine.binary("subtract", a, b)


def multiply(a, b) -> Array:
    return engine.binary("multiply", a, b)


def divide(a, b) -> Array:
    return engine.binary("divide", a, b)


def exp(a) -> Array:
    from .ops import transcendental

    return Array(transcendental.exp(asarray(a).jax()))


def log(a) -> Array:
    from .ops import transcendental

    return Array(transcendental.log(asarray(a).jax()))


def exp2(a) -> Array:
    from .ops import transcendental

    return Array(transcendental.exp2(asarray(a).jax()))


def log2(a) -> Array:
    from .ops import transcendental

    return Array(transcendental.log2(asarray(a).jax()))

"""complex64 contractions on the MXU via real/imaginary splitting.

Reference analog: ``dot_product`` for ``complex<double>``
(/root/reference/include/math/product.h:168-224), which splits each SIMD
register into real/imag lanes and accumulates the four cross products.  TPU
hardware has no complex number type at all, so the TPU-native form splits at
the MATRIX level instead: a c64 contraction becomes THREE f32 MXU
contractions via the Gauss trick

    k1 = (ar + ai) @ br
    k2 = ar @ (bi - br)
    k3 = ai @ (br + bi)
    re = k1 - k3          # = ar@br - ai@bi
    im = k1 + k2          # = ar@bi + ai@br

(25% fewer MXU FLOPs than the naive four-product form; the elementwise
pre/post adds are HBM-cheap and fuse into the matmul epilogues).  The f32
component contractions follow the same measured routing as the real f32
path (ops/engine.py): XLA dot, HIGHEST precision below the big-matmul gate
so small/odd contractions are reference-exact, platform default above it.

complex128 stays on the XLA CPU path (no f64 on TPU — documented divergence,
PARITY.md); this module is only routed for complex64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gauss(contract, ar, ai, br, bi):
    k1 = contract(ar + ai, br)
    k2 = contract(ar, bi - br)
    k3 = contract(ai, br + bi)
    return jax.lax.complex(k1 - k3, k1 + k2)


def _contract(kind: str, prec):
    if kind == "dot":
        return lambda x, y: jnp.dot(
            x, y, preferred_element_type=jnp.float32, precision=prec
        )
    return lambda x, y: jnp.matmul(
        x, y, preferred_element_type=jnp.float32, precision=prec
    )


def _precision(a_shape, b_shape):
    from . import engine

    _, prec = engine._fallback_precision(a_shape, b_shape, jnp.float32)
    return prec


def complex_dot(a, b):
    """``numpy.dot`` semantics for complex64 operands (any rank)."""
    from . import dispatch

    dispatch.record("matmul", "c64_dot")
    a = jnp.asarray(a, jnp.complex64)
    b = jnp.asarray(b, jnp.complex64)
    prec = _precision(a.shape, b.shape)
    return _gauss(
        _contract("dot", prec), jnp.real(a), jnp.imag(a), jnp.real(b), jnp.imag(b)
    )


def complex_matmul(a, b):
    """``numpy.matmul`` semantics for complex64 operands."""
    from . import dispatch

    dispatch.record("matmul", "c64_mm")
    a = jnp.asarray(a, jnp.complex64)
    b = jnp.asarray(b, jnp.complex64)
    prec = _precision(a.shape, b.shape)
    return _gauss(
        _contract("mm", prec), jnp.real(a), jnp.imag(a), jnp.real(b), jnp.imag(b)
    )

"""Pallas tiled reduction kernels.

Reference analog: the flat dot-product loops (include/math/product.h) and —
by extension — any full-array reduction.  TPU-native: a grid of VMEM tiles,
each partially reduced on the VPU into a (1, 1)-block accumulator that every
grid step adds into (sequential grid on TPU makes read-modify-write of the
output block safe), f32 accumulation regardless of input dtype.

Provides ``pallas_reduce`` (sum/max/min) and ``pallas_dot`` (1-D dot with
in-kernel multiply + reduce — one pass over HBM instead of materializing
a*b).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config

_REDUCERS = {
    "sum": (jnp.sum, lambda a, b: a + b, 0.0),
    "max": (jnp.max, jnp.maximum, -jnp.inf),
    "min": (jnp.min, jnp.minimum, jnp.inf),
}


# Pinned block indices must be int32: a Python 0 becomes an i64 constant
# under jax_enable_x64 and Mosaic rejects i64-returning index maps.
_Z = np.int32(0)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache(maxsize=128)
def _build_reduce(kind, n_rows, n_cols, block_rows, in_dtype, interpret):
    tile_reduce, combine, init = _REDUCERS[kind]
    grid = (_cdiv(n_rows, block_rows),)

    def kernel(x_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[0, 0] = jnp.float32(init)

        part = tile_reduce(x_ref[...].astype(jnp.float32))
        out_ref[0, 0] = combine(out_ref[0, 0], part)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_rows, n_cols), lambda i: (i, _Z), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (_Z, _Z), memory_space=pltpu.SMEM),
        interpret=interpret,
    )


def _to_2d(x, lanes=1024):
    n = x.size
    cols = min(lanes, n)
    rows = _cdiv(n, cols)
    pad = rows * cols - n
    flat = jnp.ravel(x)
    if pad:
        # Pad with the reduction identity so padded elements are no-ops;
        # caller passes the right pad value.
        return flat, rows, cols, pad
    return flat, rows, cols, 0


def pallas_reduce(x, kind: str = "sum", block_rows: int = 512):
    """Full reduction of ``x`` to a scalar (f32 accumulation)."""
    from . import dispatch

    dispatch.record("reduce", kind)
    _, _, init = _REDUCERS[kind]
    flat, rows, cols, pad = _to_2d(x)
    br = min(block_rows, rows)
    rows_p = _cdiv(rows, br) * br  # pad rows so no block reads OOB
    pad = rows_p * cols - (flat.size)
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad,), init, dtype=flat.dtype)]
        )
    arr = flat.reshape(rows_p, cols)
    call = _build_reduce(
        kind,
        rows_p,
        cols,
        br,
        jnp.dtype(x.dtype),
        config.interpret_mode(),
    )
    out = call(arr)
    return out[0, 0].astype(jnp.promote_types(x.dtype, jnp.float32))


@functools.lru_cache(maxsize=64)
def _build_dot1d(n_rows, n_cols, block_rows, interpret):
    grid = (_cdiv(n_rows, block_rows),)

    def kernel(a_ref, b_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[0, 0] = jnp.float32(0.0)

        part = jnp.sum(
            a_ref[...].astype(jnp.float32) * b_ref[...].astype(jnp.float32)
        )
        out_ref[0, 0] = out_ref[0, 0] + part

    spec = pl.BlockSpec(
        (block_rows, n_cols), lambda i: (i, _Z), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((1, 1), lambda i: (_Z, _Z), memory_space=pltpu.SMEM),
        interpret=interpret,
    )


def pallas_dot1d(a, b, block_rows: int = 512):
    """1-D dot product fused multiply+reduce — the working TPU version of
    the reference's ``dot_product`` SIMD loops (product.h:74-116)."""
    from . import dispatch

    dispatch.record("dot1d")
    assert a.ndim == 1 and a.shape == b.shape
    fa, rows, cols, _ = _to_2d(a)
    fb = jnp.ravel(b)
    br = min(block_rows, rows)
    rows_p = _cdiv(rows, br) * br
    pad = rows_p * cols - fa.size
    if pad:
        fa = jnp.concatenate([fa, jnp.zeros((pad,), dtype=fa.dtype)])
        fb = jnp.concatenate([fb, jnp.zeros((pad,), dtype=fb.dtype)])
    call = _build_dot1d(rows_p, cols, br, config.interpret_mode())
    out = call(fa.reshape(rows_p, cols), fb.reshape(rows_p, cols))
    return out[0, 0].astype(jnp.promote_types(jnp.result_type(a, b), jnp.float32))

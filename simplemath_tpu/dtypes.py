"""Dtype / tile trait layer — the TPU analog of the reference's SimdTraits.

The reference defines a compile-time trait struct per dtype exposing SIMD
register width and load/store/splat intrinsics at 128/256/512-bit
(include/math/helpers.h:12-119; ``simd_width`` per ISA at helpers.h:14-20).
On TPU the analogous hardware parameters are the VPU/MXU native tile shapes
per dtype (sublane x lane), which determine minimum Pallas block shapes and
good VMEM tiling.  int64 — a TODO stub in the reference (helpers.h:122-127) —
is fully supported here via jax x64 (tests) and mapped to int32 tiles on TPU.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

# Minimum (sublane, lane) tile per dtype on current TPU generations.
_MIN_TILE = {
    jnp.dtype(jnp.float32): (8, 128),
    jnp.dtype(jnp.bfloat16): (16, 128),
    jnp.dtype(jnp.float16): (16, 128),
    jnp.dtype(jnp.int32): (8, 128),
    jnp.dtype(jnp.uint32): (8, 128),
    jnp.dtype(jnp.int16): (16, 128),
    jnp.dtype(jnp.int8): (32, 128),
    jnp.dtype(jnp.uint8): (32, 128),
    jnp.dtype(jnp.float8_e4m3fn): (32, 128),
    jnp.dtype(jnp.float8_e5m2): (32, 128),
}

# Dtypes the Pallas elementwise kernels accept natively on TPU.  Others
# (float64/int64/complex) run through the XLA path, which emulates them on
# TPU or computes them natively on CPU.
PALLAS_NATIVE_DTYPES = frozenset(
    [
        jnp.dtype(jnp.float32),
        jnp.dtype(jnp.bfloat16),
        jnp.dtype(jnp.int32),
        jnp.dtype(jnp.uint32),
    ]
)


@dataclasses.dataclass(frozen=True)
class TileTraits:
    """Hardware tiling traits for a dtype (analog of SimdTraits<T>)."""

    dtype: np.dtype
    sublanes: int  # second-to-last dim granularity
    lanes: int  # last dim granularity (always 128)
    pallas_native: bool

    @property
    def min_tile(self) -> tuple[int, int]:
        return (self.sublanes, self.lanes)

    @property
    def vector_elems(self) -> int:
        """Elements per VPU tile — analog of SimdTraits::simd_width."""
        return self.sublanes * self.lanes


def traits(dtype) -> TileTraits:
    dt = jnp.dtype(dtype)
    sub, lane = _MIN_TILE.get(dt, (8, 128))
    return TileTraits(
        dtype=dt, sublanes=sub, lanes=lane, pallas_native=dt in PALLAS_NATIVE_DTYPES
    )


def canonicalize(dtype):
    """Canonicalize a user dtype spec (python type / numpy dtype / string)."""
    if dtype in (float, "float"):
        return jnp.dtype(jnp.float32)
    if dtype in (int, "int"):
        return jnp.dtype(jnp.int32)
    if dtype in (complex, "complex"):
        return jnp.dtype(jnp.complex64)
    return jnp.dtype(dtype)


def result_dtype(*dtypes):
    """NumPy-style promotion over operand dtypes."""
    return jnp.result_type(*dtypes)

"""Pallas MXU matmul kernel.

The reference's reduction engine is ``dot_product`` — flat SIMD multiply-add
loops per dtype (include/math/product.h:8-224, single vector accumulator, no
FMA).  The TPU-native equivalent keeps the FLOPs on the 128x128 MXU systolic
array: a VMEM-tiled matmul with a float32 accumulator scratch, K-innermost
grid iteration so each output tile accumulates across K-steps while the
Mosaic pipeline double-buffers the A/B tiles from HBM.

Used by ``engine.dot`` for large 2-D float matmuls on TPU; everything else
(small, N-D, complex, f64) lowers through ``lax.dot_general``, which is
already MXU-optimal for those cases.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _matmul_kernel(a_ref, b_ref, out_ref, acc_ref, *, k_steps: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        a_ref[...], b_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _store():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.lru_cache(maxsize=128)
def _build_matmul(
    M: int,
    K: int,
    N: int,
    dtype_a,
    dtype_b,
    out_dtype,
    bm: int,
    bk: int,
    bn: int,
    interpret: bool,
):
    k_steps = _cdiv(K, bk)
    grid = (_cdiv(M, bm), _cdiv(N, bn), k_steps)
    kernel = functools.partial(_matmul_kernel, k_steps=k_steps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # The tuned tiles below need ~24 MB of VMEM with double
            # buffering; the default scoped limit is 16 MB (v5e has 128).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + K * N) * jnp.dtype(dtype_a).itemsize
            + M * N * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )


# Tuned on v5e at 2048^3 with steady-state (loop-differenced) timing:
# bf16 (1024, 2048, 1024) reaches 192 TF/s (97% of the 197 TF/s MXU peak,
# ahead of XLA dot's 180); f32 (512, 2048, 512) reaches ~145 TF/s (XLA's
# f32 dot wins at ~186 under --xla_allow_excess_precision, so engine.dot
# routes f32 there by default).
_DEFAULT_BLOCKS = {
    jnp.dtype(jnp.bfloat16): (1024, 2048, 1024),
    jnp.dtype(jnp.float32): (512, 2048, 512),
}


def pallas_matmul(a, b, out_dtype=None, block_m=None, block_k=None, block_n=None):
    """2-D matmul on the MXU via Pallas; f32/bf16 inputs.

    Dimensions are zero-padded up to block multiples (padding contributes
    exact zeros to the accumulation); the output is sliced back.  Default
    block sizes are per-dtype tuned (see _DEFAULT_BLOCKS)."""
    M, K = a.shape
    K2, N = b.shape
    assert K == K2, (a.shape, b.shape)
    out_dtype = out_dtype or jnp.result_type(a, b)
    dbm, dbk, dbn = _DEFAULT_BLOCKS.get(
        jnp.dtype(a.dtype), _DEFAULT_BLOCKS[jnp.dtype(jnp.float32)]
    )
    bm = min(block_m or dbm, M)
    bk = min(block_k or dbk, K)
    bn = min(block_n or dbn, N)
    Mp, Kp, Np = (_cdiv(M, bm) * bm, _cdiv(K, bk) * bk, _cdiv(N, bn) * bn)
    if (Mp, Kp) != (M, K):
        a = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
    if (Kp, Np) != (K, N):
        b = jnp.pad(b, ((0, Kp - K), (0, Np - N)))
    call = _build_matmul(
        Mp,
        Kp,
        Np,
        jnp.dtype(a.dtype),
        jnp.dtype(b.dtype),
        jnp.dtype(out_dtype),
        bm,
        bk,
        bn,
        config.interpret_mode(),
    )
    out = call(a, b)
    if (Mp, Np) != (M, N):
        out = out[:M, :N]
    return out


def supported(a_shape, b_shape, dtype) -> bool:
    if len(a_shape) != 2 or len(b_shape) != 2:
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    M, K = a_shape
    _, N = b_shape
    # Worth a custom kernel only at sizes where tiling matters.
    return M >= 256 and N >= 256 and K >= 256

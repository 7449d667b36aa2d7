"""Pallas MXU matmul kernels (2-D and batched rank-3).

The reference's reduction engine is ``dot_product`` — flat SIMD multiply-add
loops per dtype (include/math/product.h:8-224, single vector accumulator, no
FMA).  The TPU-native equivalent keeps the FLOPs on the 128x128 MXU systolic
array: a VMEM-tiled matmul with a float32 accumulator scratch, K-innermost
grid iteration so each output tile accumulates across K-steps while the
Mosaic pipeline double-buffers the A/B tiles from HBM.  Rank-3 inputs get a
leading batch grid dimension (block extent 1 per step) — the batched
(B, M, K) x (B, K, N) contractions of the solver layer.

Precision: ``precision="default"`` matches ``jnp.dot``'s platform-default
contract — on TPU, f32 operands are truncated to bf16 before hitting the
MXU (XLA's DEFAULT f32 dot does the same single-pass truncation, which is
why it runs at bf16 speed); ``precision="highest"`` keeps true f32 passes.
Off-TPU (interpret mode) both are exact f32.

Routing (re-measured round 4, tools/tune_mm2d.py + tools/tune_bmm.py,
4 alternated A/B rounds each): XLA's dot now wins every large-matmul
configuration on this chip (2048^3 bf16: 180-194 TF/s vs this kernel's
167-172; (8,1024^2) bf16 bmm: 184.5 vs 151 best-tuned; f32 default:
~200 vs 126), so ``engine.dot``/``engine.matmul`` route "auto" to XLA and
these kernels serve the forced-``pallas`` backend, tests, and in-kernel
composition.  bench.py's same-session comparators re-check the routing on
every run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from . import dispatch


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _matmul_kernel(
    *refs, k_steps: int, trunc: bool, highest: bool, epi_fn=None
):
    a_ref, b_ref, *extra_refs, out_ref, acc_ref = refs

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = a_ref[...]
    b = b_ref[...]
    if trunc:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    # precision must reach the in-kernel dot: on the real MXU the platform
    # default truncates f32 operands to bf16, so "highest" has to be
    # requested explicitly here (interpret mode is exact either way).
    acc_ref[...] += jnp.dot(
        a,
        b,
        preferred_element_type=acc_ref.dtype,
        precision=jax.lax.Precision.HIGHEST if highest else None,
    )

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _store():
        acc = acc_ref[...]
        if epi_fn is not None:
            # Fused epilogue: the elementwise tail is applied to the f32
            # accumulator IN VMEM during the final K-step — the (M, N)
            # intermediate never round-trips HBM (the extension story the
            # reference runs per-op, README.md:86-133 + product.h).
            acc = epi_fn(acc, *[e[...] for e in extra_refs])
        out_ref[...] = acc.astype(out_ref.dtype)


def _bmm_kernel(
    *refs, k_steps: int, trunc: bool, highest: bool, epi_fn=None
):
    a_ref, b_ref, *extra_refs, out_ref, acc_ref = refs

    @pl.when(pl.program_id(3) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = a_ref[0]
    b = b_ref[0]
    if trunc:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    acc_ref[...] += jnp.dot(
        a,
        b,
        preferred_element_type=acc_ref.dtype,
        precision=jax.lax.Precision.HIGHEST if highest else None,
    )

    @pl.when(pl.program_id(3) == k_steps - 1)
    def _store():
        acc = acc_ref[...]
        if epi_fn is not None:
            # Batched fused epilogue — extras arrive as (1, 1|bm, 1|bn)
            # tiles; drop the unit batch dim so they broadcast against
            # the (bm, bn) accumulator.
            acc = epi_fn(acc, *[e[0] for e in extra_refs])
        out_ref[0] = acc.astype(out_ref.dtype)


import numpy as _np

_Z = _np.int32(0)


def _acc_dtype(in_dtype):
    """Accumulator dtype: i32 for integer inputs (exact — the MXU's native
    s8xs8->s32 path and the analog of the reference's int32 SIMD dot,
    product.h:26-69), f32 otherwise."""
    return (
        jnp.int32
        if jnp.issubdtype(jnp.dtype(in_dtype), jnp.integer)
        else jnp.float32
    )


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
    trunc: bool,
    highest: bool,
    epi_id: int = None,
    extra_shapes: tuple = (),
    extra_dtypes: tuple = (),
):
    k_steps = _cdiv(K, bk)
    grid = (_cdiv(M, bm), _cdiv(N, bn), k_steps)
    epi_fn = None
    if epi_id is not None:
        from .elementwise import _TILE_FNS

        epi_fn = _TILE_FNS[epi_id]
    kernel = functools.partial(
        _matmul_kernel, k_steps=k_steps, trunc=trunc, highest=highest,
        epi_fn=epi_fn,
    )

    def extra_spec(shape):
        # Epilogue operands broadcastable to (M, N): (1|M, 1|N) after 2-D
        # padding; size-1 dims ride pinned extent-1 blocks.
        bshape = (1 if shape[0] == 1 else bm, 1 if shape[1] == 1 else bn)

        def imap(i, j, k):
            return (_Z if shape[0] == 1 else i, _Z if shape[1] == 1 else j)

        return pl.BlockSpec(bshape, imap, memory_space=pltpu.VMEM)

    extra_bytes = sum(
        (s[0] if s[0] > 1 else 1) * (s[1] if s[1] > 1 else 1)
        * jnp.dtype(dt).itemsize
        for s, dt in zip(extra_shapes, extra_dtypes)
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ]
        + [extra_spec(s) for s in extra_shapes],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), _acc_dtype(dtype_a))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # The tuned tiles below need ~24 MB of VMEM with double
            # buffering; the default scoped limit is 16 MB (v5e has 128).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + K * N) * jnp.dtype(dtype_a).itemsize
            + M * N * jnp.dtype(out_dtype).itemsize
            + extra_bytes,
            transcendentals=0,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=128)
def _build_bmm(
    B: int,
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
    trunc: bool,
    highest: bool,
    epi_id: int = None,
    extra_shapes: tuple = (),
    extra_dtypes: tuple = (),
):
    k_steps = _cdiv(K, bk)
    grid = (B, _cdiv(M, bm), _cdiv(N, bn), k_steps)
    epi_fn = None
    if epi_id is not None:
        from .elementwise import _TILE_FNS

        epi_fn = _TILE_FNS[epi_id]
    kernel = functools.partial(
        _bmm_kernel, k_steps=k_steps, trunc=trunc, highest=highest,
        epi_fn=epi_fn,
    )

    def extra_spec(shape):
        # Epilogue operands broadcastable to (B, M, N) as (1|B, 1|M, 1|N).
        bshape = (
            1,
            1 if shape[1] == 1 else bm,
            1 if shape[2] == 1 else bn,
        )

        def imap(b, i, j, k):
            return (
                _Z if shape[0] == 1 else b,
                _Z if shape[1] == 1 else i,
                _Z if shape[2] == 1 else j,
            )

        return pl.BlockSpec(bshape, imap, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bm, bk), lambda b, i, j, k: (b, i, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bk, bn), lambda b, i, j, k: (b, k, j), memory_space=pltpu.VMEM
            ),
        ]
        + [extra_spec(s) for s in extra_shapes],
        out_specs=pl.BlockSpec(
            (1, bm, bn), lambda b, i, j, k: (b, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), _acc_dtype(dtype_a))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * N * K,
            bytes_accessed=B
            * (
                (M * K + K * N) * jnp.dtype(dtype_a).itemsize
                + M * N * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )


# Tuned on v5e at 2048^3 with steady-state (loop-differenced) timing.
# Round-4 re-measurement: bf16 (1024, 2048, 1024) runs 167-172 TF/s
# (85-87% of the 197 TF/s MXU peak) vs jnp.dot's 180-194 — round 3's
# one-off 195.8-vs-167.5 kernel win did not reproduce, so no public
# "auto" path routes here anymore (engine.dot/matmul comments).  The f32
# in-kernel bf16-truncation route measured 126 TF/s vs jnp.dot default's
# ~200; f32 precision="highest" runs ~29-30 TF/s on both engines (6-pass
# exact f32).
_DEFAULT_BLOCKS = {
    jnp.dtype(jnp.bfloat16): (1024, 2048, 1024),
    jnp.dtype(jnp.float32): (512, 2048, 512),
    # int8: swept on v5e at 2048^3 (3 alternated rounds vs XLA's int8
    # dot): (512, 2048, 2048) runs 345-353 TOPS vs XLA's 330-336 — the
    # widest N block wins because int8 tiles are half the bytes of bf16
    # and the i32 accumulator (512x2048x4 = 4 MB) still fits comfortably.
    # (uint8 is rejected — the MXU i8 path sign-extends.)
    jnp.dtype(jnp.int8): (512, 2048, 2048),
}
# f32 operands truncated in-kernel behave like bf16 for MXU tiling.
_TRUNC_BLOCKS = (1024, 2048, 1024)


def _trunc_f32(a_dtype, precision: str, interpret: bool) -> bool:
    """Whether to truncate f32 operands to bf16 in-kernel: only under the
    platform-default contract, only on real TPU (interpret = exact f32)."""
    return (
        precision == "default"
        and jnp.dtype(a_dtype) == jnp.dtype(jnp.float32)
        and not interpret
    )


def pallas_matmul(
    a,
    b,
    out_dtype=None,
    block_m=None,
    block_k=None,
    block_n=None,
    precision: str = "default",
    epilogue=None,
    extras=(),
):
    """Matmul on the MXU via Pallas; f32/bf16 inputs, rank-2 or rank-3
    (leading batch) operands.

    Dimensions are zero-padded up to block multiples (padding contributes
    exact zeros to the accumulation); the output is sliced back.  Default
    block sizes are per-dtype tuned (see _DEFAULT_BLOCKS).

    ``epilogue`` (rank-2 only) is a STABLE tile function applied to the
    f32 accumulator in the final K-step: ``epilogue(acc, *extra_tiles)``,
    with each of ``extras`` broadcastable to (M, N) as (1|M, 1|N) — the
    fused ``relu(x @ W + b)`` path where the (M, N) intermediate never
    leaves VMEM.  The epilogue sees the f32 accumulator (more accurate
    than applying it to a down-cast product)."""
    batched = a.ndim == 3
    for x in (a, b):
        if jnp.dtype(x.dtype) == jnp.dtype(jnp.uint8):
            # Mosaic's MXU i8 path sign-extends: a uint8 tile is read as
            # s8 and every output element is wrong (measured on-chip).
            raise TypeError(
                "pallas_matmul does not support uint8 operands (the MXU "
                "i8 path sign-extends); use int8, or int8_matmul's exact "
                "XLA fallback for uint8"
            )
    if batched:
        B, M, K = a.shape
        B2, K2, N = b.shape
        assert B == B2 and K == K2, (a.shape, b.shape)
    else:
        M, K = a.shape
        K2, N = b.shape
        assert K == K2, (a.shape, b.shape)
    out_dtype = out_dtype or jnp.result_type(a, b)
    interpret = config.interpret_mode()
    trunc = _trunc_f32(a.dtype, precision, interpret)
    if trunc:
        dbm, dbk, dbn = _TRUNC_BLOCKS
    else:
        dbm, dbk, dbn = _DEFAULT_BLOCKS.get(
            jnp.dtype(a.dtype), _DEFAULT_BLOCKS[jnp.dtype(jnp.float32)]
        )
    # Mosaic requires each block's trailing two dims divisible by the
    # hardware tile (sublane, 128) unless equal to the array dim; arrays are
    # padded to block multiples below, so rounding the blocks suffices.  The
    # output block (bm, bn) must satisfy the OUT dtype's sublane size too
    # (bf16 output from f32 inputs needs 16-aligned bm).
    def _sublane(dt):
        from .. import dtypes as _dtypes

        return _dtypes.traits(dt).sublanes

    sub = max(_sublane(a.dtype), _sublane(out_dtype))
    bm = _round_up(min(block_m or dbm, M), sub)
    bk = _round_up(min(block_k or dbk, K), 128)
    bn = _round_up(min(block_n or dbn, N), 128)
    Mp, Kp, Np = (_cdiv(M, bm) * bm, _cdiv(K, bk) * bk, _cdiv(N, bn) * bn)
    pad_a = [(0, Mp - M), (0, Kp - K)]
    pad_b = [(0, Kp - K), (0, Np - N)]
    if batched:
        pad_a = [(0, 0)] + pad_a
        pad_b = [(0, 0)] + pad_b
    if (Mp, Kp) != (M, K):
        a = jnp.pad(a, pad_a)
    if (Kp, Np) != (K, N):
        b = jnp.pad(b, pad_b)
    dispatch.record("matmul", "bmm" if batched else "mm")
    nd_out = 3 if batched else 2
    epi_id = None
    padded_extras = []
    if epilogue is not None:
        from .elementwise import _tile_fn_id

        epi_id = _tile_fn_id(epilogue)
        full = (B, M, N) if batched else (M, N)
        padded_dims = (B, Mp, Np) if batched else (Mp, Np)
        for e in extras:
            e = jnp.asarray(e)
            if e.ndim < nd_out:
                e = jnp.reshape(e, (1,) * (nd_out - e.ndim) + e.shape)
            es = tuple(int(x) for x in e.shape)
            if any(s not in (1, f) for s, f in zip(es, full)):
                raise ValueError(
                    f"epilogue operand shape {es} is not broadcastable to "
                    f"{full} as {'(1|B, 1|M, 1|N)' if batched else '(1|M, 1|N)'}"
                )
            # Zero-pad full dims to block multiples; the epilogue runs
            # on the padded garbage region too, which is sliced away.
            pe = [
                (0, p - s if s == f and p != s else 0)
                for s, f, p in zip(es, full, padded_dims)
            ]
            if any(p[1] for p in pe):
                e = jnp.pad(e, pe)
            padded_extras.append(e)
        dispatch.record("matmul", "bmm_epilogue" if batched else "mm_epilogue")
    extra_meta = (
        tuple(tuple(int(x) for x in e.shape) for e in padded_extras),
        tuple(jnp.dtype(e.dtype) for e in padded_extras),
    )
    if batched:
        call = _build_bmm(
            B, Mp, Kp, Np,
            jnp.dtype(a.dtype), jnp.dtype(b.dtype), jnp.dtype(out_dtype),
            bm, bk, bn, interpret, trunc, precision == "highest",
            epi_id, *extra_meta,
        )
    else:
        call = _build_matmul(
            Mp, Kp, Np,
            jnp.dtype(a.dtype), jnp.dtype(b.dtype), jnp.dtype(out_dtype),
            bm, bk, bn, interpret, trunc, precision == "highest",
            epi_id, *extra_meta,
        )
    out = call(a, b, *padded_extras)
    if (Mp, Np) != (M, N):
        out = out[..., :M, :N]
    return out


def _dequant_epi(acc, scale):
    # STABLE module-level epilogue tile (the kernel-build cache keys on
    # identity): i32 accumulator -> f32, scaled in VMEM at store time.
    return acc.astype(jnp.float32) * scale


def int8_matmul(a, b, out_dtype=jnp.int32, scale=None):
    """s8 x s8 -> s32 matmul on the MXU's int8 path (~2x bf16 MACs/cycle on
    v5e) — exact integer accumulation, the quantized-inference analog of
    the reference's int32 SIMD dot (product.h:26-69).  Rank-2 or batched
    rank-3 int8/uint8 operands; i32 accumulator and output.  Small shapes
    (below the kernel gate) and the xla backend take ``jnp.matmul`` with
    ``preferred_element_type=int32`` (also exact).

    ``scale`` (a scalar, typically ``scale_a * scale_b`` from
    ``quantize_int8``) fuses the DEQUANTIZATION into the kernel epilogue:
    the i32 accumulator is scaled to f32 in VMEM at store time, so the
    f32 result costs no extra HBM pass (rank-2 kernel path; other routes
    apply the scale in XLA, which fuses it under jit)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    for x in (a, b):
        if jnp.dtype(x.dtype) not in (jnp.dtype(jnp.int8), jnp.dtype(jnp.uint8)):
            raise TypeError(
                f"int8_matmul requires int8/uint8 operands, got {x.dtype}"
            )
    out_dtype = jnp.dtype(jnp.float32) if scale is not None else jnp.dtype(out_dtype)
    backend = config.kernel_backend
    shapes_ok = (
        a.ndim == b.ndim
        and a.ndim in (2, 3)
        and a.shape[-1] == b.shape[-2]
        and (a.ndim == 2 or a.shape[0] == b.shape[0])
        and a.shape[-2] >= 256
        and b.shape[-1] >= 256
        and a.shape[-1] >= 256
    )
    # The Pallas kernel serves SIGNED int8 only: Mosaic's MXU i8 path
    # sign-extends operands, so a uint8 tile would be read as s8 (measured
    # wrong on-chip); uint8 takes the exact XLA widening fallback below.
    signed = all(
        jnp.dtype(x.dtype) == jnp.dtype(jnp.int8) for x in (a, b)
    )
    if backend != "xla" and shapes_ok and signed:
        import jax as _jax

        if backend == "pallas" or _jax.default_backend() == "tpu":
            dispatch.record("matmul", "int8")
            if scale is not None:
                # Scalar or per-channel scales, normalized to the output's
                # rank as (1|B, 1|M, 1|N) so the epilogue reads them as
                # pinned/broadcast blocks.
                s = jnp.asarray(scale, jnp.float32)
                if s.ndim == 0:
                    s = jnp.reshape(s, (1,) * a.ndim)
                elif s.ndim < a.ndim:
                    s = jnp.reshape(s, (1,) * (a.ndim - s.ndim) + s.shape)
                return pallas_matmul(
                    a, b, out_dtype, epilogue=_dequant_epi, extras=[s]
                )
            return pallas_matmul(a, b, out_dtype)
    out = jnp.matmul(a, b, preferred_element_type=jnp.int32)
    if scale is not None:
        return out.astype(jnp.float32) * jnp.asarray(scale, jnp.float32)
    return out.astype(out_dtype)


def quantize_int8(x, scale=None, axis=None):
    """Symmetric int8 quantization: ``q = clip(round(x / scale), -127,
    127)``; default ``scale = max|x| / 127``.  ``axis`` computes
    PER-CHANNEL scales by reducing over the given axis/axes (keepdims), the
    production-quantization shape — e.g. ``axis=0`` on a (K, N) weight
    gives per-output-channel (1, N) scales, which ``int8_matmul``'s fused
    dequant epilogue consumes directly.  Returns ``(q, scale)``."""
    x = jnp.asarray(x)
    if scale is None:
        if axis is None:
            scale = jnp.max(jnp.abs(x)) / 127.0
        else:
            scale = jnp.max(jnp.abs(x), axis=axis, keepdims=True) / 127.0
    scale = jnp.asarray(scale, jnp.float32)
    safe = jnp.where(scale > 0, scale, jnp.float32(1.0))
    q = jnp.clip(jnp.round(x / safe), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_int8(q, scale):
    """Inverse of ``quantize_int8`` (also rescales i32 matmul results:
    pass ``scale_a * scale_b``)."""
    return jnp.asarray(q).astype(jnp.float32) * jnp.asarray(scale, jnp.float32)


def supported(a_shape, b_shape, dtype) -> bool:
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    if len(a_shape) == 3 and len(b_shape) == 3:
        if a_shape[0] != b_shape[0]:
            return False
        _, M, K = a_shape
        _, _, N = b_shape
    elif len(a_shape) == 2 and len(b_shape) == 2:
        M, K = a_shape
        _, N = b_shape
    else:
        return False
    # Worth a custom kernel only at sizes where tiling matters.
    return M >= 256 and N >= 256 and K >= 256

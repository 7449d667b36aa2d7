"""Dispatch engine: broadcast + backend selection + kernel launch.

TPU-native analog of the reference's call path for ``c = a + b``
(SURVEY §3.2): ``operator+`` -> ``sm::broadcast`` -> ``element_wise_op``
(include/SMArray.h:217-225, include/SMUtils.h:34-99,
include/math/calculate.h:5-99).  Here: operator -> ``engine.binary`` ->
``broadcast_shapes`` (shape check with NumPy error semantics) -> backend
pick (Pallas kernel on TPU for large ops / XLA fusion otherwise; the runtime
analog of the reference's compile-time ISA dispatch).
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp

from ..array import Array, as_jax
from ..broadcast import broadcast_shapes
from ..config import config
from . import elementwise, registry


def pallas_wanted(out_shape) -> bool:
    """Shared backend gate: True when the configured backend wants a Pallas
    kernel for an op of this output size (the runtime analog of the
    reference's compile-time ISA choice + OpenMP size gate,
    include/math/calculate.h:47)."""
    backend = config.kernel_backend
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    if jax.default_backend() != "tpu":
        return False
    return math.prod(out_shape) >= config.pallas_min_elements


def _is_arraylike(x) -> bool:
    return isinstance(x, (Array, jax.Array, jax.core.Tracer)) or hasattr(x, "shape")


def _operand_info(x):
    """(shape, result_type_arg) WITHOUT materializing view Arrays — the
    whole point of the view-kernel path is that ``ViewSpec.read`` (an HBM
    relayout copy) never runs for kernel-expressible views."""
    if isinstance(x, Array):
        return x.shape, x.dtype
    return jnp.shape(x), x


def _prepare_operands(xs, out_shape, in_dtypes, out_dtype):
    """(buffers, plans) for the Pallas path.

    A view Array whose ViewSpec the BlockSpec machinery can express
    (ops/viewkernel.py) contributes its BASE buffer plus a ViewPlan — the
    kernel reads the view in place, like the reference's strided hot loop
    (include/math/calculate.h:16-99).  Everything else materializes as
    before."""
    from . import viewkernel

    blocks = None
    bufs, plans = [], []
    any_plan = False
    for x in xs:
        if isinstance(x, Array) and x.is_view:
            if blocks is None:
                blocks = elementwise.choose_blocks_for(
                    out_shape, in_dtypes, out_dtype
                )
            plan = viewkernel.plan_view(x._spec, out_shape, blocks, x.dtype)
            if plan is not None:
                bufs.append(x._storage.buf)
                plans.append(plan)
                any_plan = True
                continue
        bufs.append(jnp.asarray(as_jax(x)))
        plans.append(None)
    return bufs, (tuple(plans) if any_plan else None)


def _transpose_operand(x, rank: int):
    """(buffer, transposed) for a dot/matmul operand: a pure (batched)
    transpose view of matching rank — 2-D ``a.T`` or rank-3 ``(0, 2, 1)``
    — contributes its BASE buffer with a flag; ``lax.dot_general``
    contracts either orientation natively on the MXU, so ``a.T @ b`` costs
    NO relayout copy (the reference's dot reads flat buffers and got
    views wrong, SURVEY §2.4-3; XLA's dimension numbers do it right for
    free).  Everything else materializes as before."""
    from ..viewspec import Span

    want_perm = (1, 0) if rank == 2 else (0, 2, 1)
    if isinstance(x, Array) and x.is_view:
        spec = x._spec
        if (
            spec.ndim == rank
            and len(spec.base_shape) == rank
            and spec.perm == want_perm
            and all(
                isinstance(e, Span)
                and e.start == 0
                and e.step == 1
                and e.length == s
                for e, s in zip(spec.entries, spec.base_shape)
            )
        ):
            return x._storage.buf, True
    return jnp.asarray(as_jax(x)), False


def _dot_general_t(av, ta, bv, tb, preferred, prec, rank: int):
    """(Batched) contraction with per-operand transposition folded into
    the dimension numbers (no transpose copies)."""
    if rank == 2:
        dims = (((0 if ta else 1,), (1 if tb else 0,)), ((), ()))
    else:
        dims = (((1 if ta else 2,), (2 if tb else 1,)), ((0,), (0,)))
    return jax.lax.dot_general(
        av, bv, dims, preferred_element_type=preferred, precision=prec
    )


def _dot_transposed_views(a, b, batched_ok: bool = False):
    """The no-copy route for 2-D (and, from ``matmul``, batched rank-3)
    contractions with transpose-view operands, or None when it does not
    apply (other ranks, complex-on-TPU, or a forced-pallas route that
    wants dense kernel operands)."""
    a_shape, a_rt = _operand_info(a)
    b_shape, b_rt = _operand_info(b)
    rank = len(a_shape)
    if len(b_shape) != rank or rank not in ((2, 3) if batched_ok else (2,)):
        return None
    if rank == 3 and a_shape[0] != b_shape[0]:
        return None
    out_dtype = jnp.result_type(a_rt, b_rt)
    if (
        jnp.dtype(out_dtype) == jnp.dtype(jnp.complex64)
        and jax.default_backend() == "tpu"
    ):
        return None
    from . import matmul as _mm

    if config.kernel_backend == "pallas" and _mm.supported(
        a_shape, b_shape, out_dtype
    ):
        return None
    av, ta = _transpose_operand(a, rank)
    bv, tb = _transpose_operand(b, rank)
    if not (ta or tb):
        return None
    preferred, prec = _fallback_precision(a_shape, b_shape, out_dtype)
    return Array(_dot_general_t(av, ta, bv, tb, preferred, prec, rank))


def _view_bypass(*xs) -> bool:
    """Whether an op should skip the deferred-eager queue because a view
    operand could be read in-kernel (the queue's recording step would
    materialize it, ops/lazy.py::_as_operand)."""
    from . import viewkernel

    return any(viewkernel.expressible_hint(x) for x in xs)


def _use_pallas(op, out_shape, in_dtypes, out_dtype) -> bool:
    if not op.pallas_ok:
        return False
    if not elementwise.supported(out_shape, in_dtypes, out_dtype):
        return False
    # auto: Pallas only on TPU for big ops (XLA fusion wins for small/fused).
    return pallas_wanted(out_shape)


def binary(name: str, a: Any, b: Any) -> Array:
    from . import dispatch, fusion, lazy

    if fusion.is_fused(a) or fusion.is_fused(b):
        return fusion.binary_node(name, a, b)
    dispatch.record("engine", name)
    if registry.get_op(name).pallas_ok and not _view_bypass(a, b):
        out = lazy.defer_binary(name, a, b)
        if out is not None:
            return out
    return binary_eager(name, a, b)


def binary_eager(name: str, a: Any, b: Any) -> Array:
    """The non-deferring compute path (also the lazy queue's single-op
    flush; ``binary`` records the engine dispatch before deferring)."""
    op = registry.get_op(name)
    a_shape, a_rt = _operand_info(a)
    b_shape, b_rt = _operand_info(b)
    br = broadcast_shapes(a_shape, b_shape)  # raises ValueError on mismatch
    out = None
    if _is_arraylike(a) and _is_arraylike(b):
        out_dtype = jnp.result_type(a_rt, b_rt)
        in_dtypes = (jnp.result_type(a_rt), jnp.result_type(b_rt))
        if _use_pallas(op, br.result_shape, in_dtypes, out_dtype):
            bufs, plans = _prepare_operands(
                (a, b), br.result_shape, in_dtypes, out_dtype
            )
            out = elementwise.pallas_elementwise(
                op.tile(),
                br.result_shape,
                out_dtype,
                *bufs,
                name=name,
                plans=plans,
            )
    if out is None:
        out = op.fn(as_jax(a), as_jax(b))
    return Array(out)


def unary(name: str, a: Any) -> Array:
    from . import dispatch, fusion, lazy

    if fusion.is_fused(a):
        return fusion.unary_node(name, a)
    dispatch.record("engine", name)
    if registry.get_op(name).pallas_ok and not _view_bypass(a):
        out = lazy.defer_unary(name, a)
        if out is not None:
            return out
    return unary_eager(name, a)


def unary_eager(name: str, a: Any) -> Array:
    """Non-deferring compute path (also the lazy single-op flush)."""
    op = registry.get_op(name)
    shape, a_rt = _operand_info(a)
    out_dtype = jnp.result_type(a_rt)
    if _use_pallas(op, shape, (out_dtype,), out_dtype):
        bufs, plans = _prepare_operands((a,), shape, (out_dtype,), out_dtype)
        out = elementwise.pallas_elementwise(
            op.tile(), shape, out_dtype, *bufs, name=name, plans=plans
        )
    else:
        out = op.fn(as_jax(a))
    return Array(out)


def ternary(name: str, a: Any, b: Any, c: Any) -> Array:
    from . import dispatch, fusion, lazy

    if fusion.is_fused(a) or fusion.is_fused(b) or fusion.is_fused(c):
        return fusion.ternary_node(name, a, b, c)
    dispatch.record("engine", name)
    if registry.get_op(name).pallas_ok and not _view_bypass(a, b, c):
        out = lazy.defer_ternary(name, a, b, c)
        if out is not None:
            return out
    return ternary_eager(name, a, b, c)


def ternary_eager(name: str, a: Any, b: Any, c: Any) -> Array:
    """Non-deferring compute path (also the lazy single-op flush)."""
    op = registry.get_op(name)
    infos = [_operand_info(v) for v in (a, b, c)]
    br = broadcast_shapes(
        broadcast_shapes(infos[0][0], infos[1][0]).result_shape,
        infos[2][0],
    )
    out = None
    if all(_is_arraylike(v) for v in (a, b, c)):
        in_dtypes = tuple(jnp.result_type(i[1]) for i in infos)
        out_dtype = jax.eval_shape(
            op.fn,
            *[jax.ShapeDtypeStruct(i[0], dt) for i, dt in zip(infos, in_dtypes)],
        ).dtype
        if _use_pallas(op, br.result_shape, in_dtypes, out_dtype):
            bufs, plans = _prepare_operands(
                (a, b, c), br.result_shape, in_dtypes, out_dtype
            )
            out = elementwise.pallas_elementwise(
                op.tile(),
                br.result_shape,
                out_dtype,
                *bufs,
                name=name,
                plans=plans,
            )
    if out is None:
        out = op.fn(as_jax(a), as_jax(b), as_jax(c))
    return Array(out)


def apply_op(name: str, *operands) -> Array:
    """Public entry for registered (incl. user) ops — the reference's custom
    operator hook (README.md:119-133)."""
    op = registry.get_op(name)
    if op.arity == 1:
        return unary(name, *operands)
    if op.arity == 3:
        return ternary(name, *operands)
    return binary(name, *operands)


# ----------------------------------------------------------------- pow
def _int_pow(base, exponent):
    """Integer pow with the reference's documented edge semantics
    (include/math/simd/crafted_pow.h:35-51, tests/pow.cpp:62-99):
    nonnegative exponents are exact square-and-multiply results; negative
    exponents truncate to 0 except bases +1/-1 (and 1^x == 1, (-1)^e = ±1 by
    parity)."""
    base = jnp.asarray(base)
    exponent = jnp.asarray(exponent)
    e = jnp.abs(exponent)
    pos = jnp.power(base, e)
    parity = jnp.where(e % 2 == 0, 1, -1).astype(base.dtype)
    neg = jnp.where(
        base == 1,
        jnp.ones_like(base),
        jnp.where(base == -1, parity, jnp.zeros_like(base)),
    )
    return jnp.where(exponent < 0, neg, pos)


def _static_int_pow(x, e: int):
    """x**e for a STATIC integer exponent by repeated squaring — exact,
    memory-bound (a handful of fused multiplies), no transcendentals."""
    if e == 0:
        return jnp.ones_like(x)
    inv = e < 0
    e = -e if inv else e
    result = None
    base = x
    while e:
        if e & 1:
            result = base if result is None else result * base
        base = base * base
        e >>= 1
    return 1.0 / result if inv else result


def pow(a: Any, b: Any) -> Array:
    """Elementwise power — reference ``sm::pow`` (include/UserFunctions.h:42-48,
    include/math/pow.h).  Unlike the reference (flat-buffer iteration,
    SURVEY §2.4-3), views are honored; float pow uses the transcendental
    kernel path with correct range reduction (the reference's admitted
    failure, README.md:8-10).  Static integer exponents (the benchmark's
    ``pow(a, 2)`` shape) specialize to repeated squaring — exact and
    memory-bound instead of transcendental-bound."""
    from . import fusion, lazy

    if fusion.is_fused(a) or fusion.is_fused(b):
        return fusion.pow_node(a, b)
    if not _view_bypass(a, b):
        out = lazy.defer_pow(a, b)
        if out is not None:
            return out
    return pow_eager(a, b)


@functools.lru_cache(maxsize=64)
def _static_pow_tile(e: int):
    """STABLE per-exponent tile for the repeated-squaring path (the
    kernel-build cache keys on tile identity)."""

    def tile(x):
        return _static_int_pow(x, e)

    return tile


def pow_eager(a: Any, b: Any) -> Array:
    """Non-deferring compute path (also the lazy single-op flush)."""
    a_shape, a_rt = _operand_info(a)
    b_shape, b_rt = _operand_info(b)
    br = broadcast_shapes(a_shape, b_shape)
    a_dt = jnp.result_type(a_rt)
    b_dt = jnp.result_type(b_rt)
    if jnp.issubdtype(a_dt, jnp.integer) and jnp.issubdtype(b_dt, jnp.integer):
        from . import transcendental

        # Public int-pow path IS the crafted square-and-multiply kernel
        # (reference crafted_pow.h:4-154 is on its public operator too);
        # small shapes / non-native dtypes take the jnp equivalent.  View
        # operands ride BlockSpec plans like the registry ops.
        out_dtype = jnp.result_type(a_rt, b_rt)
        if pallas_wanted(br.result_shape) and elementwise.supported(
            br.result_shape, (a_dt, b_dt), out_dtype
        ):
            bufs, plans = _prepare_operands(
                (a, b), br.result_shape, (a_dt, b_dt), out_dtype
            )
            return Array(
                elementwise.pallas_elementwise(
                    transcendental.ipow_tile,
                    br.result_shape,
                    out_dtype,
                    *bufs,
                    name="ipow",
                    plans=plans,
                )
            )
        return Array(_int_pow(as_jax(a), as_jax(b)))
    if (
        isinstance(b, (int, float))
        and float(b) == int(b)
        and abs(int(b)) <= 64
        and jnp.issubdtype(a_dt, jnp.floating)
    ):
        e = int(b)
        if (
            isinstance(a, Array)
            and a.is_view
            and a_dt != jnp.dtype(jnp.float64)
            and pallas_wanted(a_shape)
            and elementwise.supported(a_shape, (a_dt,), a_dt)
        ):
            bufs, plans = _prepare_operands((a,), a_shape, (a_dt,), a_dt)
            if plans is not None:
                return Array(
                    elementwise.pallas_elementwise(
                        _static_pow_tile(e), a_shape, a_dt, *bufs,
                        name="powi", plans=plans,
                    )
                )
        return Array(_static_int_pow(jnp.asarray(as_jax(a)), e))
    from . import transcendental

    return Array(transcendental.pow(as_jax(a), as_jax(b)))


# ----------------------------------------------------------------- dot
def dot(a: Any, b: Any):
    """Dot product on the MXU — reference ``operator%`` / ``dot_product``
    (include/SMArray.h:213-215, include/math/product.h:8-224).

    Follows ``numpy.dot`` semantics (1-D·1-D inner product, 2-D matmul,
    N-D contraction of last axis with second-to-last), honoring views —
    fixing the reference's flat-buffer/totalSize-of-rhs behavior
    (SURVEY §2.4-3).  2-D TRANSPOSE-view operands fold into the
    contraction's dimension numbers (``a.T @ b`` pays no relayout copy)."""
    out = _dot_transposed_views(a, b)
    if out is not None:
        return out
    av, bv = jnp.asarray(as_jax(a)), jnp.asarray(as_jax(b))
    out_dtype = jnp.result_type(av, bv)
    if (
        jnp.dtype(out_dtype) == jnp.dtype(jnp.complex64)
        and jax.default_backend() == "tpu"
    ):
        # TPU has no complex type: three f32 MXU contractions via the Gauss
        # split (ops/complexmm.py — the product.h:168-224 analog).
        from . import complexmm

        return Array(complexmm.complex_dot(av, bv))
    backend = config.kernel_backend
    if backend != "xla":
        from . import matmul, reduction

        # Route by measured speed (v5e, steady-state loop differencing,
        # re-measured round 4 with 4 alternated A/B rounds each —
        # tools/tune_mm2d.py, tools/tune_bmm.py): XLA dot wins EVERY dtype
        # and rank here (2048^3 bf16: XLA 180-194 TF/s vs kernel 167-172;
        # (8,1024^2) bf16 bmm: XLA 184.5 vs kernel's best 151; f32: XLA
        # ~200+ vs the truncation route's 126).  Round 3's one-off 195.8
        # vs 167.5 kernel win did not reproduce.  "auto" therefore sends
        # ALL large matmuls to XLA; the Pallas MXU kernels remain the
        # forced-"pallas" path (and the building block for fused/dot1d
        # pipelines where they DO win).  bench.py re-measures the
        # comparator every run so this routing stays continuously checked.
        if (
            av.ndim == 2
            and bv.ndim == 2
            and matmul.supported(av.shape, bv.shape, out_dtype)
            and backend == "pallas"
        ):
            return Array(matmul.pallas_matmul(av, bv, out_dtype))
        if (
            av.ndim == 1
            and bv.ndim == 1
            and av.shape == bv.shape
            and (
                (
                    jnp.issubdtype(out_dtype, jnp.floating)
                    and out_dtype != jnp.dtype(jnp.float64)
                )
                or jnp.dtype(out_dtype)
                in (jnp.dtype(jnp.int32), jnp.dtype(jnp.uint32))
            )
            and pallas_wanted(av.shape)
        ):
            # Fused multiply+reduce in one HBM pass — the public analog of
            # the reference's dot_product SIMD loops (float
            # product.h:74-116, int32 product.h:26-69 — i32 accumulation
            # in-kernel, exact); "auto" takes it on TPU above the size
            # gate, not only when forced (round-1 VERDICT item 3).
            return Array(reduction.pallas_dot1d(av, bv).astype(out_dtype))
    preferred, prec = _fallback_precision(av.shape, bv.shape, out_dtype)
    out = jnp.dot(av, bv, preferred_element_type=preferred, precision=prec)
    return Array(out)


def _fallback_precision(a_shape, b_shape, out_dtype):
    """(preferred_element_type, precision) for the jnp matmul fallback.

    The reference's dot is exact f32 SIMD (product.h:74-116); TPU's DEFAULT
    f32 matmul truncates operands to bf16.  Contract here: BELOW the kernel
    size gate (small/odd-rank contractions — latency-bound, extra MXU
    passes are free) f32 runs at HIGHEST precision, i.e. reference-exact;
    above the gate the MXU kernels take over at platform-default precision
    (documented divergence for speed, same as jnp.dot's default)."""
    from . import matmul as _mm

    preferred = None
    if jnp.issubdtype(out_dtype, jnp.floating):
        preferred = jnp.promote_types(out_dtype, jnp.float32)
    prec = None
    if (
        jnp.dtype(out_dtype) == jnp.dtype(jnp.float32)
        and jax.default_backend() == "tpu"
        and not _mm.supported(a_shape, b_shape, out_dtype)
    ):
        prec = jax.lax.Precision.HIGHEST
    return preferred, prec


def matmul(a: Any, b: Any) -> Array:
    """``numpy.matmul`` semantics (batched matrix product over leading
    dims).  Rank-3 same-batch float contractions — the solver layer's
    (B, n, m) @ (B, m, k) shape — route to the batched Pallas MXU kernel
    on TPU; 2-D and batched rank-3 transpose-view operands fold into
    dimension numbers (no relayout copy); everything else lowers through
    ``jnp.matmul``."""
    out = _dot_transposed_views(a, b, batched_ok=True)
    if out is not None:
        return out
    av, bv = jnp.asarray(as_jax(a)), jnp.asarray(as_jax(b))
    out_dtype = jnp.result_type(av, bv)
    if (
        jnp.dtype(out_dtype) == jnp.dtype(jnp.complex64)
        and jax.default_backend() == "tpu"
    ):
        from . import complexmm

        return Array(complexmm.complex_matmul(av, bv))
    backend = config.kernel_backend
    if backend != "xla":
        from . import matmul as _mm

        # Same measured routing as `dot` (see the comment there): XLA wins
        # every large-matmul row in the round-4 A/B, so "auto" routes to
        # XLA and the MXU kernels serve the forced-"pallas" path.
        if (
            av.ndim == bv.ndim
            and av.ndim in (2, 3)
            and _mm.supported(av.shape, bv.shape, out_dtype)
            and backend == "pallas"
        ):
            return Array(_mm.pallas_matmul(av, bv, out_dtype))
    preferred, prec = _fallback_precision(av.shape, bv.shape, out_dtype)
    return Array(jnp.matmul(av, bv, preferred_element_type=preferred, precision=prec))

"""Fused elementwise expressions: chain sm ops into ONE kernel launch.

The reference's op chain ``sm::pow`` then exp costs one full pass over the
data per op (each ``element_wise_op`` call is its own OpenMP/SIMD loop,
include/math/calculate.h:5-99) — and so did this framework's public ops
through round 2: ``sm.exp(sm.pow(a, e))`` launched two Pallas kernels, i.e.
two HBM round-trips, losing to XLA's automatic fusion by 7x on the
BASELINE.json configs[1] pipeline.

``sm.fuse`` is the TPU-native fusion story: it traces a user function built
from sm ops over symbolic ``FusedExpr`` nodes and composes their TILE-level
implementations (the same ``tile_fn``s the registry/transcendental layer
feeds the generic elementwise kernel) into a single function, executed by
ONE ``pallas_elementwise`` launch — one read of each operand, one write of
the output, with broadcasting still handled by BlockSpec index maps so
broadcast operands are never materialized::

    fused = sm.fuse(lambda a, e: sm.exp(sm.pow(a, e)))
    y = fused(a, e_row)        # ONE kernel launch; e_row (1, n) broadcasts

The composed expression is cached per input signature (shapes + dtypes), so
repeated calls reuse the same tile function object and hit the kernel-build
cache (ops/elementwise.py keys on tile-fn identity).

Supported inside a fused function: the registered elementwise ops
(+ - * / // % maximum minimum negative abs sqrt square, comparisons),
``sm.exp/log/exp2/log2``, ``sm.sin/cos/tan/tanh`` and ``sm.pow``
(static-integer exponents specialize to repeated squaring, exactly like the
public path), with Python scalars as constants.  Array-valued constants
must be passed as arguments to the fused function — every array the kernel
reads has to be an operand.  A FULL ``sm.sum/mean/max/min`` may be the
ROOT of the fused function: the whole chain then executes as a single-pass
map+reduce kernel (``FusedReduction``)::

    sqdist = sm.fuse(lambda a, b: sm.sum(sm.square(a - b)))
    d = sqdist(x, y)           # ONE pass over HBM; (x-y)^2 never stored
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..array import Array, as_jax
from ..config import config


def _leaf_fn(i: int) -> Callable:
    def leaf(*args):
        return args[i]

    return leaf


class _ViewOperand:
    """A fused-function argument that is an aliasing VIEW kept
    unmaterialized: the base buffer plus its ViewSpec.  The kernel path
    compiles the spec into a BlockSpec plan (ops/viewkernel.py) so the
    view is read in-kernel; paths without plan support call ``.read()``
    (the round-4 materializing behavior)."""

    __slots__ = ("buf", "spec")

    def __init__(self, buf, spec):
        self.buf = buf
        self.spec = spec

    @property
    def shape(self):
        return self.spec.shape

    @property
    def dtype(self):
        return self.buf.dtype

    def read(self):
        return self.spec.read(self.buf)


def _concrete(o):
    """Materialize a fused operand (views fall back to ViewSpec.read)."""
    return o.read() if isinstance(o, _ViewOperand) else o


class FusedExpr:
    """Symbolic node of a fused elementwise expression.

    ``fn(*all_operands)`` computes this node's value from the fused
    function's input arrays (or their VMEM tiles, inside the kernel); all
    nodes of one trace share the same operand signature ``specs``.

    ``leaf`` is the operand index for direct-argument leaves (None for
    composed nodes), ``used`` the set of leaf indices this node reads
    elementwise, and ``mm`` the (a_leaf, b_leaf) pair when the expression
    contains a matmul root (at most one per fused function) — in that case
    every node ``fn`` takes one extra trailing argument, the matmul
    product (the f32 accumulator tile inside the kernel)."""

    __slots__ = ("fn", "specs", "_aval", "leaf", "used", "mm", "_epi")

    def __init__(
        self,
        fn: Callable,
        specs: Tuple[jax.ShapeDtypeStruct, ...],
        leaf: int = None,
        used: frozenset = frozenset(),
        mm: tuple = None,
    ):
        self.fn = fn
        self.specs = specs
        self._aval = None
        self.leaf = leaf
        self.used = used
        self.mm = mm
        self._epi = None

    @property
    def aval(self) -> jax.ShapeDtypeStruct:
        if self._aval is None:
            self._aval = jax.eval_shape(lambda args: self.fn(*args), self.specs)
        return self._aval

    @property
    def shape(self):
        return self.aval.shape

    @property
    def dtype(self):
        return self.aval.dtype

    # ------------------------------------------------------------ operators
    def __add__(self, o):
        return binary_node("add", self, o)

    def __radd__(self, o):
        return binary_node("add", o, self)

    def __sub__(self, o):
        return binary_node("subtract", self, o)

    def __rsub__(self, o):
        return binary_node("subtract", o, self)

    def __mul__(self, o):
        return binary_node("multiply", self, o)

    def __rmul__(self, o):
        return binary_node("multiply", o, self)

    def __truediv__(self, o):
        return binary_node("divide", self, o)

    def __rtruediv__(self, o):
        return binary_node("divide", o, self)

    def __floordiv__(self, o):
        return binary_node("floor_divide", self, o)

    def __mod__(self, o):
        return binary_node("remainder", self, o)

    def __pow__(self, o):
        return pow_node(self, o)

    def __matmul__(self, o):
        return matmul_node(self, o)

    def __rmatmul__(self, o):
        return matmul_node(o, self)

    def __neg__(self):
        return unary_node("negative", self)

    def __abs__(self):
        return unary_node("abs", self)

    # Comparisons build bool-valued nodes (for sm.where conditions etc.).
    def __eq__(self, o):
        return binary_node("equal", self, o)

    def __ne__(self, o):
        return binary_node("not_equal", self, o)

    def __lt__(self, o):
        return binary_node("less", self, o)

    def __le__(self, o):
        return binary_node("less_equal", self, o)

    def __gt__(self, o):
        return binary_node("greater", self, o)

    def __ge__(self, o):
        return binary_node("greater_equal", self, o)

    def __hash__(self):
        return id(self)

    # ---------------------------------------------------------- materialize
    def materialize(self, operands, donate=None, iterations=1, carry=0) -> Array:
        from . import elementwise, engine, viewkernel

        out_shape = self.shape
        out_dtype = self.dtype
        in_dtypes = tuple(o.dtype for o in operands)
        if engine.pallas_wanted(out_shape) and elementwise.supported(
            out_shape, in_dtypes, out_dtype
        ):
            has_views = any(isinstance(o, _ViewOperand) for o in operands)
            plans = None
            if has_views and donate is None and iterations == 1 and len(
                out_shape
            ) >= 2:
                # Compile view operands into BlockSpec plans so the fused
                # kernel reads them in place (no materialization pass —
                # same machinery as engine._prepare_operands).
                blocks = elementwise.choose_blocks_for(
                    out_shape, in_dtypes, out_dtype
                )
                bufs, plan_list, any_plan = [], [], False
                for o in operands:
                    if isinstance(o, _ViewOperand):
                        p = viewkernel.plan_view(
                            o.spec, out_shape, blocks, o.dtype
                        )
                        if p is not None:
                            bufs.append(o.buf)
                            plan_list.append(p)
                            any_plan = True
                            continue
                        bufs.append(o.read())
                    else:
                        bufs.append(o)
                    plan_list.append(None)
                operands = bufs
                plans = tuple(plan_list) if any_plan else None
            elif has_views:
                operands = [_concrete(o) for o in operands]
            return Array(
                elementwise.pallas_elementwise(
                    self.fn,
                    out_shape,
                    out_dtype,
                    *operands,
                    name="fused",
                    donate=donate,
                    iterations=iterations,
                    carry=carry,
                    plans=plans,
                )
            )
        operands = [_concrete(o) for o in operands]
        if iterations != 1:
            def body(_, c):
                args = list(operands)
                args[carry] = c
                return jnp.asarray(self.fn(*args)).astype(out_dtype)

            return Array(
                jax.lax.fori_loop(
                    0, iterations, body, operands[carry].astype(out_dtype)
                )
            )
        return Array(jnp.asarray(self.fn(*operands)).astype(out_dtype))

    # --------------------------------------------------- matmul epilogue
    def materialize_matmul(self, operands) -> Array:
        """Materialize a matmul-rooted expression: ONE MXU kernel whose
        final K-step applies the traced elementwise epilogue to the f32
        accumulator (ops/matmul.py).  Falls back to jnp matmul + the
        epilogue expression (XLA fuses them under jit) below the kernel
        size gate, for unsupported dtypes/extras, or off-TPU under
        "auto"."""
        import jax as _jax

        from . import engine
        from . import matmul as mm_mod
        from .. import dtypes as _dtypes

        operands = [_concrete(o) for o in operands]
        a_i, b_i = self.mm
        if a_i in self.used or b_i in self.used:
            raise TypeError(
                "the matmul operands cannot also be used elementwise in "
                "the fused epilogue (their kernel tiles have contraction "
                "shapes); pass a separate argument"
            )
        A = jnp.asarray(operands[a_i])
        B = jnp.asarray(operands[b_i])
        out_shape = self.shape
        out_dtype = self.dtype
        nd = len(out_shape)
        others = [i for i in range(len(operands)) if i not in (a_i, b_i)]
        mm_dtype = jnp.result_type(A, B)

        def extra_ok(o):
            sh = tuple(jnp.shape(o))
            if len(sh) > nd:
                return False
            sh2 = (1,) * (nd - len(sh)) + sh
            return all(s in (1, f) for s, f in zip(sh2, out_shape))

        backend = config.kernel_backend
        use_kernel = (
            backend != "xla"
            and (backend == "pallas" or _jax.default_backend() == "tpu")
            and mm_mod.supported(A.shape, B.shape, mm_dtype)
            and jnp.dtype(out_dtype)
            in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
            and all(extra_ok(operands[i]) for i in others)
            and all(
                jnp.dtype(jnp.result_type(operands[i]))
                in _dtypes.PALLAS_NATIVE_DTYPES
                for i in others
            )
        )
        if use_kernel:
            if self._epi is None:
                n_ops = len(operands)
                fn = self.fn
                oth = tuple(others)

                def epi(prod, *vals):
                    args = [None] * n_ops
                    for i, v in zip(oth, vals):
                        args[i] = v
                    return fn(*args, prod)

                self._epi = epi
            out = mm_mod.pallas_matmul(
                A,
                B,
                out_dtype,
                epilogue=self._epi,
                extras=[jnp.asarray(operands[i]) for i in others],
            )
            return Array(out)
        preferred, prec = engine._fallback_precision(A.shape, B.shape, mm_dtype)
        prod = jnp.matmul(A, B, preferred_element_type=preferred, precision=prec)
        return Array(jnp.asarray(self.fn(*operands, prod)).astype(out_dtype))


class FusedReduction:
    """Root node: a reduction over a fused elementwise expression.

    ``sm.sum/mean/max/min`` applied to a FusedExpr produce one of these;
    ``sm.fuse`` materializes it as a SINGLE-PASS map+reduce kernel: full
    (axis=None) reductions through ``reduction.pallas_map_reduce``,
    single-axis reductions of 2-D expressions through
    ``reduction.pallas_map_reduce_axis`` (round-5; round 4 raised on axis
    roots).  Either way every operand streams through HBM exactly once and
    the mapped expression never materializes — the generalization of the
    fused 1-D dot (product.h's loops) to any expression.  Reduction
    results cannot be composed further inside the same fused function."""

    __slots__ = ("kind", "expr", "axis", "keepdims")

    def __init__(self, kind: str, expr: FusedExpr, axis=None, keepdims=False):
        self.kind = kind
        self.expr = expr
        self.axis = axis
        self.keepdims = keepdims

    def _no_compose(self, *_a, **_k):
        raise TypeError(
            "reduction results cannot be composed further inside sm.fuse; "
            "make the reduction the LAST op of the fused function"
        )

    __add__ = __radd__ = __sub__ = __rsub__ = _no_compose
    __mul__ = __rmul__ = __truediv__ = __rtruediv__ = _no_compose
    __floordiv__ = __mod__ = __pow__ = __neg__ = __abs__ = _no_compose

    def materialize(self, operands) -> Array:
        from . import elementwise, engine, reduction

        operands = [_concrete(o) for o in operands]
        expr = self.expr
        kind = "sum" if self.kind == "mean" else self.kind
        shape = expr.shape
        dtype = expr.dtype
        n = 1
        for s in shape:
            n *= s

        def _full_or_scalar(o):
            sh = tuple(jnp.shape(o))
            sz = 1
            for s in sh:
                sz *= s
            return sh == tuple(shape) or sz == 1

        kernel_ok = (
            jnp.issubdtype(dtype, jnp.floating)
            and dtype != jnp.dtype(jnp.float64)
            and n > 0
            and len(shape) >= 1
            and engine.pallas_wanted(shape)
            and elementwise.supported(
                shape, tuple(o.dtype for o in operands), dtype
            )
        )
        jnp_fn = {"sum": jnp.sum, "max": jnp.max, "min": jnp.min}[kind]
        if self.axis is not None:
            ax = self.axis + len(shape) if self.axis < 0 else self.axis
            total = None
            if kernel_ok and len(shape) == 2 and ax in (0, 1):
                # Partially-broadcast operands ((1, C) rows / (R, 1) cols)
                # ride pinned blocks in the axis kernel; it returns None
                # for anything else and XLA takes over.
                total = reduction.pallas_map_reduce_axis(
                    expr.fn, kind, ax, shape, *operands
                )
            if total is None:
                total = jnp_fn(
                    jnp.broadcast_to(jnp.asarray(expr.fn(*operands)), shape),
                    axis=ax,
                )
            if self.kind == "mean":
                total = total / shape[ax]
            if jnp.issubdtype(dtype, jnp.floating):
                total = total.astype(dtype)
            if self.keepdims:
                total = jnp.expand_dims(total, ax)
            return Array(total)
        use_kernel = kernel_ok and all(_full_or_scalar(o) for o in operands)
        if use_kernel:
            total = reduction.pallas_map_reduce(expr.fn, kind, shape, *operands)
        else:
            total = jnp_fn(jnp.broadcast_to(jnp.asarray(expr.fn(*operands)), shape))
        if self.kind == "mean":
            total = total / n
        if jnp.issubdtype(dtype, jnp.floating):
            total = total.astype(dtype)
        return Array(total)


def reduce_node(kind: str, a, axis=None, keepdims=False) -> FusedReduction:
    """api._reduce_free hook: (full or single-axis) reduction rooting a
    fused expression."""
    if isinstance(a, FusedReduction):
        raise TypeError(
            "a reduction result cannot be reduced again inside sm.fuse"
        )
    if not isinstance(a, FusedExpr):
        raise TypeError(f"sm.{kind} fused-reduction requires a fused expression")
    if axis is not None:
        if isinstance(axis, (tuple, list)):
            raise TypeError(
                f"sm.{kind} inside sm.fuse supports a single int axis, "
                f"got {axis!r}"
            )
        nd = len(a.shape)
        ax = int(axis) + nd if int(axis) < 0 else int(axis)
        if not (0 <= ax < nd):
            raise ValueError(
                f"axis {axis} out of bounds for fused expression of rank {nd}"
            )
        return FusedReduction(kind, a, axis=ax, keepdims=keepdims)
    if keepdims:
        raise TypeError(
            f"sm.{kind}(keepdims=True) without an axis is not supported "
            "inside sm.fuse"
        )
    return FusedReduction(kind, a)


def _reject_reduction(*xs):
    if any(isinstance(x, FusedReduction) for x in xs):
        raise TypeError(
            "reduction results cannot be composed further inside sm.fuse; "
            "make the reduction the LAST op of the fused function"
        )


def is_fused(x) -> bool:
    return isinstance(x, (FusedExpr, FusedReduction))


def _lift(x, specs) -> FusedExpr:
    """Coerce a python scalar to a constant node; reject array constants."""
    if isinstance(x, FusedExpr):
        return x
    if isinstance(x, (bool, int, float, complex, np.number)):
        const = x

        def fn(*args):
            return const

        return FusedExpr(fn, specs)
    if isinstance(x, (np.ndarray, jax.Array, Array)) and np.ndim(x) == 0:
        const = jnp.asarray(as_jax(x))

        def fn(*args):
            return const

        return FusedExpr(fn, specs)
    raise TypeError(
        "fused expressions only accept Python scalars as constants; pass "
        f"array values (got {type(x).__name__}) as arguments to the fused "
        "function so the kernel reads them as operands"
    )


def _merge_meta(*xs):
    """(specs, used, mm) merged over the FusedExpr children of a node:
    union of elementwise-used leaves, the unique matmul root (at most one
    per fused function), and the longest specs (matmul-descendant nodes
    carry one extra trailing spec — the product)."""
    used = frozenset()
    mm = None
    specs = None
    for x in xs:
        if isinstance(x, FusedExpr):
            used |= x.used
            if x.mm is not None:
                if mm is not None and mm != x.mm:
                    raise TypeError(
                        "sm.fuse supports at most one matmul per fused "
                        "function"
                    )
                mm = x.mm
            if specs is None or len(x.specs) > len(specs):
                specs = x.specs
    return specs, used, mm


def binary_node(name: str, a, b) -> FusedExpr:
    from . import registry

    _reject_reduction(a, b)
    if name == "pow":
        return pow_node(a, b)
    specs, used, mm = _merge_meta(a, b)
    a = _lift(a, specs)
    b = _lift(b, specs)
    tile = registry.get_op(name).tile()
    fa, fb = a.fn, b.fn

    def fn(*args):
        return tile(fa(*args), fb(*args))

    return FusedExpr(fn, specs, used=used, mm=mm)


# f64 nodes fall back to the jnp op — the tile implementations are
# f32-grade, matching transcendental._dispatch_unary.
_TRANS_F64 = {
    "exp": jnp.exp,
    "log": jnp.log,
    "exp2": jnp.exp2,
    "log2": jnp.log2,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "tanh": jnp.tanh,
}


def unary_node(name: str, a: FusedExpr) -> FusedExpr:
    from . import registry, transcendental

    _reject_reduction(a)
    if not isinstance(a, FusedExpr):
        raise TypeError(f"unary fused op {name!r} requires a FusedExpr")
    if name in _TRANS_F64:
        if a.dtype == jnp.dtype(jnp.float64):
            tile = _TRANS_F64[name]
        else:
            out_dt = (
                a.dtype
                if jnp.issubdtype(a.dtype, jnp.floating)
                else jnp.dtype(jnp.float32)
            )
            # Same impl selection (native vs crafted) as the public
            # dispatchers; the tile object is the dispatcher's own cached
            # closure, so fused and unfused paths share kernel builds.
            tile = transcendental._unary_tile(
                name, jnp.dtype(out_dt).name, config.transcendental_impl
            )
    else:
        tile = registry.get_op(name).tile()
    fa = a.fn

    def fn(*args):
        return tile(fa(*args))

    return FusedExpr(fn, a.specs, used=a.used, mm=a.mm)


def pow_node(a, b) -> FusedExpr:
    """Fused ``sm.pow`` — same specialization ladder as the public
    ``engine.pow``: int^int takes the crafted square-and-multiply kernel,
    float with a static small-integer exponent takes exact repeated
    squaring, everything else the correct-range-reduction float pow."""
    from . import engine, transcendental

    _reject_reduction(a, b)
    specs, used, mm = _merge_meta(a, b)
    a = _lift(a, specs)
    a_float = jnp.issubdtype(a.dtype, jnp.floating)
    if (
        isinstance(b, (int, float))
        and not isinstance(b, bool)
        and float(b) == int(b)
        and abs(int(b)) <= 64
        and a_float
    ):
        e = int(b)
        fa = a.fn

        def fn(*args):
            return engine._static_int_pow(fa(*args), e)

        return FusedExpr(fn, specs, used=used, mm=mm)
    b = _lift(b, specs)
    if jnp.issubdtype(a.dtype, jnp.integer) and jnp.issubdtype(b.dtype, jnp.integer):
        fa, fb = a.fn, b.fn

        def fn(*args):
            return transcendental.ipow_tile(fa(*args), fb(*args))

        return FusedExpr(fn, specs, used=used, mm=mm)
    out_dt = jnp.promote_types(a.dtype, b.dtype)
    if not jnp.issubdtype(out_dt, jnp.floating):
        out_dt = jnp.dtype(jnp.float32)
    if out_dt == jnp.dtype(jnp.float64):
        fa, fb = a.fn, b.fn

        def fn(*args):
            return jnp.power(fa(*args), fb(*args))

        return FusedExpr(fn, specs, used=used, mm=mm)
    fa, fb = a.fn, b.fn
    tile = transcendental._pow_tile(
        jnp.dtype(out_dt).name, config.transcendental_impl
    )

    def fn(*args):
        return tile(fa(*args), fb(*args))

    return FusedExpr(fn, specs, used=used, mm=mm)


def ternary_node(name: str, a, b, c) -> FusedExpr:
    from . import registry

    _reject_reduction(a, b, c)
    specs, used, mm = _merge_meta(a, b, c)
    a = _lift(a, specs)
    b = _lift(b, specs)
    c = _lift(c, specs)
    tile = registry.get_op(name).tile()
    fa, fb, fc = a.fn, b.fn, c.fn

    def fn(*args):
        return tile(fa(*args), fb(*args), fc(*args))

    return FusedExpr(fn, specs, used=used, mm=mm)


def matmul_node(a, b) -> FusedExpr:
    """``x @ W`` inside a fused function: an MXU matmul ROOT whose
    elementwise consumers become the kernel's fused epilogue (applied to
    the f32 accumulator tile in the final K-step — the (M, N) product
    never round-trips HBM).  Reference analog: the per-op extension story
    (README.md:86-133) composed with the reduction engine (product.h).

    Both operands must be DIRECT arguments of the fused function (the MXU
    grid reads their (bm, bk)/(bk, bn) tiles; a composed expression would
    need its own materialization), and at most one matmul per fused
    function.  The matmul operands cannot also be used elementwise in the
    epilogue (their kernel tiles have contraction-tile shapes)."""
    _reject_reduction(a, b)
    if not (
        isinstance(a, FusedExpr)
        and isinstance(b, FusedExpr)
        and a.leaf is not None
        and b.leaf is not None
    ):
        raise TypeError(
            "matmul inside sm.fuse requires direct arguments of the fused "
            "function (not composed expressions)"
        )
    if a.mm is not None or b.mm is not None:
        raise TypeError(
            "sm.fuse supports at most one matmul per fused function"
        )
    rank = len(a.shape)
    ok = (
        len(b.shape) == rank
        and rank in (2, 3)
        and a.shape[-1] == b.shape[-2]
        and (rank == 2 or a.shape[0] == b.shape[0])
    )
    if not ok:
        raise TypeError(
            f"fused matmul requires 2-D (M,K) @ (K,N) or batched "
            f"(B,M,K) @ (B,K,N) arguments; got {a.shape} @ {b.shape}"
        )
    out_dt = jnp.result_type(a.dtype, b.dtype)
    out_shape = (
        (a.shape[0], b.shape[1])
        if rank == 2
        else (a.shape[0], a.shape[1], b.shape[2])
    )
    prod_spec = jax.ShapeDtypeStruct(out_shape, out_dt)
    specs = a.specs + (prod_spec,)

    def fn(*args):
        return args[-1]

    return FusedExpr(fn, specs, used=frozenset(), mm=(a.leaf, b.leaf))


def apply_by_name(name: str, *args) -> FusedExpr:
    """Dispatch hook for the free-function layer (api._wrap1/_wrap2)."""
    if len(args) == 1:
        return unary_node(name, args[0])
    if len(args) == 3:
        return ternary_node(name, *args)
    return binary_node(name, *args)


def fuse(
    fn: Callable,
    donate: int | None = None,
    iterations: int = 1,
    carry: int = 0,
) -> Callable:
    """Wrap ``fn`` (built from sm ops) so calls execute as ONE fused kernel.

    The returned function accepts Arrays / jax arrays / numpy arrays; the
    expression is traced once per input signature and cached, so the fused
    tile function is a stable object across calls (kernel-build cache hits).

    ``donate=i`` declares input ``i`` (which must match the output
    shape/dtype) dead after the call so the kernel writes the output in
    place — inside jitted loops where input ``i`` is the loop carry this
    removes a full extra HBM pass (measured 1.6x on the fused-pipeline
    bench).

    ``iterations=L`` runs the WHOLE chain L times inside the one launch,
    feeding the result back as input ``carry`` each pass: an in-kernel
    ``fori_loop`` whose carry tile stays VMEM-resident for all L
    iterations, so per-iteration HBM traffic is amortized to (reads +
    write)/L.  This is the capability XLA's fusion loop has that a
    launch-per-iteration chain lacks (round-3 VERDICT item 2); use it for
    iterated elementwise recurrences like ``acc = f(acc, ...)``.  The
    expression's output must match input ``carry``'s shape/dtype, and
    input ``carry`` cannot be a broadcast operand.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    cache = {}

    @functools.wraps(fn)
    def fused(*arrays):
        ops = []
        for a in arrays:
            if isinstance(a, Array) and a.is_view:
                # Views stay unmaterialized: the kernel path compiles them
                # to BlockSpec plans (FusedExpr.materialize); other paths
                # call .read() at the last moment.
                ops.append(_ViewOperand(a._storage.buf, a._spec))
            else:
                ops.append(jnp.asarray(as_jax(a)))
        key = tuple(
            (tuple(o.shape), jnp.dtype(o.dtype).name,
             bool(getattr(o, "weak_type", False)),
             o.spec if isinstance(o, _ViewOperand) else None)
            for o in ops
        ) + (config.transcendental_impl,)
        expr = cache.get(key)
        if expr is None:
            # weak_type must survive into the specs: a weak 0-d scalar
            # argument would otherwise promote the whole chain (f32 chain +
            # weak-f64 scalar under x64 -> f64 nodes -> the f64/jnp
            # transcendental branch, which on TPU is the sloppy native log
            # — the same bug class fixed in ops/lazy.py::_compose).
            specs = tuple(
                jax.ShapeDtypeStruct(
                    o.shape, o.dtype,
                    weak_type=bool(getattr(o, "weak_type", False)),
                )
                for o in ops
            )
            leaves = [
                FusedExpr(_leaf_fn(i), specs, leaf=i, used=frozenset((i,)))
                for i in range(len(ops))
            ]
            expr = fn(*leaves)
            if not isinstance(expr, (FusedExpr, FusedReduction)):
                raise TypeError(
                    "the function passed to sm.fuse must return a fused "
                    f"expression built from sm ops; got {type(expr).__name__}"
                )
            if isinstance(expr, FusedReduction):
                if iterations != 1:
                    raise ValueError(
                        "sm.fuse(iterations=...) does not compose with a "
                        "reduction root (the result is a scalar)"
                    )
                if expr.expr.mm is not None:
                    raise TypeError(
                        "a reduction over a fused matmul epilogue is not "
                        "supported; materialize the epilogue first"
                    )
                expr.expr.aval  # force shape/dtype inference at trace time
            else:
                if expr.mm is not None and iterations != 1:
                    raise ValueError(
                        "sm.fuse(iterations=...) does not compose with a "
                        "matmul root"
                    )
                expr.aval  # force shape/dtype inference at trace time
            if iterations != 1 and (
                expr.shape != tuple(ops[carry].shape)
                or jnp.dtype(expr.dtype) != jnp.dtype(ops[carry].dtype)
            ):
                raise ValueError(
                    f"sm.fuse(iterations={iterations}): the expression "
                    f"result ({expr.shape}, {expr.dtype}) must match carry "
                    f"input {carry} ({tuple(ops[carry].shape)}, "
                    f"{ops[carry].dtype}) so it can feed back"
                )
            cache[key] = expr
        if isinstance(expr, FusedReduction):
            return expr.materialize(ops)
        if expr.mm is not None:
            return expr.materialize_matmul(ops)
        return expr.materialize(
            ops, donate=donate, iterations=iterations, carry=carry
        )

    return fused

"""Read view operands INSIDE the elementwise kernel — no materialization.

The reference's engine reads strided/transposed views directly in its hot
loop: ``element_wise_op`` walks per-operand strides element by element
(include/math/calculate.h:16-99), and ``transpose`` views are just reversed
shape+strides (include/SMArray.h:121-136), so ``a.T + b`` costs a single
pass.  Through round 4 this framework paid a full extra HBM round-trip
instead: ``engine.binary`` materialized every view operand
(``ViewSpec.read`` -> relayout copy, a measured fact on this chip) before
the Pallas kernel ran.

This module closes that gap the BlockSpec way: a view operand's
``ViewSpec`` is compiled into a *plan* — a per-base-dimension BlockSpec
index map plus an optional in-VMEM tile transpose — so the kernel streams
the BASE buffer directly and the view's index arithmetic runs in the
block-index computation (free) and on VMEM-resident tiles (VPU relayout,
no HBM traffic).  Stride-0 broadcasting already worked this way
(pinned-block index maps); views are the same trick generalized:

* dimension permutations  -> permuted grid indices in the index map, plus
  an in-kernel ``swapaxes`` of the VMEM tile when the trailing two dims
  swap (the 2-D ``a.T`` case);
* offset / stepped / collapsed LEADING dims -> affine block-index maps
  ``start + step * g`` (block extent 1 in leading dims makes block index
  == element index, so ANY start/step — including negative — is exact);
* truncating slices of the trailing two dims -> plain grid maps (view
  element (i, j) == base element (i, j); out-of-view lanes in the final
  block are real in-bounds base memory, masked by the output store).

Not expressible (``plan_view`` returns ``None`` and the engine falls back
to the round-4 materialize-then-kernel path): stepped or offset slices of
the trailing two dims, collapses of a trailing dim, rank-changing views
feeding 1-D kernels, and block shapes Mosaic's tiling rules reject
(trailing-dim blocks must be 128-multiples, second-minor blocks
sublane-multiples, unless equal to the full base dim).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from .. import dtypes as _dtypes
from ..viewspec import Span, ViewSpec


class ViewPlan(NamedTuple):
    """Hashable per-operand kernel plan (part of the kernel-build cache key).

    ``imap[d]`` describes base dim ``d``'s block index as a function of the
    grid indices ``g`` (one per out dim):

    * ``("g", out_d)``            -> ``g[out_d]``          (extent ``block[d]``)
    * ``("a", out_d, start, step)`` -> ``start + step * g[out_d]`` (extent 1;
      ``out_d is None`` or ``step == 0`` pins the dim to ``start``)
    """

    base_shape: Tuple[int, ...]
    block: Tuple[int, ...]  # block extents over base dims
    imap: Tuple[tuple, ...]  # per-base-dim index-map entries
    swap: bool  # swap trailing two tile dims in-kernel
    vblock: Tuple[int, ...]  # padded view block shape (out rank)


def plan_view(
    spec: ViewSpec, out_shape, blocks, dtype
) -> Optional[ViewPlan]:
    """Compile ``spec`` into a ViewPlan for an output tiled by ``blocks``,
    or None when the view is outside the expressible set."""
    out_shape = tuple(out_shape)
    blocks = tuple(blocks)
    nd_out = len(out_shape)
    nd_v = spec.ndim
    nd_b = len(spec.base_shape)
    if nd_out < 2 or nd_v < 2 or nd_b < 2:
        return None
    vshape = spec.shape
    off = nd_out - nd_v
    kept = spec.kept_dims
    vd_to_bd = [kept[spec.perm[j]] for j in range(nd_v)]
    t2 = (nd_b - 2, nd_b - 1)
    # The trailing two view dims must land on the trailing two base dims
    # (either order): Mosaic's tiling rules pin nonunit block extents there.
    if {vd_to_bd[-1], vd_to_bd[-2]} != set(t2):
        return None
    swap = vd_to_bd[-1] == nd_b - 2

    block = [1] * nd_b
    imap: list = [None] * nd_b
    for j in range(nd_v):
        d = vd_to_bd[j]
        e = spec.entries[d]
        assert isinstance(e, Span)
        out_d = j + off
        if vshape[j] == 1 and out_shape[out_d] != 1:
            # Broadcast dim: pinned extent-1 block (the stride-0 trick).
            if d in t2 and spec.base_shape[d] != 1:
                return None
            imap[d] = ("a", None, e.start, 0)
        elif d in t2:
            if e.start != 0 or e.step != 1:
                return None
            block[d] = blocks[out_d]
            imap[d] = ("g", out_d)
        else:
            # Leading view dim -> leading out dim -> block extent 1, where
            # the block index IS the element index: any affine span works.
            if blocks[out_d] != 1:
                return None
            imap[d] = ("a", out_d, e.start, e.step)
    for d in range(nd_b):
        if imap[d] is None:  # collapsed base dim
            e = spec.entries[d]
            assert isinstance(e, int)
            if d in t2 and spec.base_shape[d] != 1:
                return None
            imap[d] = ("a", None, e, 0)

    # Mosaic tiling: trailing base-dim block extents must be granularity
    # multiples unless equal to the full base dim.
    sub = _dtypes.traits(dtype).sublanes
    for d, gran in ((nd_b - 2, sub), (nd_b - 1, 128)):
        ext = block[d]
        if ext != spec.base_shape[d] and ext % gran != 0:
            return None

    vblock = [1] * nd_out
    for j in range(nd_v):
        out_d = j + off
        if vshape[j] != 1 or out_shape[out_d] == 1:
            vblock[out_d] = blocks[out_d]
    return ViewPlan(
        base_shape=tuple(spec.base_shape),
        block=tuple(block),
        imap=tuple(imap),
        swap=swap,
        vblock=tuple(vblock),
    )


def expressible_hint(x) -> bool:
    """Cheap necessary-condition check used by the engine to decide whether
    an op with view operands should skip the deferred-eager queue (whose
    recording step would materialize the view).  The full decision happens
    in ``plan_view`` once output blocks are known."""
    spec = getattr(x, "_spec", None)
    if spec is None or spec.is_identity:
        return False
    nd_v = spec.ndim
    nd_b = len(spec.base_shape)
    if nd_v < 2 or nd_b < 2:
        return False
    kept = spec.kept_dims
    t2 = {nd_b - 2, nd_b - 1}
    if {kept[spec.perm[nd_v - 1]], kept[spec.perm[nd_v - 2]]} != t2:
        return False
    for d in t2:
        e = spec.entries[d]
        if not isinstance(e, Span):
            return False
        if (e.start != 0 or e.step != 1) and e.length != 1:
            return False
    return True

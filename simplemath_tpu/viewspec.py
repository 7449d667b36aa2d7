"""View / index-expression machinery.

The reference implements views by pointer+stride arithmetic:
``accessByArray`` advances the data pointer for INDEX dims and collapses
them, and rewrites shape/strides for SLICE dims, returning a non-owning view
(include/SMArray.h:397-437); ``transpose`` reverses shape and strides in a
view (include/SMArray.h:121-136).  JAX arrays are immutable and unstrided, so
the same observable semantics (views alias their parent; writes through a
view are visible to the parent and vice versa) are provided by an index
*expression* tracked alongside a shared buffer: a per-base-dimension span
(start, step, length) or collapse index, plus a dimension permutation for
transposes.  Reads lower to ``lax.slice``/``transpose`` (via jnp indexing);
writes lower to scatter via ``Array.at[...].set``.

This also fixes reference quirks on purpose:

* INDEX-collapsed views keep the parent's ``ndim`` in the reference
  (include/SMArray.h:401, 428-434; SURVEY §2.4-5) — here ndim always equals
  ``len(shape)``;
* stepped slicing is unreachable in the reference (include/Slice.h:11-13) —
  here arbitrary (including negative) steps work.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple, Union


@dataclasses.dataclass(frozen=True)
class Span:
    """A kept dimension: selects ``start + step*i`` for i in [0, length)."""

    start: int
    step: int
    length: int

    def to_py_slice(self) -> slice:
        if self.step > 0:
            return slice(self.start, self.start + self.step * self.length, self.step)
        stop = self.start + self.step * self.length
        return slice(self.start, None if stop < 0 else stop, self.step)


Entry = Union[int, Span]


@dataclasses.dataclass(frozen=True)
class ViewSpec:
    """Index expression mapping view coordinates to base-buffer coordinates.

    ``entries[d]`` describes base dim ``d``: an ``int`` collapses it, a
    ``Span`` keeps it.  After indexing, kept dims appear in base order;
    ``perm`` then permutes them: view dim ``j`` is kept-dim ``perm[j]``.
    """

    base_shape: Tuple[int, ...]
    entries: Tuple[Entry, ...]
    perm: Tuple[int, ...]

    # ---------------------------------------------------------------- util
    @staticmethod
    def identity(shape: Sequence[int]) -> "ViewSpec":
        shape = tuple(int(s) for s in shape)
        return ViewSpec(
            base_shape=shape,
            entries=tuple(Span(0, 1, s) for s in shape),
            perm=tuple(range(len(shape))),
        )

    @property
    def kept_dims(self) -> Tuple[int, ...]:
        return tuple(d for d, e in enumerate(self.entries) if isinstance(e, Span))

    @property
    def shape(self) -> Tuple[int, ...]:
        kept = self.kept_dims
        return tuple(self.entries[kept[p]].length for p in self.perm)

    @property
    def ndim(self) -> int:
        return len(self.perm)

    @property
    def is_identity(self) -> bool:
        if self.perm != tuple(range(len(self.base_shape))):
            return False
        return all(
            isinstance(e, Span) and e.start == 0 and e.step == 1 and e.length == s
            for e, s in zip(self.entries, self.base_shape)
        )

    # The strides (in elements) this view would have over the base buffer —
    # observable-API parity with the reference's ``_strides``
    # (include/SMArray.h:357-364 computes row-major strides; views carry
    # stride*step, include/SMArray.h:421).
    def strides(self) -> Tuple[int, ...]:
        base_strides = []
        acc = 1
        for s in reversed(self.base_shape):
            base_strides.append(acc)
            acc *= s
        base_strides.reverse()
        kept = self.kept_dims
        return tuple(
            base_strides[kept[p]] * self.entries[kept[p]].step for p in self.perm
        )

    def offset(self) -> int:
        base_strides = []
        acc = 1
        for s in reversed(self.base_shape):
            base_strides.append(acc)
            acc *= s
        base_strides.reverse()
        off = 0
        for d, e in enumerate(self.entries):
            start = e if isinstance(e, int) else e.start
            off += start * base_strides[d]
        return off

    # ------------------------------------------------------------ indexing
    def base_indexer(self) -> Tuple[Union[int, slice], ...]:
        """Indexer applied to the base buffer; result dims = kept base order."""
        return tuple(
            e if isinstance(e, int) else e.to_py_slice() for e in self.entries
        )

    def read(self, buf):
        """Materialize this view of ``buf`` (a jax array)."""
        import jax.numpy as jnp

        out = buf[self.base_indexer()] if not self.is_identity else buf
        if self.perm != tuple(range(len(self.perm))):
            out = jnp.transpose(out, self.perm)
        return out

    def write(self, buf, value):
        """Return a new base buffer with this view's region set to ``value``.

        ``value`` must already have this view's shape (or broadcast to it).
        """
        import jax.numpy as jnp

        value = jnp.broadcast_to(jnp.asarray(value, dtype=buf.dtype), self.shape)
        inv = _argsort(self.perm)
        if self.perm != tuple(range(len(self.perm))):
            value = jnp.transpose(value, inv)
        if self.is_identity:
            return value
        return buf.at[self.base_indexer()].set(value)

    # --------------------------------------------------------- composition
    def compose(self, key: Sequence[Union[int, slice]]) -> "ViewSpec":
        """Apply a basic-index ``key`` (ints / python slices over view dims)."""
        key = list(key)
        if len(key) > self.ndim:
            raise IndexError(
                f"too many indices: array is {self.ndim}-d, got {len(key)}"
            )
        key += [slice(None)] * (self.ndim - len(key))

        kept = self.kept_dims
        entries = list(self.entries)
        surviving: list[int] = []  # base dims of surviving view dims, view order
        for j, k in enumerate(key):
            b = kept[self.perm[j]]
            span = self.entries[b]
            assert isinstance(span, Span)
            if isinstance(k, slice):
                s, _, st = k.indices(span.length)
                nlen = _slice_len(k, span.length)
                entries[b] = Span(span.start + s * span.step, span.step * st, nlen)
                surviving.append(b)
            else:
                i = int(k)
                if i < 0:
                    i += span.length
                if not (0 <= i < span.length):
                    raise IndexError(
                        f"index {int(k)} out of bounds for axis {j} with size "
                        f"{span.length}"
                    )
                entries[b] = span.start + i * span.step
        new_kept = [d for d, e in enumerate(entries) if isinstance(e, Span)]
        new_perm = tuple(new_kept.index(b) for b in surviving)
        return ViewSpec(self.base_shape, tuple(entries), new_perm)

    def transpose(self, axes: Sequence[int] = None) -> "ViewSpec":
        n = self.ndim
        if axes is None:
            axes = tuple(reversed(range(n)))
        axes = tuple(int(a) + n if a < 0 else int(a) for a in axes)
        if sorted(axes) != list(range(n)):
            raise ValueError(f"invalid transpose axes {axes} for ndim {n}")
        return ViewSpec(
            self.base_shape, self.entries, tuple(self.perm[a] for a in axes)
        )


def _slice_len(sl: slice, dim: int) -> int:
    start, stop, step = sl.indices(dim)
    if step > 0:
        return max(0, (stop - start + step - 1) // step)
    return max(0, (start - stop - step - 1) // (-step))


def _argsort(perm: Tuple[int, ...]) -> Tuple[int, ...]:
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return tuple(inv)

"""Slice descriptors — parity layer for the reference's Slice type.

The reference models slicing with a small ``Slice`` struct carrying
``start``/``end``/``step`` and a ``kind`` that distinguishes a range slice
from an integer INDEX that collapses the dimension
(include/Slice.h:10-28), plus convenience macros ``SLICE``, ``SLICE_START``,
``SLICE_END``, ``SLICE_ALL`` (include/Slice.h:4-8).  Integer arguments to
``operator()`` are converted into INDEX slices by ``processIndex``
(include/SMUtils.h:14-23).

Divergences from the reference, on purpose (intended NumPy semantics):

* the reference's ``step`` is an enum frozen at 0 and silently patched to 1,
  making stepped slicing unreachable (include/Slice.h:11-13,
  include/SMArray.h:414) — here ``step`` works, including negative steps;
* ``end == -1`` is the reference's "to the end" sentinel
  (include/SMArray.h:415-416); here ``end=None`` means "to the end" and
  negative indices count from the end, as in NumPy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union


@dataclasses.dataclass(frozen=True)
class Slice:
    """start/end/step slice descriptor (reference include/Slice.h:10-28)."""

    start: Optional[int] = None
    end: Optional[int] = None
    step: Optional[int] = None

    def to_py(self) -> slice:
        return slice(self.start, self.end, self.step)


# Macro-style helpers mirroring SLICE / SLICE_START / SLICE_END / SLICE_ALL
# (include/Slice.h:4-8).
SLICE_ALL = Slice()


def SLICE(start: int, end: int, step: Optional[int] = None) -> Slice:
    return Slice(start, end, step)


def SLICE_START(start: int) -> Slice:
    return Slice(start, None, None)


def SLICE_END(end: int) -> Slice:
    return Slice(None, end, None)


Indexer = Union[int, slice, Slice, type(Ellipsis), None]


def process_index(arg) -> Union[int, slice]:
    """Normalize a user index argument to int or python slice.

    Analog of ``processIndex`` (include/SMUtils.h:14-23) which wraps bare
    ints into INDEX-kind slices; here ints stay ints (dimension collapse is
    handled by the view machinery) and ``Slice`` descriptors become python
    slices.
    """
    if isinstance(arg, Slice):
        return arg.to_py()
    if isinstance(arg, (int,)) or hasattr(arg, "__index__"):
        return arg.__index__() if not isinstance(arg, int) else arg
    if isinstance(arg, slice):
        return arg
    raise TypeError(f"invalid index argument: {arg!r}")

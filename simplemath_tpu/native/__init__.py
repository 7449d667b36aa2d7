"""Native host-side runtime helpers (C++ CPython extension) with pure-python
fallbacks.

``available()`` reports whether the compiled extension is importable; the
array layer uses ``parse_nested`` for fast nested-list construction when it
is.  Build with ``python -m simplemath_tpu.native.build``.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

try:
    from . import _smnative as _ext  # type: ignore[attr-defined]
except ImportError:
    try:
        import _smnative as _ext  # type: ignore[no-redef]
    except ImportError:
        _ext = None


def available() -> bool:
    return _ext is not None


def parse_nested(obj):
    """(shape, flat_numpy_array) from a nested python sequence.

    Native: one C pass for shape inference + flattening (reference nested
    initializer ctor, include/SMArray.h:36-68).  Fallback: numpy.
    """
    import numpy as np

    if _ext is not None and isinstance(obj, (list, tuple)):
        shape, data, is_float = _ext.parse_nested(obj)
        dtype = np.float64 if is_float else np.int64
        arr = np.frombuffer(data, dtype=dtype).reshape(shape)
        return tuple(shape), arr
    arr = np.asarray(obj)
    return arr.shape, arr


def row_major_strides(shape: Sequence[int]) -> Tuple[int, ...]:
    if _ext is not None:
        return _ext.row_major_strides(tuple(shape))
    strides = []
    acc = 1
    for s in reversed(tuple(shape)):
        strides.append(acc)
        acc *= s
    return tuple(reversed(strides))


def broadcast_shapes(a: Sequence[int], b: Sequence[int]) -> Tuple[int, ...]:
    if _ext is not None:
        return _ext.broadcast_shapes(tuple(a), tuple(b))
    nd = max(len(a), len(b))
    pa = (1,) * (nd - len(a)) + tuple(a)
    pb = (1,) * (nd - len(b)) + tuple(b)
    out = []
    for x, y in zip(pa, pb):
        if x == y or y == 1:
            out.append(x)
        elif x == 1:
            out.append(y)
        else:
            raise ValueError(
                f"operands could not be broadcast together with shapes {a} {b}"
            )
    return tuple(out)

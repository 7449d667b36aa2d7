"""Kernel-dispatch observability.

The reference's dispatch is compile-time (ISA ``#ifdef``s pick the SIMD
specialization, include/math/helpers.h:14-20) so "which kernel ran" is
visible in the binary.  Here backend selection happens at trace time
(ops/engine.py), so this module keeps a lightweight counter of every Pallas
kernel launch the engine builds.  Tests use it to assert that a public API
call actually routed to a kernel (rather than silently falling back to the
XLA path), and users can read it to understand dispatch decisions.

Counting happens at trace/launch-build time: one increment per eager op
call, one per jit trace for ops inside a jitted function.
"""

from __future__ import annotations

import collections
from typing import Dict

_COUNTS: collections.Counter = collections.Counter()


def record(kind: str, name: str = "") -> None:
    """Record one kernel dispatch, e.g. record("elementwise", "add")."""
    _COUNTS[f"{kind}:{name}" if name else kind] += 1


def counts() -> Dict[str, int]:
    """Snapshot of dispatch counts since the last reset."""
    return dict(_COUNTS)


def count(kind: str, name: str = "") -> int:
    return _COUNTS[f"{kind}:{name}" if name else kind]


def reset() -> None:
    _COUNTS.clear()

"""Kernel layer: op registry, Pallas elementwise/broadcast kernels,
transcendental kernels, reductions — the TPU-native stand-in for the
reference's include/math/ tree (SimdTraits + op functors + dispatch engine).
"""

from . import (  # noqa: F401
    elementwise,
    engine,
    matmul,
    reduction,
    registry,
    transcendental,
)
from .registry import Op, get_op, register_op, registered_ops  # noqa: F401
from .engine import apply_op, binary, unary  # noqa: F401

"""Kernel layer: op registry, Pallas elementwise/broadcast kernels,
transcendental kernels, reductions — the TPU-native stand-in for the
reference's include/math/ tree (SimdTraits + op functors + dispatch engine).
"""

from . import elementwise, engine, registry, transcendental  # noqa: F401
from .registry import Op, get_op, register_op, registered_ops  # noqa: F401
from .engine import apply_op, binary, unary  # noqa: F401

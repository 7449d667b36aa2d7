"""Matmul-precision pinning for the solver layer.

TPU's DEFAULT matmul precision truncates f32 operands to bf16 before the
MXU.  For the big dense kernels that is the documented speed contract
(ops/matmul.py), but inside the solvers the matrices are tiny (nx <= 12)
and chained through hundreds of Riccati steps — bf16 truncation there
compounds into real convergence failures (measured on v5e: the AL
box-constraint solve stalls at 1e-1 violation instead of 1e-6, and the SoA
vs vmapped backward passes drift apart).  Every solver entry point
therefore pins float32 precision for the ops built under it; the cost is
negligible (the MXU is idle at these shapes) and results match the CPU
float64 reference within f32 tolerance — BASELINE.json's numerical-parity
contract.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace ``fn``'s ops under float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    # Marker for the regression test that keeps every solver entry point
    # pinned (tests/test_numerical_parity.py).
    wrapped._pins_f32_matmuls = True
    return wrapped

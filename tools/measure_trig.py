"""Measure on-TPU accuracy of sin/cos/tan/tanh (round-4 VERDICT item 5).

Runs each op through BOTH execution paths — the Pallas kernel (Mosaic
lowering, forced backend) and plain XLA — on the real chip, against a NumPy
float64 oracle, across domains that stress range reduction:

  near:  [-2pi, 2pi]            (core polynomial accuracy)
  mid:   [-1e3, 1e3]            (moderate reduction)
  large: |x| in [1e4, 3e7]      (where sloppy reduction falls apart; 3e7 is
                                 near the last f32 with sub-ulp pi spacing)

Reports max abs error and max rel error (rel filtered to |true| > 1e-3 —
near trig zeros the achievable rel error is set by argument error, not
implementation quality).  One JSON line per (op, path, domain).
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

import simplemath_tpu as sm
from simplemath_tpu.config import config


def domains(op):
    rng = np.random.default_rng(0)
    near = np.linspace(-2 * np.pi, 2 * np.pi, 50_001).astype(np.float32)
    mid = np.linspace(-1e3, 1e3, 50_001).astype(np.float32)
    large = (rng.uniform(1e4, 3e7, 30_000) * rng.choice([-1, 1], 30_000)).astype(
        np.float32
    )
    if op == "tanh":
        return {"near": near, "wide": np.linspace(-30, 30, 50_001).astype(np.float32)}
    return {"near": near, "mid": mid, "large": large}


def oracle(op, x):
    return getattr(np, op)(x.astype(np.float64))


def measure(op, x, backend):
    old = config.kernel_backend
    config.kernel_backend = backend
    try:
        got = np.asarray(getattr(sm, op)(sm.Array(x)).jax(), dtype=np.float64)
    finally:
        config.kernel_backend = old
    want = oracle(op, x)
    # tan poles: exclude points where the f32-rounded input sits so close to
    # a pole that the float64 oracle itself is huge (>1e6) — there rel error
    # measures input rounding, not the implementation.
    ok = np.isfinite(want) & (np.abs(want) < 1e6)
    got, want = got[ok], want[ok]
    abs_err = np.abs(got - want)
    denom = np.abs(want)
    rel_mask = denom > 1e-3
    max_rel = float((abs_err[rel_mask] / denom[rel_mask]).max()) if rel_mask.any() else 0.0
    return {"max_abs": float(abs_err.max()), "max_rel": max_rel,
            "n": int(ok.sum())}


def main():
    for op in ("sin", "cos", "tan", "tanh"):
        for dom_name, x in domains(op).items():
            for backend in ("pallas", "xla"):
                try:
                    r = measure(op, x, backend)
                except Exception as e:  # noqa: BLE001
                    r = {"error": str(e)[:300]}
                print(json.dumps({"op": op, "domain": dom_name,
                                  "path": backend, **r}), flush=True)


if __name__ == "__main__":
    main()

"""Batched cartpole swing-up: 8192 scenarios, H=100, one chip
(BASELINE.json config 4).

Run: python examples/batched_cartpole.py [--batch N] [--sharded]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from simplemath_tpu.models import ILQRConfig, make_cartpole
from simplemath_tpu.models.ilqr import solve_batched
from simplemath_tpu.utils import MetricsLogger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--horizon", type=int, default=100)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--sharded", action="store_true")
    args = parser.parse_args()

    system = make_cartpole()
    cfg = ILQRConfig(iterations=args.iters)
    key = jax.random.PRNGKey(0)
    x0s = 0.2 * jax.random.normal(key, (args.batch, system.nx), dtype=jnp.float32)
    us = jnp.zeros((args.batch, args.horizon, system.nu), jnp.float32)

    log = MetricsLogger("cartpole")
    if args.sharded:
        from simplemath_tpu import parallel

        mesh = parallel.make_mesh()
        print(f"mesh: {dict(mesh.shape)}")
        t0 = time.perf_counter()
        result, stats = parallel.solve_batched_sharded(system, x0s, us, cfg, mesh)
        mean_cost = float(stats["mean_cost"])
    else:
        t0 = time.perf_counter()
        result = solve_batched(system, x0s, us, cfg)
        mean_cost = float(jnp.mean(result.cost))
    dt = time.perf_counter() - t0  # includes compile on first run
    log.log(0, mean_cost=mean_cost, wall_s=dt)

    print(f"batch={args.batch} horizon={args.horizon} iters={args.iters}")
    print(f"mean final cost: {mean_cost:.2f}")
    print(f"wall (incl. compile): {dt:.2f}s -> {args.batch / dt:.0f} solves/s")
    trace = np.asarray(result.cost_trace)
    print("mean cost per iteration:", np.round(trace.mean(axis=0), 1))


if __name__ == "__main__":
    main()

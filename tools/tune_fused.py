"""Block-shape sweep for the iterated fused kernel at 2048^2 f32 (the
BASELINE configs[1] pipeline), alternated against XLA every round so the
ratio is robust to the tunnel's run-to-run jitter (XLA's own time swings
50-69 us across bench runs)."""

import json
import os
import sys

os.environ.setdefault("SM_EW_VMEM_BUDGET", str(26 * 1024 * 1024))
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

import bench
import simplemath_tpu as sm
from simplemath_tpu.config import config

n = 2048
shape = (n, n)


def chain(acc, a, e_row):
    return acc * np.float32(1e-3) + sm.exp(
        sm.pow(a + acc * np.float32(1e-6), e_row)
    )


def make_args(i):
    k1, k2 = jax.random.split(jax.random.PRNGKey(i))
    return (
        jax.random.uniform(k1, shape, jnp.float32, 0.5, 2.0),
        jax.random.uniform(k2, (1, n), jnp.float32, -2.0, 2.0),
    )


def t_kernel(rows, cols):
    config.ew_block_rows, config.ew_block_cols = rows, cols

    def build(L):
        fused_L = sm.fuse(chain, donate=0, iterations=L)

        def run(a, e_row):
            return fused_L(jnp.zeros_like(a), a, e_row).jax()

        return run

    return bench._per_iter_time(build, make_args, 16, 400)


def t_xla():
    def build(L):
        def run(a, e_row):
            def body(i, acc):
                y = jnp.exp(jnp.power(a + acc * np.float32(1e-6), e_row))
                return acc * np.float32(1e-3) + y

            return jax.lax.fori_loop(0, L, body, jnp.zeros_like(a))

        return run

    return bench._per_iter_time(build, make_args, 16, 400)


def main():
    variants = [(512, 1024), (256, 1024), (128, 1024), (512, 2048), (256, 2048)]
    xla_times = []
    for r in range(2):
        tx = t_xla()
        xla_times.append(tx)
        print(json.dumps({"round": r, "xla_us": tx * 1e6}), flush=True)
        for rows, cols in variants:
            tk = t_kernel(rows, cols)
            print(json.dumps({"round": r, "blocks": [rows, cols],
                              "kernel_us": tk * 1e6,
                              "vs_this_xla": tx / tk}), flush=True)
    print(json.dumps({"xla_median_us": sorted(xla_times)[len(xla_times) // 2] * 1e6}),
          flush=True)


if __name__ == "__main__":
    main()

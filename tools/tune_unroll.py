"""Two quick follow-up sweeps on the chip:

1. fori_loop `unroll` for the iterated fused kernel at 2048^2 (does
   unrolling the in-kernel recurrence help Mosaic's VPU scheduling?).
2. streaming elementwise block rows/cols at 256 MB (is the 6 MB budget /
   (128,1024) block choice leaving roofline on the table?).
"""

import json
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

import bench
from simplemath_tpu.ops import elementwise
from simplemath_tpu.config import config

# ---- 1. unroll sweep (monkeypatch the loop body builder) -----------------
n = 2048
shape = (n, n)


def make_args(i):
    k1, k2 = jax.random.split(jax.random.PRNGKey(i))
    return (
        jax.random.uniform(k1, shape, jnp.float32, 0.5, 2.0),
        jax.random.uniform(k2, (1, n), jnp.float32, -2.0, 2.0),
    )


def run_iterated(unroll):
    import simplemath_tpu as sm

    orig = elementwise._loop_kernel_body

    def patched(tile_fn, refs, iterations, carry, out_dtype):
        out_ref = refs[-1]
        vals = [r[...] for r in refs[:-1]]
        if iterations == 1:
            out_ref[...] = tile_fn(*vals).astype(out_ref.dtype)
            return

        def body(_, c):
            args = list(vals)
            args[carry] = c
            return tile_fn(*args).astype(c.dtype)

        out_ref[...] = jax.lax.fori_loop(
            0, iterations, body, vals[carry].astype(out_ref.dtype),
            unroll=unroll,
        )

    elementwise._loop_kernel_body = patched
    # distinct tile identity per unroll so kernel caches don't collide
    def chain(acc, a, e_row, _u=unroll):
        return acc * np.float32(1e-3) + sm.exp(
            sm.pow(a + acc * np.float32(1e-6), e_row)
        )

    try:
        def build(L):
            fused_L = sm.fuse(chain, donate=0, iterations=L)

            def run(a, e_row):
                return fused_L(jnp.zeros_like(a), a, e_row).jax()

            return run

        return bench._per_iter_time(build, make_args, 16, 400)
    finally:
        elementwise._loop_kernel_body = orig


for unroll in (1,):  # Mosaic supports only unroll=1 or full-unroll
    t = run_iterated(unroll)
    print(json.dumps({"exp": "iter_unroll", "unroll": unroll,
                      "us_per_iter": t * 1e6}), flush=True)

# ---- 2. streaming block sweep at 256 MB ----------------------------------
m = 64 * 1024 * 1024
sshape = (m // 1024, 1024)
decay = np.float32(0.999)


def streaming(rows, cols, budget):
    config.ew_block_rows, config.ew_block_cols = rows, cols
    old_budget = elementwise._VMEM_BUDGET_BYTES
    elementwise._VMEM_BUDGET_BYTES = budget
    elementwise._build_call.cache_clear()

    def tile(x, y, _r=rows, _c=cols, _b=budget):
        return x * decay + y

    def build(L):
        def run(a, b):
            def body(i, acc):
                return elementwise.pallas_elementwise(
                    tile, sshape, jnp.float32, acc, b,
                    name=f"axpy{rows}x{cols}b{budget}", donate=0,
                )

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def margs(i):
        ka, kb = jax.random.split(jax.random.PRNGKey(i))
        return (
            jax.random.normal(ka, sshape, jnp.float32),
            jax.random.normal(kb, sshape, jnp.float32),
        )

    try:
        t = bench._per_iter_time(build, margs, 16, 80)
    finally:
        elementwise._VMEM_BUDGET_BYTES = old_budget
        elementwise._build_call.cache_clear()
    return 3 * m * 4 / t / 1e9


MB = 1024 * 1024
for rows, cols, budget in [
    (512, 1024, 6 * MB), (256, 1024, 6 * MB), (512, 1024, 12 * MB),
    (1024, 1024, 24 * MB), (128, 1024, 3 * MB),
]:
    g = streaming(rows, cols, budget)
    print(json.dumps({"exp": "stream", "rows": rows, "cols": cols,
                      "budget_mb": budget // MB, "GBps": g}), flush=True)

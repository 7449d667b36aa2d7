"""Round-3 on-TPU verification of the new kernels (real Mosaic lowering):

- 1-D elementwise path: ragged blocks, scalar broadcast, correctness + perf
- flattened (B, 3, 3) int pow (the lane-packed small-op path)
- new blockwise-accumulator reduce (1-D streaming + 2-D) and dot1d
- fused pipeline kernel

Run alone (ONE TPU process): python tools/exp_verify2.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import simplemath_tpu as sm
from simplemath_tpu.ops import dispatch, elementwise, reduction
from bench import _per_iter_time, _timeit


def check(label, ok, detail=""):
    print(f"{label}: {'OK' if ok else 'FAIL'} {detail}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)

    # ---- correctness: 1-D ragged + scalar broadcast ----
    n = 1_000_003  # prime-ish: guaranteed ragged last block
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (n,), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)

    @jax.jit
    def f_add(a, b):
        got = sm.add(sm.Array(a), sm.Array(b)).jax()
        return jnp.max(jnp.abs(got - (a + b)))

    dispatch.reset()
    err = float(f_add(a, b))
    check("1d ragged add", err == 0.0, f"err={err} "
          f"kernel={dispatch.count('elementwise', 'add')}")

    @jax.jit
    def f_scalar(a):
        got = sm.multiply(sm.Array(a), sm.Array(jnp.float32(2.5))).jax()
        return jnp.max(jnp.abs(got - a * 2.5))

    err = float(f_scalar(a))
    check("1d scalar-bcast mul", err == 0.0, f"err={err}")

    # ---- correctness: flattened (B,3,3) int pow ----
    B = 200_000
    base = (jnp.arange(B * 9, dtype=jnp.int32) % 5 - 2).reshape(B, 3, 3)

    @jax.jit
    def f_ipow(base):
        got = sm.pow(sm.Array(base), 2).jax()
        return jnp.max(jnp.abs(got - base * base))

    dispatch.reset()
    err = float(f_ipow(base))
    check("flattened ipow (B,3,3)", err == 0.0,
          f"err={err} kernel={dispatch.count('elementwise', 'ipow')}")

    # ---- correctness: new reduce / dot1d ----
    x2 = jax.random.normal(k, (4097, 1000), jnp.float32)  # ragged rows+lanes

    @jax.jit
    def f_red2(x):
        return sm.Array(x).sum().jax(), jnp.sum(x, dtype=jnp.float32)

    got, want = f_red2(x2)
    rel = abs(float(got) - float(want)) / max(abs(float(want)), 1e-9)
    check("2d reduce ragged", rel < 1e-4, f"rel={rel:.2e}")

    x1 = jax.random.normal(k, (1_000_003,), jnp.float32)

    @jax.jit
    def f_red1(x):
        return sm.Array(x).sum().jax(), jnp.sum(x, dtype=jnp.float32)

    got, want = f_red1(x1)
    rel = abs(float(got) - float(want)) / max(abs(float(want)), 1e-9)
    check("1d reduce ragged", rel < 1e-4, f"rel={rel:.2e}")

    @jax.jit
    def f_dot(a, b):
        return sm.dot(sm.Array(a), sm.Array(b)).jax(), jnp.dot(
            a, b, precision=jax.lax.Precision.HIGHEST
        )

    got, want = f_dot(a, b)
    rel = abs(float(got) - float(want)) / max(abs(float(want)), 1e-9)
    check("1d ragged dot1d", rel < 1e-3, f"rel={rel:.2e}")

    # ---- correctness: min/max reduce on-TPU ----
    @jax.jit
    def f_minmax(x):
        return (
            sm.Array(x).max().jax() - jnp.max(x),
            sm.Array(x).min().jax() - jnp.min(x),
        )

    dmax, dmin = f_minmax(x1)
    check("1d min/max", float(dmax) == 0.0 and float(dmin) == 0.0)

    # ---- correctness: fused pipeline ----
    na = 2048
    fa = jax.random.uniform(k, (na, na), jnp.float32, 0.5, 2.0)
    fe = jax.random.uniform(k, (1, na), jnp.float32, -2.0, 2.0)
    fused = sm.fuse(lambda a, e: sm.exp(sm.pow(a, e)))

    @jax.jit
    def f_fused(a, e):
        got = fused(a, e).jax()
        want = jnp.exp(jnp.power(a, e))
        return jnp.max(jnp.abs(got - want) / jnp.maximum(jnp.abs(want), 1e-6))

    dispatch.reset()
    rel = float(f_fused(fa, fe))
    check("fused exp(pow) kernel", rel < 3e-4,
          f"rel={rel:.2e} fused={dispatch.count('elementwise', 'fused')}")

    # ---- perf rows (steady-state) ----
    from bench import (
        bench_million_add,
        bench_reduce_sum,
        bench_dot1d,
        bench_fused_pipeline,
        bench_small_pow_batched,
        bench_pow_small,
    )

    for name, fn in [
        ("million_add", bench_million_add),
        ("reduce_sum", bench_reduce_sum),
        ("dot1d", bench_dot1d),
        ("fused_pipeline", bench_fused_pipeline),
        ("small_pow_batched", bench_small_pow_batched),
        ("pow_1d_int", lambda: bench_pow_small((10,), 3, 297, "1d")),
    ]:
        try:
            print(f"{name}: {fn()}", flush=True)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""TPU layout experiments for round 3 (VERDICT items 1 and 3).

Q1: what is the fastest way to run a Pallas elementwise kernel over 1-D
    (flat) data — 1-D BlockSpec, reshape-to-2D outside the kernel, or the
    current (1, n) promotion?
Q2: matmul f32 routing — jnp.dot default vs pallas trunc vs highest.

Run alone (ONE TPU process): python tools/exp_layout.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _per_iter_time, _timeit

Z = np.int32(0)


def _cdiv(a, b):
    return -(-a // b)


def add1d_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] + b_ref[...]


@functools.lru_cache(maxsize=None)
def build_1d(n, bn):
    grid = (_cdiv(n, bn),)
    spec = pl.BlockSpec((bn,), lambda i: (i,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        add1d_kernel,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )


@functools.lru_cache(maxsize=None)
def build_2d(r, c, br):
    grid = (_cdiv(r, br),)
    spec = pl.BlockSpec((br, c), lambda i: (i, Z), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        add1d_kernel,
        out_shape=jax.ShapeDtypeStruct((r, c), jnp.float32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )


def run_row(label, n, body, l_short=16, l_long=80, traffic=3):
    def build_run(L):
        def run(a, b):
            def loop(i, acc):
                return body(acc, b)

            return jax.lax.fori_loop(0, L, loop, a)

        return run

    def make_args(i):
        k = jax.random.PRNGKey(i)
        ka, kb = jax.random.split(k)
        return (
            jax.random.normal(ka, (n,), jnp.float32),
            jax.random.normal(kb, (n,), jnp.float32),
        )

    try:
        t = _per_iter_time(build_run, make_args, l_short, l_long)
        gbps = traffic * n * 4 / t / 1e9
        print(f"{label}: t={t*1e6:.1f}us  {gbps:.0f} GB/s", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    NBIG = 64 * 1024 * 1024  # 256 MB/operand -> HBM streaming
    NM = 1_000_000           # the million_add shape (VMEM-resident)

    # --- HBM streaming variants ---
    run_row("A 2d (65536,1024) br=512", NBIG,
            lambda a, b: build_2d(65536, 1024, 512)(a.reshape(65536, 1024),
                                                    b.reshape(65536, 1024)).reshape(-1))
    run_row("B 1d blockspec bn=128K", NBIG,
            lambda a, b: build_1d(NBIG, 131072)(a, b))
    run_row("B2 1d blockspec bn=512K", NBIG,
            lambda a, b: build_1d(NBIG, 524288)(a, b))
    run_row("E xla 1d add", NBIG, lambda a, b: a + b)

    # --- million_add shape (1e6: no divisor that is a multiple of 128) ---
    run_row("F 1M 1d blockspec bn=128K", NM,
            lambda a, b: build_1d(NM, 131072)(a, b), 512, 8704)
    run_row("G 1M reshape (2000,500)", NM,
            lambda a, b: build_2d(2000, 500, 2000)(a.reshape(2000, 500),
                                                   b.reshape(2000, 500)).reshape(-1),
            512, 8704)
    run_row("H 1M current (1,n) promo", NM,
            lambda a, b: build_2d(1, NM, 1)(a.reshape(1, NM),
                                            b.reshape(1, NM)).reshape(-1),
            512, 8704)
    run_row("I 1M xla add", NM, lambda a, b: a + b, 512, 8704)

    # --- matmul f32 routing (item 3) ---
    from simplemath_tpu.ops import matmul as mm
    n = 2048
    scale = np.float32(1.0 / n)

    def mm_row(label, f):
        def build_run(L):
            def run(a, b):
                def loop(i, acc):
                    return f(acc, b) * scale

                return jax.lax.fori_loop(0, L, loop, a)

            return run

        def make_args(i):
            k = jax.random.PRNGKey(i)
            ka, kb = jax.random.split(k)
            return (
                jax.random.normal(ka, (n, n), jnp.float32),
                jax.random.normal(kb, (n, n), jnp.float32),
            )

        try:
            t = _per_iter_time(build_run, make_args, 64, 448)
            tf = 2 * n**3 / t / 1e12
            print(f"{label}: t={t*1e6:.1f}us  {tf:.1f} TF/s", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

    mm_row("M1 jnp.dot default f32", lambda a, b: jnp.dot(a, b))
    mm_row("M2 pallas trunc f32", lambda a, b: mm.pallas_matmul(a, b, jnp.float32))
    mm_row("M3 pallas highest f32",
           lambda a, b: mm.pallas_matmul(a, b, jnp.float32, precision="highest"))
    mm_row("M4 jnp.dot highest f32",
           lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST))

    # bf16 check (claimed 192, measured 172 in r2)
    def mm_row16(label, f):
        dt = jnp.bfloat16

        def build_run(L):
            def run(a, b):
                def loop(i, acc):
                    return (f(acc, b) * scale).astype(dt)

                return jax.lax.fori_loop(0, L, loop, a)

            return run

        def make_args(i):
            k = jax.random.PRNGKey(i)
            ka, kb = jax.random.split(k)
            return (jax.random.normal(ka, (n, n), dt), jax.random.normal(kb, (n, n), dt))

        try:
            t = _per_iter_time(build_run, make_args, 64, 448)
            tf = 2 * n**3 / t / 1e12
            print(f"{label}: t={t*1e6:.1f}us  {tf:.1f} TF/s", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

    mm_row16("M5 pallas bf16", lambda a, b: mm.pallas_matmul(a, b, jnp.bfloat16))
    mm_row16("M6 jnp.dot bf16", lambda a, b: jnp.dot(a, b)
             .astype(jnp.bfloat16))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

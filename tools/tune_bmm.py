"""bmm block-tuning sweep on the real chip (round-4 VERDICT item 1).

Measures the Pallas batched-matmul kernel at the solver-relevant
(B, n, n)x(B, n, n) bf16 shape across block configs and grid orders,
against the same-session XLA comparator, with steady-state loop-differenced
timing (fresh inputs per repeat; scalar sync).  Prints one JSON line per
config.
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
import bench  # noqa: E402  (timing machinery)


def make_bmm(B, M, K, N, bm, bk, bn, order="bmnk"):
    k_steps = -(-K // bk)

    def kernel(a_ref, b_ref, o_ref, acc_ref, *, k_axis):
        @pl.when(pl.program_id(k_axis) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.dot(
            a_ref[0], b_ref[0], preferred_element_type=jnp.float32
        )

        @pl.when(pl.program_id(k_axis) == k_steps - 1)
        def _store():
            o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    if order == "bmnk":
        grid = (B, M // bm, N // bn, k_steps)
        a_spec = pl.BlockSpec((1, bm, bk), lambda b, i, j, k: (b, i, k))
        b_spec = pl.BlockSpec((1, bk, bn), lambda b, i, j, k: (b, k, j))
        o_spec = pl.BlockSpec((1, bm, bn), lambda b, i, j, k: (b, i, j))
        sem = ("parallel", "parallel", "parallel", "arbitrary")
        k_axis = 3
    elif order == "mnbk":
        grid = (M // bm, N // bn, B, k_steps)
        a_spec = pl.BlockSpec((1, bm, bk), lambda i, j, b, k: (b, i, k))
        b_spec = pl.BlockSpec((1, bk, bn), lambda i, j, b, k: (b, k, j))
        o_spec = pl.BlockSpec((1, bm, bn), lambda i, j, b, k: (b, i, j))
        sem = ("parallel", "parallel", "parallel", "arbitrary")
        k_axis = 3
    else:  # "bk_fused": batch rides the arbitrary k axis -> (B*k_steps,)
        raise ValueError(order)

    return pl.pallas_call(
        functools.partial(kernel, k_axis=k_axis),
        out_shape=jax.ShapeDtypeStruct((B, M, N), jnp.bfloat16),
        grid=grid,
        in_specs=[a_spec, b_spec],
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=sem,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * N * K,
            bytes_accessed=B * (M * K + K * N + 2 * M * N),
            transcendentals=0,
        ),
    )


def measure(call, B, n, l_short=16, l_long=400):
    scale = np.float32(1.0 / n)

    def build_run(L):
        def run(a, b):
            def body(i, acc):
                return (call(acc, b) * scale).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, L, body, a)

        return run

    def make_args(i):
        k = jax.random.PRNGKey(i)
        ka, kb = jax.random.split(k)
        return (
            jax.random.normal(ka, (B, n, n), jnp.bfloat16),
            jax.random.normal(kb, (B, n, n), jnp.bfloat16),
        )

    t = bench._per_iter_time(build_run, make_args, l_short, l_long)
    return 2 * B * n**3 / t / 1e12


def main():
    B, n = 8, 1024
    t_xla = measure(jnp.matmul, B, n)
    print(json.dumps({"config": "xla", "TFLOPs": t_xla}), flush=True)
    configs = [
        ("bmnk", 1024, 1024, 1024),
        ("bmnk", 512, 1024, 512),
        ("bmnk", 512, 1024, 1024),
        ("bmnk", 1024, 1024, 512),
        ("bmnk", 256, 1024, 1024),
        ("bmnk", 512, 512, 512),
        ("mnbk", 1024, 1024, 1024),
        ("mnbk", 512, 1024, 512),
        ("mnbk", 512, 1024, 1024),
    ]
    for order, bm, bk, bn in configs:
        try:
            call = make_bmm(B, n, n, n, bm, bk, bn, order)
            tf = measure(call, B, n)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"config": f"{order}-{bm}-{bk}-{bn}",
                              "error": str(e)[:200]}), flush=True)
            continue
        print(json.dumps({"config": f"{order}-{bm}-{bk}-{bn}", "TFLOPs": tf,
                          "vs_xla": tf / t_xla}), flush=True)


if __name__ == "__main__":
    main()

"""Round-3 fused-pipeline tuning: donation + block shapes.

Body fused end-to-end: acc' = acc*1e-3 + exp(pow(a + acc*1e-6, e_row)),
Pallas kernel with donated acc vs the identical XLA loop body.
Run alone (ONE TPU process).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simplemath_tpu.ops import elementwise
from simplemath_tpu.config import config
from bench import _per_iter_time


def tile_body(acc, a, e):
    return acc * np.float32(1e-3) + jnp.exp(
        jnp.power(a + acc * np.float32(1e-6), e)
    )


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 2048
    shape = (n, n)

    def make_args(i):
        k1, k2 = jax.random.split(jax.random.PRNGKey(i))
        return (
            jax.random.uniform(k1, shape, jnp.float32, 0.5, 2.0),
            jax.random.uniform(k2, (1, n), jnp.float32, -2.0, 2.0),
        )

    for rows, cols, donate in [
        (512, 1024, 0), (512, 1024, None),
        (256, 1024, 0), (1024, 1024, 0), (2048, 1024, 0),
        (512, 2048, 0), (128, 2048, 0),
    ]:
        config.ew_block_rows = rows
        config.ew_block_cols = cols

        def build_run(L, donate=donate, tag=f"r{rows}c{cols}d{donate}"):
            def run(a, e_row):
                def body(i, acc):
                    return elementwise.pallas_elementwise(
                        tile_body, shape, jnp.float32, acc, a, e_row,
                        name=f"fb_{tag}", donate=donate,
                    )

                return jax.lax.fori_loop(0, L, body, jnp.zeros(shape, jnp.float32))

            return run

        try:
            tt = _per_iter_time(build_run, make_args, 8, 136)
            print(f"blocks ({rows},{cols}) donate={donate}: t={tt*1e6:.1f}us "
                  f"({n*n/tt/1e9:.1f} Gelem/s)", flush=True)
        except Exception as ex:
            print(f"blocks ({rows},{cols}) d={donate}: FAILED "
                  f"{type(ex).__name__}: {str(ex)[:200]}", flush=True)

    def build_run_xla(L):
        def run(a, e_row):
            def body(i, acc):
                return acc * np.float32(1e-3) + jnp.exp(
                    jnp.power(a + acc * np.float32(1e-6), e_row)
                )

            return jax.lax.fori_loop(0, L, body, jnp.zeros(shape, jnp.float32))

        return run

    tx = _per_iter_time(build_run_xla, make_args, 8, 136)
    print(f"XLA same body: t={tx*1e6:.1f}us ({n*n/tx/1e9:.1f} Gelem/s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""In-kernel transcendental speed shootout (round-3 fused_pipeline fix).

T1: native jnp.power + jnp.exp inside the Pallas tile
T2: crafted pow_f32 + exp_f32 (current, known compute-bound)
T3: hybrid — crafted edge handling, native exp2/log2 cores
XLA: jnp chain outside Pallas (the bench comparator)

Accuracy is scored against the XLA f32 chain (itself validated vs float64
in the CPU suite).  Run alone (ONE TPU process).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import jax
import jax.numpy as jnp
import numpy as np

from simplemath_tpu.ops import elementwise, transcendental as t
from bench import _per_iter_time


def tile_native(a, e):
    return jnp.exp(jnp.power(a, e))


def tile_crafted(a, e):
    return t.exp_f32(t.pow_f32(a, e))


def _pow_hybrid(x, y):
    """pow via native exp2/log2 with the crafted edge-case ladder."""
    ax = jnp.abs(x)
    r = jnp.exp2(y * jnp.log2(jnp.where(ax > 0, ax, np.float32(1.0))))
    y_int = jnp.round(y)
    y_is_int = y == y_int
    y_is_odd = y_is_int & (jnp.abs(jnp.mod(y_int, np.float32(2.0))) == 1.0)
    sign = jnp.where((x < 0) & y_is_odd, np.float32(-1.0), np.float32(1.0))
    out = sign * r
    out = jnp.where((x < 0) & ~y_is_int, jnp.float32(np.nan), out)
    out = jnp.where(x == 0, jnp.where(y > 0, 0.0, jnp.where(y < 0, np.inf, 1.0)), out)
    out = jnp.where(y == 0, np.float32(1.0), out)
    return out


def tile_hybrid(a, e):
    return jnp.exp(_pow_hybrid(a, e))


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

    a0, e0 = make_args(0)
    want = jnp.exp(jnp.power(a0, e0))

    for label, tile in [("T1 native", tile_native), ("T2 crafted", tile_crafted),
                        ("T3 hybrid", tile_hybrid)]:
        try:
            @jax.jit
            def acc_check(a, e, tile=tile):
                got = elementwise.pallas_elementwise(
                    tile, shape, jnp.float32, a, e, name=f"x_{label[:2]}"
                )
                w = jnp.exp(jnp.power(a, e))
                return jnp.max(jnp.abs(got - w) / jnp.maximum(jnp.abs(w), 1e-30))

            rel = float(acc_check(a0, e0))

            def build_run(L, tile=tile, label=label):
                def run(a, e_row):
                    def body(i, acc):
                        y = elementwise.pallas_elementwise(
                            tile, shape, jnp.float32, a + acc * np.float32(1e-6),
                            e_row, name=f"x_{label[:2]}"
                        )
                        return acc * np.float32(1e-3) + y

                    return jax.lax.fori_loop(0, L, body, jnp.zeros(shape, jnp.float32))

                return run

            tt = _per_iter_time(build_run, make_args, 8, 136)
            print(f"{label}: rel={rel:.2e}  t={tt*1e6:.1f}us "
                  f"({n*n/tt/1e9:.1f} Gelem/s)", flush=True)
        except Exception as ex:
            print(f"{label}: FAILED {type(ex).__name__}: {str(ex)[:300]}", flush=True)

    def build_run_xla(L):
        def run(a, e_row):
            def body(i, acc):
                y = jnp.exp(jnp.power(a + acc * np.float32(1e-6), e_row))
                return acc * np.float32(1e-3) + y

            return jax.lax.fori_loop(0, L, body, jnp.zeros(shape, jnp.float32))

        return run

    tx = _per_iter_time(build_run_xla, make_args, 8, 136)
    print(f"XLA chain: t={tx*1e6:.1f}us ({n*n/tx/1e9:.1f} Gelem/s)", flush=True)

    # standalone exp and log tiles, native vs crafted
    for label, tile in [("exp native", jnp.exp), ("exp crafted", t.exp_f32),
                        ("log native", jnp.log), ("log crafted", t.log_f32)]:
        def build_run(L, tile=tile, label=label):
            def run(a, e_row):
                def body(i, acc):
                    y = elementwise.pallas_elementwise(
                        tile, shape, jnp.float32, a + acc * np.float32(1e-6),
                        name=f"u_{label[:5]}"
                    )
                    return acc * np.float32(1e-3) + y

                return jax.lax.fori_loop(0, L, body, jnp.zeros(shape, jnp.float32))

            return run

        try:
            tt = _per_iter_time(build_run, make_args, 8, 136)
            print(f"{label}: t={tt*1e6:.1f}us ({n*n/tt/1e9:.1f} Gelem/s)", flush=True)
        except Exception as ex:
            print(f"{label}: FAILED {type(ex).__name__}: {str(ex)[:200]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

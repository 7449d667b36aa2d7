"""Parallel-in-time RTI SQP-MPC on the quadrotor — the 1 kHz replan
architecture (O(log H) sequential depth per tick).

Run: python examples/rti_mpc.py
"""

import jax.numpy as jnp
import numpy as np

from simplemath_tpu.models import make_quadrotor
from simplemath_tpu.models.rti import rti_closed_loop


def main():
    system = make_quadrotor()
    x0 = (
        jnp.zeros(12, jnp.float32)
        .at[0:3]
        .set(jnp.asarray([0.5, -0.5, 0.3], jnp.float32))
    )
    xs, us, costs, defects = rti_closed_loop(system, x0, horizon=40, ticks=120)
    for t in range(0, 120, 20):
        print(
            f"t={t:3d}  |pos|={np.linalg.norm(np.asarray(xs[t, 0:3])):.3f}"
            f"  cost={float(costs[t]):9.2f}  defect={float(defects[t]):.2e}"
        )
    print("final position error:", float(jnp.linalg.norm(xs[-1, 0:3])))


if __name__ == "__main__":
    main()

"""Quadrotor MPC closed loop: hover recovery from an offset, with control
bounds (BASELINE.json config 5 workload, single scenario).

Run: python examples/mpc_quadrotor.py
"""

import jax.numpy as jnp
import numpy as np

from simplemath_tpu.models import make_quadrotor
from simplemath_tpu.models.sqp_mpc import MPCController


def main():
    system = make_quadrotor()
    ctrl = MPCController(
        system,
        horizon=50,
        u_min=np.array([-5.0, -1.0, -1.0, -1.0], np.float32),
        u_max=np.array([5.0, 1.0, 1.0, 1.0], np.float32),
        replan_iters=2,
    )

    x = jnp.zeros(12, jnp.float32).at[0:3].set(
        jnp.asarray([1.0, -1.0, 0.5], jnp.float32)
    )
    for t in range(100):
        u0, cost = ctrl.replan(x)
        x = system.step(x, u0)
        if t % 20 == 0:
            pos = np.asarray(x[0:3])
            print(f"t={t:3d}  |pos|={np.linalg.norm(pos):.3f}  cost={float(cost):.1f}")

    print("final position error:", float(jnp.linalg.norm(x[0:3])))


if __name__ == "__main__":
    main()

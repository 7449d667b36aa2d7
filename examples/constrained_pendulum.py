"""Constrained swing-up: augmented-Lagrangian iLQR on torque bounds.

The solver returns the true AL iterate — `max_violation` measures actual
constraint convergence, not a post-hoc clip (models/sqp_mpc.py).

Run: python examples/constrained_pendulum.py
"""

import jax.numpy as jnp
import numpy as np

from simplemath_tpu.models import make_pendulum
from simplemath_tpu.models.sqp_mpc import SQPConfig, solve_constrained


def main():
    system = make_pendulum()
    x0 = jnp.zeros(2, jnp.float32)  # hanging at rest
    us0 = jnp.zeros((50, 1), jnp.float32)

    res = solve_constrained(
        system, x0, us0, u_min=-2.0, u_max=2.0, config=SQPConfig()
    )
    print(f"cost            : {float(res.cost):.3f}")
    print(f"max violation   : {float(res.max_violation):.2e}")
    print(f"max |u|         : {float(jnp.max(jnp.abs(res.us))):.4f}  (bound 2.0)")
    print(f"max multiplier  : {float(jnp.max(res.lam_lo + res.lam_hi)):.3f}")
    print(f"final theta     : {float(res.xs[-1, 0]):.3f}  (target {np.pi:.3f})")


if __name__ == "__main__":
    main()

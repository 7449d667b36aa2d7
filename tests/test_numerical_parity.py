"""Numerical parity: the f32 solver must match a float64 CPU reference
control sequence within tolerance at the same horizon (BASELINE.json
north_star)."""

import jax
import jax.numpy as jnp
import numpy as np

from simplemath_tpu.models import ILQRConfig, make_cartpole, make_pendulum
from simplemath_tpu.models.ilqr import solve


def _solve_in_dtype(system, x0, horizon, dtype, iters=20):
    x0 = jnp.asarray(x0, dtype)
    us = jnp.zeros((horizon, system.nu), dtype)
    return solve(system, x0, us, ILQRConfig(iterations=iters))


def test_pendulum_f32_matches_f64_controls():
    system = make_pendulum()
    x0 = [0.4, 0.0]
    r32 = _solve_in_dtype(system, x0, 40, jnp.float32)
    r64 = _solve_in_dtype(system, x0, 40, jnp.float64)
    # Cost parity is the robust criterion (controls can differ along flat
    # valleys); require matching trajectory cost within 0.1%.
    assert abs(float(r32.cost) - float(r64.cost)) / float(r64.cost) < 1e-3
    # Control sequences agree to f32-appropriate tolerance.
    np.testing.assert_allclose(
        np.asarray(r32.us), np.asarray(r64.us), rtol=0.05, atol=0.05
    )


def test_cartpole_f32_matches_f64_cost():
    system = make_cartpole()
    x0 = [0.0, 0.0, 0.3, 0.0]
    r32 = _solve_in_dtype(system, x0, 60, jnp.float32, iters=15)
    r64 = _solve_in_dtype(system, x0, 60, jnp.float64, iters=15)
    assert abs(float(r32.cost) - float(r64.cost)) / float(r64.cost) < 5e-3

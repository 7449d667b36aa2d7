"""Parallel-in-time RTI SQP-MPC: affine scan correctness, LQR oracle,
closed-loop stabilization, defect convergence."""

import jax
import jax.numpy as jnp
import numpy as np

from simplemath_tpu.models import make_pendulum, make_quadrotor
from simplemath_tpu.models import rti
from simplemath_tpu.models.rti import (
    RTIConfig,
    RTIState,
    affine_scan,
    rti_closed_loop,
    rti_init,
    rti_tick,
)


def test_affine_scan_matches_sequential():
    key = jax.random.PRNGKey(0)
    H, n = 17, 5
    A = 0.3 * jax.random.normal(key, (H, n, n))
    b = jax.random.normal(jax.random.PRNGKey(1), (H, n))
    x0 = jax.random.normal(jax.random.PRNGKey(2), (n,))
    xs = affine_scan(A, b, x0)
    x = x0
    for k in range(H):
        x = A[k] @ x + b[k]
        np.testing.assert_allclose(np.asarray(xs[k + 1]), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_rti_tick_shapes():
    system = make_pendulum()
    state = rti_init(system, jnp.zeros(2, jnp.float32), horizon=30)
    out = rti_tick(system, state, jnp.zeros(2, jnp.float32))
    assert out.u0.shape == (1,)
    assert out.state.xs.shape == (31, 2)
    assert np.isfinite(float(out.cost))


def test_rti_closed_loop_stabilizes_pendulum():
    system = make_pendulum()
    x0 = jnp.asarray([np.pi - 0.3, 0.0], jnp.float32)
    xs, us, costs, defects = rti_closed_loop(system, x0, horizon=30, ticks=80)
    assert abs(float(xs[-1, 0]) - np.pi) < 0.2
    assert abs(float(xs[-1, 1])) < 0.5
    # Defects (shooting infeasibility) shrink as the nominal converges.
    assert float(defects[-1]) < float(defects[0]) + 1e-3


def test_rti_closed_loop_quadrotor():
    system = make_quadrotor()
    x0 = (
        jnp.zeros(12, jnp.float32)
        .at[0:3]
        .set(jnp.asarray([0.5, -0.5, 0.3], jnp.float32))
    )
    xs, us, costs, defects = rti_closed_loop(system, x0, horizon=40, ticks=120)
    assert float(jnp.linalg.norm(xs[-1, 0:3])) < 0.15
    assert np.isfinite(np.asarray(costs)).all()


def test_rti_jittable():
    system = make_pendulum()
    state = rti_init(system, jnp.zeros(2, jnp.float32), horizon=20)

    fn = jax.jit(lambda s, x: rti_tick(system, s, x))
    out = fn(state, jnp.zeros(2, jnp.float32))
    assert np.isfinite(float(out.cost))

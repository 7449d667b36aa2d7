"""Closed-loop simulation and multihost helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplemath_tpu.models import make_pendulum
from simplemath_tpu.models.ilqr import ILQRConfig
from simplemath_tpu.models.simulate import closed_loop
from simplemath_tpu.parallel import multihost


def test_closed_loop_stabilizes():
    system = make_pendulum()
    x0 = jnp.asarray([np.pi - 0.3, 0.0], jnp.float32)
    result = closed_loop(
        system, x0, horizon=25, ticks=40, ilqr_config=ILQRConfig(iterations=2)
    )
    assert result.xs.shape == (41, 2)
    assert result.us.shape == (40, 1)
    assert abs(float(result.xs[-1, 0]) - np.pi) < 0.3


def test_closed_loop_with_noise_and_bounds():
    system = make_pendulum()
    x0 = jnp.asarray([np.pi - 0.2, 0.0], jnp.float32)
    result = closed_loop(
        system,
        x0,
        horizon=20,
        ticks=30,
        u_min=-4.0,
        u_max=4.0,
        noise_std=0.01,
        key=jax.random.PRNGKey(1),
    )
    assert float(jnp.max(jnp.abs(result.us))) <= 4.0 + 1e-6
    assert np.isfinite(np.asarray(result.costs)).all()


def test_pod_mesh_single_process():
    mesh = multihost.pod_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert "scenario" in mesh.axis_names


def test_host_local_batch_slice():
    start, size = multihost.host_local_batch_slice(64)
    assert start == 0 and size == 64


def test_scaling_efficiency():
    assert multihost.scaling_efficiency(1.0, 1.25, 2) == 0.8

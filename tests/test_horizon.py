"""Horizon (sequence) parallelism: the blocked, mesh-sharded Riccati
suffix scan must match the single-device associative and sequential
backward passes exactly (same algebra, different bracketing).

All sharded calls are jitted — shard_map programs are built for jit
execution; op-by-op eager dispatch of the blocked scan is pathologically
slow and is not a supported mode."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplemath_tpu.models import dynamics as dyn
from simplemath_tpu.models import ilqr
from simplemath_tpu.parallel import horizon
from simplemath_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


def _linearized_problem(H=37, seed=0):
    """A real linearization (cartpole rollout) — not random matrices — so
    the element algebra is exercised on representative conditioning."""
    system = dyn.make_cartpole()
    key = jax.random.PRNGKey(seed)
    x0 = 0.1 * jax.random.normal(key, (system.nx,), jnp.float32)
    us = 0.05 * jax.random.normal(key, (H, system.nu), jnp.float32)
    xs = ilqr.rollout(system.step, x0, us)
    A, B, lx, lu, lxx, luu, lux, Vx_T, Vxx_T = ilqr.linearize(system, xs, us)
    lxx, luu, lux, Vxx_T = ilqr.psd_cost_hessians(
        lxx, luu, lux, Vxx_T, "clamp_diag", 1e-6
    )
    return A, B, lx, lu, lxx, luu, lux, Vx_T, Vxx_T


def _sharded_jit(mesh, **kw):
    return jax.jit(
        functools.partial(
            horizon.backward_associative_sharded, mesh, "h", **kw
        )
    )


@pytest.mark.parametrize(
    "n_dev,H",
    [(2, 16), (8, 37)],  # 38 = 2*19 elements: the 8-way case forces padding
)
def test_sharded_backward_matches_single_device(n_dev, H):
    if n_dev > len(jax.devices()):
        pytest.skip(f"needs {n_dev} devices")
    args = _linearized_problem(H=H)
    reg = jnp.float32(1e-6)
    ks_ref, Ks_ref, Vx_ref, Vxx_ref = jax.jit(
        functools.partial(ilqr.backward_associative, return_values=True)
    )(*args, reg)
    mesh = make_mesh((n_dev,), ("h",), devices=jax.devices()[:n_dev])
    ks, Ks, Vx, Vxx = _sharded_jit(mesh, return_values=True)(*args, reg)
    np.testing.assert_allclose(
        np.asarray(Vx), np.asarray(Vx_ref), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(Vxx), np.asarray(Vxx_ref), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ks), np.asarray(ks_ref), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(Ks), np.asarray(Ks_ref), rtol=2e-4, atol=2e-5
    )


def test_sharded_backward_matches_sequential():
    """End-to-end cross-check against the O(H) sequential pass."""
    args = _linearized_problem(H=24, seed=3)
    reg = jnp.float32(1e-5)
    ks_seq, Ks_seq = jax.jit(ilqr.backward_sequential)(*args, reg)
    mesh = make_mesh((2,), ("h",), devices=jax.devices()[:2])
    ks, Ks = _sharded_jit(mesh)(*args, reg)
    np.testing.assert_allclose(
        np.asarray(ks), np.asarray(ks_seq), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(Ks), np.asarray(Ks_seq), rtol=1e-3, atol=1e-4
    )


def test_batched_2d_mesh_scenario_x_horizon():
    """2-D decomposition: scenario batch sharded over one mesh axis, the
    horizon over the other — must match vmap of the single-device
    associative pass."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    H, Bb = 21, 6  # H+1=22 over 4 time shards forces padding; Bb=6 over 2
    keys = jax.random.split(jax.random.PRNGKey(7), Bb)
    probs = [
        _linearized_problem(H=H, seed=int(k[0]) % 1000) for k in keys
    ]
    args = tuple(
        jnp.stack([p[i] for p in probs]) for i in range(9)
    )  # batch-leading
    reg = jnp.float32(1e-6)

    ks_ref, Ks_ref = jax.jit(
        jax.vmap(lambda *a: ilqr.backward_associative(*a, reg))
    )(*args)

    mesh = make_mesh((2, 4), ("scenario", "h"), devices=jax.devices()[:8])
    ks, Ks = jax.jit(
        functools.partial(
            horizon.backward_associative_sharded_batched,
            mesh,
            "h",
            scenario_axis="scenario",
        )
    )(*args, reg)
    np.testing.assert_allclose(
        np.asarray(ks), np.asarray(ks_ref), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(Ks), np.asarray(Ks_ref), rtol=2e-4, atol=2e-5
    )

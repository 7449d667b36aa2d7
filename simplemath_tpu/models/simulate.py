"""Closed-loop simulation: run a controller against (optionally noisy)
dynamics, entirely on device.

The deployment shape for the MPC stack (BASELINE.json config 5): a jitted
``lax.scan`` over control ticks with the solver inside — no host round
trips, which is what makes kHz-rate control feasible on an accelerator.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import ilqr as _ilqr
from .dynamics import System


class SimResult(NamedTuple):
    xs: jax.Array  # (T+1, nx) closed-loop state trajectory
    us: jax.Array  # (T, nu) applied controls
    costs: jax.Array  # (T,) solver cost per tick


def closed_loop(
    system: System,
    x0,
    horizon: int,
    ticks: int,
    ilqr_config: Optional[_ilqr.ILQRConfig] = None,
    u_min=None,
    u_max=None,
    noise_std: float = 0.0,
    key=None,
):
    """Simulate `ticks` MPC cycles: replan (warm-started), apply the first
    control, step the (noisy) dynamics.  One jitted program."""
    cfg = ilqr_config or _ilqr.ILQRConfig(iterations=2, alphas=(1.0, 0.5, 0.1))
    key = key if key is not None else jax.random.PRNGKey(0)
    x0 = jnp.asarray(x0, jnp.float32)

    def tick(carry, noise):
        x, us_warm = carry
        res = _ilqr.solve(system, x, us_warm, cfg)
        us = res.us
        if u_min is not None:
            us = jnp.clip(us, jnp.asarray(u_min), jnp.asarray(u_max))
        u0 = us[0]
        x_next = system.step(x, u0) + noise
        us_next = jnp.concatenate([us[1:], us[-1:]], axis=0)
        return (x_next, us_next), (x_next, u0, res.cost)

    noises = noise_std * jax.random.normal(
        key, (ticks, system.nx), dtype=jnp.float32
    )
    us_warm = jnp.zeros((horizon, system.nu), jnp.float32)
    (_, _), (xs_tail, us_applied, costs) = jax.lax.scan(
        tick, (x0, us_warm), noises
    )
    xs = jnp.concatenate([x0[None], xs_tail], axis=0)
    return SimResult(xs=xs, us=us_applied, costs=costs)

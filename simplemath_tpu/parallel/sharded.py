"""Sharded batched solving: the scenario axis over the device mesh.

TPU-native replacement for the reference's intra-op OpenMP loop
(include/math/calculate.h:47-48): instead of threads over 1024-element
chunks, ``shard_map`` splits the scenario batch across chips, each chip
vmaps its shard, and cross-chip ``psum``/``pmax`` collectives aggregate
global solver statistics (cost sums, convergence criteria — the "QP/KKT
block reductions" of BASELINE.json configs 4-5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import config
from ..models.dynamics import System
from ..models import ilqr as _ilqr
from . import collectives, mesh as _mesh


def solve_batched_sharded(
    system: System,
    x0_batch,
    us_init_batch,
    ilqr_config: _ilqr.ILQRConfig = _ilqr.ILQRConfig(),
    mesh: Optional[Mesh] = None,
    axis_name: Optional[str] = None,
):
    """Solve a scenario batch sharded over the mesh's scenario axis.

    Returns (result, stats) where stats carries globally-reduced metrics:
    total cost (psum over ICI), max gradient norm (pmax), mean cost.
    The scenario batch's leading dim must divide by the axis size.
    """
    mesh = mesh if mesh is not None else _mesh.make_mesh()
    axis_name = axis_name or config.data_axis

    n = x0_batch.shape[0]
    axis_size = mesh.shape[axis_name]
    if n % axis_size != 0:
        raise ValueError(
            f"scenario batch {n} not divisible by mesh axis "
            f"{axis_name}={axis_size}"
        )

    other_axes = tuple(a for a in mesh.axis_names if a != axis_name)

    def shard_fn(x0s, uss):
        result = _ilqr.solve_batched(system, x0s, uss, ilqr_config)
        # Cross-chip KKT/convergence reductions over ICI.
        total_cost = collectives.psum(jnp.sum(result.cost), axis_name)
        max_grad = collectives.pmax(jnp.max(result.grad_norm), axis_name)
        mean_cost = total_cost / n
        return result, {
            "total_cost": total_cost,
            "mean_cost": mean_cost,
            "max_grad_norm": max_grad,
        }

    spec = P(axis_name)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(
            _ilqr.ILQRResult(
                xs=spec, us=spec, cost=spec, cost_trace=spec, grad_norm=spec
            ),
            {"total_cost": P(), "mean_cost": P(), "max_grad_norm": P()},
        ),
        check_vma=False,
    )
    return fn(x0_batch, us_init_batch)


def make_sharded_train_step(
    system: System,
    mesh: Mesh,
    ilqr_config: _ilqr.ILQRConfig = _ilqr.ILQRConfig(),
    axis_name: Optional[str] = None,
):
    """A jitted sharded solve step (the framework's "training step")."""
    axis_name = axis_name or config.data_axis

    @jax.jit
    def step(x0_batch, us_batch):
        return solve_batched_sharded(
            system, x0_batch, us_batch, ilqr_config, mesh, axis_name
        )

    return step

"""Distributed CG solves: the whole solver loop runs SPMD inside shard_map.

Composition of ``solvers.cg*`` with :class:`DistPoissonOperator`: each
iteration is (local fused update) -> (local cell loop + plane ppermute) ->
(7 local dots + ONE stacked psum over ICI). Scalar recurrences are computed
redundantly on every device — the TPU equivalent of the reference's
"7-double allreduce then host scalar math" (``bp5/solver.h:488-533``), with
no host in the loop at all.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..solvers.cg import solve_cg
from ..solvers.cg_merged import solve_cg_merged
from ..solvers.control import SolverControl
from .dist_operator import DistPoissonOperator
from .partition import SlabPartition

__all__ = ["solve_cg_merged_dist", "solve_cg_dist", "make_device_mesh"]


def make_device_mesh(n_devices: int, axis_name: str = "z") -> Mesh:
    return Mesh(jax.devices()[:n_devices], (axis_name,))


def _dist_solve(solver_fn, dist_op, b_stacked, control, mesh, **kwargs):
    part = dist_op.part
    ax = part.axis_name

    def local_solve(b_loc):
        b_loc = b_loc.reshape(part.local_grid_shape)
        w = dist_op.dot_weight(b_loc.dtype)
        x, info = solver_fn(
            dist_op.vmult_local,
            b_loc,
            control,
            dot_weight=w,
            psum_axis=ax,
            **kwargs,
        )
        # scalars are already replicated (post-psum recurrences)
        return x.reshape(b_loc.shape), info["n_iterations"], info["res_norm"]

    shmapped = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=P(ax, None, None),
        out_specs=(P(ax, None, None), P(), P()),
    )
    nzl, ny, nx = part.local_grid_shape
    b_flat = b_stacked.reshape(part.n_shards * nzl, ny, nx)
    x, it, res = jax.jit(shmapped)(b_flat)
    return x.reshape(part.n_shards, nzl, ny, nx), {
        "n_iterations": it,
        "res_norm": res,
    }


def solve_cg_merged_dist(
    dist_op: DistPoissonOperator,
    b_stacked: jnp.ndarray,
    control: SolverControl,
    mesh: Optional[Mesh] = None,
    **kwargs,
):
    """b_stacked: ``[n_shards, nz_loc, ny, nx]`` ghosted slabs (see
    ``SlabPartition.to_slabs``). Returns (x_stacked, info)."""
    mesh = mesh or make_device_mesh(dist_op.part.n_shards, dist_op.part.axis_name)
    return _dist_solve(solve_cg_merged, dist_op, b_stacked, control, mesh, **kwargs)


def solve_cg_dist(
    dist_op: DistPoissonOperator,
    b_stacked: jnp.ndarray,
    control: SolverControl,
    mesh: Optional[Mesh] = None,
    **kwargs,
):
    mesh = mesh or make_device_mesh(dist_op.part.n_shards, dist_op.part.axis_name)
    return _dist_solve(solve_cg, dist_op, b_stacked, control, mesh, **kwargs)

"""Distributed AMR: the solve -> estimate -> mark -> refine loop with
SPMD solves over the device mesh.

Each step repartitions the current adaptive space (exact owned slabs +
shared-surface SIGMA exchange, :class:`.dist_adaptive.AdaptivePartition`)
and solves it distributed — global-coarsening multigrid CG by default
(level-independent iterations), or plain merged CG. Estimation/marking
(ZZ gradient recovery + Doerfler) run host-side on the gathered solution:
they cost one operator-apply-shaped pass per step against hundreds of
solve applies, and marking is a global decision anyway (the reference's
p4est repartitions host-side the same way, `bp5/step-64.cu:310`).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..adaptive import (
    AdaptiveMesh,
    AdaptivePoissonOperator,
    AdaptiveSpace,
    assemble_rhs_adaptive,
    estimate_gradient_recovery,
    mark_doerfler,
)
from ..mesh import BrickMesh
from ..solvers.control import ReductionControl
from .dist_adaptive import AdaptivePartition, DistAdaptivePoisson, solve_cg_merged_dist_adaptive
from .dist_adaptive_mg import DistAdaptiveMultigrid, solve_cg_mg_dist_adaptive

__all__ = ["amr_loop_distributed"]


def amr_loop_distributed(
    base: BrickMesh,
    degree: int,
    n_shards: int,
    f=1.0,
    n_steps: int = 3,
    theta: float = 0.5,
    reduction: float = 1e-10,
    max_iterations: int = 800,
    precond: str = "mg",
    dtype=jnp.float64,
):
    """Distributed counterpart of :func:`..adaptive.amr_loop`; same
    history records plus ``n_shards``. ``precond``: "mg" (distributed
    global-coarsening V-cycle) or "none" (distributed merged CG)."""
    mesh = AdaptiveMesh.from_brick(base)
    history = []
    for step in range(n_steps + 1):
        space = AdaptiveSpace(mesh, degree, dtype=dtype)
        part = AdaptivePartition(space, n_shards)
        b = assemble_rhs_adaptive(space, f)
        b_sh = part.to_shards(np.asarray(b))
        control = ReductionControl(
            max_iterations, tolerance=0.0, reduction=reduction
        )
        if precond == "mg" and int(mesh.levels.max()) > 0:
            dmg = DistAdaptiveMultigrid(part, dtype=dtype)
            x_sh, info = solve_cg_mg_dist_adaptive(dmg, b_sh, control)
        else:
            dop = DistAdaptivePoisson(part, dtype=dtype)
            x_sh, info = solve_cg_merged_dist_adaptive(
                dop, jnp.asarray(b_sh), control
            )
        x = jnp.asarray(part.from_shards(np.asarray(x_sh)))

        op = AdaptivePoissonOperator(space)  # host-side estimator tables
        eta = estimate_gradient_recovery(space, op, x)
        history.append(
            {
                "space": space,
                "x": x,
                "n_dofs": space.n_dofs,
                "n_cells": mesh.n_cells,
                "n_shards": n_shards,
                "eta": float(np.sqrt((eta**2).sum())),
                "eta_cells": eta,
                "n_iterations": int(info["n_iterations"]),
            }
        )
        if step < n_steps:
            mesh = mesh.refine_active(mark_doerfler(eta, theta))
    return history

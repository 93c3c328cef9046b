"""Distributed multigrid (parallel/dist_multigrid.py) on the 8-CPU mesh.

Acceptance: the SPMD V-cycle-preconditioned CG reproduces the
single-device MG-CG solve (same mesh-independent iteration counts, same
solution) at every shard layout, including 2D blocks, uneven extents
(dead-element padding), and mapped geometry.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import (
    BrickMesh,
    FESpace,
    ReductionControl,
    sine_map,
    solve_cg,
)
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator, assemble_rhs
from deal_and_ceed_on_gpu_tpu.parallel import (
    BlockPartition,
    DistMultigrid,
    make_device_mesh,
    solve_cg_mg_dist,
)
from deal_and_ceed_on_gpu_tpu.solvers import Multigrid


def _reference(mesh, p, rule="gauss_lobatto", backend="separable"):
    space = FESpace.create(mesh, p, rule=rule, dtype=jnp.float64)
    op = PoissonOperator(space, backend=backend)
    mg = Multigrid(
        space,
        make_op=lambda s: PoissonOperator(s, backend=backend),
        coarse_max_dofs=500,
    )
    b = assemble_rhs(space, 1.0)
    control = ReductionControl(60, tolerance=0.0, reduction=1e-10)
    x, info = solve_cg(op.vmult, b, control, diag=mg.vcycle)
    return space, b, x, int(info["n_iterations"]), control


@pytest.mark.parametrize("pz,py", [(2, 1), (4, 2), (2, 2)])
def test_dist_mg_matches_single_device(pz, py):
    mesh = BrickMesh((4, 8, 8))
    p = 2
    space, b, x_ref, it_ref, control = _reference(mesh, p)
    assert it_ref <= 12

    part = BlockPartition(mesh, p, pz=pz, py=py)
    dmg = DistMultigrid(part, dtype=jnp.float64, coarse_max_dofs=500)
    assert dmg.n_levels >= 2
    b_blocks = jnp.asarray(part.to_blocks(np.asarray(b).reshape(space.grid_shape)))
    x_blocks, info = solve_cg_mg_dist(dmg, b_blocks, control, mesh=make_device_mesh(pz, py))
    assert int(info["n_iterations"]) == it_ref
    x = part.from_blocks(np.asarray(x_blocks)).reshape(-1)
    np.testing.assert_allclose(x, np.asarray(x_ref), rtol=1e-9, atol=1e-12)


def test_dist_mg_uneven_extents():
    """mz=12 over pz=8: local blocks pad with dead elements; hierarchy
    stops when blocks stop halving — still >= 2 levels and exact
    agreement with the single-device solve."""
    mesh = BrickMesh((4, 4, 12))
    p = 2
    space, b, x_ref, it_ref, control = _reference(mesh, p)
    part = BlockPartition(mesh, p, pz=2, py=2)
    dmg = DistMultigrid(part, dtype=jnp.float64, coarse_max_dofs=500)
    b_blocks = jnp.asarray(part.to_blocks(np.asarray(b).reshape(space.grid_shape)))
    x_blocks, info = solve_cg_mg_dist(dmg, b_blocks, control, mesh=make_device_mesh(2, 2))
    # hierarchy depth may differ from the single-device one (block
    # alignment can stop coarsening earlier) -> same quality, iteration
    # count within 1-2 of the reference
    assert abs(int(info["n_iterations"]) - it_ref) <= 2
    x = part.from_blocks(np.asarray(x_blocks)).reshape(-1)
    np.testing.assert_allclose(x, np.asarray(x_ref), rtol=1e-8, atol=1e-12)


def test_dist_mg_mapped_mesh():
    phi, jac = sine_map(0.04)
    mesh = BrickMesh((4, 4, 8)).deform(phi, jac)
    p = 2
    space, b, x_ref, it_ref, control = _reference(
        mesh, p, rule="gauss", backend="structured"
    )
    part = BlockPartition(mesh, p, pz=4, py=1)
    dmg = DistMultigrid(
        part, dtype=jnp.float64, backend="structured", rule="gauss",
        coarse_max_dofs=500,
    )
    b_blocks = jnp.asarray(part.to_blocks(np.asarray(b).reshape(space.grid_shape)))
    x_blocks, info = solve_cg_mg_dist(dmg, b_blocks, control, mesh=make_device_mesh(4, 1))
    assert abs(int(info["n_iterations"]) - it_ref) <= 2
    x = part.from_blocks(np.asarray(x_blocks)).reshape(-1)
    np.testing.assert_allclose(x, np.asarray(x_ref), rtol=1e-8, atol=1e-12)


def test_dist_mg_graded_mesh():
    """Graded tensor mesh: per-shard width-aware prolongation stacks."""
    bz = np.cumsum(np.r_[0, 0.7 ** np.arange(8)[::-1]])
    mesh = BrickMesh.graded(
        np.linspace(0, 1, 5), np.linspace(0, 1, 5), bz / bz[-1]
    )
    p = 2
    space, b, x_ref, it_ref, control = _reference(mesh, p)
    part = BlockPartition(mesh, p, pz=4, py=2)
    dmg = DistMultigrid(
        part, dtype=jnp.float64, backend="structured", coarse_max_dofs=500
    )
    b_blocks = jnp.asarray(part.to_blocks(np.asarray(b).reshape(space.grid_shape)))
    x_blocks, info = solve_cg_mg_dist(dmg, b_blocks, control, mesh=make_device_mesh(4, 2))
    assert abs(int(info["n_iterations"]) - it_ref) <= 2
    x = part.from_blocks(np.asarray(x_blocks)).reshape(-1)
    np.testing.assert_allclose(x, np.asarray(x_ref), rtol=1e-8, atol=1e-12)


def test_dist_mg_3d_mesh():
    """Full 3D 2x2x2 device mesh: the x axis is partitioned through the
    whole hierarchy (per-shard x prolongation stacks, 3-axis coarse
    stitching) — same iterations and solution as single-device MG."""
    mesh = BrickMesh((8, 8, 8))
    p = 2
    space, b, x_ref, it_ref, control = _reference(mesh, p)
    assert it_ref <= 12

    part = BlockPartition(mesh, p, pz=2, py=2, px=2)
    dmg = DistMultigrid(part, dtype=jnp.float64, coarse_max_dofs=500)
    assert dmg.n_levels >= 2
    b_blocks = jnp.asarray(
        part.to_blocks(np.asarray(b).reshape(space.grid_shape))
    )
    x_blocks, info = solve_cg_mg_dist(
        dmg, b_blocks, control, mesh=make_device_mesh(2, 2, px=2)
    )
    assert int(info["n_iterations"]) == it_ref
    x = part.from_blocks(np.asarray(x_blocks)).reshape(-1)
    np.testing.assert_allclose(x, np.asarray(x_ref), rtol=1e-9, atol=1e-12)

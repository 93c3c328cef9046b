"""Distributed FDM (parallel/dist_fdm.py) on the 8-CPU mesh: the
all_to_all shard-transpose spectral solve must reproduce the single-device
FDMSolver exactly — direct solves and as a CG preconditioner."""

import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace, ReductionControl, solve_cg
from deal_and_ceed_on_gpu_tpu.models import (
    HelmholtzOperator,
    PoissonOperator,
    assemble_rhs,
)
from deal_and_ceed_on_gpu_tpu.parallel import (
    BlockPartition,
    DistFDM,
    DistOperator,
    make_device_mesh,
    solve_cg_fdm_dist,
)
from deal_and_ceed_on_gpu_tpu.solvers import FDMSolver


@pytest.mark.parametrize("pz,py", [(2, 1), (4, 2), (2, 2), (8, 1)])
def test_dist_fdm_direct_matches_single(pz, py):
    """Exact direct solve at every shard layout, including uneven extents
    (mz=5 over pz=2/4/8 pads with dead elements)."""
    mesh = BrickMesh((3, 4, 5))
    p = 3
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    b = assemble_rhs(space, 1.0)
    x_ref = np.asarray(FDMSolver(space).solve(b))

    part = BlockPartition(mesh, p, pz=pz, py=py)
    dfdm = DistFDM(part, dtype=jnp.float64)
    b_blocks = jnp.asarray(part.to_blocks(np.asarray(b).reshape(space.grid_shape)))
    x_blocks = dfdm.solve_direct(b_blocks, mesh=make_device_mesh(pz, py))
    x = part.from_blocks(np.asarray(x_blocks)).reshape(-1)
    np.testing.assert_allclose(x, x_ref, rtol=1e-12, atol=1e-14)
    # and the solve is actually correct: residual of the Poisson system
    op = PoissonOperator(space, backend="separable")
    r = float(jnp.linalg.norm(b - op.vmult(jnp.asarray(x))) / jnp.linalg.norm(b))
    assert r < 1e-11, r


def test_dist_fdm_ghost_planes_consistent():
    """Duplicated ghost planes must carry the owner's exact values."""
    mesh = BrickMesh((2, 4, 4))
    p = 2
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    b = assemble_rhs(space, lambda x: np.sin(3 * x[..., 0]) + x[..., 2])
    part = BlockPartition(mesh, p, pz=2, py=2)
    dfdm = DistFDM(part, dtype=jnp.float64)
    b_blocks = jnp.asarray(part.to_blocks(np.asarray(b).reshape(space.grid_shape)))
    x_blocks = np.asarray(dfdm.solve_direct(b_blocks, mesh=make_device_mesh(2, 2)))
    nzl, nyl, nx = part.local_grid_shape
    x4 = x_blocks.reshape(2, nzl, 2, nyl, nx)
    # shard (0, iy)'s last z plane == shard (1, iy)'s first plane, bitwise
    np.testing.assert_array_equal(x4[0, -1], x4[1, 0])
    np.testing.assert_array_equal(x4[:, :, 0, -1], x4[:, :, 1, 0])


def test_dist_fdm_preconditions_helmholtz():
    """FDM-preconditioned distributed CG on the variable-coefficient
    Helmholtz operator: same iteration count as single-device FDM-CG."""
    mesh = BrickMesh((4, 4, 4))
    p = 2
    space = FESpace.create(mesh, p, rule="gauss", dtype=jnp.float64)
    op = HelmholtzOperator(space, backend="structured")
    b = assemble_rhs(space, 1.0)
    control = ReductionControl(100, tolerance=0.0, reduction=1e-10)
    fdm = FDMSolver(space)
    x_ref, info_ref = solve_cg(op.vmult, b, control, diag=fdm.apply)
    assert int(info_ref["n_iterations"]) < 40

    part = BlockPartition(mesh, p, pz=2, py=2)
    dfdm = DistFDM(part, dtype=jnp.float64, rule="gauss")
    dop = DistOperator(
        part, HelmholtzOperator, dtype=jnp.float64, backend="structured",
        rule="gauss",
    )
    b_blocks = jnp.asarray(part.to_blocks(np.asarray(b).reshape(space.grid_shape)))
    x_blocks, info = solve_cg_fdm_dist(
        dfdm, dop, b_blocks, control, mesh=make_device_mesh(2, 2)
    )
    assert abs(int(info["n_iterations"]) - int(info_ref["n_iterations"])) <= 1
    x = part.from_blocks(np.asarray(x_blocks)).reshape(-1)
    np.testing.assert_allclose(x, np.asarray(x_ref), rtol=1e-8, atol=1e-12)


def test_dist_fdm_graded_mesh():
    """Graded tensor meshes stay on the FDM path (geometry absorbed in the
    1D tables), distributed included."""
    bz = np.cumsum(np.r_[0, 0.7 ** np.arange(4)[::-1]])
    mesh = BrickMesh.graded(
        np.linspace(0, 1, 4), np.linspace(0, 1, 5), bz / bz[-1]
    )
    p = 2
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    b = assemble_rhs(space, 1.0)
    x_ref = np.asarray(FDMSolver(space).solve(b))
    part = BlockPartition(mesh, p, pz=2, py=2)
    dfdm = DistFDM(part, dtype=jnp.float64)
    b_blocks = jnp.asarray(part.to_blocks(np.asarray(b).reshape(space.grid_shape)))
    x_blocks = dfdm.solve_direct(b_blocks, mesh=make_device_mesh(2, 2))
    np.testing.assert_allclose(
        part.from_blocks(np.asarray(x_blocks)).reshape(-1), x_ref,
        rtol=1e-12, atol=1e-14,
    )


def test_dist_fdm_rejects_mapped():
    from deal_and_ceed_on_gpu_tpu import sine_map

    phi, jac = sine_map(0.03)
    mesh = BrickMesh((4, 4, 4)).deform(phi, jac)
    with pytest.raises(ValueError, match="tensor-product"):
        DistFDM(BlockPartition(mesh, 2, pz=2), dtype=jnp.float64)

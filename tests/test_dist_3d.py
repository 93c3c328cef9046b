"""Full 3D (pz x py x px) domain decomposition on the 8-CPU device mesh:
x-axis partitioning, 8-corner halo resolution, distributed CG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace, SolverControl
from deal_and_ceed_on_gpu_tpu.models import (
    HelmholtzOperator,
    PoissonOperator,
    assemble_rhs,
)
from deal_and_ceed_on_gpu_tpu.parallel import (
    BlockPartition,
    DistOperator,
    make_device_mesh,
    make_dist_vmult,
    solve_cg_merged_dist,
)
from deal_and_ceed_on_gpu_tpu.solvers import solve_cg_merged


@pytest.mark.parametrize(
    "shape,p,decomp",
    [
        ((4, 4, 4), 2, (2, 2, 2)),  # full 3D cube decomposition
        ((3, 5, 4), 2, (2, 2, 2)),  # uneven extents on every axis
        ((4, 2, 2), 3, (1, 1, 4)),  # pure x slabs
        ((4, 4, 2), 2, (1, 2, 4)),  # (y, x) decomposition
    ],
)
def test_dist_3d_vmult_matches_single(shape, p, decomp):
    pz, py, px = decomp
    mesh = BrickMesh(shape, upper=(1.1, 0.9, 1.0))
    space = FESpace.create(mesh, p, rule="gauss", dtype=jnp.float64)
    part = BlockPartition(mesh, p, pz=pz, py=py, px=px)
    dist_op = DistOperator(
        part, PoissonOperator, dtype=jnp.float64, backend="structured",
        rule="gauss",
    )
    devmesh = make_device_mesh(pz, py, px=px)
    op_ref = PoissonOperator(space, backend="structured")
    u = np.random.default_rng(0).standard_normal(space.n_dofs)
    want = np.asarray(op_ref.vmult(jnp.asarray(u)))
    vm = make_dist_vmult(dist_op, devmesh)
    ub = jnp.asarray(part.to_blocks(u.reshape(space.grid_shape)))
    out = jax.block_until_ready(vm(ub))
    got = part.from_blocks(np.asarray(out)).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    # ghost coherence: duplicated x planes bitwise equal across sharers
    nzl, nyl, nxl = part.local_grid_shape
    b3 = np.asarray(out).reshape(pz * nzl, py * nyl, px, nxl)
    for ix in range(px - 1):
        np.testing.assert_array_equal(b3[:, :, ix, -1], b3[:, :, ix + 1, 0])


def test_dist_3d_merged_cg_helmholtz():
    """2x2x2 decomposition, position-dependent a(x) tables sliced along
    all three axes, whole fused-CG SPMD solve vs single-device."""
    mesh = BrickMesh((3, 4, 4))
    p = 2
    space = FESpace.create(mesh, p, rule="gauss", dtype=jnp.float64)
    part = BlockPartition(mesh, p, pz=2, py=2, px=2)
    dist_op = DistOperator(
        part, HelmholtzOperator, dtype=jnp.float64, backend="structured",
        rule="gauss",
    )
    devmesh = make_device_mesh(2, 2, px=2)
    op_ref = HelmholtzOperator(space, backend="structured")
    b = assemble_rhs(space, 1.0)
    control = SolverControl(300, 1e-10 * float(jnp.linalg.norm(b)))
    x_ref, info_ref = solve_cg_merged(op_ref.vmult, b, control)
    bb = jnp.asarray(part.to_blocks(np.asarray(b).reshape(space.grid_shape)))
    xb, info = solve_cg_merged_dist(dist_op, bb, control, mesh=devmesh)
    jax.block_until_ready(xb)
    assert abs(int(info["n_iterations"]) - int(info_ref["n_iterations"])) <= 1
    x = part.from_blocks(np.asarray(xb)).reshape(-1)
    np.testing.assert_allclose(x, np.asarray(x_ref), rtol=1e-9, atol=1e-12)

"""Distributed banded-Kronecker kernel (interpret mode, 8-CPU mesh): the
Gauss-rule BP1-BP4 fast path under shard_map vs the single-device
separable oracle (VERDICT r4 weak #6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace, IterationNumberControl
from deal_and_ceed_on_gpu_tpu.models import (
    MassOperator,
    PoissonOperator,
    assemble_rhs,
)
from deal_and_ceed_on_gpu_tpu.ops.pallas_stencil import YOFF
from deal_and_ceed_on_gpu_tpu.parallel import BlockPartition, make_device_mesh
from deal_and_ceed_on_gpu_tpu.parallel.dist_banded import DistBandedOperator
from deal_and_ceed_on_gpu_tpu.parallel.dist_pallas import (
    make_dist_vmult_pallas,
    solve_cg_merged_dist_pallas,
)
from deal_and_ceed_on_gpu_tpu.solvers import solve_cg_merged


def _oracle(mesh, p, kind):
    space = FESpace.create(mesh, p, n_q=p + 3, rule="gauss", dtype=jnp.float64)
    cls = PoissonOperator if kind == "stiffness" else MassOperator
    return space, cls(space, backend="separable")


def _dist_vmult_global(dop, u_global):
    vm = make_dist_vmult_pallas(dop, make_device_mesh(dop.part.pz, dop.part.py))
    up = jnp.asarray(dop.to_padded_blocks(u_global))
    out = jax.block_until_ready(vm(up))
    return dop.from_padded_blocks(np.asarray(out)), np.asarray(out)


def _check_ghost_coherence(dop, out_padded):
    """Shared (duplicated) planes must be BITWISE equal on all sharers."""
    part = dop.part
    L = dop.layout
    zt, yt, nxp = L.padded_shape
    nzl, nyl, nx = part.local_grid_shape
    b = out_padded.reshape(part.pz, zt, part.py, yt, nxp)
    p = L.p
    for iz in range(part.pz - 1):
        np.testing.assert_array_equal(b[iz, p + nzl - 1], b[iz + 1, p])
    for iy in range(part.py - 1):
        np.testing.assert_array_equal(
            b[:, :, iy, YOFF + nyl - 1], b[:, :, iy + 1, YOFF]
        )


@pytest.mark.parametrize(
    "shape,p,pz,py,kind",
    [
        ((4, 4, 4), 2, 2, 1, "stiffness"),
        ((4, 4, 6), 3, 2, 2, "stiffness"),
        ((4, 4, 6), 3, 2, 2, "mass"),
        ((2, 3, 5), 2, 2, 2, "stiffness"),  # ragged (dead-element padding)
        ((2, 2, 2), 2, 3, 1, "mass"),  # a fully-dead shard
        ((4, 6, 8), 2, 4, 2, "stiffness"),  # full 8-device mesh
    ],
)
def test_dist_banded_vmult_matches_single(shape, p, pz, py, kind):
    mesh = BrickMesh(shape, upper=(1.0, 0.9, 1.2))
    space, op_ref = _oracle(mesh, p, kind)
    part = BlockPartition(mesh, p, pz=pz, py=py)
    dop = DistBandedOperator(part, dtype=jnp.float64, kind=kind, interpret=True)
    u = np.random.default_rng(0).standard_normal(space.n_dofs)
    want = np.asarray(op_ref.vmult(jnp.asarray(u)))
    got, out_padded = _dist_vmult_global(dop, u.reshape(space.grid_shape))
    np.testing.assert_allclose(got.reshape(-1), want, rtol=1e-12, atol=1e-12)
    _check_ghost_coherence(dop, out_padded)


@pytest.mark.parametrize("kind", ["stiffness", "mass"])
def test_dist_banded_merged_cg_matches_single(kind):
    mesh = BrickMesh((4, 4, 6), upper=(1.0, 0.9, 1.2))
    p = 3
    space, op_ref = _oracle(mesh, p, kind)
    part = BlockPartition(mesh, p, pz=2, py=2)
    dop = DistBandedOperator(part, dtype=jnp.float64, kind=kind, interpret=True)
    b = assemble_rhs(space, 1.0)
    ctl = IterationNumberControl(60, 1e-10 * float(jnp.linalg.norm(b)))
    x_ref, info_ref = solve_cg_merged(op_ref.vmult, b, ctl)
    bp = jnp.asarray(dop.to_padded_blocks(np.asarray(b).reshape(space.grid_shape)))
    xp, info = solve_cg_merged_dist_pallas(dop, bp, ctl)
    x = dop.from_padded_blocks(np.asarray(xp)).reshape(-1)
    assert int(info["n_iterations"]) == int(info_ref["n_iterations"])
    np.testing.assert_allclose(
        x, np.asarray(x_ref), rtol=1e-9,
        atol=1e-10 * float(jnp.linalg.norm(x_ref)),
    )

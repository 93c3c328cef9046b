"""Distributed fused Pallas stencil kernel (interpret mode, 8-CPU mesh):
the flagship hot kernel under shard_map at any shard count, vs the
single-device backends."""

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
from deal_and_ceed_on_gpu_tpu.parallel import BlockPartition, make_device_mesh
from deal_and_ceed_on_gpu_tpu.parallel.dist_pallas import (
    DistStencilOperator,
    make_dist_vmult_pallas,
    solve_cg_merged_dist_pallas,
)
from deal_and_ceed_on_gpu_tpu.solvers import solve_cg_merged


def _dist_vmult_global(dop, u_global):
    """Apply the distributed operator to a global vector, returning the
    global result and the raw padded output (for coherence checks)."""
    vm = make_dist_vmult_pallas(dop, make_device_mesh(dop.part.pz, dop.part.py))
    up = jnp.asarray(dop.to_padded_blocks(u_global))
    out = jax.block_until_ready(vm(up))
    return dop.from_padded_blocks(np.asarray(out)), np.asarray(out)


from deal_and_ceed_on_gpu_tpu.ops.pallas_stencil import YOFF  # noqa: E402


def _check_ghost_coherence(dop, out_padded):
    """Shared (duplicated) planes must be BITWISE equal on all sharers."""
    part = dop.part
    L = dop.layout
    zt, yt, nxp = L.padded_shape
    nzl, nyl, nx = part.local_grid_shape
    b = out_padded.reshape(part.pz, zt, part.py, yt, nxp)
    p = L.p
    for iz in range(part.pz - 1):
        np.testing.assert_array_equal(
            b[iz, p + nzl - 1], b[iz + 1, p]
        )
    for iy in range(part.py - 1):
        np.testing.assert_array_equal(
            b[:, :, iy, YOFF + nyl - 1], b[:, :, iy + 1, YOFF]
        )


@pytest.mark.parametrize(
    "shape,p,pz,py,overlap",
    [
        ((4, 4, 4), 2, 2, 1, False),
        ((4, 4, 4), 2, 2, 1, True),
        ((4, 4, 6), 3, 2, 2, False),
        ((4, 4, 6), 3, 2, 2, True),
        ((2, 3, 5), 2, 2, 2, True),  # uneven extents (dead-element padding)
        ((2, 2, 2), 2, 3, 1, True),  # a fully-dead shard
        ((4, 6, 8), 2, 4, 2, True),  # full 8-device mesh
    ],
)
def test_dist_pallas_vmult_matches_single(shape, p, pz, py, overlap):
    mesh = BrickMesh(shape, upper=(1.0, 0.9, 1.2))
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    part = BlockPartition(mesh, p, pz=pz, py=py)
    dop = DistStencilOperator(
        part, dtype=jnp.float64, interpret=True, overlap=overlap
    )
    op_ref = PoissonOperator(space, backend="separable")
    u = np.random.default_rng(0).standard_normal(space.n_dofs)
    want = np.asarray(op_ref.vmult(jnp.asarray(u)))
    got, out_padded = _dist_vmult_global(dop, u.reshape(space.grid_shape))
    np.testing.assert_allclose(got.reshape(-1), want, rtol=1e-12, atol=1e-12)
    _check_ghost_coherence(dop, out_padded)


@pytest.mark.parametrize("overlap", [False, True])
def test_dist_pallas_helmholtz_vmult(overlap):
    mesh = BrickMesh((4, 4, 6))
    p = 2
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    part = BlockPartition(mesh, p, pz=2, py=2)
    dop = DistStencilOperator(
        part, dtype=jnp.float64, operator="helmholtz", interpret=True,
        overlap=overlap,
    )
    op_ref = HelmholtzOperator(space, backend="separable")
    u = np.random.default_rng(1).standard_normal(space.n_dofs)
    want = np.asarray(op_ref.vmult(jnp.asarray(u)))
    got, out_padded = _dist_vmult_global(dop, u.reshape(space.grid_shape))
    np.testing.assert_allclose(got.reshape(-1), want, rtol=1e-12, atol=1e-12)
    _check_ghost_coherence(dop, out_padded)


@pytest.mark.parametrize("overlap", [False, True])
def test_dist_pallas_merged_cg_matches_single(overlap):
    """Whole distributed merged-CG solves on the padded layout match the
    single-chip pallas solve (reference dist-vs-single contract)."""
    mesh = BrickMesh((3, 3, 4))
    p = 2
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    part = BlockPartition(mesh, p, pz=2, py=2)
    dop = DistStencilOperator(
        part, dtype=jnp.float64, interpret=True, overlap=overlap
    )
    op_ref = PoissonOperator(space, backend="separable")
    b = assemble_rhs(space, 1.0)
    control = SolverControl(300, 1e-10 * float(jnp.linalg.norm(b)))
    x_ref, info_ref = solve_cg_merged(op_ref.vmult, b, control)

    bp = jnp.asarray(dop.to_padded_blocks(np.asarray(b).reshape(space.grid_shape)))
    xp, info = solve_cg_merged_dist_pallas(
        dop, bp, control, mesh=make_device_mesh(2, 2)
    )
    jax.block_until_ready(xp)
    assert abs(int(info["n_iterations"]) - int(info_ref["n_iterations"])) <= 1
    x = dop.from_padded_blocks(np.asarray(xp)).reshape(-1)
    np.testing.assert_allclose(x, np.asarray(x_ref), rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("overlap", [False, True])
def test_dist_pallas_bf16_stream_vmult(overlap):
    """bf16-streaming mode under shard_map: HBM vectors and ICI plane
    traffic at bf16, per-shard f32 VMEM accumulation. Must match the f64
    operator to bf16 rounding and keep bitwise ghost coherence."""
    mesh = BrickMesh((4, 4, 6), upper=(1.0, 0.9, 1.2))
    p = 3
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    part = BlockPartition(mesh, p, pz=2, py=2)
    dop = DistStencilOperator(
        part,
        dtype=jnp.float32,
        interpret=True,
        overlap=overlap,
        pallas_opts=dict(stream_dtype=jnp.bfloat16),
    )
    op_ref = PoissonOperator(space, backend="separable")
    u = np.random.default_rng(3).standard_normal(space.n_dofs)
    want = np.asarray(op_ref.vmult(jnp.asarray(u)))
    got, out_padded = _dist_vmult_global(dop, u.reshape(space.grid_shape))
    assert out_padded.dtype == np.dtype(jnp.bfloat16).newbyteorder("=")
    scale = np.abs(want).max()
    assert np.abs(got.reshape(-1).astype(np.float64) - want).max() / scale < 3e-2
    _check_ghost_coherence(dop, out_padded)


def test_dist_pallas_bf16_stream_ir_recovers_f64():
    """Distributed bf16-streaming merged CG as the inner stage of iterative
    refinement: the outer loop measures true f64 residuals, each inner
    distributed solve only needs ~1-2 digits — together they reach 1e-10,
    so the half-traffic mode loses no accuracy at the solver level."""
    from deal_and_ceed_on_gpu_tpu import ReductionControl

    mesh = BrickMesh((3, 3, 4))
    p = 2
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    part = BlockPartition(mesh, p, pz=2, py=2)
    dop = DistStencilOperator(
        part,
        dtype=jnp.float32,
        interpret=True,
        pallas_opts=dict(stream_dtype=jnp.bfloat16),
    )
    op_ref = PoissonOperator(space, backend="separable")
    b = assemble_rhs(space, 1.0)
    bnorm = float(jnp.linalg.norm(b))
    ctrl = ReductionControl(
        60, tolerance=0.0, reduction=3e-2, success_on_max_steps=True
    )
    devmesh = make_device_mesh(2, 2)

    x = jnp.zeros_like(b)
    res = 1.0
    for _ in range(12):
        r = b - op_ref.vmult(x)
        res = float(jnp.linalg.norm(r)) / bnorm
        if res <= 1e-10:
            break
        rp = dop.to_padded_blocks(
            np.asarray(r, np.float64).reshape(space.grid_shape)
        )
        ep, _ = solve_cg_merged_dist_pallas(dop, rp, ctrl, mesh=devmesh)
        x = x + jnp.asarray(
            dop.from_padded_blocks(np.asarray(ep, np.float64)).reshape(-1)
        )
    assert res <= 1e-10

"""Helmholtz on the fused Pallas stencil kernel (interpret mode on CPU):
the collocated value term as one extra in-kernel FMA against the a(x)
node table must reproduce the structured cell loop exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace, SolverControl, solve_cg
from deal_and_ceed_on_gpu_tpu.models import HelmholtzOperator, assemble_rhs


@pytest.mark.parametrize("shape,p", [((2, 3, 4), 2), ((2, 2, 2), 5), ((4, 4, 4), 3)])
def test_pallas_helmholtz_matches_structured(shape, p):
    mesh = BrickMesh(shape, upper=(1.0, 0.9, 1.2))
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    op_ref = HelmholtzOperator(space, backend="structured")
    op = HelmholtzOperator(space, backend="pallas")
    op._stencil.interpret = True
    u = jnp.asarray(np.random.default_rng(0).standard_normal(space.n_dofs))
    np.testing.assert_allclose(
        np.asarray(op.vmult(u)), np.asarray(op_ref.vmult(u)), rtol=1e-13, atol=1e-13
    )


def test_pallas_helmholtz_bf16_streaming():
    """The collocated value term composes with bf16 streaming: a(x) table
    stays f32 in VMEM, vectors stream narrow — bf16-rounding accuracy."""
    mesh = BrickMesh((3, 3, 4), upper=(1.0, 0.9, 1.2))
    p = 3
    space64 = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    op_ref = HelmholtzOperator(space64, backend="structured")
    space32 = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float32)
    op = HelmholtzOperator(
        space32, backend="pallas", pallas_opts=dict(stream_dtype=jnp.bfloat16)
    )
    op._stencil.interpret = True
    u = jnp.asarray(np.random.default_rng(7).standard_normal(space64.n_dofs))
    want = np.asarray(op_ref.vmult(u))
    got = np.asarray(
        op.vmult(jnp.asarray(u, jnp.float32)), dtype=np.float64
    )
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 3e-2


def test_pallas_helmholtz_solve_and_fold_scale():
    mesh = BrickMesh((3, 3, 3))
    space = FESpace.create(mesh, 2, rule="gauss_lobatto", dtype=jnp.float64)
    op_ref = HelmholtzOperator(space, backend="structured")
    op = HelmholtzOperator(space, backend="pallas")
    op._stencil.interpret = True
    b = assemble_rhs(space, 1.0)
    control = SolverControl(300, 1e-11 * float(jnp.linalg.norm(b)))
    x_ref, info_ref = solve_cg(op_ref.vmult, b, control)
    L = op.layout
    xp, info = solve_cg(op.vmult_padded, L.pad_flat(b), control)
    assert abs(int(info["n_iterations"]) - int(info_ref["n_iterations"])) <= 1
    np.testing.assert_allclose(
        np.asarray(L.unpad_flat(xp)), np.asarray(x_ref), rtol=1e-9, atol=1e-12
    )
    # fold_scale semantics on the value+gradient kernel
    u = jnp.asarray(np.random.default_rng(1).standard_normal(space.n_dofs))
    before = np.asarray(op.vmult(u))
    op.fold_scale(0.5)
    after = np.asarray(op.vmult(u))
    mask = np.asarray(mesh.boundary_dof_mask(2))
    np.testing.assert_allclose(after[mask], before[mask], rtol=0, atol=0)
    np.testing.assert_allclose(after[~mask], 0.5 * before[~mask], rtol=1e-13)


def test_pallas_helmholtz_rejects_gauss_rule():
    mesh = BrickMesh((2, 2, 2))
    space = FESpace.create(mesh, 2, rule="gauss", dtype=jnp.float64)
    with pytest.raises(ValueError, match="collocation"):
        HelmholtzOperator(space, backend="pallas")


def test_stacked_helmholtz_vector_value_term():
    """Vector Helmholtz at GLL collocation: the stacked stencil kernel
    now carries the collocated value term (one a(x) tile per slab), so
    all 3 components ride ONE launch and match the per-component
    structured oracle."""
    from deal_and_ceed_on_gpu_tpu.models.vector import VectorOperator
    from deal_and_ceed_on_gpu_tpu.ops.pallas_stencil import (
        StackedStencilOperator,
    )

    mesh = BrickMesh((2, 3, 4))
    p = 3
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    ref = VectorOperator(HelmholtzOperator(space, backend="structured"), 3)
    sop = HelmholtzOperator(space, backend="pallas")
    sop._stencil.interpret = True
    vop = VectorOperator(sop, 3)
    assert isinstance(vop._stacked, StackedStencilOperator)
    assert vop._stacked._a is not None

    u = jnp.asarray(
        np.random.default_rng(11).standard_normal((3, space.n_dofs))
    )
    want = np.asarray(ref.vmult(u))
    got = np.asarray(vop.unpad_flat(vop.vmult_padded(vop.pad_flat(u))))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 1e-11 * scale

    # fold_scale reaches the stacked value tile too. Contract
    # (models/operator_base.py fold_scale): unconstrained rows scale by s,
    # Dirichlet identity rows are UNAFFECTED — the stacked kernel enforces
    # the identity in-kernel, so constrained rows return src values.
    up = vop.pad_flat(u)
    before = np.asarray(vop.vmult_padded(up))
    vop.fold_scale(3.0)
    after = np.asarray(vop.vmult_padded(up))
    free_ind = jnp.tile(
        (~space.dirichlet_mask).astype(space.dtype)[None, :], (3, 1)
    )
    freep = np.asarray(vop.pad_flat(free_ind)) > 0.5
    free = freep & (before != 0)
    np.testing.assert_allclose(after[free] / before[free], 3.0, rtol=1e-12)
    con = (~freep) & (before != 0)
    np.testing.assert_allclose(after[con], before[con], rtol=0, atol=0)

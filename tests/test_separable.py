"""Separable (Kronecker) backend vs oracle and vs the cell-loop backends."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.models import MassOperator, PoissonOperator
from deal_and_ceed_on_gpu_tpu.utils import oracle

CASES = [
    ((2, 2, 2), 1, "gauss_lobatto", None),
    ((2, 3, 4), 3, "gauss_lobatto", None),   # BP5 collocation
    ((3, 2, 2), 2, "gauss", None),           # q = p+1 Gauss
    ((2, 2, 3), 2, "gauss", 4),              # BP3: q = p+2
    ((2, 2, 2), 5, "gauss_lobatto", None),
]


@pytest.mark.parametrize("shape,p,rule,nq", CASES)
@pytest.mark.parametrize("mode", ["matmul", "stencil"])
def test_separable_poisson_matches_oracle(shape, p, rule, nq, mode):
    mesh = BrickMesh(shape, upper=(1.0, 0.8, 1.3))
    space = FESpace.create(mesh, p, n_q=nq, rule=rule, dtype=jnp.float64)
    op = PoissonOperator(space, backend="separable")
    op.sep_mode = mode
    A = oracle.assemble_sparse(mesh, space.basis, "stiffness")
    mask = mesh.boundary_dof_mask(p)
    u = jnp.asarray(np.random.default_rng(0).standard_normal(space.n_dofs))
    got = np.asarray(jax.jit(op.vmult)(u))
    want = oracle.apply_constrained(A, mask, np.asarray(u))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("shape,p,rule,nq", CASES[:4])
@pytest.mark.parametrize("mode", ["matmul", "stencil"])
def test_separable_mass_matches_oracle(shape, p, rule, nq, mode):
    mesh = BrickMesh(shape, upper=(1.1, 0.9, 1.0))
    space = FESpace.create(mesh, p, n_q=nq, rule=rule, dtype=jnp.float64)
    op = MassOperator(space, backend="separable")
    op.sep_mode = mode
    A = oracle.assemble_sparse(mesh, space.basis, "mass")
    mask = mesh.boundary_dof_mask(p)
    u = jnp.asarray(np.random.default_rng(1).standard_normal(space.n_dofs))
    got = np.asarray(jax.jit(op.vmult)(u))
    want = oracle.apply_constrained(A, mask, np.asarray(u))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


def test_separable_helmholtz_collocated_matches_cell_loop():
    """GLL-collocated Helmholtz on the separable fast path: Poisson
    Kronecker terms + a global diagonal mass term."""
    from deal_and_ceed_on_gpu_tpu.models import HelmholtzOperator

    mesh = BrickMesh((2, 3, 2))
    space = FESpace.create(mesh, 3, rule="gauss_lobatto", dtype=jnp.float64)
    op_ref = HelmholtzOperator(space, backend="structured")
    op_sep = HelmholtzOperator(space, backend="separable")
    u = jnp.asarray(np.random.default_rng(5).standard_normal(space.n_dofs))
    np.testing.assert_allclose(
        np.asarray(op_sep.vmult(u)), np.asarray(op_ref.vmult(u)), rtol=1e-12, atol=1e-13
    )


def test_separable_helmholtz_gauss_raises():
    from deal_and_ceed_on_gpu_tpu.models import HelmholtzOperator

    mesh = BrickMesh((2, 2, 2))
    space = FESpace.create(mesh, 2, rule="gauss", dtype=jnp.float64)
    with pytest.raises(ValueError):
        HelmholtzOperator(space, backend="separable")


def test_deterministic_apply():
    """No atomics anywhere: repeated applies are bitwise identical (the
    reproducibility the reference only gets with graph coloring,
    bp5/fe_evaluation_gl.h:176-180)."""
    mesh = BrickMesh((3, 3, 3))
    space = FESpace.create(mesh, 3, dtype=jnp.float64)
    u = jnp.asarray(np.random.default_rng(9).standard_normal(space.n_dofs))
    for backend in ("gather", "structured", "separable"):
        op = PoissonOperator(space, backend=backend)
        f = jax.jit(op.vmult)
        a = np.asarray(f(u))
        b = np.asarray(f(u))
        np.testing.assert_array_equal(a, b)

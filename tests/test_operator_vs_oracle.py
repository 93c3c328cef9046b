"""Matrix-free operator apply vs the dense assembly oracle (SURVEY.md 7.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import FESpace, BrickMesh
from deal_and_ceed_on_gpu_tpu.models import (
    HelmholtzOperator,
    MassOperator,
    PoissonOperator,
    assemble_rhs,
)
from deal_and_ceed_on_gpu_tpu.models.helmholtz import default_coefficient
from deal_and_ceed_on_gpu_tpu.utils import oracle


def _random_u(space, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(space.n_dofs))


CASES = [
    # (mesh shape, degree, rule, n_q)
    ((2, 2, 2), 1, "gauss_lobatto", None),
    ((2, 2, 2), 3, "gauss_lobatto", None),   # BP5/BP6 collocation
    ((3, 2, 1), 2, "gauss", None),           # step-64 default q=p+1
    ((2, 2, 2), 2, "gauss", 4),              # BP1/BP3 q=p+2 rectangular
    ((1, 1, 1), 5, "gauss_lobatto", None),
    ((2, 1, 2), 4, "gauss", None),
]


@pytest.mark.parametrize("shape,p,rule,nq", CASES)
@pytest.mark.parametrize("backend", ["structured", "gather"])
def test_poisson_vmult_matches_oracle(shape, p, rule, nq, backend):
    mesh = BrickMesh(shape, upper=(1.0, 0.8, 1.3))
    space = FESpace.create(mesh, p, n_q=nq, rule=rule, dtype=jnp.float64)
    op = PoissonOperator(space, backend=backend)
    A = oracle.assemble_sparse(mesh, space.basis, "stiffness")
    mask = mesh.boundary_dof_mask(p)
    u = _random_u(space)
    got = np.asarray(jax.jit(op.vmult)(u))
    want = oracle.apply_constrained(A, mask, np.asarray(u))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("backend", ["structured", "gather"])
def test_poisson_merged_full_coefficient(backend):
    mesh = BrickMesh((2, 2, 2), upper=(1.0, 2.0, 0.5))
    space = FESpace.create(mesh, 3, dtype=jnp.float64)
    op_const = PoissonOperator(space, backend=backend, coefficient="merged_const")
    op_full = PoissonOperator(space, backend=backend, coefficient="merged_full")
    u = _random_u(space)
    np.testing.assert_allclose(
        np.asarray(op_const.vmult(u)), np.asarray(op_full.vmult(u)), rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("shape,p,rule,nq", CASES[:4])
@pytest.mark.parametrize("backend", ["structured", "gather"])
def test_mass_vmult_matches_oracle(shape, p, rule, nq, backend):
    mesh = BrickMesh(shape, upper=(1.1, 0.9, 1.0))
    space = FESpace.create(mesh, p, n_q=nq, rule=rule, dtype=jnp.float64)
    op = MassOperator(space, backend=backend)
    A = oracle.assemble_sparse(mesh, space.basis, "mass")
    mask = mesh.boundary_dof_mask(p)
    u = _random_u(space, 3)
    got = np.asarray(jax.jit(op.vmult)(u))
    want = oracle.apply_constrained(A, mask, np.asarray(u))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("backend", ["structured", "gather"])
def test_helmholtz_vmult_matches_oracle(backend):
    # step-64 configuration: Q3, q = p+1 Gauss, varying coefficient
    mesh = BrickMesh.hyper_cube().refine_global(1)  # 8 cells
    p = 3
    space = FESpace.create(mesh, p, rule="gauss", dtype=jnp.float64)
    op = HelmholtzOperator(space, backend=backend)
    A = oracle.assemble_sparse(mesh, space.basis, "helmholtz", default_coefficient)
    mask = mesh.boundary_dof_mask(p)
    u = _random_u(space, 7)
    got = np.asarray(jax.jit(op.vmult)(u))
    want = oracle.apply_constrained(A, mask, np.asarray(u))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_operator_is_symmetric():
    mesh = BrickMesh((2, 2, 2))
    space = FESpace.create(mesh, 3, dtype=jnp.float64)
    op = PoissonOperator(space)
    u = _random_u(space, 1)
    v = _random_u(space, 2)
    lhs = jnp.vdot(v, op.vmult(u))
    rhs = jnp.vdot(u, op.vmult(v))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


@pytest.mark.parametrize("backend", ["structured", "gather"])
def test_rhs_matches_oracle(backend):
    """b_i = integral(phi_i * 1) — compare against mass matrix times ones
    (partition of unity: sum_j phi_j = 1)."""
    mesh = BrickMesh((2, 2, 2), upper=(1.0, 1.5, 1.0))
    p = 3
    space = FESpace.create(mesh, p, rule="gauss", dtype=jnp.float64)
    b = np.asarray(assemble_rhs(space, 1.0, backend=backend))
    M = oracle.assemble_sparse(mesh, space.basis, "mass")
    mask = mesh.boundary_dof_mask(p)
    want = np.where(mask, 0.0, M @ np.ones(space.n_dofs))
    np.testing.assert_allclose(b, want, rtol=1e-12, atol=1e-13)

"""Fast-diagonalization solver/preconditioner."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace, SolverControl, solve_cg
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator, assemble_rhs
from deal_and_ceed_on_gpu_tpu.solvers.fdm import FDMSolver
from deal_and_ceed_on_gpu_tpu.utils import oracle


@pytest.mark.parametrize(
    "mesh",
    [
        BrickMesh((3, 2, 4), upper=(1.0, 0.7, 1.3)),
        BrickMesh.graded(
            np.array([0.0, 0.1, 0.35, 1.0]), np.linspace(0, 1, 4), np.linspace(0, 1, 4)
        ),
    ],
)
@pytest.mark.parametrize("p,rule", [(2, "gauss_lobatto"), (4, "gauss_lobatto"), (3, "gauss")])
def test_fdm_is_exact_poisson_solver(mesh, p, rule):
    space = FESpace.create(mesh, p, rule=rule, dtype=jnp.float64)
    fdm = FDMSolver(space)
    b = assemble_rhs(space, 1.0)
    x = fdm.solve(b)
    A = oracle.assemble_sparse(mesh, space.basis, "stiffness")
    mask = mesh.boundary_dof_mask(p)
    x_direct = spla.spsolve(oracle.constrained_matrix(A, mask).tocsc(), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-10, atol=1e-12)


def test_fdm_preconditioned_cg_converges_in_one_iteration():
    """FDM is the exact inverse of the BP5 operator: CG with it converges
    in one step."""
    mesh = BrickMesh((2, 3, 2))
    space = FESpace.create(mesh, 3, rule="gauss_lobatto", dtype=jnp.float64)
    op = PoissonOperator(space, backend="separable")
    fdm = FDMSolver(space)
    b = assemble_rhs(space, 1.0)
    control = SolverControl(50, 1e-10 * float(jnp.linalg.norm(b)))
    x, info = solve_cg(op.vmult, b, control, diag=fdm.apply)
    assert int(info["n_iterations"]) <= 2
    res = float(jnp.linalg.norm(b - op.vmult(x)))
    assert res <= 1e-9 * float(jnp.linalg.norm(b))


def test_fdm_preconditions_helmholtz():
    """On the variable-coefficient Helmholtz system the Poisson-FDM is an
    approximate inverse: iteration counts drop by ~an order of magnitude
    vs the identity preconditioner (which is what the reference uses)."""
    from deal_and_ceed_on_gpu_tpu.models import HelmholtzOperator

    mesh = BrickMesh.hyper_cube().refine_global(2)  # 64 cells
    p = 3
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    op = HelmholtzOperator(space)
    fdm = FDMSolver(space)
    b = assemble_rhs(space, 1.0)
    control = SolverControl(2000, 1e-10 * float(jnp.linalg.norm(b)))
    _, info_id = solve_cg(op.vmult, b, control)
    x, info_fdm = solve_cg(op.vmult, b, control, diag=fdm.apply)
    it_id, it_fdm = int(info_id["n_iterations"]), int(info_fdm["n_iterations"])
    assert it_fdm * 4 <= it_id, (it_fdm, it_id)
    res = float(jnp.linalg.norm(b - op.vmult(x)))
    assert res <= 1e-8 * float(jnp.linalg.norm(b))

"""High-degree coverage (BASELINE: p = 1..8) and solver robustness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import (
    BrickMesh,
    FESpace,
    NoConvergence,
    SolverControl,
    solve_cg_merged,
)
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator, assemble_rhs
from deal_and_ceed_on_gpu_tpu.utils import oracle


@pytest.mark.parametrize("p", [6, 7, 8])
@pytest.mark.parametrize("backend", ["structured", "separable"])
def test_high_degree_vmult_matches_oracle(p, backend):
    mesh = BrickMesh((2, 2, 2))
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    op = PoissonOperator(space, backend=backend)
    A = oracle.assemble_sparse(mesh, space.basis, "stiffness")
    mask = mesh.boundary_dof_mask(p)
    u = jnp.asarray(np.random.default_rng(p).standard_normal(space.n_dofs))
    got = np.asarray(op.vmult(u))
    want = oracle.apply_constrained(A, mask, np.asarray(u))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("p", list(range(1, 9)))
def test_degree_sweep_cg_solves(p):
    """CG on the BP5 configuration converges for every degree p=1..8."""
    mesh = BrickMesh((2, 2, 2))
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    op = PoissonOperator(space, backend="separable")
    b = assemble_rhs(space, 1.0)
    tol = 1e-10 * float(jnp.linalg.norm(b))
    x, info = solve_cg_merged(op.vmult, b, SolverControl(2000, tol))
    res = float(jnp.linalg.norm(b - op.vmult(x)))
    assert res <= 50 * tol


def test_nan_poisons_solve_but_terminates():
    """A NaN in the system must terminate the while_loop (NaN fails the
    continue predicate) and surface as NoConvergence — the failure-detection
    contract (reference aborts via exceptions, SURVEY.md section 5)."""
    mesh = BrickMesh((2, 2, 2))
    space = FESpace.create(mesh, 2, dtype=jnp.float64)
    op = PoissonOperator(space)
    b = assemble_rhs(space, 1.0).at[33].set(jnp.nan)
    control = SolverControl(500, 1e-12)
    x, info = solve_cg_merged(op.vmult, b, control)
    assert int(info["n_iterations"]) < 500  # terminated early, no hang
    with pytest.raises(NoConvergence):
        control.check({k: np.asarray(v) for k, v in info.items()})

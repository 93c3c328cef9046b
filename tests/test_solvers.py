"""CG solver tests: scipy cross-check, standard-vs-merged agreement
(the reference's own verification strategy, SURVEY.md section 4), and the
deferred-x-update scheme."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from deal_and_ceed_on_gpu_tpu import (
    BrickMesh,
    FESpace,
    IterationNumberControl,
    SolverControl,
    solve_cg,
    solve_cg_merged,
)
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator, assemble_rhs
from deal_and_ceed_on_gpu_tpu.utils import oracle


def _poisson_setup(p=3, shape=(2, 2, 2), rule="gauss_lobatto"):
    mesh = BrickMesh(shape)
    space = FESpace.create(mesh, p, rule=rule, dtype=jnp.float64)
    op = PoissonOperator(space)
    b = assemble_rhs(space, 1.0)
    return mesh, space, op, b


def test_cg_matches_direct_solve():
    mesh, space, op, b = _poisson_setup()
    A = oracle.assemble_sparse(mesh, space.basis, "stiffness")
    mask = mesh.boundary_dof_mask(space.degree)
    A_eff = oracle.constrained_matrix(A, mask)
    x_direct = spla.spsolve(A_eff.tocsc(), np.asarray(b))

    control = SolverControl(500, 1e-12 * float(jnp.linalg.norm(b)))
    x, info = jax.jit(lambda b: solve_cg(op.vmult, b, control))(b)
    control.check({k: np.asarray(v) for k, v in info.items()})
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("deferred", [False, True])
def test_merged_cg_matches_standard(deferred):
    """Same system, both solvers: iteration counts equal, solutions equal —
    the reference's solver cross-check (bp5/step-64.cu:434-517)."""
    mesh, space, op, b = _poisson_setup(p=2, shape=(3, 3, 3))
    tol = 1e-10 * float(jnp.linalg.norm(b))
    control = SolverControl(500, tol)
    x_std, info_std = jax.jit(lambda b: solve_cg(op.vmult, b, control))(b)
    x_mrg, info_mrg = jax.jit(
        lambda b: solve_cg_merged(op.vmult, b, control, deferred_x_update=deferred)
    )(b)
    # identical Krylov spaces => same iteration count (+-1 for the residual
    # recurrence vs true-residual difference)
    assert abs(int(info_std["n_iterations"]) - int(info_mrg["n_iterations"])) <= 1
    np.testing.assert_allclose(np.asarray(x_std), np.asarray(x_mrg), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("max_steps", [1, 2, 3, 4, 5, 7, 8])
def test_merged_cg_deferred_x_correct_at_any_stop(max_steps):
    """The deferred two-step x update must leave x complete no matter the
    parity of the stopping iteration (update_c epilogue semantics)."""
    mesh, space, op, b = _poisson_setup(p=2, shape=(2, 2, 2))
    c = IterationNumberControl(max_steps, 0.0)
    x_plain, _ = solve_cg_merged(op.vmult, b, c, deferred_x_update=False)
    x_defer, _ = solve_cg_merged(op.vmult, b, c, deferred_x_update=True)
    np.testing.assert_allclose(
        np.asarray(x_plain), np.asarray(x_defer), rtol=1e-12, atol=1e-13
    )


def test_merged_cg_converges_to_direct():
    mesh, space, op, b = _poisson_setup(p=3, shape=(2, 2, 2))
    A = oracle.assemble_sparse(mesh, space.basis, "stiffness")
    mask = mesh.boundary_dof_mask(space.degree)
    A_eff = oracle.constrained_matrix(A, mask)
    x_direct = spla.spsolve(A_eff.tocsc(), np.asarray(b))
    control = SolverControl(500, 1e-12 * float(jnp.linalg.norm(b)))
    x, info = solve_cg_merged(op.vmult, b, control)
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-9, atol=1e-11)


def test_iteration_number_control_runs_fixed_count():
    # system big enough that 17 iterations don't fully converge
    mesh, space, op, b = _poisson_setup(p=3, shape=(3, 3, 3))
    c = IterationNumberControl(17, 0.0)
    _, info = solve_cg_merged(op.vmult, b, c)
    assert int(info["n_iterations"]) == 17
    c.check({k: np.asarray(v) for k, v in info.items()})  # success at max


def test_exact_convergence_stops_cleanly():
    """Once the residual hits exact zero the safe-divide recurrences stop the
    loop with res == 0 instead of the reference's ExcDivideByZero abort
    (bp5/solver.h:501)."""
    mesh, space, op, b = _poisson_setup(p=2, shape=(2, 2, 2))
    c = IterationNumberControl(1000, 0.0)
    x, info = solve_cg_merged(op.vmult, b, c)
    assert np.isfinite(np.asarray(x)).all()
    assert float(info["res_norm"]) == 0.0
    # and x is still the correct solution
    np.testing.assert_allclose(
        np.asarray(op.vmult(x)), np.asarray(b), rtol=1e-10, atol=1e-10
    )


@pytest.mark.parametrize("solver", [solve_cg, solve_cg_merged])
def test_reduction_control_stops_at_relative_reduction(solver):
    """ReductionControl must terminate on res <= reduction * res0 (deal.II
    semantics; the step-64 driver criterion) — it is wired through the
    solver loops via res0, not just an absolute tolerance."""
    from deal_and_ceed_on_gpu_tpu import ReductionControl

    mesh, space, op, b = _poisson_setup(p=3, shape=(3, 3, 3))
    c = ReductionControl(500, tolerance=0.0, reduction=1e-4)
    x, info = jax.jit(lambda b: solver(op.vmult, b, c))(b)
    res, res0 = float(info["res_norm"]), float(info["res0"])
    it = int(info["n_iterations"])
    assert res <= 1e-4 * res0
    assert it < 500  # stopped early, not at max_steps
    # one iteration earlier the residual was still above the threshold:
    # rerunning with a fixed count of it-1 must leave res > reduction*res0
    c_short = IterationNumberControl(it - 1, 0.0)
    _, info_short = jax.jit(lambda b: solver(op.vmult, b, c_short))(b)
    assert float(info_short["res_norm"]) > 1e-4 * res0
    c.check({k: np.asarray(v) for k, v in info.items()})


def test_jacobi_preconditioner_changes_nothing_for_identity_diag():
    mesh, space, op, b = _poisson_setup(p=2, shape=(2, 2, 2))
    control = SolverControl(500, 1e-10)
    x1, _ = solve_cg(op.vmult, b, control)
    x2, _ = solve_cg(op.vmult, b, control, diag=op.diagonal())
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-12)

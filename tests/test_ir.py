"""Mixed-precision iterative refinement: f32 inner CG + f64 true residuals."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator, assemble_rhs
from deal_and_ceed_on_gpu_tpu.solvers import solve_cg_ir
from deal_and_ceed_on_gpu_tpu.utils import oracle


def _ops(p=3, shape=(3, 3, 3)):
    mesh = BrickMesh(shape)
    s32 = FESpace.create(mesh, p, dtype=jnp.float32)
    s64 = FESpace.create(mesh, p, dtype=jnp.float64)
    return (
        mesh,
        s64,
        PoissonOperator(s32, backend="separable"),
        PoissonOperator(s64, backend="separable"),
    )


def test_ir_reaches_f64_accuracy():
    """f32 CG alone stagnates near 1e-4 true residual; refinement must
    reach the requested 1e-10 and match the f64 direct solve."""
    mesh, s64, op32, op64 = _ops()
    b = assemble_rhs(s64, 1.0)
    x, info = solve_cg_ir(op32, op64, b, rtol=1e-10)
    assert info["res_rel"] <= 1e-10
    assert 1 <= info["n_outer"] <= 10

    A = oracle.assemble_sparse(mesh, s64.basis, "stiffness")
    mask = mesh.boundary_dof_mask(s64.degree)
    A_eff = oracle.constrained_matrix(A, mask)
    x_direct = spla.spsolve(A_eff.tocsc(), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-8, atol=1e-10)

    # true residual independently verified in f64
    res = float(jnp.linalg.norm(b - op64.vmult(x)) / jnp.linalg.norm(b))
    assert res <= 1e-10


def test_ir_jitted_steps_are_cached():
    _, s64, op32, op64 = _ops(p=2, shape=(2, 2, 2))
    b = assemble_rhs(s64, 1.0)
    solve_cg_ir(op32, op64, b, rtol=1e-9)
    assert len(op32._ir_cache) == 1
    solve_cg_ir(op32, op64, b, rtol=1e-9)
    assert len(op32._ir_cache) == 1  # reused, not re-jitted


def test_ir_zero_rhs():
    _, s64, op32, op64 = _ops(p=2, shape=(2, 2, 2))
    x, info = solve_cg_ir(op32, op64, jnp.zeros((s64.n_dofs,), jnp.float64))
    assert float(jnp.abs(x).max()) == 0.0 and info["n_outer"] == 0


def test_ir_with_fdm_preconditioned_inner():
    """Callable preconditioner (FDM) routes through plain inner CG and
    slashes inner iteration counts on variable-coefficient systems."""
    from deal_and_ceed_on_gpu_tpu.models import HelmholtzOperator
    from deal_and_ceed_on_gpu_tpu.solvers import FDMSolver

    mesh = BrickMesh((3, 3, 3))
    s32 = FESpace.create(mesh, 3, rule="gauss", dtype=jnp.float32)
    s64 = FESpace.create(mesh, 3, rule="gauss", dtype=jnp.float64)
    op32 = HelmholtzOperator(s32, backend="structured")
    op64 = HelmholtzOperator(s64, backend="structured")
    b = assemble_rhs(s64, 1.0)

    x_j, info_j = solve_cg_ir(op32, op64, b, rtol=1e-10)
    x_f, info_f = solve_cg_ir(
        op32, op64, b, rtol=1e-10, diag32=FDMSolver(s32).apply
    )
    assert info_f["res_rel"] <= 1e-10
    assert info_f["n_inner"] < info_j["n_inner"] // 3
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_j), rtol=1e-8, atol=1e-10)

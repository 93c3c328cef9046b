"""Fused general-quadrature Pallas kernel (interpret mode on CPU) vs the
structured XLA backends, across rules (Gauss p+1 / p+2, GLL) and
geometries (uniform, graded, mapped)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.mesh import sine_map
from deal_and_ceed_on_gpu_tpu.models import (
    HelmholtzOperator,
    MassOperator,
    PoissonOperator,
)


def _compare(op, op_ref, n, seed=0, rtol=1e-12):
    u = jnp.asarray(np.random.default_rng(seed).standard_normal(n))
    want = np.asarray(op_ref.vmult(u))
    got = np.asarray(op.vmult(u))
    np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-12)


@pytest.mark.parametrize(
    "p,n_q,rule",
    [(2, 3, "gauss"), (3, 4, "gauss"), (2, 4, "gauss"), (3, 4, "gauss_lobatto")],
)
def test_general_poisson_uniform(p, n_q, rule):
    mesh = BrickMesh((3, 2, 4), upper=(1.0, 0.8, 1.3))
    space = FESpace.create(mesh, p, n_q=n_q, rule=rule, dtype=jnp.float64)
    op_ref = PoissonOperator(space, backend="structured")
    op = PoissonOperator(
        space, backend="pallas_general", pallas_opts=dict(interpret=True)
    )
    _compare(op, op_ref, space.n_dofs)


def test_general_poisson_graded():
    bx = np.array([0.0, 0.05, 0.2, 1.0])
    by = np.array([0.0, 0.3, 0.7, 1.2])
    bz = np.linspace(0.0, 1.0, 5)
    mesh = BrickMesh.graded(bx, by, bz)
    space = FESpace.create(mesh, 3, rule="gauss", dtype=jnp.float64)
    op_ref = PoissonOperator(space, backend="structured")
    op = PoissonOperator(
        space, backend="pallas_general", pallas_opts=dict(interpret=True)
    )
    _compare(op, op_ref, space.n_dofs)


def test_general_poisson_mapped():
    phi, jac = sine_map(0.08)
    mesh = BrickMesh((3, 3, 3)).deform(phi, jac)
    space = FESpace.create(mesh, 3, rule="gauss", dtype=jnp.float64)
    op_ref = PoissonOperator(space, backend="structured")
    op = PoissonOperator(
        space, backend="pallas_general", pallas_opts=dict(interpret=True)
    )
    _compare(op, op_ref, space.n_dofs)


@pytest.mark.parametrize("mapped", [False, True])
def test_general_helmholtz(mapped):
    mesh = BrickMesh((3, 3, 3))
    if mapped:
        phi, jac = sine_map(0.06)
        mesh = mesh.deform(phi, jac)
    space = FESpace.create(mesh, 3, rule="gauss", dtype=jnp.float64)
    op_ref = HelmholtzOperator(space, backend="structured")
    op = HelmholtzOperator(
        space, backend="pallas_general", pallas_opts=dict(interpret=True)
    )
    _compare(op, op_ref, space.n_dofs)


def test_general_mass_bp1():
    """BP1 configuration: full Gauss q = p+2 (rectangular interpolation)."""
    mesh = BrickMesh((3, 2, 3), upper=(1.0, 1.1, 0.9))
    space = FESpace.create(mesh, 2, n_q=4, rule="gauss", dtype=jnp.float64)
    op_ref = MassOperator(space, backend="structured")
    op = MassOperator(
        space, backend="pallas_general", pallas_opts=dict(interpret=True)
    )
    _compare(op, op_ref, space.n_dofs)


def test_general_fold_scale():
    mesh = BrickMesh((2, 2, 2))
    space = FESpace.create(mesh, 2, rule="gauss", dtype=jnp.float64)
    op = PoissonOperator(
        space, backend="pallas_general", pallas_opts=dict(interpret=True)
    )
    u = jnp.asarray(np.random.default_rng(3).standard_normal(space.n_dofs))
    before = np.asarray(op.vmult(u))
    op.fold_scale(0.5)
    after = np.asarray(op.vmult(u))
    mask = np.asarray(space.mesh.boundary_dof_mask(space.degree))
    np.testing.assert_allclose(after[mask], before[mask], rtol=0, atol=0)
    np.testing.assert_allclose(after[~mask], 0.5 * before[~mask], rtol=1e-13)


def test_general_solve_matches_structured():
    """Whole merged-CG solves on the general kernel (step-64 shape)."""
    from deal_and_ceed_on_gpu_tpu import SolverControl, solve_cg_merged
    from deal_and_ceed_on_gpu_tpu.models import assemble_rhs

    mesh = BrickMesh((4, 4, 4))
    space = FESpace.create(mesh, 3, rule="gauss", dtype=jnp.float64)
    op_ref = HelmholtzOperator(space, backend="structured")
    op = HelmholtzOperator(
        space, backend="pallas_general", pallas_opts=dict(interpret=True)
    )
    b = assemble_rhs(space, 1.0)
    control = SolverControl(300, 1e-12 * float(jnp.linalg.norm(b)))
    x_ref, info_ref = solve_cg_merged(op_ref.vmult, b, control)
    x, info = solve_cg_merged(op.vmult, b, control)
    assert abs(int(info["n_iterations"]) - int(info_ref["n_iterations"])) <= 1
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=1e-10, atol=1e-13
    )


def test_general_split3_precision_mode():
    """split3 (emulated bf16x3) stays within ~1e-5 of the exact apply and
    f64 spaces silently fall back to exact HIGHEST."""
    mesh = BrickMesh((3, 3, 3))
    space = FESpace.create(mesh, 3, rule="gauss", dtype=jnp.float32)
    op_ref = PoissonOperator(space, backend="structured")
    op = PoissonOperator(
        space,
        backend="pallas_general",
        pallas_opts=dict(interpret=True, precision="split3"),
    )
    u = jnp.asarray(
        np.random.default_rng(7).standard_normal(space.n_dofs), jnp.float32
    )
    want = np.asarray(op_ref.vmult(u), np.float64)
    got = np.asarray(op.vmult(u), np.float64)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 3e-5, rel

    sp64 = FESpace.create(mesh, 2, rule="gauss", dtype=jnp.float64)
    op64 = PoissonOperator(
        sp64,
        backend="pallas_general",
        pallas_opts=dict(interpret=True, precision="split3"),
    )
    assert op64._general.precision == jax.lax.Precision.HIGHEST

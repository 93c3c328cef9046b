"""Banded-separable Pallas kernel (``ops/pallas_banded.py``): interpret-mode
exactness against the XLA backends for every kind/quadrature/mesh combination
the kernel claims (any Gauss rule on uniform and graded bricks — the BP1-BP4
configurations, reference ``bp5/fe_evaluation_gl.h:192-250``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.models import (
    HelmholtzOperator,
    MassOperator,
    PoissonOperator,
)
from deal_and_ceed_on_gpu_tpu.ops.pallas_banded import (
    BandedLayout,
    build_banded_operator,
)


def _mesh(n_el, graded):
    if graded:
        rng = np.random.default_rng(7)
        bks = [
            np.cumsum(np.concatenate([[0.0], 0.6 + rng.random(m)]))
            for m in n_el
        ]
        return BrickMesh.graded(*bks)
    return BrickMesh(n_el)


def _oracle(space, kind, c):
    if kind == "mass":
        op = MassOperator(space, backend="separable")
        if c is not None:
            op.fold_scale(c)
        return op
    if c is not None:
        return HelmholtzOperator(
            space, backend="structured",
            coefficient_fn=lambda x: c + 0.0 * x[..., 0],
        )
    return PoissonOperator(space, backend="separable")


@pytest.mark.parametrize(
    "n_el,p,q,graded,kind,c",
    [
        ((4, 5, 6), 3, 5, False, "stiffness", None),
        ((4, 5, 6), 3, 4, True, "stiffness", 2.5),
        ((3, 4, 5), 5, 7, True, "stiffness", None),
        ((4, 5, 6), 2, 4, True, "mass", None),
        ((3, 4, 5), 4, 6, False, "mass", 3.0),
    ],
)
def test_banded_exact_vs_oracle(n_el, p, q, graded, kind, c):
    mesh = _mesh(n_el, graded)
    space = FESpace.create(mesh, p, n_q=q, rule="gauss", dtype=jnp.float64)
    op = build_banded_operator(
        mesh, space.basis, jnp.float64, kind=kind, value_const=c,
        interpret=True
    )
    oracle = _oracle(space, kind, c)
    u = np.random.default_rng(0).standard_normal(space.n_dofs)
    L = op.layout
    got = np.asarray(L.unpad_flat(op(L.pad_flat(jnp.asarray(u)))))
    # the kernel computes the constrained M A M only; vmult matches it on
    # free rows (identity rows are the epilogue's job)
    free = ~np.asarray(space.dirichlet_mask)
    want = np.asarray(oracle.vmult(jnp.asarray(u)))
    scale = np.abs(want[free]).max()
    assert np.abs(got[free] - want[free]).max() < 1e-11 * scale
    # constrained rows are exactly zero (mask baked into the 1D factors)
    assert np.abs(got[~free]).max() == 0.0


@pytest.mark.parametrize("bp", ["bp1", "bp3"])
def test_bp_operator_pallas_backend(bp):
    """backend="pallas" on the Gauss-rule BPs routes to the banded kernel;
    operator-level vmult (incl. the constrained epilogue) matches the
    separable oracle on GLOBAL vectors, and a merged-CG solve in the
    padded layout matches the separable solve."""
    from deal_and_ceed_on_gpu_tpu.models import assemble_rhs, make_bp_operator
    from deal_and_ceed_on_gpu_tpu.solvers import (
        IterationNumberControl,
        solve_cg_merged,
    )

    mesh = BrickMesh((4, 4, 4))
    _, op_ref = make_bp_operator(bp, mesh, 3, dtype=jnp.float64)
    space, op = make_bp_operator(bp, mesh, 3, dtype=jnp.float64,
                                 backend="pallas")
    op._stencil.interpret = True
    u = jnp.asarray(np.random.default_rng(2).standard_normal(space.n_dofs))
    np.testing.assert_allclose(
        np.asarray(op.vmult(u)), np.asarray(op_ref.vmult(u)),
        rtol=1e-12, atol=1e-12,
    )
    b = assemble_rhs(space, 1.0)
    ctl = IterationNumberControl(25, 1e-12 * float(jnp.linalg.norm(b)))
    x_ref, _ = solve_cg_merged(op_ref.vmult, b, ctl)
    L = op.layout
    xp, _ = solve_cg_merged(op.vmult_padded, L.pad_flat(b), ctl)
    np.testing.assert_allclose(
        np.asarray(L.unpad_flat(xp)), np.asarray(x_ref), rtol=1e-10,
        atol=1e-10 * float(jnp.linalg.norm(x_ref)),
    )


def test_banded_fold_scale_and_auto_opts():
    mesh = BrickMesh((4, 4, 4))
    space = FESpace.create(mesh, 3, n_q=5, rule="gauss", dtype=jnp.float64)
    opts = BandedLayout.auto_opts(mesh, 3, jnp.float64)
    assert set(opts) <= {"block_z", "block_y", "sub_y", "vmem_limit_bytes"}
    op = build_banded_operator(mesh, space.basis, jnp.float64, interpret=True)
    u = jnp.asarray(np.random.default_rng(1).standard_normal(space.n_dofs))
    L = op.layout
    up = L.pad_flat(u)
    before = op(up)
    op.fold_scale(2.5)
    after = op(up)
    np.testing.assert_allclose(
        np.asarray(after), 2.5 * np.asarray(before), rtol=1e-13, atol=1e-13
    )


@pytest.mark.parametrize("bp", ["bp2", "bp4"])
def test_stacked_banded_vector_bp(bp):
    """BP2/BP4 (vector mass/stiffness, Gauss q=p+2) ride ONE stacked
    banded kernel launch: vmult on global [3, n] vectors matches the
    per-component separable oracle, and a padded-layout merged-CG solve
    matches the oracle solve."""
    from deal_and_ceed_on_gpu_tpu.models import assemble_rhs, make_bp_operator
    from deal_and_ceed_on_gpu_tpu.models.vector import VectorOperator
    from deal_and_ceed_on_gpu_tpu.ops.pallas_banded import (
        StackedBandedOperator,
    )
    from deal_and_ceed_on_gpu_tpu.solvers import (
        IterationNumberControl,
        solve_cg_merged,
    )

    mesh = BrickMesh((3, 4, 5))
    _, op_ref = make_bp_operator(bp, mesh, 3, dtype=jnp.float64)
    space, vop = make_bp_operator(bp, mesh, 3, dtype=jnp.float64,
                                  backend="pallas")
    assert isinstance(vop._stacked, StackedBandedOperator)
    vop._stacked.interpret = True
    vop.scalar_op._stencil.interpret = True

    u = jnp.asarray(
        np.random.default_rng(4).standard_normal((3, space.n_dofs))
    )
    want = np.asarray(op_ref.vmult(u))
    up = vop.pad_flat(u)
    got = np.asarray(vop.unpad_flat(vop.vmult_padded(up)))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    b = jnp.stack([assemble_rhs(space, float(c + 1)) for c in range(3)])
    # both solves run to 1e-12: the two operators are bitwise-different
    # f64 evaluations, so mid-flight iterates diverge at ~1e-7 — only the
    # CONVERGED solutions are comparable
    ctl = IterationNumberControl(120, 1e-12 * float(jnp.linalg.norm(b)))
    x_ref, _ = solve_cg_merged(op_ref.vmult, b, ctl)
    xp, _ = solve_cg_merged(vop.vmult_padded, vop.pad_flat(b), ctl)
    np.testing.assert_allclose(
        np.asarray(vop.unpad_flat(xp)), np.asarray(x_ref), rtol=1e-9,
        atol=1e-10 * float(jnp.linalg.norm(x_ref)),
    )

    # fold_scale scales all Kronecker terms exactly once. Contract
    # (models/operator_base.py fold_scale): unconstrained rows scale by s,
    # Dirichlet identity rows are UNAFFECTED — the stacked banded kernel
    # enforces the identity in-kernel, so constrained rows return src.
    before = np.asarray(vop.vmult_padded(up))
    vop._stacked.fold_scale(2.0)
    after = np.asarray(vop.vmult_padded(up))
    free_ind = jnp.tile(
        (~space.dirichlet_mask).astype(space.dtype)[None, :], (3, 1)
    )
    freep = np.asarray(vop.pad_flat(free_ind)) > 0.5
    free = freep & (before != 0)
    np.testing.assert_allclose(after[free] / before[free], 2.0, rtol=1e-13)
    con = (~freep) & (before != 0)
    np.testing.assert_allclose(after[con], before[con], rtol=0, atol=0)

"""Q-grid streaming kernel (ops/pallas_qgrid.py, interpret mode): the
general-quadrature/general-geometry cell loop WITHOUT element-major
layout, vs the structured XLA oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.models import (
    HelmholtzOperator,
    MassOperator,
    PoissonOperator,
)
from deal_and_ceed_on_gpu_tpu.ops.pallas_qgrid import build_qgrid_operator


def _mapped(shape):
    mesh = BrickMesh(shape)
    amp = 0.08

    def mapping(x):
        return x + amp * np.stack(
            [
                np.sin(np.pi * x[..., 1]) * np.sin(np.pi * x[..., 2]),
                np.sin(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 2]),
                np.sin(np.pi * x[..., 0]) * np.sin(np.pi * x[..., 1]),
            ],
            axis=-1,
        )

    def jac(x):
        pi = np.pi
        c = amp * pi
        s0, c0 = np.sin(pi * x[..., 0]), np.cos(pi * x[..., 0])
        s1, c1 = np.sin(pi * x[..., 1]), np.cos(pi * x[..., 1])
        s2, c2 = np.sin(pi * x[..., 2]), np.cos(pi * x[..., 2])
        J = np.zeros(x.shape[:-1] + (3, 3))
        J[..., 0, 0] = 1.0
        J[..., 0, 1] = c * c1 * s2
        J[..., 0, 2] = c * s1 * c2
        J[..., 1, 0] = c * c0 * s2
        J[..., 1, 1] = 1.0
        J[..., 1, 2] = c * s0 * c2
        J[..., 2, 0] = c * c0 * s1
        J[..., 2, 1] = c * s0 * c1
        J[..., 2, 2] = 1.0
        return J

    return mesh.deform(mapping, jac)


def _apply_cell_loop(op, u):
    """The raw (unconstrained) cell loop of a MatrixFreeOperator."""
    return np.asarray(op.apply_cell_loop(jnp.asarray(u)))


CASES = [
    # (mesh kind, shape, p, q_off, grad?, val?)
    ("uniform", (3, 9, 5), 3, 1, "grad", None),       # BP3-like q=p+1
    ("uniform", (2, 10, 7), 2, 2, "grad", None),      # q=p+2
    ("graded", (3, 9, 5), 3, 1, "grad", None),        # diag3 stream
    ("uniform", (3, 9, 5), 3, 1, None, "table"),      # varying a(x) mass
    ("uniform", (2, 9, 4), 3, 1, "grad", "table"),    # step-64-native
    ("mapped", (3, 9, 5), 3, 1, "grad", None),        # full6 stream
    ("uniform", (2, 17, 4), 5, 2, "grad", None),      # p=5 q=7, 2 y blocks
    ("mapped", (2, 9, 4), 2, 1, "grad", "dettab"),    # mapped + c*det table
    ("uniform", (2, 9, 4), 2, 1, "grad", "const"),    # uniform + const val
]


def _make(kind, shape):
    if kind == "uniform":
        return BrickMesh(shape, upper=(1.0, 0.9, 1.2))
    if kind == "graded":
        rng = np.random.default_rng(3)
        bks = [
            np.cumsum(np.concatenate([[0.0], 0.6 + rng.random(m)]))
            for m in shape
        ]
        return BrickMesh.graded(*bks)
    return _mapped(shape)


@pytest.mark.parametrize("kind,shape,p,qoff,grad,val", CASES)
def test_qgrid_matches_structured(kind, shape, p, qoff, grad, val):
    mesh = _make(kind, shape)
    space = FESpace.create(
        mesh, p, n_q=p + 1 + qoff, rule="gauss", dtype=jnp.float64
    )
    geo = space.geometry
    w3 = np.asarray(geo.w3d).reshape(-1)

    gspec = vspec = None
    a_fn = lambda x: 3.0 + x[..., 0] + 0.5 * x[..., 1] * x[..., 2]  # noqa
    if grad:
        if geo.uniform:
            gspec = ("const", geo.const_merged_diag)
        elif not geo.mapped:
            C = geo.merged_coef_full()[:, :, (0, 3, 5)] / w3[None, :, None]
            gspec = ("diag3", C)
        else:
            gspec = ("full6", geo.merged_coef_full() / w3[None, :, None])
    if val == "table":
        xq = geo.q_points_phys()
        a_det = np.asarray(a_fn(xq)) * geo.det_q_full()
        vspec = ("table", a_det)
    elif val == "dettab":
        # constant coefficient on a mapped mesh: det varies per qpoint,
        # so it rides the table mode (const requires uniform metric)
        vspec = ("table", 2.0 * geo.det_q_full())
    elif val == "const":
        vspec = ("const", 2.0 * geo.det_j)

    qop = build_qgrid_operator(
        mesh, space.basis, jnp.float64, grad=gspec, val=vspec, interpret=True
    )
    L = qop.layout

    # oracle: structured backend cell loops
    if grad and val is None:
        ref = PoissonOperator(space, backend="structured")
        oracle = lambda u: _apply_cell_loop(ref, u)  # noqa: E731
    elif grad and val == "table":
        ref = HelmholtzOperator(
            space, backend="structured", coefficient_fn=a_fn
        )
        oracle = lambda u: _apply_cell_loop(ref, u)  # noqa: E731
    elif grad and val in ("const", "dettab"):
        refp = PoissonOperator(space, backend="structured")
        refm = MassOperator(space, backend="structured")
        oracle = lambda u: _apply_cell_loop(refp, u) + 2.0 * _apply_cell_loop(  # noqa: E731
            refm, u
        )
    else:  # val table only: mass with varying coefficient
        refm = MassOperator(space, backend="structured")
        xq = geo.q_points_phys()
        # structured mass has no varying-a mode: assemble via Helmholtz
        # minus Poisson
        refh = HelmholtzOperator(
            space, backend="structured", coefficient_fn=a_fn
        )
        refp = PoissonOperator(space, backend="structured")
        oracle = lambda u: _apply_cell_loop(refh, u) - _apply_cell_loop(  # noqa: E731
            refp, u
        )

    rng = np.random.default_rng(0)
    u = rng.standard_normal(space.n_dofs)
    want = oracle(u)
    up = L.pad_flat(jnp.asarray(u))
    got = np.asarray(L.unpad_flat(qop(up)))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12 * scale)


@pytest.mark.parametrize("kind", ["uniform", "mapped"])
def test_qgrid_constrained_matches_vmult(kind):
    """constrained_call == the full constrained operator (M A M +
    identity rows), matching PoissonOperator.vmult with Dirichlet
    handling, entirely in-kernel."""
    mesh = _make(kind, (3, 9, 5))
    p = 3
    space = FESpace.create(mesh, p, n_q=p + 1, rule="gauss", dtype=jnp.float64)
    geo = space.geometry
    w3 = np.asarray(geo.w3d).reshape(-1)
    if geo.uniform:
        gspec = ("const", geo.const_merged_diag)
    else:
        gspec = ("full6", geo.merged_coef_full() / w3[None, :, None])
    qop = build_qgrid_operator(
        mesh, space.basis, jnp.float64, grad=gspec, interpret=True
    )
    L = qop.layout
    ref = PoissonOperator(space, backend="structured")
    u = np.random.default_rng(2).standard_normal(space.n_dofs)
    want = np.asarray(ref.vmult(jnp.asarray(u)))
    up = L.pad_flat(jnp.asarray(u))
    outp = qop.constrained_call(up)
    got = np.asarray(L.unpad_flat(outp))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12 * scale)
    # the zero-padding invariant: every pad entry of the output is zero
    grid = np.asarray(outp).reshape(L.padded_shape)
    nz, ny, nx = L.real_shape
    assert not np.any(grid[nz:]) and not np.any(grid[:, ny:])
    assert not np.any(grid[:, :, nx:])


def test_qgrid_operator_backend():
    """backend="pallas_qgrid" on the three operator models: vmult (flat
    AND padded) matches the structured backend; a padded-layout merged-CG
    solve matches the structured solve."""
    from deal_and_ceed_on_gpu_tpu.models import assemble_rhs
    from deal_and_ceed_on_gpu_tpu.solvers import (
        IterationNumberControl,
        solve_cg_merged,
    )

    mesh = _mapped((3, 9, 4))
    p = 3
    space = FESpace.create(mesh, p, n_q=p + 1, rule="gauss", dtype=jnp.float64)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal(space.n_dofs))
    for cls, kw in (
        (PoissonOperator, {}),
        (HelmholtzOperator, {}),
        (MassOperator, {}),
    ):
        ref = cls(space, backend="structured", **kw)
        qop = cls(space, backend="pallas_qgrid",
                  pallas_opts=dict(interpret=True), **kw)
        want = np.asarray(ref.vmult(u))
        got = np.asarray(qop.vmult(u))
        scale = np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12 * scale)
        L = qop.layout
        gotp = np.asarray(L.unpad_flat(qop.vmult_padded(L.pad_flat(u))))
        np.testing.assert_allclose(gotp, want, rtol=0, atol=1e-12 * scale)

    # whole solve in the padded layout (Poisson)
    ref = PoissonOperator(space, backend="structured")
    qop = PoissonOperator(space, backend="pallas_qgrid",
                          pallas_opts=dict(interpret=True))
    b = assemble_rhs(space, 1.0)
    ctl = IterationNumberControl(80, 1e-10 * float(jnp.linalg.norm(b)))
    x_ref, info_ref = solve_cg_merged(ref.vmult, b, ctl)
    L = qop.layout
    xp, info = solve_cg_merged(qop.vmult_padded, L.pad_flat(b), ctl)
    assert int(info["n_iterations"]) == int(info_ref["n_iterations"])
    np.testing.assert_allclose(
        np.asarray(L.unpad_flat(xp)), np.asarray(x_ref), rtol=1e-9,
        atol=1e-10 * float(jnp.linalg.norm(x_ref)),
    )


def test_qgrid_fold_scale():
    mesh = BrickMesh((2, 9, 4))
    space = FESpace.create(mesh, 2, n_q=4, rule="gauss", dtype=jnp.float64)
    geo = space.geometry
    qop = build_qgrid_operator(
        mesh, space.basis, jnp.float64,
        grad=("const", geo.const_merged_diag), interpret=True,
    )
    L = qop.layout
    u = np.random.default_rng(1).standard_normal(space.n_dofs)
    up = L.pad_flat(jnp.asarray(u))
    before = np.asarray(qop(up))
    qop.fold_scale(2.5)
    after = np.asarray(qop(up))
    np.testing.assert_allclose(after, 2.5 * before, rtol=1e-13, atol=1e-13)

"""Fused-kernel merged CG (ops/pallas_cg.py + solvers/cg_fused.py).

Interpret-mode (CPU) checks against the XLA merged solver — the same
cross-solver verification the reference uses between ``SolverCG`` and
``SolverCGFullMerge`` (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import (
    BrickMesh,
    FESpace,
    IterationNumberControl,
    ReductionControl,
    solve_cg_merged,
    solve_cg_fused,
)
from deal_and_ceed_on_gpu_tpu.models import HelmholtzOperator, PoissonOperator

OPTS = dict(interpret=True, block_z=8, block_y=16)


def _setup(op_cls=PoissonOperator, shape=(6, 5, 7), p=3, **kw):
    mesh = BrickMesh(shape)
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float32)
    op = op_cls(space, backend="pallas", pallas_opts=OPTS, **kw)
    rng = np.random.default_rng(0)
    b = op.layout.pad_flat(
        jnp.asarray(rng.standard_normal(space.n_dofs), jnp.float32)
    )
    return op, b


def test_step_matches_constrained_vmult():
    """alpha=beta=0 step: d=-g, h=A(-g), bitwise vs constrained_vmult."""
    op, b = _setup()
    step = op.fused_cg_step
    z = jnp.zeros_like(b)
    s = step.stack_state(z, -b, z, z)
    s2, dots = step(s, jnp.zeros_like(s), jnp.zeros(3, jnp.float32))
    href = op.vmult_padded(b)
    assert jnp.max(jnp.abs(step.unstack(s2, 2) - href)) == 0.0
    assert jnp.max(jnp.abs(step.unstack(s2, 0) - b)) == 0.0
    d4 = np.asarray(jnp.sum(dots[:4], axis=1))
    ref = [
        float(jnp.vdot(b, href)),
        float(jnp.vdot(href, href)),
        float(jnp.vdot(-b, href)),
        float(jnp.vdot(b, b)),
    ]
    np.testing.assert_allclose(d4, ref, rtol=1e-5)


def test_solver_matches_xla_merged():
    op, b = _setup()
    ctrl = IterationNumberControl(30, 0.0)
    x_ref, info_ref = solve_cg_merged(op.vmult_padded, b, ctrl)
    x_f, info_f = solve_cg_fused(op, b, ctrl)
    assert int(info_f["n_iterations"]) == int(info_ref["n_iterations"])
    np.testing.assert_allclose(
        float(info_f["res_norm"]), float(info_ref["res_norm"]), rtol=1e-5
    )
    err = float(jnp.linalg.norm(x_f - x_ref)) / float(jnp.linalg.norm(x_ref))
    assert err < 1e-5


def test_solver_reduction_control():
    """Tolerance-based stopping matches the XLA solver's iteration count."""
    op, b = _setup(shape=(4, 4, 4), p=2)
    ctrl = ReductionControl(200, 0.0, 1e-6)
    x_ref, info_ref = solve_cg_merged(op.vmult_padded, b, ctrl)
    x_f, info_f = solve_cg_fused(op, b, ctrl)
    assert abs(int(info_f["n_iterations"]) - int(info_ref["n_iterations"])) <= 1
    r = op.vmult_padded(x_f) - b
    rel = float(jnp.linalg.norm(r)) / float(jnp.linalg.norm(b))
    assert rel < 2e-6


def test_solver_x0():
    op, b = _setup(shape=(4, 4, 4), p=2)
    ctrl = IterationNumberControl(25, 0.0)
    x0 = 0.3 * b
    x_ref, _ = solve_cg_merged(op.vmult_padded, b, ctrl, x0=x0)
    x_f, _ = solve_cg_fused(op, b, ctrl, x0=x0)
    err = float(jnp.linalg.norm(x_f - x_ref)) / float(jnp.linalg.norm(x_ref))
    assert err < 1e-5


def test_solver_helmholtz_value_term():
    """The streamed a(x) value coefficient rides through the fused kernel."""
    op, b = _setup(op_cls=HelmholtzOperator, shape=(5, 4, 6), p=3)
    ctrl = IterationNumberControl(25, 0.0)
    x_ref, info_ref = solve_cg_merged(op.vmult_padded, b, ctrl)
    x_f, info_f = solve_cg_fused(op, b, ctrl)
    assert int(info_f["n_iterations"]) == int(info_ref["n_iterations"])
    err = float(jnp.linalg.norm(x_f - x_ref)) / float(jnp.linalg.norm(x_ref))
    assert err < 1e-5


def test_solver_bf16_stream():
    """bf16-streaming state: residuals track the f32 solve loosely."""
    mesh = BrickMesh((6, 5, 7))
    space = FESpace.create(mesh, 3, rule="gauss_lobatto", dtype=jnp.float32)
    op = PoissonOperator(
        space, backend="pallas",
        pallas_opts=dict(OPTS, stream_dtype="bfloat16"),
    )
    rng = np.random.default_rng(0)
    b = op.layout.pad_flat(
        jnp.asarray(rng.standard_normal(space.n_dofs), jnp.float32)
    )
    ctrl = IterationNumberControl(20, 0.0)
    x_ref, info_ref = solve_cg_merged(
        op.vmult_padded, b, ctrl, dot_dtype=jnp.float32
    )
    x_f, info_f = solve_cg_fused(op, b, ctrl)
    # bf16 rounding diverges the trajectories; solutions agree loosely
    err = float(
        jnp.linalg.norm((x_f - x_ref).astype(jnp.float32))
    ) / float(jnp.linalg.norm(x_ref.astype(jnp.float32)))
    assert err < 0.05


def test_merged_donated_vmult_matches():
    """solve_cg_merged with A_donate (bare kernel, donated h buffer, no
    strip/face epilogue) matches the constrained-vmult solve when b is
    zero on the Dirichlet set — the solve-mode fast path bench.py uses."""
    mesh = BrickMesh((6, 5, 7))
    space = FESpace.create(mesh, 3, rule="gauss_lobatto", dtype=jnp.float32)
    op = PoissonOperator(space, backend="pallas", pallas_opts=OPTS)
    L = op.layout
    rng = np.random.default_rng(0)
    b0 = space.zero_constrained_values(
        jnp.asarray(rng.standard_normal(space.n_dofs), jnp.float32)
    )
    b = L.pad_flat(b0)
    ctrl = IterationNumberControl(30, 0.0)
    x_ref, ir = solve_cg_merged(op.vmult_padded, b, ctrl)
    x_d, idn = solve_cg_merged(op.vmult_padded, b, ctrl, A_donate=op.vmult_free)
    np.testing.assert_allclose(
        float(idn["res_norm"]), float(ir["res_norm"]), rtol=1e-5
    )
    xr, xd = L.unpad_flat(x_ref), L.unpad_flat(x_d)
    err = float(jnp.linalg.norm(xd - xr)) / float(jnp.linalg.norm(xr))
    assert err < 1e-5


def test_fold_scale_rebuilds_step():
    op, _ = _setup(shape=(4, 4, 4), p=2)
    space = op.space
    rng = np.random.default_rng(1)
    # zero Dirichlet rows: CG iterates are then exactly scale-equivariant
    # (nonzero face values ride the UNSCALED identity rows and break it)
    b0 = space.zero_constrained_values(
        jnp.asarray(rng.standard_normal(space.n_dofs), jnp.float32)
    )
    b = op.layout.pad_flat(b0)
    step0 = op.fused_cg_step
    x1, _ = solve_cg_fused(op, b, IterationNumberControl(10, 0.0))
    op.fold_scale(2.0)
    assert op.fused_cg_step is not step0
    # A -> 2A: solving 2A x = b halves the iterates
    x2, _ = solve_cg_fused(op, b, IterationNumberControl(10, 0.0))
    np.testing.assert_allclose(
        np.asarray(x2), np.asarray(x1) / 2.0, rtol=1e-4, atol=1e-6
    )

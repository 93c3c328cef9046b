"""Fused Pallas stencil kernel (interpret mode on CPU) vs the jnp backends."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator


@pytest.mark.parametrize(
    "shape,p",
    [((2, 3, 4), 2), ((2, 2, 2), 5), ((4, 4, 8), 2), ((8, 4, 10), 3), ((2, 2, 2), 8)],
)
def test_pallas_vmult_matches_separable(shape, p):
    mesh = BrickMesh(shape, upper=(1.0, 0.8, 1.3))
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    op_ref = PoissonOperator(space, backend="separable")
    op = PoissonOperator(space, backend="pallas")
    op._stencil.interpret = True
    u = jnp.asarray(np.random.default_rng(0).standard_normal(space.n_dofs))
    want = np.asarray(op_ref.vmult(u))
    got = np.asarray(op.vmult(u))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)


def test_pallas_padded_layout_invariants():
    """Zero padding must survive a vmult on padded vectors, and the padded
    path must agree with pad(vmult(unpadded))."""
    mesh = BrickMesh((4, 2, 6))
    p = 3
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    op = PoissonOperator(space, backend="pallas")
    op._stencil.interpret = True
    L = op.layout
    u = jnp.asarray(np.random.default_rng(1).standard_normal(space.n_dofs))
    up = L.pad_flat(u)
    out_p = op.vmult_padded(up)
    # padding stays exactly zero
    mask = np.asarray(L.dirichlet_mask_padded(mesh)).reshape(L.padded_shape)
    dead = np.ones(L.padded_shape, dtype=bool)
    dead[L.p : L.p + L.real_shape[0], 8 : 8 + L.real_shape[1], : L.real_shape[2]] = False
    np.testing.assert_array_equal(np.asarray(out_p).reshape(L.padded_shape)[dead], 0.0)
    # consistency with the unpadded API
    np.testing.assert_allclose(
        np.asarray(L.unpad_flat(out_p)), np.asarray(op.vmult(u)), atol=1e-14
    )


def test_full_cg_solve_in_padded_layout():
    """Whole merged-CG solves run on padded vectors with the pallas vmult:
    zero padding is an invariant of every solver update, so the result
    matches the unpadded separable solve exactly (up to fp ordering)."""
    from deal_and_ceed_on_gpu_tpu import SolverControl, solve_cg_merged
    from deal_and_ceed_on_gpu_tpu.models import assemble_rhs
    from deal_and_ceed_on_gpu_tpu.solvers import solve_cg as _solve_cg

    mesh = BrickMesh((3, 3, 3))
    space = FESpace.create(mesh, 2, rule="gauss_lobatto", dtype=jnp.float64)
    op_ref = PoissonOperator(space, backend="separable")
    op = PoissonOperator(space, backend="pallas")
    op._stencil.interpret = True
    b = assemble_rhs(space, 1.0)
    control = SolverControl(300, 1e-11 * float(jnp.linalg.norm(b)))

    x_ref, info_ref = solve_cg_merged(op_ref.vmult, b, control)

    L = op.layout
    bp = L.pad_flat(b)
    xp, info = solve_cg_merged(op.vmult_padded, bp, control)
    # fp-ordering differences between backends may flip the final iteration
    assert abs(int(info["n_iterations"]) - int(info_ref["n_iterations"])) <= 1
    # padding stayed zero through the whole solve
    x3 = np.asarray(xp).reshape(L.padded_shape)
    dead = np.ones(L.padded_shape, dtype=bool)
    nz, ny, nx = L.real_shape
    dead[L.p : L.p + nz, 8 : 8 + ny, :nx] = False
    np.testing.assert_array_equal(x3[dead], 0.0)
    np.testing.assert_allclose(
        np.asarray(L.unpad_flat(xp)), np.asarray(x_ref), rtol=1e-9, atol=1e-12
    )

    # active-region solves (updates + dots skip the dead z/y padding):
    # same iterates up to summation order, padding still exactly zero
    for solver in (solve_cg_merged, _solve_cg):
        xa, info_a = solver(
            op.vmult_padded, bp, control, active=L.active_spec()
        )
        assert abs(int(info_a["n_iterations"]) - int(info_ref["n_iterations"])) <= 1
        xa3 = np.asarray(xa).reshape(L.padded_shape)
        np.testing.assert_array_equal(xa3[dead], 0.0)
        np.testing.assert_allclose(
            np.asarray(L.unpad_flat(xa)), np.asarray(x_ref), rtol=1e-9, atol=1e-12
        )


def test_auto_opts_invariants_and_kernel():
    """StencilLayout.auto_opts picks valid tiles (BZ >= 2p, BY a multiple
    of 8, VMEM estimate under budget) whose traffic proxy never exceeds
    the constructor defaults', and a kernel built at a non-default BZ
    (24, the cycle-33 auto pick) matches the separable backend."""
    from deal_and_ceed_on_gpu_tpu.ops.pallas_stencil import (
        YOFF,
        StencilLayout,
    )

    for shape, p in [((96, 32, 32), 5), ((8, 8, 8), 5), ((4, 4, 4), 3)]:
        mesh = BrickMesh(shape)
        opts = StencilLayout.auto_opts(mesh, p)
        bz = opts.get("block_z", 16)
        by = opts.get("block_y")
        assert bz >= 2 * p and bz % 8 == 0
        if by is not None:
            assert by % 8 == 0
        # proxy(auto) <= proxy(defaults): build both layouts, compare
        # padded totals weighted by the y-halo read amplification
        basis = FESpace.create(
            BrickMesh((2, 2, 2)), p, rule="gauss_lobatto", dtype=jnp.float64
        ).basis

        def proxy(L):
            zt, yt, _ = L.padded_shape
            return zt * yt * (1.0 + (L.BY + 2 * YOFF) / L.BY)

        La = StencilLayout(mesh, basis, jnp.float64, **{
            k: v for k, v in opts.items() if k != "vmem_limit_bytes"
        })
        Ld = StencilLayout(mesh, basis, jnp.float64)
        assert proxy(La) <= proxy(Ld) * (1 + 1e-12)

    # the BZ=24 tile path in the actual kernel (interpret mode)
    mesh = BrickMesh((4, 3, 6), upper=(1.0, 0.9, 1.4))
    space = FESpace.create(mesh, 5, rule="gauss_lobatto", dtype=jnp.float64)
    op_ref = PoissonOperator(space, backend="separable")
    op = PoissonOperator(
        space, backend="pallas", pallas_opts=dict(block_z=24, block_y=32)
    )
    op._stencil.interpret = True
    u = jnp.asarray(np.random.default_rng(2).standard_normal(space.n_dofs))
    np.testing.assert_allclose(
        np.asarray(op.vmult(u)), np.asarray(op_ref.vmult(u)),
        rtol=1e-13, atol=1e-13,
    )


@pytest.mark.parametrize("shape,p", [((4, 4, 8), 2), ((2, 2, 2), 5)])
def test_pallas_bf16_streaming(shape, p):
    """stream_dtype=bfloat16 halves the kernel's HBM traffic while keeping
    the VMEM window/tables at f32; the result must match the f32 operator
    to bf16 rounding (inputs AND outputs are rounded once each)."""
    mesh = BrickMesh(shape, upper=(1.0, 0.8, 1.3))
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float32)
    op32 = PoissonOperator(space, backend="pallas")
    op32._stencil.interpret = True
    opbf = PoissonOperator(
        space, backend="pallas", pallas_opts=dict(stream_dtype=jnp.bfloat16)
    )
    opbf._stencil.interpret = True
    Lb = opbf.layout
    u = jnp.asarray(
        np.random.default_rng(2).standard_normal(space.n_dofs), dtype=jnp.float32
    )
    want = np.asarray(op32.vmult(u), dtype=np.float64)
    ub = Lb.pad_flat(u)
    assert ub.dtype == jnp.bfloat16
    got = np.asarray(
        Lb.unpad_flat(opbf.vmult_padded(ub)), dtype=np.float64
    )
    scale = max(1e-30, float(np.abs(want).max()))
    assert np.max(np.abs(got - want)) / scale < 3e-2
    # padding invariant survives in the narrow layout too
    outp = np.asarray(opbf.vmult_padded(ub)).reshape(Lb.padded_shape)
    dead = np.ones(Lb.padded_shape, dtype=bool)
    dead[
        Lb.p : Lb.p + Lb.real_shape[0], 8 : 8 + Lb.real_shape[1], : Lb.real_shape[2]
    ] = False
    np.testing.assert_array_equal(outp[dead], 0.0)


def test_pallas_bf16_streaming_ir_recovers_f64():
    """A bf16-streaming inner operator inside iterative refinement still
    converges the f64 residual: the outer loop measures true residuals with
    the exact separable f64 operator, the bf16 inner CG only needs ~1-2
    digits of reduction per cycle."""
    from deal_and_ceed_on_gpu_tpu import ReductionControl, solve_cg_merged
    from deal_and_ceed_on_gpu_tpu.models import assemble_rhs

    mesh = BrickMesh((3, 3, 3))
    p = 3
    space64 = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float64)
    op64 = PoissonOperator(space64, backend="separable")
    b = assemble_rhs(space64)
    bnorm = float(jnp.linalg.norm(b))

    space32 = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float32)
    opbf = PoissonOperator(
        space32, backend="pallas", pallas_opts=dict(stream_dtype=jnp.bfloat16)
    )
    opbf._stencil.interpret = True
    Lb = opbf.layout
    ctrl = ReductionControl(
        80, tolerance=0.0, reduction=3e-2, success_on_max_steps=True
    )

    x = jnp.zeros_like(b)
    res = 1.0
    for _ in range(12):
        r = b - op64.vmult(x)
        res = float(jnp.linalg.norm(r)) / bnorm
        if res <= 1e-10:
            break
        ep, _ = solve_cg_merged(
            opbf.vmult_padded,
            Lb.pad_flat(r.astype(jnp.float32)),
            ctrl,
            dot_dtype=jnp.float32,
        )
        x = x + Lb.unpad_flat(ep).astype(jnp.float64)
    assert res <= 1e-10

"""Distributed adaptive multigrid (parallel/dist_adaptive_mg.py).

Every SPMD piece must match the single-device global-coarsening MG
bit-tight: transfers (including the manual transpose vs
``jax.linear_transpose``), the full V-cycle, and MG-CG solves (same
iteration counts, 1e-10 agreement) — level-independent convergence on
hanging-node meshes over the device mesh, which the reference (Jacobi-CG
only, `bp5/step-64.cu:428-432`) does not reach.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from deal_and_ceed_on_gpu_tpu import BrickMesh, ReductionControl, solve_cg
from deal_and_ceed_on_gpu_tpu.adaptive import (
    AdaptiveMesh,
    AdaptivePoissonOperator,
    AdaptiveSpace,
    assemble_rhs_adaptive,
)
from deal_and_ceed_on_gpu_tpu.parallel.dist_adaptive import (
    AdaptivePartition,
    make_device_mesh_1d,
)
from deal_and_ceed_on_gpu_tpu.parallel.dist_adaptive_mg import (
    DistAdaptiveMultigrid,
    solve_cg_mg_dist_adaptive,
)
from deal_and_ceed_on_gpu_tpu.solvers import AdaptiveMultigrid


def _space(p=2):
    amesh = AdaptiveMesh.refine(BrickMesh((2, 2, 2)), (0, 7))
    child = int(np.flatnonzero(amesh.levels == 1)[0])
    return AdaptiveSpace(amesh.refine_active((child,)), p)


def _mg_pair(space, n_shards):
    op = AdaptivePoissonOperator(space)
    single = AdaptiveMultigrid(space, fine_op=op)
    part = AdaptivePartition(space, n_shards)
    dist = DistAdaptiveMultigrid(part)
    return op, single, dist


def _run_local(dist_mg, fn, vec_shards):
    """Run a per-shard slab function inside shard_map with all MG operands."""
    ax = dist_mg.axis_name
    mesh = make_device_mesh_1d(dist_mg.parts[0].n_shards, ax)
    f = jax.jit(
        jax.shard_map(
            lambda v, *opnds: fn(v.reshape(-1), opnds).reshape(1, -1),
            mesh=mesh,
            in_specs=(P(ax),) + dist_mg.operand_specs,
            out_specs=P(ax),
        )
    )
    return np.asarray(f(jnp.asarray(vec_shards), *dist_mg.operands))


@pytest.mark.parametrize("n_shards", [2, 4])
def test_dist_transfers_match_single(n_shards):
    space = _space()
    _, single, dist = _mg_pair(space, n_shards)
    assert dist.n_levels == single.n_levels == 3
    rng = np.random.default_rng(5)
    for k in range(dist.n_levels - 1):
        part_c, part_f = dist.parts[k + 1], dist.parts[k]
        uc = rng.standard_normal(dist.spaces[k + 1].n_dofs)
        want_f = np.asarray(single.prolongs[k](jnp.asarray(uc)))
        got_sh = _run_local(
            dist, lambda v, o, k=k: dist._prolong(k, v, o), part_c.to_shards(uc)
        )
        np.testing.assert_allclose(
            part_f.from_shards(got_sh), want_f, rtol=1e-11, atol=1e-12
        )

        rf = rng.standard_normal(dist.spaces[k].n_dofs)
        want_c = np.asarray(single.restricts[k](jnp.asarray(rf)))
        got_sh = _run_local(
            dist, lambda v, o, k=k: dist._restrict(k, v, o), part_f.to_shards(rf)
        )
        np.testing.assert_allclose(
            part_c.from_shards(got_sh), want_c, rtol=1e-11, atol=1e-12
        )


@pytest.mark.parametrize("n_shards", [2, 8])
def test_dist_vcycle_matches_single(n_shards):
    space = _space()
    _, single, dist = _mg_pair(space, n_shards)
    rng = np.random.default_rng(9)
    r = rng.standard_normal(space.n_dofs)
    r[space.constrained_mask_np] = 0.0
    want = np.asarray(single.vcycle(jnp.asarray(r)))
    got_sh = _run_local(dist, dist.vcycle_local, dist.parts[0].to_shards(r))
    np.testing.assert_allclose(
        dist.parts[0].from_shards(got_sh), want, rtol=1e-10, atol=1e-11
    )


@pytest.mark.parametrize("n_shards,p", [(4, 2), (8, 3)])
def test_dist_mgcg_solve_matches_single(n_shards, p):
    space = _space(p)
    assert space.hanging_mask_np.sum() > 0
    op, single, dist = _mg_pair(space, n_shards)
    b = assemble_rhs_adaptive(space, 1.0)
    control = ReductionControl(60, tolerance=0.0, reduction=1e-11)

    x_s, info_s = solve_cg(op.vmult, b, control, diag=single.vcycle)
    its_s = int(info_s["n_iterations"])
    assert its_s <= 25

    part = dist.parts[0]
    x_sh, info_d = solve_cg_mg_dist_adaptive(
        dist, part.to_shards(np.asarray(b)), control
    )
    its_d = int(info_d["n_iterations"])
    assert its_d == its_s, f"dist {its_d} vs single {its_s} iterations"
    np.testing.assert_allclose(
        part.from_shards(np.asarray(x_sh)), np.asarray(x_s),
        rtol=1e-9, atol=1e-10,
    )


def test_dist_adaptive_helmholtz_vmult_and_mgcg():
    """Variable-coefficient (step-64 a(x)) on a distributed adaptive mesh:
    the SPMD vmult matches the single-device AdaptiveHelmholtzOperator and
    distributed MG-CG matches single-device MG-CG iteration-for-iteration."""
    from deal_and_ceed_on_gpu_tpu.adaptive import AdaptiveHelmholtzOperator
    from deal_and_ceed_on_gpu_tpu.models.helmholtz import default_coefficient
    from deal_and_ceed_on_gpu_tpu.parallel.dist_adaptive import DistAdaptivePoisson

    n_shards = 4
    space = _space(p=2)
    op = AdaptiveHelmholtzOperator(space)
    part = AdaptivePartition(space, n_shards)
    dop = DistAdaptivePoisson(part, a=default_coefficient)

    # vmult parity
    u = np.random.default_rng(11).standard_normal(space.n_dofs)
    want = np.asarray(op.vmult(jnp.asarray(u)))
    ax = part.axis_name
    mesh = make_device_mesh_1d(n_shards, ax)
    f = jax.jit(
        jax.shard_map(
            dop.vmult_local,
            mesh=mesh,
            in_specs=(P(ax),) + dop.operand_specs(),
            out_specs=P(ax),
        )
    )
    got = part.from_shards(
        np.asarray(f(jnp.asarray(part.to_shards(u)), *dop.shard_operands))
    )
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    # MG-CG parity
    from deal_and_ceed_on_gpu_tpu.solvers import AdaptiveMultigrid

    single = AdaptiveMultigrid(
        space, fine_op=op, make_op=AdaptiveHelmholtzOperator
    )
    b = assemble_rhs_adaptive(space, 1.0)
    control = ReductionControl(60, tolerance=0.0, reduction=1e-11)
    x_s, info_s = solve_cg(op.vmult, b, control, diag=single.vcycle)

    dist = DistAdaptiveMultigrid(part, a=default_coefficient)
    x_sh, info_d = solve_cg_mg_dist_adaptive(
        dist, part.to_shards(np.asarray(b)), control
    )
    assert int(info_d["n_iterations"]) == int(info_s["n_iterations"])
    np.testing.assert_allclose(
        part.from_shards(np.asarray(x_sh)), np.asarray(x_s),
        rtol=1e-9, atol=1e-10,
    )


def test_amr_loop_distributed_matches_single():
    """The distributed AMR loop reproduces the single-device loop exactly:
    same refinement decisions (cell/DoF counts), same estimates, and
    MG-level iteration counts."""
    from deal_and_ceed_on_gpu_tpu.adaptive import amr_loop
    from deal_and_ceed_on_gpu_tpu.parallel import amr_loop_distributed

    def f(x):
        return np.exp(-((x - 0.75) ** 2).sum(axis=-1) / 0.05)

    kw = dict(f=f, n_steps=2, theta=0.4, reduction=1e-9, max_iterations=400)
    single = amr_loop(BrickMesh((2, 2, 2)), 2, precond="mg", **kw)
    dist = amr_loop_distributed(BrickMesh((2, 2, 2)), 2, 4, precond="mg", **kw)
    assert len(dist) == len(single) == 3
    for hs, hd in zip(single, dist):
        assert hd["n_cells"] == hs["n_cells"]
        assert hd["n_dofs"] == hs["n_dofs"]
        np.testing.assert_allclose(hd["eta"], hs["eta"], rtol=1e-7)
        np.testing.assert_allclose(
            np.asarray(hd["x"]), np.asarray(hs["x"]), rtol=1e-6, atol=1e-9
        )
    assert dist[-1]["n_iterations"] <= 25  # level-independent MG at scale

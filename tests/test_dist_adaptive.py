"""Distributed adaptive (hanging-node) meshes: the p4est-parity frontier.

SPMD solves over the shared-surface SIGMA exchange must match the
single-device adaptive operator exactly (same iterations, 1e-10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, SolverControl, solve_cg_merged
from deal_and_ceed_on_gpu_tpu.adaptive import (
    AdaptiveMesh,
    AdaptivePoissonOperator,
    AdaptiveSpace,
    assemble_rhs_adaptive,
)
from deal_and_ceed_on_gpu_tpu.parallel.dist_adaptive import (
    AdaptivePartition,
    DistAdaptivePoisson,
    make_device_mesh_1d,
    solve_cg_merged_dist_adaptive,
)
from jax.sharding import PartitionSpec as P


def _space(two_level=True, p=2):
    amesh = AdaptiveMesh.refine(BrickMesh((2, 2, 2)), (0, 7))
    if two_level:
        child = int(np.flatnonzero(amesh.levels == 1)[0])
        amesh = amesh.refine_active((child,))
    return AdaptiveSpace(amesh, p)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
@pytest.mark.parametrize("two_level", [False, True])
def test_dist_adaptive_vmult_matches_single(n_shards, two_level):
    space = _space(two_level)
    assert space.hanging_mask_np.sum() > 0
    op = AdaptivePoissonOperator(space)
    part = AdaptivePartition(space, n_shards)
    dist_op = DistAdaptivePoisson(part)

    u = np.random.default_rng(0).standard_normal(space.n_dofs)
    want = np.asarray(op.vmult(jnp.asarray(u)))

    mesh = make_device_mesh_1d(n_shards)
    specs = dist_op.operand_specs()
    f = jax.jit(
        jax.shard_map(
            dist_op.vmult_local,
            mesh=mesh,
            in_specs=(P(part.axis_name),) + specs,
            out_specs=P(part.axis_name),
        )
    )
    got_sh = f(jnp.asarray(part.to_shards(u)), *dist_op.shard_operands)
    got = part.from_shards(np.asarray(got_sh))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_dist_adaptive_solve_matches_single(n_shards):
    space = _space(True, p=3)
    op = AdaptivePoissonOperator(space)
    b = assemble_rhs_adaptive(space, 1.0)
    control = SolverControl(800, 1e-10)
    x_single, info_single = solve_cg_merged(op.vmult, b, control)

    part = AdaptivePartition(space, n_shards)
    dist_op = DistAdaptivePoisson(part)
    x_sh, info = solve_cg_merged_dist_adaptive(
        dist_op, jnp.asarray(part.to_shards(np.asarray(b))), control
    )
    assert int(info["n_iterations"]) == int(info_single["n_iterations"])
    x = part.from_shards(np.asarray(x_sh))
    np.testing.assert_allclose(x, np.asarray(x_single), rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("n_shards", [2, 8])
def test_dist_zz_estimator_matches_host(n_shards):
    """The SPMD ZZ estimator (per-shard recovery over the SIGMA exchange,
    parallel/dist_amr.py) reproduces the host estimator on a hanging-node
    mesh to f64 psum-association noise, and — the contract that matters
    for reproducible AMR — marks the IDENTICAL cell set."""
    from deal_and_ceed_on_gpu_tpu.adaptive import (
        estimate_gradient_recovery,
        mark_doerfler,
    )
    from deal_and_ceed_on_gpu_tpu.parallel.dist_amr import (
        estimate_gradient_recovery_dist,
    )

    space = _space(two_level=True)
    assert space.hanging_mask_np.sum() > 0
    op = AdaptivePoissonOperator(space)
    part = AdaptivePartition(space, n_shards)

    # a non-trivial conforming field: one plain CG solve of -lap u = f
    b = assemble_rhs_adaptive(
        space, lambda x: np.exp(-((x - 0.7) ** 2).sum(axis=-1) / 0.05)
    )
    x, _ = solve_cg_merged(op.vmult, jnp.asarray(b), SolverControl(300, 1e-12))

    want = estimate_gradient_recovery(space, op, x)
    got = estimate_gradient_recovery_dist(
        part, part.to_shards(np.asarray(x)), dtype=jnp.float64
    )
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)
    # owner-interior cells: summation order identical -> bitwise equal
    # (on this tiny mesh most cells touch a shard boundary, so only a
    # fraction is fully interior; larger meshes trend to 1)
    assert np.any(got == want)
    for theta in (0.3, 0.6):
        assert set(mark_doerfler(got, theta)) == set(mark_doerfler(want, theta))

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

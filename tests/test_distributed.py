"""Distributed (shard_map over 8 virtual CPU devices) vs single-device:
the reference's 'same binary at any rank count' property (SURVEY.md 4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import (
    BrickMesh,
    FESpace,
    IterationNumberControl,
    SolverControl,
    solve_cg_merged,
)
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator, assemble_rhs
from deal_and_ceed_on_gpu_tpu.parallel import (
    DistPoissonOperator,
    SlabPartition,
    solve_cg_merged_dist,
)
from deal_and_ceed_on_gpu_tpu.parallel.dist_solve import make_device_mesh


def _setup(p=2, shape=(2, 2, 4), n_shards=2):
    mesh = BrickMesh(shape)
    space = FESpace.create(mesh, p, dtype=jnp.float64)
    part = SlabPartition(mesh, p, n_shards)
    return mesh, space, part


@pytest.mark.parametrize("n_shards", [1, 2, 4])
def test_slab_roundtrip(n_shards):
    mesh, space, part = _setup(n_shards=n_shards, shape=(2, 2, 4))
    rng = np.random.default_rng(0)
    u = rng.standard_normal(space.grid_shape)
    slabs = part.to_slabs(u)
    # ghost plane of shard k == first plane of shard k+1
    for k in range(n_shards - 1):
        np.testing.assert_array_equal(slabs[k][-1], slabs[k + 1][0])
    np.testing.assert_array_equal(part.from_slabs(slabs), u)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_dist_vmult_matches_single(n_shards):
    p = 2
    mesh, space, part = _setup(p=p, shape=(2, 3, 8), n_shards=n_shards)
    op = PoissonOperator(space, backend="structured")
    dist_op = DistPoissonOperator(part, dtype=jnp.float64)

    rng = np.random.default_rng(1)
    u = rng.standard_normal(space.grid_shape)
    want = np.asarray(op.vmult(jnp.asarray(u.reshape(-1)))).reshape(space.grid_shape)

    devmesh = make_device_mesh(n_shards)
    nzl, ny, nx = part.local_grid_shape
    u_flat = jnp.asarray(part.to_slabs(u).reshape(n_shards * nzl, ny, nx))
    from jax.sharding import PartitionSpec as P

    f = jax.jit(
        jax.shard_map(
            dist_op.vmult_local,
            mesh=devmesh,
            in_specs=P("z", None, None),
            out_specs=P("z", None, None),
        )
    )
    got_slabs = np.asarray(f(u_flat)).reshape(n_shards, nzl, ny, nx)
    # duplicated planes must agree bitwise between neighbors
    for k in range(n_shards - 1):
        np.testing.assert_array_equal(got_slabs[k][-1], got_slabs[k + 1][0])
    got = part.from_slabs(got_slabs)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_dist_merged_cg_matches_single(n_shards):
    p = 2
    mesh, space, part = _setup(p=p, shape=(2, 2, 4), n_shards=n_shards)
    op = PoissonOperator(space)
    b = assemble_rhs(space, 1.0)
    control = SolverControl(300, 1e-10)

    x_single, info_single = solve_cg_merged(op.vmult, b, control)

    dist_op = DistPoissonOperator(part, dtype=jnp.float64)
    b_stacked = jnp.asarray(part.to_slabs(np.asarray(b).reshape(space.grid_shape)))
    x_stacked, info = solve_cg_merged_dist(dist_op, b_stacked, control)

    assert int(info["n_iterations"]) == int(info_single["n_iterations"])
    x = part.from_slabs(np.asarray(x_stacked))
    np.testing.assert_allclose(
        x.reshape(-1), np.asarray(x_single), rtol=1e-10, atol=1e-12
    )

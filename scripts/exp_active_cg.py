"""A/B the padded-layout merged-CG variants at cycle 33 p=5 f32:
(a) full-vector updates, materialized ones diag (round-2 behavior)
(b) full-vector updates, diag=None (scalar identity)
(c) active-region z+y slicing
(d) active-region z-only slicing (contiguous leading-dim)
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from deal_and_ceed_on_gpu_tpu import (
    BrickMesh,
    FESpace,
    IterationNumberControl,
    solve_cg_merged,
)
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator

mesh = BrickMesh.bp5_cycle(33)
space = FESpace.create(mesh, 5, rule="gauss_lobatto", dtype=jnp.float32)
op = PoissonOperator(
    space, backend="pallas",
    pallas_opts=dict(block_y=96, vmem_limit_bytes=100 << 20),
)
L = op.layout
n = space.n_dofs
rng = np.random.default_rng(0)
u0 = jnp.asarray(rng.standard_normal(n), dtype=space.dtype)
b = L.pad_flat(u0 / jnp.linalg.norm(u0))
b = jax.block_until_ready(b)

n_it = 50
control = IterationNumberControl(n_it, 0.0)
vm = op.vmult_padded

zs, ys, _ = L.active_spec()[1]
variants = {
    "ones-diag": dict(diag=jnp.ones((L.n,), dtype=space.dtype)),
    "scalar-diag": dict(),
    "active-zy": dict(active=L.active_spec()),
    "active-z": dict(active=(L.padded_shape, (zs, slice(None), slice(None)))),
}
for name, kw in variants.items():
    f = jax.jit(lambda b, kw=kw: solve_cg_merged(vm, b, control, **kw)[0])
    jax.block_until_ready(f(b))
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(f(b))
        best = max(best, n * n_it / (time.perf_counter() - t0))
    print(f"{name}: {best/1e9:.3f} GDoF/s", flush=True)

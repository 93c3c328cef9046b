#!/usr/bin/env python
"""Stage breakdown of the adaptive (hanging-node) vmult on the chip:
gather / cell apply / scatter / constraint passes, against the
platform's raw gather+scatter microbenchmark at the same sizes — is the
0.01 GDoF/s adaptive apply at the irregular-access roofline?

    python scripts/profile_adaptive_vmult.py [rounds]   # default 3
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from deal_and_ceed_on_gpu_tpu import BrickMesh
from deal_and_ceed_on_gpu_tpu.adaptive import (
    AdaptiveMesh,
    AdaptivePoissonOperator,
    AdaptiveSpace,
)
from deal_and_ceed_on_gpu_tpu.ops import local_global as lg
from deal_and_ceed_on_gpu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

C, R = np.array([0.5, 0.5, 0.5]), 0.3
rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def ball_refine(mesh):
    centers = mesh.origins + 0.5 * mesh.sizes
    rad = 0.5 * np.linalg.norm(mesh.sizes, axis=1)
    d = np.abs(np.linalg.norm(centers - C, axis=1) - R)
    return mesh.refine_active(np.flatnonzero(d <= rad))


mesh = AdaptiveMesh.from_brick(BrickMesh((8, 8, 8)))
for _ in range(rounds):
    mesh = ball_refine(mesh)
space = AdaptiveSpace(mesh, 2, dtype=jnp.float32)
op = AdaptivePoissonOperator(space, backend="xla")
n, E = space.n_dofs, mesh.n_cells
print(f"rounds={rounds}: {E} cells, {n} DoFs, "
      f"{E * 27} local values ({E * 27 / n:.2f} per DoF)", flush=True)

u = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
u = u / jnp.linalg.norm(u)
N_AP = 30


def timed(name, fn, x):
    @jax.jit
    def chain(v):
        return jax.lax.fori_loop(0, N_AP, lambda i, w: fn(w), v)

    jax.block_until_ready(chain(x))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x))
        best = min(best, (time.perf_counter() - t0) / N_AP)
    print(f"  {name:28s}: {best * 1e3:8.3f} ms", flush=True)
    return best


s = space
# full vmult
timed("vmult (all stages)", op.vmult, u)
# constraint passes only
timed("distribute+condense", lambda v: s.condense(s.distribute(v)), u)


# gather+scatter round trip only (sum over locals = the transfer cost
# with a trivial cell body)
def gs(v):
    ul = lg.gather_indexed(v, s.elem_dof_map, s.degree)
    return lg.scatter_indexed_sorted(ul * 2.0, s.scatter_plan, s.n_dofs)


timed("gather + scatter (no cell)", gs, u)


# cell body only on a fixed local tensor (element-resident, no transfer)
ul0 = jax.block_until_ready(lg.gather_indexed(u, s.elem_dof_map, s.degree))
from deal_and_ceed_on_gpu_tpu.ops import sum_factorization as sf


def cell_only(ul):
    _, grads = sf.evaluate(ul, op.S, op.D, (1, 2, 3), False, True, True)
    gx, gy, gz = grads
    cx, cy, cz = op._cw
    vl = sf.integrate(None, (gx * cx, gy * cy, gz * cz), op.S, op.D,
                      (1, 2, 3), True)
    return vl


timed("cell apply (local only)", cell_only, ul0)

# platform microbenchmark: same-size random gather and scatter on flat
# arrays (the irregular-access roofline this path lives under)
m = E * 27
rng = np.random.default_rng(1)
gidx = jnp.asarray(rng.integers(0, n, size=m).astype(np.int32))
sidx = jnp.asarray(np.sort(rng.integers(0, n, size=m)).astype(np.int32))
flat = jnp.asarray(rng.standard_normal(m), jnp.float32)
timed("raw gather (same size)", lambda v: jnp.take(v, gidx, axis=0)[:n],
      u)
timed(
    "raw scatter-add (same size)",
    lambda v: jnp.zeros((n,), v.dtype).at[sidx].add(
        jnp.broadcast_to(v[0], (m,))
    ),
    u,
)

"""Sweep stencil-kernel tile configs (BZ, BY) at one BP5 size on the real
chip: chained-vmult GDoF/s per config, plus the padding ratio. Informs
the StencilLayout auto-default (padding-aware BY selection)."""

import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator

CYCLE = int(sys.argv[1]) if len(sys.argv) > 1 else 33
N_APPLIES = 200
N_REPS = 3

mesh = BrickMesh.bp5_cycle(CYCLE)
space = FESpace.create(mesh, 5, rule="gauss_lobatto", dtype=jnp.float32)
n = space.n_dofs
rng = np.random.default_rng(0)
u0 = jnp.asarray(rng.standard_normal(n), dtype=space.dtype)
u0 = u0 / jnp.linalg.norm(u0)

from deal_and_ceed_on_gpu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

configs = []
bzs = [int(s) for s in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["16"])]
bys = [int(s) for s in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["48", "64", "80", "88", "96"])]
for bz in bzs:
    for by in bys:
        configs.append(dict(block_z=bz, block_y=by,
                            vmem_limit_bytes=100 << 20))

for opts in configs:
    try:
        op = PoissonOperator(space, backend="pallas", pallas_opts=opts)
        L = op.layout
        pad = L.n / n
        u = op.layout.pad_flat(u0)
        v = jax.block_until_ready(jax.jit(op.vmult_padded)(u))
        op.fold_scale(1.0 / max(float(jnp.linalg.norm(v)), 1.0))
        vmult = jax.jit(op.vmult_padded)

        @jax.jit
        def chain(u, vmult=vmult):
            return jax.lax.fori_loop(0, N_APPLIES, lambda i, v: vmult(v), u)

        jax.block_until_ready(chain(u))
        best = 0.0
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(u))
            best = max(best, n * N_APPLIES / (time.perf_counter() - t0))
        print(
            f"BZ={opts['block_z']:3d} BY={opts['block_y']:3d} SY={L.SY:3d} "
            f"pad={pad:.3f} shape={L.padded_shape}  {best/1e9:7.3f} GDoF/s",
            flush=True,
        )
    except Exception as e:
        print(f"BZ={opts['block_z']} BY={opts['block_y']}: FAIL "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)

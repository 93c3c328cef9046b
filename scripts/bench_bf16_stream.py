"""Measure the bf16-streaming stencil mode vs plain f32 on the dev chip.

The fused stencil kernel is Pallas-DMA-bound on this platform
(ARCHITECTURE.md "measured bounds": ~145 GB/s copy rate, min-traffic
roofline ~14.5 GDoF/s at f32). Streaming the padded vectors in bf16
halves the kernel's HBM bytes -> roofline ~2x. This script measures
chained vmult + fixed-iteration merged CG for both modes back-to-back,
plus IR time-to-1e-10 with each inner operator.
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
from deal_and_ceed_on_gpu_tpu.ops.pallas_stencil import StencilLayout

CYCLE = 33
P = 5
N_APPLIES = 300
N_REPS = 5
N_IT = 150


def measure(op, tag):
    L = op.layout
    n = op.space.n_dofs
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    u0 = u0 / jnp.linalg.norm(u0)
    u = jax.block_until_ready(L.pad_flat(u0))

    # ---- pcg-merged (fixed 150 iterations, dots in f32) ----
    control = IterationNumberControl(N_IT, 0.0)
    solver = jax.jit(
        lambda b: solve_cg_merged(
            op.vmult_padded, b, control, dot_dtype=jnp.float32
        )[0]
    )
    jax.block_until_ready(solver(u))
    best_cg = 0.0
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(solver(u))
        best_cg = max(best_cg, n * N_IT / (time.perf_counter() - t0))

    # ---- chained vmult ----
    v = jax.block_until_ready(jax.jit(op.vmult_padded)(u))
    op.fold_scale(1.0 / max(float(jnp.linalg.norm(v.astype(jnp.float32))), 1.0))
    vm = jax.jit(op.vmult_padded)

    @jax.jit
    def chain(u):
        return jax.lax.fori_loop(0, N_APPLIES, lambda i, v: vm(v), u)

    jax.block_until_ready(chain(u))
    best = 0.0
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(u))
        best = max(best, n * N_APPLIES / (time.perf_counter() - t0))
    print(
        f"{tag}: vmult {best / 1e9:.2f} GDoF/s   pcg-merged "
        f"{best_cg / 1e9:.2f} GDoF/s  (n={n})"
    )
    return best, best_cg


def main():
    mesh = BrickMesh.bp5_cycle(CYCLE)
    space = FESpace.create(
        mesh, P, rule="gauss_lobatto", dtype=jnp.dtype("float32")
    )
    auto = StencilLayout.auto_opts(mesh, P, jnp.float32)
    print("auto opts:", auto)

    op32 = PoissonOperator(space, backend="pallas", pallas_opts=dict(auto))
    measure(op32, "f32 stream")
    del op32

    opbf = PoissonOperator(
        space,
        backend="pallas",
        pallas_opts=dict(auto, stream_dtype=jnp.bfloat16),
    )
    print(
        "bf16 layout tiles:",
        opbf.layout.BZ,
        opbf.layout.BY,
        opbf.layout.SY,
        opbf.layout.padded_shape,
    )
    measure(opbf, "bf16 stream")


if __name__ == "__main__":
    main()

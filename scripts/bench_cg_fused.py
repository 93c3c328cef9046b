#!/usr/bin/env python
"""Round-5 task 3: measure solve_cg_fused (the fully-fused CG-iteration
Pallas kernel, ops/pallas_cg.py) against the production donated-buffer
merged CG (solve_cg_merged + A_donate) on the real chip.

The fused kernel is the designed remedy for the f32 pcg/vmult gap
(BENCH_r04: f32 pcg-merged 5.68 vs vmult 12.82 GDoF/s = 0.44x): one DMA
pass moves all four CG vectors per iteration instead of XLA's separate
update/dots/vmult streams.

Timing is honest against the tunnel (see bench.py): each candidate is ONE
jitted whole-solve dispatch ending in a scalar fetch; fixed 200
iterations; best of N reps.

Prints one line per (cycle, stream, solver): GDoF/s = n * iters / t.
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
    solve_cg_fused,
    solve_cg_merged,
)
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator
from deal_and_ceed_on_gpu_tpu.ops.pallas_stencil import StencilLayout

DEGREE = 5
N_ITERS = 200
N_REPS = 4


def timeit_scalar(fn, *args):
    float(fn(*args))  # compile + warmup
    best = np.inf
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def run(cycle, stream_dtype):
    mesh = BrickMesh.bp5_cycle(cycle)
    space = FESpace.create(
        mesh, DEGREE, rule="gauss_lobatto", dtype=jnp.float32
    )
    n = space.n_dofs
    opts = dict(StencilLayout.auto_opts(mesh, DEGREE, jnp.float32))
    if stream_dtype:
        opts["stream_dtype"] = stream_dtype
    op = PoissonOperator(space, backend="pallas", pallas_opts=opts)
    L = op.layout
    rng = np.random.default_rng(0)
    b0 = space.zero_constrained_values(
        jnp.asarray(rng.standard_normal(n), jnp.float32)
    )
    b = jax.block_until_ready(L.pad_flat(b0))
    ctl = IterationNumberControl(N_ITERS, 0.0)
    mixed = L.stream_dtype != L.dtype
    dot_dtype = jnp.float32 if mixed else None
    tag = stream_dtype or "f32"

    @jax.jit
    def s_merged(b):
        x, info = solve_cg_merged(
            op.vmult_padded, b, ctl, dot_dtype=dot_dtype,
            A_donate=op.vmult_free,
        )
        return jnp.sum(x.astype(jnp.float32)) + info["res_norm"]

    t = timeit_scalar(s_merged, b)
    print(
        f"cycle {cycle} n={n} {tag:6s} pcg-merged(donated) "
        f"{n * N_ITERS / t / 1e9:8.3f} GDoF/s  ({t * 1e3 / N_ITERS:.3f} ms/it)",
        flush=True,
    )

    # the fused kernel carries 4 sliding windows — it needs its OWN tile
    # selection (stencil tiles overflow scoped VMEM at cycle 33 f32), and
    # its own operator instance whose layout padding matches
    from deal_and_ceed_on_gpu_tpu.ops.pallas_cg import CGFusedStep

    fopts = CGFusedStep.auto_opts(
        mesh, DEGREE, jnp.float32, stream_dtype=stream_dtype
    )
    fop = PoissonOperator(space, backend="pallas", pallas_opts=fopts)
    bf = jax.block_until_ready(fop.layout.pad_flat(b0))

    @jax.jit
    def s_fused(b):
        x, info = solve_cg_fused(fop, b, ctl)
        return jnp.sum(x.astype(jnp.float32)) + info["res_norm"]

    try:
        t = timeit_scalar(s_fused, bf)
        print(
            f"cycle {cycle} n={n} {tag:6s} pcg-fused           "
            f"{n * N_ITERS / t / 1e9:8.3f} GDoF/s  ({t * 1e3 / N_ITERS:.3f} ms/it)"
            f"  [tiles BZ={fop.layout.BZ} BY={fop.layout.BY}]",
            flush=True,
        )
    except Exception as e:
        print(f"cycle {cycle} {tag} pcg-fused FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    cycles = [int(c) for c in sys.argv[1:]] or [29, 33, 38]
    for cycle in cycles:
        for stream in (None, "bfloat16"):
            run(cycle, stream)

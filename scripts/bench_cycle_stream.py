"""BP5 cycle sweep on the fused Pallas stencil kernel: f32 vs
bf16-streaming, chained vmult + fixed-iteration merged CG (padded
layout, auto tiles). Run from the repo root:

    python scripts/bench_cycle_stream.py [cycles...]   # default sweep
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
from deal_and_ceed_on_gpu_tpu.utils import enable_compilation_cache

enable_compilation_cache()
P = 5
CYCLES = [int(c) for c in sys.argv[1:]] or [24, 27, 30, 33, 36, 38, 40]
N_AP, N_IT, REPS = 100, 100, 3

for cycle in CYCLES:
    mesh = BrickMesh.bp5_cycle(cycle)
    space = FESpace.create(mesh, P, rule="gauss_lobatto", dtype=jnp.float32)
    n = space.n_dofs
    auto = StencilLayout.auto_opts(mesh, P, jnp.float32)
    line = [f"cycle {cycle} {n}:"]
    for tag, extra in [("f32", {}), ("bf16", dict(stream_dtype=jnp.bfloat16))]:
        try:
            op = PoissonOperator(
                space, backend="pallas", pallas_opts=dict(auto, **extra)
            )
            L = op.layout
            u0 = jnp.asarray(
                np.random.default_rng(0).standard_normal(n), jnp.float32
            )
            u0 = L.pad_flat(u0 / jnp.linalg.norm(u0))
            control = IterationNumberControl(N_IT, 0.0)
            dd = jnp.float32 if extra else None
            # donated bare-kernel applies (A_donate), as bench.py ships;
            # the returned scalar is fetched to host — block_until_ready
            # does not reliably block through the axon tunnel
            b0 = L.pad_flat(
                space.zero_constrained_values(L.unpad_flat(u0))
            )
            solver = jax.jit(
                lambda b: (
                    lambda x, info: jnp.sum(x.astype(jnp.float32))
                    + info["res_norm"]
                )(*solve_cg_merged(
                    op.vmult_padded, b, control, dot_dtype=dd,
                    A_donate=op.vmult_free,
                ))
            )
            float(solver(b0))
            best_cg = 0.0
            for _ in range(REPS):
                t0 = time.perf_counter()
                float(solver(b0))
                best_cg = max(best_cg, n * N_IT / (time.perf_counter() - t0))
            v = jax.block_until_ready(jax.jit(op.vmult_padded)(u0))
            op.fold_scale(
                1.0 / max(float(jnp.linalg.norm(v.astype(jnp.float32))), 1.0)
            )
            vm = jax.jit(op.vmult_padded)
            chain = jax.jit(
                lambda u: jax.lax.fori_loop(0, N_AP, lambda i, w: vm(w), u)
            )
            jax.block_until_ready(chain(u0))
            best = 0.0
            for _ in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(chain(u0))
                best = max(best, n * N_AP / (time.perf_counter() - t0))
            line.append(
                f"{tag} cg {best_cg / 1e9:.2f} vmult {best / 1e9:.2f}"
            )
            del op, solver, vm, chain, u0, b0, v
        except Exception as e:  # Mosaic flake / OOM: keep sweeping
            line.append(f"{tag} FAILED {str(e)[:80]}")
    print("  ".join(line), flush=True)

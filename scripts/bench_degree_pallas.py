"""BP5 degree sweep p=1..8 on the fused Pallas stencil kernel (~4M DoFs
cubes, chained vmult + fixed-iteration merged CG in the padded layout).
Run from the repo root; pass ``bf16`` to sweep the bf16-streaming mode
(dots at f32)."""
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
from deal_and_ceed_on_gpu_tpu.utils import enable_compilation_cache

enable_compilation_cache()
N_AP, N_IT, REPS = 100, 100, 3
BF16 = "bf16" in sys.argv[1:]
DOT_DTYPE = jnp.float32 if BF16 else None

for p in range(1, 9):
    m = max(2, round(4_000_000 ** (1 / 3) / p))
    mesh = BrickMesh((m, m, m))
    space = FESpace.create(mesh, p, rule="gauss_lobatto", dtype=jnp.float32)
    n = space.n_dofs
    try:
        from deal_and_ceed_on_gpu_tpu.ops.pallas_stencil import StencilLayout

        opts = StencilLayout.auto_opts(mesh, p, jnp.float32)
        if BF16:
            opts["stream_dtype"] = jnp.bfloat16
        op = PoissonOperator(space, backend="pallas", pallas_opts=opts)
        L = op.layout
        u0 = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
        u0 = L.pad_flat(u0 / jnp.linalg.norm(u0))
        # pcg-merged (fixed iterations, padded layout)
        control = IterationNumberControl(N_IT, 0.0)
        solver = jax.jit(
            lambda b: solve_cg_merged(
                op.vmult_padded, b, control, dot_dtype=DOT_DTYPE
            )[0]
        )
        jax.block_until_ready(solver(u0))
        best_cg = 0.0
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(solver(u0))
            best_cg = max(best_cg, n * N_IT / (time.perf_counter() - t0))
        # chained vmult
        v = jax.block_until_ready(jax.jit(op.vmult_padded)(u0))
        op.fold_scale(
            1.0 / max(float(jnp.linalg.norm(v.astype(jnp.float32))), 1.0)
        )
        vm = jax.jit(op.vmult_padded)

        @jax.jit
        def chain(u):
            return jax.lax.fori_loop(0, N_AP, lambda i, w: vm(w), u)

        jax.block_until_ready(chain(u0))
        best = 0.0
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(u0))
            best = max(best, n * N_AP / (time.perf_counter() - t0))
        print(
            f"p={p} DoFs={n}: pcg-merged {best_cg/1e9:.2f}  vmult {best/1e9:.2f} GDoF/s",
            flush=True,
        )
    except Exception as e:
        print(f"p={p} DoFs={n}: FAILED {str(e)[:120]}", flush=True)

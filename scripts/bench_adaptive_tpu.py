"""Adaptive (hanging-node) multigrid-CG on the REAL TPU chip: the
RESULTS.md "adaptive multigrid at scale" workload (ball-surface-refined
Q2 meshes) with the solve on device. Per size:

  - space/MG setup wall (host-side numpy, same either platform),
  - f64 MG-CG solve to 1e-10 relative (the CPU table's configuration),
  - mixed-precision IR (f32 adaptive-MG inner CG, f64 true residuals)
    to the same 1e-10 f64 true residual — the production TPU path.

Run from the repo root:  python scripts/bench_adaptive_tpu.py [rounds...]
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
    assemble_rhs_adaptive,
)
from deal_and_ceed_on_gpu_tpu.solvers import (
    AdaptiveMultigrid,
    ReductionControl,
    solve_cg,
    solve_cg_ir,
)
from deal_and_ceed_on_gpu_tpu.utils import (
    enable_compilation_cache,
    jit_hoisted,
)

jax.config.update("jax_enable_x64", True)
enable_compilation_cache()
print("platform:", jax.devices()[0].platform, flush=True)

C, R = np.array([0.5, 0.5, 0.5]), 0.3
ROUNDS = [int(a) for a in sys.argv[1:]] or [2, 3, 4]


def ball_refine(mesh: AdaptiveMesh) -> AdaptiveMesh:
    """Refine every active cell crossing the sphere |x - C| = R."""
    centers = mesh.origins + 0.5 * mesh.sizes
    rad = 0.5 * np.linalg.norm(mesh.sizes, axis=1)
    d = np.abs(np.linalg.norm(centers - C, axis=1) - R)
    return mesh.refine_active(np.flatnonzero(d <= rad))


for rounds in ROUNDS:
    mesh = AdaptiveMesh.from_brick(BrickMesh((8, 8, 8)))
    for _ in range(rounds):
        mesh = ball_refine(mesh)

    t0 = time.perf_counter()
    space = AdaptiveSpace(mesh, 2, dtype=jnp.float64)
    op = AdaptivePoissonOperator(space)
    t_space = time.perf_counter() - t0
    n = space.n_dofs
    n_hang = int(np.asarray(space.hanging_mask).sum())
    print(
        f"rounds={rounds}: {mesh.n_cells} cells, {n} DoFs, "
        f"{n_hang} hanging, space+op setup {t_space:.1f} s",
        flush=True,
    )
    b = assemble_rhs_adaptive(space, 1.0)

    # f32 chained-vmult throughput (the VERDICT r3 item-3 metric), BOTH
    # backends: "xla" (einsum cell apply) and "pallas" (GeneralCellKernel
    # cell apply — first Mosaic compile of the adaptive diag3 shapes, the
    # on-silicon coverage ADVICE r4 asked for). Parity-checked on chip.
    s32v = AdaptiveSpace(mesh, 2, dtype=jnp.float32)
    u = jnp.asarray(
        np.random.default_rng(0).standard_normal(n), jnp.float32
    )
    u = u / jnp.linalg.norm(u)
    N_AP = 50
    outs = {}
    for bk in ("xla", "pallas"):
        try:
            op32v = AdaptivePoissonOperator(s32v, backend=bk)
            v = jax.block_until_ready(op32v.vmult(u))
            outs[bk] = np.asarray(v)
            nrm = float(jnp.linalg.norm(v))

            @jax.jit
            def chain(x, op32v=op32v, nrm=nrm):
                return jax.lax.fori_loop(
                    0, N_AP, lambda i, x: op32v.vmult(x) / nrm, x
                )

            jax.block_until_ready(chain(u))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(chain(u))
                best = min(best, (time.perf_counter() - t0) / N_AP)
            print(
                f"  f32 vmult [{bk:6s}]: {best*1e3:.3f} ms/apply -> "
                f"{n/best/1e9:.2f} GDoF/s",
                flush=True,
            )
        except Exception as e:
            print(f"  f32 vmult [{bk:6s}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
    if len(outs) == 2:
        err = np.abs(outs["xla"] - outs["pallas"]).max()
        scale = np.abs(outs["xla"]).max()
        print(f"  xla/pallas parity: max rel err {err/scale:.2e}", flush=True)

    # f64 MG-CG (the CPU table's configuration)
    t0 = time.perf_counter()
    mg = AdaptiveMultigrid(space, fine_op=op)
    t_mg = time.perf_counter() - t0
    control = ReductionControl(400, tolerance=0.0, reduction=1e-10)
    # jit_hoisted turns EVERY captured table — per-level int32 index
    # maps, coefficient arrays, the dense coarse inverse (~300 MB at
    # rounds=4) — into jit ARGUMENTS: captured as inline constants they
    # bust the axon tunnel's remote-compile body limit (HTTP 413).
    # jax.closure_convert is not enough (it hoists inexact dtypes only).
    f = jit_hoisted(
        lambda bb: solve_cg(op.vmult, bb, control, diag=mg.vcycle), b
    )
    x, info = f(b)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x, info = f(b)
    jax.block_until_ready(x)
    t64 = time.perf_counter() - t0
    res = float(jnp.linalg.norm(b - op.vmult(x)) / jnp.linalg.norm(b))
    print(
        f"  f64 MG-CG : setup {t_mg:.1f} s, warm solve {t64:.2f} s, "
        f"{int(info['n_iterations'])} its, true rel res {res:.2e}",
        flush=True,
    )

    # mixed-precision IR (f32 MG inner, f64 residuals) to the same truth
    try:
        t0 = time.perf_counter()
        s32 = AdaptiveSpace(mesh, 2, dtype=jnp.float32)
        op32 = AdaptivePoissonOperator(s32)
        mg32 = AdaptiveMultigrid(s32, fine_op=op32)
        t_mg32 = time.perf_counter() - t0
        x, ir = solve_cg_ir(op32, op, b, rtol=1e-10, diag32=mg32.vcycle)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        x, ir = solve_cg_ir(op32, op, b, rtol=1e-10, diag32=mg32.vcycle)
        jax.block_until_ready(x)
        t_ir = time.perf_counter() - t0
        print(
            f"  f32 MG-IR : setup {t_mg32:.1f} s, warm solve {t_ir:.2f} s, "
            f"{int(ir['n_outer'])} outer / {int(ir['n_inner'])} inner, "
            f"true rel res {float(ir['res_rel']):.2e}",
            flush=True,
        )
    except Exception as e:
        print(f"  f32 MG-IR : FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)

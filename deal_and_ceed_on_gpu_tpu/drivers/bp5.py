"""BP5 benchmark driver: mesh-size sweep, three benchmark modes, validation.

Rebuild of the ``PoissonProblem`` driver (``bp5/step-64.cu:280-679``) with
runtime configuration replacing the reference's template parameters
(``<dim=3, fe_degree=5>`` instantiated at ``bp5/step-64.cu:724-733``). Output
lines match the reference format so result tables are comparable:

    pcg-standard <dofs/rank> <max_throughput>
    pcg-merged   <dofs/rank> <max_throughput>
    vmult        <dofs/rank> <max_throughput>

Throughput = DoFs * iterations / wall_time / n_processes, max over
repetitions (``bp5/step-64.cu:458-463``). Timing fences with
``block_until_ready`` (the ``cudaDeviceSynchronize`` equivalent).

The vmult mode chains ``v <- (A v) * (1/lambda_est)`` so the loop cannot be
hoisted as loop-invariant and f32 cannot overflow across 200 applies; the
scalar multiply fuses into the scatter and adds no measurable traffic.
"""

from __future__ import annotations

import argparse
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..fe_space import FESpace
from ..mesh import BrickMesh
from ..models import PoissonOperator, assemble_rhs, l2_norm_function
from ..solvers import IterationNumberControl, solve_cg, solve_cg_merged
from ..utils.logging import rank0_print as pcout
from ..utils.timer import Timer

__all__ = ["BP5Config", "run_cycle", "run"]


@dataclasses.dataclass
class BP5Config:
    degree: int = 5
    n_iterations: int = 200
    n_repetitions: int = 10
    dtype: str = "float32"
    backend: str = "structured"
    rule: str = "gauss_lobatto"  # BP5 collocation; "gauss" for BP3-style
    n_q: int | None = None
    modes: tuple = ("pcg-standard", "pcg-merged", "vmult")
    validate: bool = True
    # MXU matmul precision for the chained-vmult BENCHMARK only; solve and
    # validation modes always trace at "highest" (a process-global lowered
    # precision would silently degrade the CG accuracy and the L2 norm)
    mxu_precision: str = "highest"
    # tile tuning for backend="pallas"/"pallas_general" (None = defaults;
    # the measured-fastest stencil config on v5e is
    # dict(block_y=96, vmem_limit_bytes=100 << 20), see RESULTS.md)
    pallas_opts: dict | None = None
    # backend="pallas" only: stream the padded HBM vectors (and the
    # kernel's DMA traffic) at this dtype while accumulating in f32
    # ("bfloat16" halves the solver+kernel bytes — measured +8% vmult,
    # +21% pcg-merged at cycle 33). Solutions are rounded to ~1e-3; full
    # accuracy needs iterative refinement around it (solvers/ir.py).
    stream_dtype: str | None = None
    # explicit opt-in for running a float64 request on the XLA separable
    # path when a Mosaic (f32/bf16-only) backend was asked for — without
    # it the driver refuses loudly and points at pcg-ir (VERDICT r3 §4)
    f64_fallback_ok: bool = False


import contextlib


@contextlib.contextmanager
def _vmult_precision(cfg: "BP5Config"):
    """Apply ``cfg.mxu_precision`` to trace-time matmul precision for the
    chained-vmult benchmark ONLY, restoring "highest" afterwards so solve
    and validation traces in the same invocation are unaffected."""
    from ..ops.sum_factorization import set_matmul_precision

    if cfg.mxu_precision == "highest":
        yield
        return
    set_matmul_precision(cfg.mxu_precision)
    try:
        yield
    finally:
        set_matmul_precision("highest")


def _throughput_lines(label, n_dofs, times, iters, n_ranks=1):
    tp = [n_dofs * it / t / n_ranks for t, it in zip(times, iters)]
    for t, it, th in zip(times, iters, tp):
        pcout(f"   Solved in {it} iterations with time {t:.6f} and DoFs/s {th:.6g}")
    best = max(tp)
    pcout(f"{label} {n_dofs // n_ranks} {best:.6g}")
    pcout("")
    return best


def estimate_lambda_max(op, n_dofs, iters=12, seed=0):
    """Crude power-iteration bound on the operator spectral radius (used only
    to scale the chained vmult benchmark)."""
    u = jnp.asarray(
        np.random.default_rng(seed).standard_normal(n_dofs), dtype=op.space.dtype
    )

    def body(i, carry):
        u, lam = carry
        # cast back to the probe dtype: bf16-streaming operators return
        # narrow vectors, which would flip the fori_loop carry dtype
        v = op.vmult(u).astype(u.dtype)
        lam = jnp.linalg.norm(v)
        return v / lam, lam

    _, lam = jax.lax.fori_loop(0, iters, body, (u / jnp.linalg.norm(u), jnp.array(1.0, op.space.dtype)))
    return float(lam)


def run_cycle(cycle: int, cfg: BP5Config):
    mesh = BrickMesh.bp5_cycle(cycle)
    dtype = jnp.dtype(cfg.dtype)
    space = FESpace.create(mesh, cfg.degree, n_q=cfg.n_q, rule=cfg.rule, dtype=dtype)
    # backend="auto": the measured solver-selection guidance (RESULTS.md
    # cycle/degree sweeps) as a driver policy — the fused stencil kernel
    # saturates from ~6M points and wins decisively there; below that the
    # XLA separable path leads in f32 (with bf16 streaming the kernel
    # leads from ~4M, so the threshold drops).
    if cfg.backend == "auto":
        if cfg.rule != "gauss_lobatto" or not mesh.is_uniform:
            cfg = dataclasses.replace(cfg, backend="pallas_general")
        else:
            thresh = 4_000_000 if cfg.stream_dtype else 6_000_000
            cfg = dataclasses.replace(
                cfg,
                backend=(
                    "pallas"
                    if mesh.n_dofs(cfg.degree) >= thresh
                    else "separable"
                ),
            )
        pcout(f"   backend auto -> {cfg.backend}")
    # Mosaic kernels are f32/bf16-only: with --dtype float64 the f64
    # operator (pcg-standard/merged/vmult/validation) runs the separable
    # Kronecker path; pcg-ir still builds its f32 inner operator on the
    # requested pallas backend. Interpret mode (CPU tests) runs f64
    # through the kernels directly and keeps the padded-layout path.
    eff_backend = cfg.backend
    if (
        dtype == jnp.float64
        and cfg.backend in ("pallas", "pallas_general")
        and not (cfg.pallas_opts or {}).get("interpret")
    ):
        eff_backend = "separable"
        # pcg-ir is the sanctioned f64 x kernel combination: the inner f32
        # solves run on the requested Mosaic backend, and the f64 operator
        # built here only serves outer residuals/validation
        if not cfg.f64_fallback_ok and "pcg-ir" not in cfg.modes:
            raise SystemExit(
                f"--dtype float64 --backend {cfg.backend}: Mosaic TPU "
                "kernels are f32/bf16-only (the reference runs native f64, "
                "bp5/step-64.cu:206 — TPUs have no f64 ALUs). For "
                "reference-grade 1e-10 accuracy WITH the fused kernel use "
                "--modes pcg-ir (mixed-precision iterative refinement, "
                "measured 5.7-50x faster than all-f64 — RESULTS.md), or "
                "pass --f64-fallback to accept the XLA separable path for "
                "the f64 operator."
            )
    op_kwargs = (
        {"pallas_opts": cfg.pallas_opts}
        if eff_backend in ("pallas", "pallas_general")
        else {}
    )
    if eff_backend == "pallas" and cfg.pallas_opts is None:
        # per-mesh padding-aware tile selection (the grid-rounded padding
        # varies 1.4-2.7x with tile choice across the sweep shapes)
        from ..ops.pallas_stencil import StencilLayout

        op_kwargs["pallas_opts"] = StencilLayout.auto_opts(
            mesh, cfg.degree, dtype
        )
    if eff_backend == "pallas" and cfg.stream_dtype:
        op_kwargs["pallas_opts"] = dict(
            op_kwargs.get("pallas_opts") or {}, stream_dtype=cfg.stream_dtype
        )
    op = PoissonOperator(space, backend=eff_backend, **op_kwargs)
    pcout(f"Cycle {cycle}")
    pcout(f"   Number of active cells:       {mesh.n_cells}")
    pcout(f"   Number of degrees of freedom: {space.n_dofs}")
    pcout("")

    b = assemble_rhs(space, 1.0, backend=eff_backend)
    b = jax.block_until_ready(b)
    norm_b = float(jnp.linalg.norm(b))
    control = IterationNumberControl(cfg.n_iterations, 1e-6 * norm_b)

    if eff_backend == "pallas":
        # whole solves run in the kernel-owned padded layout (zero padding
        # is an invariant of the operator and of every CG update); vectors
        # are padded once here and unpadded once for validation. diag=None
        # is the reference's identity DiagonalMatrix without materializing
        # a ones vector. active_spec() (skip dead z/y padding in the CG
        # updates) is measured SLOWER on the dev chip — XLA materializes a
        # copy per sliced dynamic-update-slice, eating the 1.5x traffic
        # saving (scripts/exp_active_cg.py: 4.09 full vs 2.66 sliced
        # GDoF/s) — so the full-vector updates stay the default here.
        L = op.layout
        b_solve = jax.block_until_ready(L.pad_flat(b))
        vm = op.vmult_padded
        # donated-buffer bare-kernel applies inside the merged solve: the
        # kernel tables already encode M A M, every CG vector stays zero
        # on the constrained set (b is), so the strip/face epilogue is
        # unnecessary (measured 7.2 -> 11.5 GDoF/s at cycle 33 bf16)
        merged_kw = dict(A_donate=op.vmult_free)
        diag = None
        active = None
        mixed = L.stream_dtype != L.dtype
        # bf16-streaming vectors: dots/recurrences must accumulate at the
        # compute dtype (bf16 sums over 10^7 entries are meaningless), and
        # the solution is upconverted once for validation
        dot_dtype = space.dtype if mixed else None
        if mixed:
            unpack = lambda xp: L.unpad_flat(xp).astype(space.dtype)  # noqa: E731
            if cfg.validate:
                pcout(
                    "   NOTE: stream_dtype solves round the solution to "
                    "~1e-3 rel.; wrap in iterative refinement "
                    "(solvers/ir.py) for full accuracy"
                )
        else:
            unpack = L.unpad_flat
    else:
        b_solve, vm, diag = b, op.vmult, op.diagonal()
        merged_kw = {}
        active = None
        dot_dtype = None
        unpack = lambda x: x  # noqa: E731

    results = {}
    solution = None

    if "pcg-standard" in cfg.modes:
        f = jax.jit(
            lambda b: solve_cg(
                vm, b, control, diag=diag, active=active, dot_dtype=dot_dtype
            )
        )
        x, info = f(b_solve)  # warmup/compile
        jax.block_until_ready(x)
        times, iters = [], []
        for _ in range(cfg.n_repetitions):
            t = Timer().start()
            x, info = f(b_solve)
            t.stop(fence=(x, info["res_norm"]))
            times.append(t.elapsed)
            iters.append(int(info["n_iterations"]))
        results["pcg-standard"] = _throughput_lines(
            "pcg-standard", space.n_dofs, times, iters
        )
        solution = unpack(x)

    if "pcg-merged" in cfg.modes:
        f = jax.jit(
            lambda b: solve_cg_merged(
                vm, b, control, diag=diag, active=active,
                dot_dtype=dot_dtype, **merged_kw
            )
        )
        x, info = f(b_solve)
        jax.block_until_ready(x)
        times, iters = [], []
        for _ in range(cfg.n_repetitions):
            t = Timer().start()
            x, info = f(b_solve)
            t.stop(fence=(x, info["res_norm"]))
            times.append(t.elapsed)
            iters.append(int(info["n_iterations"]))
        results["pcg-merged"] = _throughput_lines(
            "pcg-merged", space.n_dofs, times, iters
        )
        solution = unpack(x)

    if "pcg-fused" in cfg.modes:
        # the ENTIRE CG iteration — update_a + vmult + the dot products —
        # in ONE Pallas pass (ops/pallas_cg.py, the TPU form of the
        # reference's SolverCGFullMerge custom kernels bp5/solver.h:48-311).
        # Wired as an explicit mode for measurement: on the v5e dev chip
        # the donated XLA path (pcg-merged + A_donate) is FASTER (cycle 33:
        # f32 5.4 vs 3.4, bf16 10.2 vs 5.1 GDoF/s — Pallas DMA streams at
        # ~half XLA's rate here), so pcg-merged stays the default; see
        # RESULTS.md "fully-fused CG iteration kernel".
        if eff_backend != "pallas" or dtype != jnp.float32:
            pcout(
                "pcg-fused requires --backend pallas --dtype float32 — "
                "skipping"
            )
        else:
            from ..ops.pallas_cg import CGFusedStep
            from ..solvers import solve_cg_fused

            # the fused kernel carries FOUR sliding windows: it needs its
            # own tile selection (stencil tiles overflow scoped VMEM) and
            # an operator instance whose layout padding matches
            fopts = CGFusedStep.auto_opts(
                mesh, cfg.degree, dtype, stream_dtype=cfg.stream_dtype
            )
            fop = PoissonOperator(space, backend="pallas", pallas_opts=fopts)
            bf = jax.block_until_ready(fop.layout.pad_flat(b))
            f = jax.jit(lambda b: solve_cg_fused(fop, b, control))
            x, info = f(bf)
            jax.block_until_ready(x)
            times, iters = [], []
            for _ in range(cfg.n_repetitions):
                t = Timer().start()
                x, info = f(bf)
                t.stop(fence=(x, info["res_norm"]))
                times.append(t.elapsed)
                iters.append(int(info["n_iterations"]))
            results["pcg-fused"] = _throughput_lines(
                "pcg-fused", space.n_dofs, times, iters
            )
            solution = fop.layout.unpad_flat(x).astype(space.dtype)

    if "fdm-direct" in cfg.modes:
        # beyond the reference: the Kronecker fast-diagonalization DIRECT
        # solve (solvers/fdm.py) — one apply replaces the whole CG loop.
        # Throughput line counts the equivalent work as 1 "iteration".
        from ..solvers import FDMSolver

        fdm = FDMSolver(space)
        f = jax.jit(fdm.solve)
        x = jax.block_until_ready(f(b))
        times = []
        for _ in range(cfg.n_repetitions):
            t = Timer().start()
            x = f(b)
            t.stop(fence=x)
            times.append(t.elapsed)
        rel = float(jnp.linalg.norm(b - op.vmult(x)) / jnp.linalg.norm(b))
        for t in times:
            pcout(f"   FDM direct solve in time {t:.6f} (rel res {rel:.2e})")
        best = min(times)
        pcout(f"fdm-direct {space.n_dofs} {space.n_dofs / best:.6g}")
        pcout("")
        results["fdm-direct"] = space.n_dofs / best
        solution = x

    if "pcg-ir" in cfg.modes:
        # beyond the reference: mixed-precision iterative refinement to a
        # TRUE f64 relative residual of 1e-10 (solvers/ir.py) — f32 (or
        # bf16-streaming) merged-CG inner solves, f64 residuals. The
        # reference never faces the tradeoff (native f64 GPUs); on TPU
        # this is the production path to reference-grade accuracy.
        # Requires --dtype float64 (the accumulation dtype).
        if dtype != jnp.float64:
            pcout("pcg-ir requires --dtype float64 — skipping")
        else:
            from ..solvers import solve_cg_ir

            space32 = FESpace.create(
                mesh, cfg.degree, n_q=cfg.n_q, rule=cfg.rule,
                dtype=jnp.float32,
            )
            kw32 = dict(op_kwargs)
            if cfg.backend == "pallas":
                from ..ops.pallas_stencil import StencilLayout

                base_opts = (
                    dict(cfg.pallas_opts)
                    if cfg.pallas_opts
                    else StencilLayout.auto_opts(mesh, cfg.degree, jnp.float32)
                )
                if cfg.stream_dtype:
                    base_opts["stream_dtype"] = cfg.stream_dtype
                kw32["pallas_opts"] = base_opts
            op32 = PoissonOperator(space32, backend=cfg.backend, **kw32)
            # f64 residual operator: the Mosaic kernel is f32-only, so the
            # f64 apply uses the separable Kronecker path (eff_backend
            # already fell back to it for pallas backends under f64)
            op64 = op
            x, info = solve_cg_ir(op32, op64, b, rtol=1e-10)
            jax.block_until_ready(x)
            times, its = [], []
            for _ in range(cfg.n_repetitions):
                t = Timer().start()
                x, info = solve_cg_ir(op32, op64, b, rtol=1e-10)
                t.stop(fence=x)
                times.append(t.elapsed)
                its.append(int(info["n_inner"]))
            for t, it in zip(times, its):
                pcout(
                    f"   IR solved to true rel. res {info['res_rel']:.2e} "
                    f"({info['n_outer']} outer / {it} inner) in {t:.6f}"
                )
            tp = [space.n_dofs * it / t for t, it in zip(times, its)]
            pcout(f"pcg-ir {space.n_dofs} {max(tp):.6g}")
            pcout("")
            results["pcg-ir"] = max(tp)
            solution = x

    if "pcg-mg" in cfg.modes:
        # beyond the reference: geometric-multigrid-preconditioned CG
        # (solvers/multigrid.py) — converges in a mesh-independent ~10
        # iterations instead of the O(1/h) Jacobi counts
        from ..solvers import Multigrid

        mg = Multigrid(
            space,
            make_op=lambda s: PoissonOperator(s, backend="separable"),
            fine_op=op if cfg.backend == "separable" else None,
        )
        f = jax.jit(lambda b: solve_cg(op.vmult, b, control, diag=mg.vcycle))
        x, info = f(b)
        jax.block_until_ready(x)
        times, iters = [], []
        for _ in range(cfg.n_repetitions):
            t = Timer().start()
            x, info = f(b)
            t.stop(fence=(x, info["res_norm"]))
            times.append(t.elapsed)
            iters.append(int(info["n_iterations"]))
        results["pcg-mg"] = _throughput_lines("pcg-mg", space.n_dofs, times, iters)
        solution = x

    if "vmult" in cfg.modes:
        # fold the 1/lambda_est normalization into the operator tables so
        # the chain is pure back-to-back applies (no extra elementwise pass)
        lam = estimate_lambda_max(op, space.n_dofs)
        op.fold_scale(1.0 / lam)

        if eff_backend == "pallas":
            # bare-kernel donated double-buffer chain: u0 is zero on the
            # constrained set and on the dead strips, both are fixed
            # points of M A M, so the epilogue is unnecessary (same
            # invariant as the merged solve's A_donate path)
            @jax.jit
            def chain(u):
                def body(i, c):
                    v, w = c
                    return op.vmult_free(v, w), v

                v, _ = jax.lax.fori_loop(
                    0, cfg.n_iterations, body, (u, jnp.zeros_like(u))
                )
                return v

        else:

            @jax.jit
            def chain(u):
                return jax.lax.fori_loop(
                    0, cfg.n_iterations, lambda i, v: vm(v), u
                )

        # normalize at the compute dtype (a bf16 12M-entry norm is junk),
        # then cast back so the chain carry keeps the streaming dtype
        nrm = jnp.linalg.norm(b_solve.astype(space.dtype))
        u0 = (b_solve.astype(space.dtype) / nrm).astype(b_solve.dtype)
        with _vmult_precision(cfg):
            jax.block_until_ready(chain(u0))  # traced under the bench precision
        times = []
        for _ in range(cfg.n_repetitions):
            t = Timer().start()
            out = chain(u0)
            t.stop(fence=out)
            times.append(t.elapsed)
        tp = [space.n_dofs * cfg.n_iterations / t for t in times]
        for t, th in zip(times, tp):
            pcout(f"   {cfg.n_iterations} mat-vecs in time {t:.6f} and DoFs/s {th:.6g}")
        results["vmult"] = max(tp)
        pcout(f"vmult {space.n_dofs} {max(tp):.6g}")
        pcout("")

    if cfg.validate and solution is not None:
        norm = float(l2_norm_function(space, solution))
        pcout(f"   solution L2 norm: {norm:.12g}")
        results["l2_norm"] = norm
        pcout("")

    return results


def run(cycle_min=7, cycle_max=40, cfg: BP5Config | None = None):
    cfg = cfg or BP5Config()
    out = {}
    for cycle in range(cycle_min, cycle_max + 1):
        out[cycle] = run_cycle(cycle, cfg)
    return out


def run_cycle_distributed(
    cycle: int,
    pz: int,
    py: int = 1,
    cfg: BP5Config | None = None,
    px: int = 1,
    write_solution: str | None = None,
):
    """Distributed benchmark over a ``pz x py`` device mesh ((z, y) block
    decomposition; any shard count divides any mesh via dead-element
    padding). Runs the pcg-merged and vmult modes with the same
    reference-format per-rank output lines as the reference's multi-GPU
    runs (``bp5/step-64.cu:470-474,543-547``). The jitted SPMD solver is
    built once and reused across timed repetitions."""
    import numpy as np

    from ..parallel import (
        BlockPartition,
        DistOperator,
        make_device_mesh,
        make_dist_vmult,
        solve_cg_dist,
        solve_cg_merged_dist,
    )

    cfg = cfg or BP5Config()
    n_shards = pz * py * px
    mesh = BrickMesh.bp5_cycle(cycle)
    dtype = jnp.dtype(cfg.dtype)
    space = FESpace.create(mesh, cfg.degree, rule=cfg.rule, dtype=dtype)
    part = BlockPartition(mesh, cfg.degree, pz=pz, py=py, px=px)
    dist_kwargs = (
        {"pallas_opts": cfg.pallas_opts}
        if cfg.backend == "pallas_general" and cfg.pallas_opts
        else {}
    )
    dist_op = DistOperator(
        part, PoissonOperator, dtype=dtype, backend=cfg.backend, **dist_kwargs
    )
    pcout(f"Cycle {cycle} on {pz}x{py}x{px} shards")
    pcout(f"   Number of active cells:       {mesh.n_cells}")
    pcout(f"   Number of degrees of freedom: {space.n_dofs}")

    b = assemble_rhs(space, 1.0)
    norm_b = float(jnp.linalg.norm(b))
    control = IterationNumberControl(cfg.n_iterations, 1e-6 * norm_b)
    b_stacked = jnp.asarray(
        part.to_blocks(np.asarray(b).reshape(space.grid_shape))
    )
    devmesh = make_device_mesh(pz, py, px=px)
    results = {}

    if "pcg-standard" in cfg.modes:
        x, info = solve_cg_dist(dist_op, b_stacked, control, mesh=devmesh)
        jax.block_until_ready(x)
        times, iters = [], []
        for _ in range(cfg.n_repetitions):
            t = Timer().start()
            x, info = solve_cg_dist(dist_op, b_stacked, control, mesh=devmesh)
            t.stop(fence=x)
            times.append(t.elapsed)
            iters.append(int(info["n_iterations"]))
        results["pcg-standard"] = _throughput_lines(
            "pcg-standard", space.n_dofs, times, iters, n_ranks=n_shards
        )

    if "pcg-merged" in cfg.modes:
        x, info = solve_cg_merged_dist(dist_op, b_stacked, control, mesh=devmesh)
        jax.block_until_ready(x)
        times, iters = [], []
        for _ in range(cfg.n_repetitions):
            t = Timer().start()
            x, info = solve_cg_merged_dist(
                dist_op, b_stacked, control, mesh=devmesh
            )
            t.stop(fence=x)
            times.append(t.elapsed)
            iters.append(int(info["n_iterations"]))
        results["pcg-merged"] = _throughput_lines(
            "pcg-merged", space.n_dofs, times, iters, n_ranks=n_shards
        )
        results["n_iterations"] = iters[-1]
        if write_solution:
            # per-shard .vtr pieces + .pvtr master (the reference's
            # per-rank VTU + PVTU record, step-64/step-64.cu:560-588)
            from ..utils.vtk import write_solution_pvtr

            write_solution_pvtr(write_solution, part, np.asarray(x))
            pcout(f"   wrote {write_solution} (+ per-shard pieces)")

    if "fdm-direct" in cfg.modes:
        # distributed exact FDM solve: 8 all_to_all shard transposes
        from ..parallel import DistFDM

        dfdm = DistFDM(part, dtype=dtype, rule=cfg.rule, n_q=cfg.n_q)
        x = dfdm.solve_direct(b_stacked, mesh=devmesh)
        jax.block_until_ready(x)
        times = []
        for _ in range(cfg.n_repetitions):
            t = Timer().start()
            x = dfdm.solve_direct(b_stacked, mesh=devmesh)
            t.stop(fence=x)
            times.append(t.elapsed)
        op_chk = PoissonOperator(space, backend=cfg.backend)
        x_glob = jnp.asarray(
            part.from_blocks(np.asarray(x)).reshape(-1)
        )
        rel = float(jnp.linalg.norm(b - op_chk.vmult(x_glob)) / norm_b)
        for t in times:
            pcout(f"   FDM direct solve in time {t:.6f} (rel res {rel:.2e})")
        best = min(times)
        pcout(f"fdm-direct {space.n_dofs // n_shards} {space.n_dofs / best / n_shards:.6g}")
        pcout("")
        results["fdm-direct"] = space.n_dofs / best / n_shards

    if "vmult" in cfg.modes:
        vmult = make_dist_vmult(dist_op, devmesh)
        op_single = PoissonOperator(space, backend=cfg.backend)
        lam = estimate_lambda_max(op_single, space.n_dofs)
        scale = jnp.asarray(1.0 / lam, dtype=dtype)

        @jax.jit
        def chain(u):
            def body(i, v):
                return vmult(v) * scale

            return jax.lax.fori_loop(0, cfg.n_iterations, body, u)

        u0 = b_stacked / jnp.linalg.norm(b_stacked)
        with _vmult_precision(cfg):
            jax.block_until_ready(chain(u0))  # traced under the bench precision
        times = []
        for _ in range(cfg.n_repetitions):
            t = Timer().start()
            out = chain(u0)
            t.stop(fence=out)
            times.append(t.elapsed)
        tp = [space.n_dofs * cfg.n_iterations / t / n_shards for t in times]
        for t, th in zip(times, tp):
            pcout(
                f"   {cfg.n_iterations} mat-vecs in time {t:.6f} and DoFs/s {th:.6g}"
            )
        results["vmult"] = max(tp)
        pcout(f"vmult {space.n_dofs // n_shards} {max(tp):.6g}")
        pcout("")

    return results


def main():
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description="BP5 benchmark (TPU)")
    ap.add_argument("--cycle-min", type=int, default=7)
    ap.add_argument("--cycle-max", type=int, default=40)
    ap.add_argument("--degree", type=int, default=5)
    ap.add_argument("--iterations", type=int, default=200)
    ap.add_argument("--repetitions", type=int, default=10)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument(
        "--backend",
        default="structured",
        help="structured | gather | separable | pallas | pallas_general | "
        "auto (auto picks per cycle from the measured guidance: pallas "
        "from ~6M DoFs f32 / ~4M with --stream-dtype, separable below, "
        "pallas_general for Gauss rules and mapped meshes)",
    )
    ap.add_argument("--modes", default="pcg-standard,pcg-merged,vmult")
    ap.add_argument(
        "--shards",
        default="1",
        help="device-mesh decomposition: N (z slabs), PZxPY (2D blocks) "
        "or PZxPYxPX (full 3D)",
    )
    ap.add_argument(
        "--write-solution",
        default=None,
        help="distributed runs: write the pcg-merged solution as per-shard "
        ".vtr pieces + a .pvtr master to this path",
    )
    ap.add_argument(
        "--stream-dtype",
        default=None,
        choices=["bfloat16"],
        help="backend=pallas only: stream the padded HBM vectors at this "
        "dtype (f32 accumulate in VMEM) — halves the solver+kernel bytes; "
        "solutions are rounded to ~1e-3 (use solvers/ir.py for full "
        "accuracy)",
    )
    ap.add_argument(
        "--mxu-precision",
        default="highest",
        choices=["highest", "high", "default"],
        help="MXU matmul precision for f32 paths (highest=bf16x6 exact, "
        "high=bf16x3 ~2.6e-6 rel.err, default=bf16 ~8e-4 — benchmark-only)",
    )
    ap.add_argument(
        "--f64-fallback",
        action="store_true",
        help="with --dtype float64 and a Mosaic backend (f32/bf16-only): "
        "accept the XLA separable path for the f64 operator instead of "
        "erroring (pcg-ir is the recommended f64-accuracy mode)",
    )
    args = ap.parse_args()
    from ..utils import ensure_x64

    ensure_x64(args.dtype)
    cfg = BP5Config(
        degree=args.degree,
        n_iterations=args.iterations,
        n_repetitions=args.repetitions,
        dtype=args.dtype,
        backend=args.backend,
        modes=tuple(args.modes.split(",")),
        mxu_precision=args.mxu_precision,
        stream_dtype=args.stream_dtype,
        f64_fallback_ok=args.f64_fallback,
        # stencil tiles are auto-selected per mesh (StencilLayout
        # .auto_opts) when pallas_opts is None; the general kernel fixes
        # its MXU precision at construction, so the --mxu-precision flag
        # must be forwarded here (set_matmul_precision only reaches the
        # XLA sum-factorization sweeps)
        pallas_opts=(
            dict(precision=args.mxu_precision)
            if args.backend == "pallas_general"
            else None
        ),
    )
    if (
        args.backend == "pallas_general"
        and args.mxu_precision != "highest"
        and set(cfg.modes) - {"vmult"}
    ):
        pcout(
            "WARNING: the pallas_general kernel fixes MXU precision at "
            "construction — with --mxu-precision "
            f"{args.mxu_precision!r} the pcg solves/validation in this "
            "invocation also run at reduced precision (unlike the XLA "
            "backends, where it is scoped to the vmult benchmark)"
        )
    if args.stream_dtype and args.backend not in ("pallas", "auto"):
        pcout("WARNING: --stream-dtype only applies to backend=pallas (ignored)")
    parts = [int(s) for s in args.shards.split("x")]
    pz, py, px = (parts + [1, 1])[:3]
    if pz * py * px > 1:
        for cycle in range(args.cycle_min, args.cycle_max + 1):
            run_cycle_distributed(
                cycle, pz, py, cfg, px=px, write_solution=args.write_solution
            )
    else:
        run(args.cycle_min, args.cycle_max, cfg)


if __name__ == "__main__":
    main()

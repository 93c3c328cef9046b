#!/usr/bin/env python
"""Round-4 item 1 groundwork: measure the per-iteration traffic budget of
the merged CG on the dev chip, to decide WHERE the solver's vector work
should run (XLA streaming vs fused into the Pallas stencil kernel).

ALL timings are chained inside one jit (fori_loop with true data
dependence) — separate dispatches hit a ~2 ms per-call floor through the
tunnel that swamps sub-ms device work.

Measured at the BP5 cycle-33 padded layout, bf16-stream and f32:
  a) XLA 1-pass stream (y = 2x)            -> R_XLA
  b) XLA dots pass (3 reads -> 4 scalars)
  c) XLA update pass (4r+3w)
  d) full XLA solver side (dots -> scalars -> update), as in the CG body
  e) Pallas DMA copy chain (window-shaped reads, tile writes)
  f) stencil kernel chain (plain)
  g) stencil kernel chain + extra streamed operand (the Helmholtz a_pad
     path) -> marginal cost of one extra in-kernel bf16/f32 stream
  h) merged-CG measured per-iteration (whole solve, one dispatch)
"""
import functools
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deal_and_ceed_on_gpu_tpu import (
    BrickMesh,
    FESpace,
    IterationNumberControl,
    solve_cg_merged,
)
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator
from deal_and_ceed_on_gpu_tpu.ops.pallas_stencil import StencilLayout, _stencil_call

CYCLE = 33
DEGREE = 5
N_CH = 100  # chain length


def timeit(fn, *args, reps=4):
    out = jax.block_until_ready(fn(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_CH, out


def run(stream_dtype):
    mesh = BrickMesh.bp5_cycle(CYCLE)
    space = FESpace.create(mesh, DEGREE, rule="gauss_lobatto", dtype=jnp.float32)
    auto = StencilLayout.auto_opts(mesh, DEGREE, jnp.float32)
    opts = dict(auto)
    if stream_dtype is not None:
        opts["stream_dtype"] = stream_dtype
    op = PoissonOperator(space, backend="pallas", pallas_opts=opts)
    L = op.layout
    n = space.n_dofs
    npad = int(np.prod(L.padded_shape))
    isz = jnp.dtype(L.stream_dtype).itemsize
    print(f"--- stream={L.stream_dtype} n={n} npad={npad} pad={npad/n:.3f} "
          f"shape={L.padded_shape} BZ={L.BZ} BY={L.BY}", flush=True)

    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    u = op.layout.pad_flat(u0 / jnp.linalg.norm(u0))
    sd = L.stream_dtype

    x = u
    y = u * jnp.asarray(0.5, sd)
    z = u * jnp.asarray(0.25, sd)
    w = u * jnp.asarray(0.125, sd)

    # (a) XLA 1-pass: y = 2x, chained via carry
    @jax.jit
    def one_pass_chain(x):
        return jax.lax.fori_loop(
            0, N_CH, lambda i, v: v * jnp.asarray(0.999, sd) + jnp.asarray(1e-9, sd), x)

    t, _ = timeit(one_pass_chain, x)
    print(f"(a) XLA 1r+1w pass: {t*1e3:.3f} ms -> {2*npad*isz/t/1e9:.0f} GB/s")

    # (b) XLA dots pass, carry-dependent
    @jax.jit
    def dots_chain(d, g, h):
        def body(i, carry):
            d, s = carry
            dd = jnp.float32
            hd = h.astype(dd)
            gd = g.astype(dd)
            dv = d.astype(dd)
            s = jnp.stack([jnp.sum(dv * hd), jnp.sum(hd * hd),
                           jnp.sum(gd * hd), jnp.sum(gd * gd)])
            return d.at[0].add((s[0] * 1e-30).astype(sd)), s
        return jax.lax.fori_loop(0, N_CH, body, (d, jnp.zeros(4)))

    t, _ = timeit(dots_chain, x, y, z)
    print(f"(b) XLA dots (3r): {t*1e3:.3f} ms -> {3*npad*isz/t/1e9:.0f} GB/s")

    # (c) XLA update pass (4r+3w), natural carry dependence
    @jax.jit
    def update_chain(x, d, g, h):
        def body(i, c):
            x, d, g = c
            a = jnp.asarray(1e-9, sd)
            bb = jnp.asarray(0.999, sd)
            g2 = g + a * h
            return (x + a * d, bb * d - g2, g2)
        return jax.lax.fori_loop(0, N_CH, body, (x, d, g))

    t, _ = timeit(update_chain, x, y, z, w)
    print(f"(c) XLA update (4r+3w): {t*1e3:.3f} ms -> {7*npad*isz/t/1e9:.0f} GB/s")

    # (d) full XLA solver side: dots -> scalars -> update
    @jax.jit
    def solverside_chain(x, d, g, h):
        def body(i, c):
            x, d, g = c
            dd = jnp.float32
            hd = h.astype(dd)
            gd = g.astype(dd)
            s = jnp.stack([jnp.sum(d.astype(dd) * hd), jnp.sum(hd * hd),
                           jnp.sum(gd * hd), jnp.sum(gd * gd)])
            a = (s[3] / s[0] * 1e-12).astype(sd)
            bb = (s[2] / s[1] * 1e-12 + 0.999).astype(sd)
            g2 = g + a * h
            return (x + a * d, bb * d - g2, g2)
        return jax.lax.fori_loop(0, N_CH, body, (x, d, g))

    t, _ = timeit(solverside_chain, x, y, z, w)
    print(f"(d) XLA dots->scalars->update: {t*1e3:.3f} ms "
          f"-> {10*npad*isz/t/1e9:.0f} GB/s eff")

    # (e) Pallas copy chain: window-shaped reads (y-halo amp) + tile writes
    zt, yt, nxp = L.padded_shape
    BZ, BY = L.BZ, L.BY
    WY = BY + 16
    nzb, nyb = L.nzb, L.nyb

    def copy_kernel(src_hbm, dst_hbm, buf, obuf, in_sem, out_sem):
        j = pl.program_id(0)
        k = pl.program_id(1)
        s = jax.lax.rem(k, jnp.asarray(2, jnp.int32))
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(k * BZ, BZ), pl.ds(j * BY, WY)], buf.at[s],
            in_sem.at[s])
        cp.start()
        cp.wait()
        obuf[s] = buf[s][:, 8:8 + BY] * jnp.asarray(2.0, sd)
        co = pltpu.make_async_copy(
            obuf.at[s], dst_hbm.at[pl.ds(k * BZ, BZ), pl.ds(j * BY + 8, BY)],
            out_sem.at[s])
        co.start()

        @pl.when(jnp.logical_or(k == nzb - 1, k > 0))
        def _():
            pass

        @pl.when(k > 0)
        def _():
            pltpu.make_async_copy(
                obuf.at[1 - s],
                dst_hbm.at[pl.ds((k - 1) * BZ, BZ), pl.ds(j * BY + 8, BY)],
                out_sem.at[1 - s]).wait()

        @pl.when(k == nzb - 1)
        def _():
            co.wait()

    def pallas_copy(xx):
        return pl.pallas_call(
            copy_kernel,
            grid=(nyb, nzb),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((zt, yt, nxp), sd),
            scratch_shapes=[
                pltpu.VMEM((2, BZ, WY, nxp), sd),
                pltpu.VMEM((2, BZ, BY, nxp), sd),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=100 << 20),
        )(xx.reshape(zt, yt, nxp)).reshape(-1)

    @jax.jit
    def pallas_copy_chain(x):
        return jax.lax.fori_loop(0, N_CH, lambda i, v: pallas_copy(v), x)

    t, _ = timeit(pallas_copy_chain, x)
    amp = 1 + (WY - BY) / BY
    print(f"(e) Pallas copy chain ({amp:.2f}r+1w): {t*1e3:.3f} ms -> "
          f"{(1+amp)*npad*isz/t/1e9:.0f} GB/s")

    # (f) stencil kernel chain (normalize so values stay bounded)
    op.fold_scale(0.05)
    kern = functools.partial(_stencil_call, layout=L, interpret=False)

    @jax.jit
    def stencil_chain(u):
        return jax.lax.fori_loop(
            0, N_CH,
            lambda i, v: kern(v, L.bz, L.by, L.bx, L.sz, L.syx, None), u)

    t, _ = timeit(stencil_chain, u)
    print(f"(f) stencil kernel: {t*1e3:.3f} ms -> {n/t/1e9:.2f} GDoF/s")

    # (g) stencil + one extra streamed operand (Helmholtz a_pad path)
    a_pad = L.pad_node_field(np.zeros((L.real_shape)))

    @jax.jit
    def stencil_a_chain(u, a_pad):
        return jax.lax.fori_loop(
            0, N_CH,
            lambda i, v: kern(v, L.bz, L.by, L.bx, L.sz, L.syx, a_pad), u)

    t, _ = timeit(stencil_a_chain, u, a_pad)
    print(f"(g) stencil + 1 extra stream: {t*1e3:.3f} ms -> {n/t/1e9:.2f} GDoF/s")

    # (h) merged CG per-iteration
    n_it = 150
    control = IterationNumberControl(n_it, 0.0)
    dot_dtype = jnp.float32 if sd != jnp.float32 else None
    op2 = PoissonOperator(space, backend="pallas", pallas_opts=opts)
    solver = jax.jit(lambda b: solve_cg_merged(
        op2.vmult_padded, b, control, dot_dtype=dot_dtype)[0])
    jax.block_until_ready(solver(u))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(solver(u))
        best = min(best, time.perf_counter() - t0)
    per_it = best / n_it
    print(f"(h) merged-CG per-iter: {per_it*1e3:.3f} ms -> {n/per_it/1e9:.2f} GDoF/s")


if __name__ == "__main__":
    run("bfloat16")
    run(None)

"""Fully-fused CG iteration kernel on the padded stencil layout.

The TPU answer to the reference's ``SolverCGFullMerge`` custom kernels
(``bp5/solver.h:48-311``): where the reference fuses the CG vector work
into THREE device passes per iteration (``update_a*`` + ``vmult`` +
``update_b``), this kernel fuses the ENTIRE iteration into ONE pass over
the padded nodal layout:

    prologue (per window slab, as planes stream in):
        g_new = g + alpha * h                    (the ``update_a`` g pass)
        d_new = beta * d - g_new                 (identity-diag direction)
    body:   h_new = A d_new                      (the z-streaming stencil)
    epilogue (per output tile, everything already in VMEM):
        x += (alpha/beta) * (d_new + g_new)      (== alpha * d_old, since
                                                  d_new = beta*d_old - g_new)
        partial dots (d.h, h.h, g.h, g.g)        (the ``update_b`` pass)

STACKED STATE: the four CG vectors live in ONE array ``[4, zt, yt, nxp]``
(planes d, g, h, x — stacked on the LEADING axis so every per-plane VMEM
op is a clean (sublane, lane)-tiled block), so each grid step issues
exactly ONE input DMA and ONE output DMA. Measured on the dev chip, DMA cost is ~35 us fixed per
transfer plus bytes at the streaming rate, with only a couple of engines
— eight small per-step DMAs serialize, one stacked pair doesn't
(scripts/exp_solver_budget.py). MEASURED VERDICT (RESULTS.md "Fully-fused
CG iteration kernel"): on the dev chip the donated XLA path stays faster
(Pallas DMA streams at ~half XLA's rate there), so pcg-merged+A_donate
remains the production default and this kernel is the recorded
alternative, re-measurable via ``--modes pcg-fused`` /
``scripts/bench_cg_fused.py``.

Design notes:
- Four sliding windows share the z-streaming schedule of the base stencil
  kernel (ops/pallas_stencil.py): ``win`` (S-scaled d_new, f32, feeds the
  taps), ``win_g``/``win_draw``/``win_x`` at the stream dtype. The scaled
  window is built FROM the stream-rounded d_new, so the operator is
  applied to exactly the d that is written back (bit-consistent with the
  unfused solver's storage).
- The x update uses the identity ``alpha*d_old = (alpha/beta) *
  (d_new + g_new)``; its rounding error is bounded by
  ``ulp * alpha * |g_new|``, below x's own storage rounding. The solver
  passes ``xa = alpha/beta`` (0 on the first iteration / at exact
  convergence, where the pending ``alpha * d`` is applied in XLA after
  the loop — the reference's ``update_c``, ``bp5/solver.h:315-336``).
- Dirichlet identity rows in-kernel: ``h = S_out * (taps) + m3 * d_new``
  with ``m3`` marking the 6 boundary faces — the full constrained
  operator (``copy_constrained_values``, ``bp5/step-64.cu:275``) with
  zero epilogue traffic.
- The output ping-pongs: freshly written state cannot alias the read
  state (the y-halo of column j+1 re-reads rows column j wrote), so the
  solver carries two stacked buffers and donates the stale one via
  ``input_output_aliases``. Dead padding stays zero by induction from the
  zero-initialized buffers — uninitialized-HBM NaN can never leak in.
- Partial dot products accumulate across the whole grid into an
  ``[8, nxp]`` f32 VMEM accumulator (lane-parallel, no in-kernel
  cross-lane reduction); the solver does the final tiny reduce, and under
  sharding the four sums become one stacked ``psum`` — the reference's
  single 7-double ``MPI_Allreduce`` (``bp5/solver.h:488-494``).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stencil import YOFF, StencilLayout

__all__ = ["CGFusedStep"]

# stacked-state plane indices
D, G, H, X = 0, 1, 2, 3


def _cg_kernel(
    scal_ref,  # SMEM (8,) f32: [alpha, beta, xa, *unused]
    s_hbm,  # ANY stacked state [4, zt, yt, nxp] (read side)
    sw_hbm,  # donated write buffer (aliased to the output)
    bz_ref, by_ref, bx_ref,  # band tables (VMEM), as the base kernel
    sz_ref, syx_ref,  # symmetric scaling S
    mz_ref, my_ref, mx_ref,  # identity-face indicators
    *rest,
    p: int, BZ: int, BY: int, SY: int, nxp: int, nzb: int,
    has_value: bool,
):
    if has_value:
        a_ref, *rest = rest
    else:
        a_ref = None
    (so_hbm, dots_ref,
     win, win_g, win_draw, win_x, gin, fil, ob,
     fill_sem, in_sem, out_sem) = rest
    del sw_hbm  # donated; written through the output ref

    j = pl.program_id(0)  # y block (outer)
    k = pl.program_id(1)  # z block (inner, fastest)
    WZ, WY = BZ + 2 * p, BY + 2 * YOFF

    alpha = scal_ref[0]
    beta = scal_ref[1]
    xa = scal_ref[2]

    def mod2(i):
        return jax.lax.rem(i, jnp.asarray(2, jnp.int32))

    s = mod2(k)

    @pl.when(jnp.logical_and(j == 0, k == 0))
    def _():
        dots_ref[...] = jnp.zeros_like(dots_ref)

    def scale_rows(z0, rows):
        """S-scale rows (padded z rows [z0, z0+len)) — base-kernel form."""
        return (
            rows
            * sz_ref[pl.ds(z0, rows.shape[0]), :][:, :, None]
            * syx_ref[pl.ds(j * BY, WY), :][None, :, :]
        )

    def place(z0, z1, grp):
        """CG-update freshly streamed raw rows and place them into the four
        windows. The scaled window is rebuilt from the ROUNDED d_new so
        taps see exactly the d that is written back."""
        g_new = grp[G].astype(jnp.float32) + alpha * grp[H].astype(
            jnp.float32
        )
        d_new = beta * grp[D].astype(jnp.float32) - g_new
        draw = d_new.astype(win_draw.dtype)
        rows = grp.shape[1]
        win_draw[z1:z1 + rows] = draw
        win[z1:z1 + rows] = scale_rows(z0, draw.astype(jnp.float32))
        win_g[z1:z1 + rows] = g_new.astype(win_g.dtype)
        win_x[z1:z1 + rows] = grp[X]

    def in_dma(buf, z0, rows, sem):
        return pltpu.make_async_copy(
            s_hbm.at[:, pl.ds(z0, rows), pl.ds(j * BY, WY), :], buf, sem
        )

    def prefetch(kk):
        """The BZ fresh planes window kk appends: rows [kk*BZ+2p, +BZ)."""
        sl = mod2(kk)
        return in_dma(gin.at[sl], kk * BZ + 2 * p, BZ, in_sem.at[sl])

    @pl.when(k == 0)
    def _():
        # initial fill: rows [0, BZ) via gin[0], rows [BZ, WZ) via fil
        cpa = in_dma(gin.at[0], 0, BZ, in_sem.at[0])
        cpb = in_dma(fil, BZ, 2 * p, fill_sem)
        cpa.start()
        cpb.start()
        cpa.wait()
        cpb.wait()
        place(0, 0, gin[0])
        place(BZ, BZ, fil[...])

    @pl.when(k + 1 < nzb)
    def _():
        prefetch(k + 1).start()

    @pl.when(k > 0)
    def _():
        # slide all four windows, append the freshly updated group
        win[0 : 2 * p] = win[BZ:WZ]
        win_g[0 : 2 * p] = win_g[BZ:WZ]
        win_draw[0 : 2 * p] = win_draw[BZ:WZ]
        win_x[0 : 2 * p] = win_x[BZ:WZ]
        prefetch(k).wait()
        place(k * BZ + 2 * p, 2 * p, gin[s])

    def out_copy(kk):
        sl = mod2(kk)
        return pltpu.make_async_copy(
            ob.at[sl],
            so_hbm.at[:, pl.ds(kk * BZ + p, BZ), pl.ds(j * BY + YOFF, BY), :],
            out_sem.at[sl],
        )

    # drain the output slot issued two z-steps ago before reusing it
    @pl.when(k >= 2)
    def _():
        out_copy(k - 2).wait()

    bz_s = bz_ref[pl.ds(k * BZ + p, BZ), :]  # bands at the output rows
    soz_s = sz_ref[pl.ds(k * BZ + p, BZ), :]
    mz_s = mz_ref[pl.ds(k * BZ + p, BZ), :]

    for ys in range(0, BY, SY):
        # the base kernel's tap core: all 3(2p+1) taps on the scaled
        # window into one accumulator
        acc = win[0:BZ, YOFF + ys : YOFF + ys + SY, :] * bz_s[:, 0][:, None, None]
        for t in range(1, 2 * p + 1):
            acc = acc + win[t : t + BZ, YOFF + ys : YOFF + ys + SY, :] * bz_s[
                :, t
            ][:, None, None]
        for t in range(2 * p + 1):
            o = YOFF - p + t + ys
            acc = acc + win[p : p + BZ, o : o + SY, :] * by_ref[
                t, pl.ds(j * BY + YOFF + ys, SY), :
            ][None, :, :]
        c_tile = win[p : p + BZ, YOFF + ys : YOFF + ys + SY, :]
        for t in range(2 * p + 1):
            shift = (p - t) % nxp
            acc = acc + pltpu.roll(
                c_tile, jnp.asarray(shift, jnp.int32), 2
            ) * bx_ref[t]
        if has_value:
            acc = acc + c_tile * a_ref[:, ys : ys + SY, :]
        d_c = win_draw[p : p + BZ, YOFF + ys : YOFF + ys + SY, :].astype(
            jnp.float32
        )
        # h = S_out * taps + m3 * d   (Dirichlet identity rows in-kernel)
        m3 = jnp.maximum(
            jnp.maximum(
                mz_s[:, :, None],
                my_ref[pl.ds(j * BY + YOFF + ys, SY), :][None, :, :],
            ),
            mx_ref[...][None, :, :],
        )
        h_t = (
            acc * soz_s[:, :, None]
            * syx_ref[pl.ds(j * BY + YOFF + ys, SY), :][None, :, :]
            + d_c * m3
        )
        g_c = win_g[p : p + BZ, YOFF + ys : YOFF + ys + SY, :].astype(
            jnp.float32
        )
        # partial dots, lane-parallel (final cross-lane reduce is on host)
        dots_ref[0, :] += jnp.sum(d_c * h_t, axis=(0, 1))
        dots_ref[1, :] += jnp.sum(h_t * h_t, axis=(0, 1))
        dots_ref[2, :] += jnp.sum(g_c * h_t, axis=(0, 1))
        dots_ref[3, :] += jnp.sum(g_c * g_c, axis=(0, 1))
        sd = ob.dtype
        ob[s, D, :, ys : ys + SY, :] = win_draw[
            p : p + BZ, YOFF + ys : YOFF + ys + SY, :
        ]
        ob[s, G, :, ys : ys + SY, :] = win_g[
            p : p + BZ, YOFF + ys : YOFF + ys + SY, :
        ]
        ob[s, H, :, ys : ys + SY, :] = h_t.astype(sd)
        # x += xa * (d_new + g_new)  ==  x += alpha_prev * d_old
        ob[s, X, :, ys : ys + SY, :] = (
            win_x[p : p + BZ, YOFF + ys : YOFF + ys + SY, :].astype(
                jnp.float32
            )
            + xa * (d_c + g_c)
        ).astype(sd)

    out_copy(k).start()

    # end of column: drain the outstanding output DMAs
    @pl.when(k == nzb - 1)
    def _():
        out_copy(k).wait()

        @pl.when(nzb >= 2)
        def _():
            out_copy(k - 1).wait()


class CGFusedStep:
    """Builds and calls the fused CG-iteration kernel for one stencil
    operator (``build_stencil_operator`` instance, including its optional
    Helmholtz value coefficient). Single-device layouts only (all faces
    global Dirichlet); identity-diagonal preconditioner (as both reference
    drivers use, ``bp5/step-64.cu:428-432``)."""

    @staticmethod
    def auto_opts(mesh, degree, dtype=jnp.float32, stream_dtype=None,
                  has_value=False, vmem_budget=88 << 20):
        """Tile selection under the FUSED kernel's VMEM footprint.

        The stencil kernel's ``StencilLayout.auto_opts`` sizes tiles for
        ONE sliding window; the fused CG kernel carries FOUR (scaled d,
        g, raw d, x) plus stacked 4-plane input groups and output tiles,
        so stencil-tuned tiles overflow scoped VMEM at BP5 sweep shapes
        (measured: cycle 33 f32 wants 107.75M against the 100M scope).
        Same DMA-traffic proxy (all four vectors move together, so the
        relative ranking is unchanged); returns ``pallas_opts`` for the
        operator whose ``fused_cg_step`` will run."""
        from .pallas_stencil import _round_up as _ru

        p = degree
        mx, my, mz = mesh.n_elements
        nx, ny, nz = mx * p + 1, my * p + 1, mz * p + 1
        nxp = _ru(nx, 128)
        ny_eff = _ru(ny, 8)
        i_c = 4  # the scaled window is always f32
        i_s = jnp.dtype(stream_dtype or dtype).itemsize
        best = None
        for BZ in (16, 24, 32):
            if BZ < 2 * p:
                continue
            nzb = -(-(nz + p) // BZ)
            zt = nzb * BZ + 2 * p
            WZ = BZ + 2 * p
            for BY in range(16, max(min(ny_eff, 160), 16) + 1, 8):
                BY = min(BY, ny_eff)
                WY = BY + 2 * YOFF
                nyb = -(-(ny + YOFF) // BY)
                yt = nyb * BY + 2 * YOFF
                SY = next(
                    (s for s in range(min(BY, 32), 0, -1)
                     if BY % s == 0 and s % 8 == 0), None,
                )
                if SY is None:
                    continue
                vmem = nxp * (
                    WZ * WY * (i_c + 3 * i_s)     # win + win_g/draw/x
                    + 2 * 4 * BZ * WY * i_s       # gin (stacked groups)
                    + 4 * 2 * p * WY * i_s        # fil
                    + 2 * 4 * BZ * BY * i_s       # ob (stacked tiles)
                    + (2 * p + 4) * BZ * SY * i_c  # tap/roll temporaries
                    + (BZ * BY * i_c if has_value else 0)  # a tile
                )
                if vmem > vmem_budget:
                    continue
                proxy = zt * yt * (1.0 + WY / BY)
                key = (proxy, -SY, BZ, BY)
                if best is None or key < best[0]:
                    best = (key, BZ, BY)
        opts = dict(vmem_limit_bytes=100 << 20)
        if best is not None:
            opts.update(block_z=best[1], block_y=best[2])
        if stream_dtype is not None:
            opts["stream_dtype"] = stream_dtype
        return opts

    def __init__(self, stencil, interpret: bool = False):
        L: StencilLayout = stencil.layout
        assert L.dtype == jnp.float32, "fused CG kernel: f32 compute only"
        assert getattr(L, "faces", (True,) * 4) == (True, True, True, True), (
            "fused CG kernel: single-device layouts only"
        )
        self.layout = L
        self.interpret = interpret
        self._a = getattr(stencil, "_a", None)
        p = L.p
        zt, yt, nxp = L.padded_shape
        cd = L.dtype

        # identity-face indicators (6 global Dirichlet faces)
        nz, ny, nx = L.real_shape
        mz1 = np.zeros((zt, 1))
        mz1[p] = mz1[p + nz - 1] = 1.0
        my1 = np.zeros((yt, 1))
        my1[YOFF] = my1[YOFF + ny - 1] = 1.0
        mx1 = np.zeros((1, nxp))
        mx1[0, 0] = mx1[0, nx - 1] = 1.0
        self.mz1 = jnp.asarray(mz1, cd)
        self.my1 = jnp.asarray(my1, cd)
        self.mx1 = jnp.asarray(mx1, cd)

    # ------------------------- state transfer ------------------------- #
    def stack_state(self, d, g, h, x):
        """Four padded-flat vectors -> one stacked state [4, zt, yt, nxp]."""
        L = self.layout
        return jnp.stack(
            [v.reshape(L.padded_shape) for v in (d, g, h, x)], axis=0
        )

    def unstack(self, s, plane):
        return s[plane].reshape(-1)

    def __call__(self, s, sw, scal):
        """One fused CG iteration on the stacked state ``s`` (``sw`` is
        the donated write buffer). ``scal`` = [alpha, beta, xa] f32.
        Returns ``(s_new, dots[8, nxp] f32)``."""
        L = self.layout
        p = L.p
        zt, yt, nxp = L.padded_shape
        WZ, WY = L.BZ + 2 * p, L.BY + 2 * YOFF
        sd = L.stream_dtype
        cd = L.dtype
        has_value = self._a is not None
        kernel = functools.partial(
            _cg_kernel,
            p=p, BZ=L.BZ, BY=L.BY, SY=L.SY, nxp=nxp, nzb=L.nzb,
            has_value=has_value,
        )
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [any_spec] * 2 + [
            vmem
        ] * 8
        operands = [
            jnp.pad(scal.astype(jnp.float32), (0, 8 - scal.shape[0])),
            s, sw,
            L.bz, L.by, L.bx, L.sz, L.syx,
            self.mz1, self.my1, self.mx1,
        ]
        if has_value:
            in_specs.append(
                pl.BlockSpec((L.BZ, L.BY, nxp), lambda j, k: (k, j, 0))
            )
            operands.append(self._a)
        scratch = [
            pltpu.VMEM((WZ, WY, nxp), cd),          # win (scaled d_new)
            pltpu.VMEM((WZ, WY, nxp), sd),          # win_g (g_new)
            pltpu.VMEM((WZ, WY, nxp), sd),          # win_draw (raw d_new)
            pltpu.VMEM((WZ, WY, nxp), sd),          # win_x
            pltpu.VMEM((2, 4, L.BZ, WY, nxp), sd),  # gin (stacked groups)
            pltpu.VMEM((4, 2 * p, WY, nxp), sd),    # fil
            pltpu.VMEM((2, 4, L.BZ, L.BY, nxp), sd),  # ob (stacked tiles)
            pltpu.SemaphoreType.DMA(()),            # fill
            pltpu.SemaphoreType.DMA((2,)),          # gin stream
            pltpu.SemaphoreType.DMA((2,)),          # out stream
        ]
        out_shape = (
            jax.ShapeDtypeStruct((4, zt, yt, nxp), sd),   # stacked state
            jax.ShapeDtypeStruct((8, nxp), jnp.float32),  # dots
        )
        out_specs = (any_spec, vmem)
        x64_ctx = (
            contextlib.nullcontext() if cd == jnp.float64
            else jax.enable_x64(False)
        )
        with x64_ctx:
            s2, dots = pl.pallas_call(
                kernel,
                grid=(L.nyb, L.nzb),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                scratch_shapes=scratch,
                interpret=self.interpret,
                input_output_aliases={2: 0},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    vmem_limit_bytes=L.vmem_limit_bytes,
                ),
            )(*operands)
        return s2, dots

"""Q-grid streaming Pallas kernel: general quadrature + general geometry
WITHOUT the element-major layout.

The round-3/4 general kernel (``ops/pallas_general.py``) computes per-
element dense basis matmuls on ``[E, (p+1)^3]`` blocks; its XLA-side
local<->global transposes cost ~7x the kernel itself (RESULTS.md r3:
BP3 p=5 2.86 ms apply / 0.135 ms kernel), capping the mapped/varying-
coefficient configurations at 0.7-1.2 GDoF/s while the separable paths
run 3-16. This kernel removes the element-major layout the same way the
banded kernel (``ops/pallas_banded.py``) did for separable operators —
by reorganizing the MATH to stay on structured grids:

    nodal grid u  --interp/diff-->  QUADRATURE grid  --multiply C(q)-->
                  <--integrate--    (q-slots per element, no sharing)

Per axis the node->q map is per-element (block-diagonal, elements don't
share qpoints), so on a z-streaming schedule each transfer is local:

- **z** (streamed dim): element layer ``e`` reads node planes
  ``e*p .. e*p+p`` — the growing node/q offset is absorbed into per-block
  DMA addressing (read at ``k*EZ*p``, write at ``k*EZ*p`` rows while the
  q intermediate holds ``EZ*q`` planes); the per-plane contractions are
  trace-time-constant weighted sums.
- **y** (sublane dim): blocks of EY=8 elements; within a block the
  node->q tap offsets ``t = i - r - e*(q-p)`` are bounded by the block,
  so the sweep is ``NT = p + q + 7(q-p)`` static sublane rotates with
  per-position tap tables — the banded kernel's aligned-rotate trick on
  a RECTANGULAR (node->q) band.
- **x** (lane dim): dense basis matmuls on the MXU in 128-lane output
  chunks — each chunk contracts a 128-aligned input window (the
  block-banded structure bounds the window, so FLOPs/DoF are constant in
  mesh size), with the element-assembly in x coming out of the transpose
  matmul for free.

Assembly across z/y element blocks (shared node planes/columns) uses
carry buffers in VMEM: the z carry completes each block's first node
plane, a column-spanning y carry completes each y block's first column
(the corner line flows z-carry -> y-carry), so every output row is
written exactly once and the scatter-add never exists.

Quadrature weights fold into the BACKWARD (integrate) tables at
construction, so the streamed coefficients are ``det * J^{-1}J^{-T}``
(grad) and ``a * det`` (val) — weightless, as ``fold_scale`` wants.

Supported terms (trace-time): grad in {None, "const", "diag3", "full6"},
val in {None, "const", "table"} — the full step-64-native configuration
(uniform mesh, varying a(x), Gauss q=p+1) and the mapped BP configs.
Reference hot path being replaced: ``bp5/fe_evaluation_gl.h:192-250`` +
``step-64/step-64.cu:153-219``.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["QGridLayout", "build_qgrid_operator"]

EY = 8  # y elements per block: EY*p and EY*q are always sublane-aligned


def _round_up(x, m):
    return (x + m - 1) // m * m


# --------------------------------------------------------------------- #
# table construction
# --------------------------------------------------------------------- #
def _y_tap_tables(S, D, p, q, wy=None):
    """Forward (node->q) and backward (q->node) y tap tables.

    Forward: out[jy] = sum_t roll_t(in)[jy] * F[t][jy], jy = e*q + r,
    in col c = jy + t = e*p + i. Backward: out[c] = sum_t roll_t(in)[c]
    * B[t][c], in col jy = c + t. ``wy`` (len q) folds the quadrature
    weight into the backward tables."""
    n = EY * q
    ts_f = sorted(
        {
            i - r - e * (q - p)
            for e in range(EY)
            for r in range(q)
            for i in range(p + 1)
        }
    )
    F = {}
    for kind, M in (("S", S), ("D", D)):
        tab = np.zeros((len(ts_f), n))
        for ti, t in enumerate(ts_f):
            for jy in range(n):
                e, r = divmod(jy, q)
                i = t + r + e * (q - p)
                if 0 <= i <= p:
                    tab[ti, jy] = M[r, i]
        F[kind] = tab
    ts_b = sorted(
        {
            r - i + e * (q - p)
            for e in range(EY)
            for r in range(q)
            for i in range(p + 1)
        }
    )
    B = {}
    w = np.ones(q) if wy is None else np.asarray(wy)
    for kind, M in (("S", S), ("D", D)):
        tab = np.zeros((len(ts_b), n))
        for ti, t in enumerate(ts_b):
            for c in range(n):  # node col (block-local, c <= EY*p valid)
                jy = c + t
                if not (0 <= jy < n):
                    continue
                e, r = divmod(jy, q)
                i = c - e * p
                if 0 <= i <= p and c <= EY * p:
                    tab[ti, c] += M[r, i] * w[r]
        B[kind] = tab
    return ts_f, F, ts_b, B


def _x_chunk_tables(S, D, p, q, mx, nxp, mxq, wx=None):
    """Dense per-chunk x tables.

    Forward: q-lane chunk oc (128 lanes) = node window [w0, w0+LW) @
    T[oc] with T[oc][n - w0, s - oc*128] = M[r, i] for s = e*q+r,
    n = e*p+i. Backward (weights folded): node chunk = q window @ Tb.
    All window starts are 128-aligned (lane slices must not relayout)."""
    w = np.ones(q) if wx is None else np.asarray(wx)
    dense = {}
    nx = mx * p + 1
    for kind, M in (("S", S), ("D", D)):
        A = np.zeros((nxp, mxq))
        for e in range(mx):
            for r in range(q):
                for i in range(p + 1):
                    A[e * p + i, e * q + r] = M[r, i]
        dense[kind] = A
    del nx

    n_oc = mxq // 128
    spans = []
    for oc in range(n_oc):
        e_lo = (oc * 128) // q
        e_hi = min((oc * 128 + 127) // q, mx - 1)
        w0 = min((e_lo * p) // 128 * 128, max(nxp - 128, 0))
        need = e_hi * p + p + 1 - w0
        spans.append((w0, need))
    LW = min(nxp, _round_up(max(s[1] for s in spans), 128))
    fwd = {}
    for kind, A in dense.items():
        T = np.zeros((n_oc, LW, 128))
        for oc, (w0, _) in enumerate(spans):
            w0 = min(w0, nxp - LW)
            blk = A[w0 : w0 + LW, oc * 128 : (oc + 1) * 128]
            T[oc, : blk.shape[0]] = blk
        fwd[kind] = T
    w0s_f = [min(s[0], nxp - LW) for s in spans]

    n_onc = nxp // 128
    spans_b = []
    for onc in range(n_onc):
        c_lo, c_hi = onc * 128, min(onc * 128 + 127, mx * p)
        e_lo = max((c_lo - p) // p, 0)
        e_hi = min(c_hi // p, mx - 1)
        w0 = min((e_lo * q) // 128 * 128, max(mxq - 128, 0))
        need = e_hi * q + q - w0
        spans_b.append((w0, need))
    LWb = min(mxq, _round_up(max(s[1] for s in spans_b), 128))
    bwd = {}
    wq = np.zeros(mxq)  # weight per q lane (zero on dead pad lanes)
    wq[: mx * q] = np.tile(w, mx)
    for kind, A in dense.items():
        Aw = A * wq[None, :]
        T = np.zeros((n_onc, LWb, 128))
        for onc, (w0, _) in enumerate(spans_b):
            w0 = min(w0, mxq - LWb)
            blk = Aw.T[w0 : w0 + LWb, onc * 128 : (onc + 1) * 128]
            T[onc, : blk.shape[0]] = blk
        bwd[kind] = T
    w0s_b = [min(s[0], mxq - LWb) for s in spans_b]
    return fwd, tuple(w0s_f), LW, bwd, tuple(w0s_b), LWb


class QGridLayout:
    """Geometry + tables for the q-grid streaming kernel.

    HBM vector layout: padded nodal grid ``[ZT, YT, nxp]`` (element-
    aligned blocks, real nodes from index 0). Streamed coefficient
    layout: quadrature grid ``[K, ZQ, YQ, MXQ]``.
    """

    def __init__(self, mesh, basis, dtype, grad=None, val=None,
                 block_ez=2, coef_stream_dtype=None,
                 vmem_limit_bytes=100 << 20, precision="highest"):
        p, q = basis.degree, basis.n_q
        assert q >= p + 1, "qgrid kernel: Gauss-type rules (q > p) only"
        self.p, self.q = p, q
        self.mesh, self.basis = mesh, basis
        self.dtype = jnp.dtype(dtype)
        self.vmem_limit_bytes = vmem_limit_bytes
        self.precision = precision
        cdt = jnp.dtype(coef_stream_dtype) if coef_stream_dtype else self.dtype
        self.coef_dtype = cdt
        mx, my, mz = mesh.n_elements
        self.EZ = max(1, min(block_ez, mz))
        self.nzb = -(-mz // self.EZ)
        self.nyb = -(-my // EY)
        nx, ny, nz = mx * p + 1, my * p + 1, mz * p + 1
        self.real_shape = (nz, ny, nx)
        self.nxp = _round_up(nx, 128)
        self.mxq = _round_up(mx * q, 128)
        self.ZT = _round_up(self.nzb * self.EZ * p + 1, 8)
        self.YT = _round_up(self.nyb * EY * p + 1, 8)
        self.ZQ = self.nzb * self.EZ * q
        self.YQ = self.nyb * EY * q
        self.padded_shape = (self.ZT, self.YT, self.nxp)
        self.n = self.ZT * self.YT * self.nxp

        S, D = np.asarray(basis.S), np.asarray(basis.D)
        wq = np.asarray(basis.q_weights)
        self.S_np, self.D_np, self.w_np = S, D, wq

        ts_f, F, ts_b, B = _y_tap_tables(S, D, p, q, wy=wq)
        self.y_ts_f, self.y_ts_b = tuple(ts_f), tuple(ts_b)
        dt = self.dtype
        self.yF_S = jnp.asarray(F["S"], dt)
        self.yF_D = jnp.asarray(F["D"], dt)
        self.yB_S = jnp.asarray(B["S"], dt)
        self.yB_D = jnp.asarray(B["D"], dt)

        fwd, w0f, LW, bwd, w0b, LWb = _x_chunk_tables(
            S, D, p, q, mx, self.nxp, self.mxq, wx=wq
        )
        self.x_w0f, self.x_LW = w0f, LW
        self.x_w0b, self.x_LWb = w0b, LWb
        self.xF_S = jnp.asarray(fwd["S"], dt)
        self.xF_D = jnp.asarray(fwd["D"], dt)
        self.xB_S = jnp.asarray(bwd["S"], dt)
        self.xB_D = jnp.asarray(bwd["D"], dt)

        # dead-element live thresholds on the q grid: ragged tail blocks
        # hold pad elements whose forward-interpolated q values are
        # NONZERO (they read the real boundary node plane) — streamed
        # coefficient tables zero them implicitly (built for real
        # elements only); the "const" modes mask them in-kernel via iota
        # compares against these thresholds (the dead set is a contiguous
        # tail per axis: global q index >= m*q); x pad is zeroed by the
        # dense chunk tables
        self.nq_live_z = mz * q
        self.nq_live_y = my * q

        # ------------- coefficient tables on the q grid ------------- #
        self.grad_kind = 0
        self.val_kind = 0
        self.c_grad = None  # python consts for "const"
        self.c_val = None
        self.C = None  # [K, ZQ, YQ, MXQ]
        self.a_q = None  # [ZQ, YQ, MXQ]
        if grad is not None:
            mode, data = grad
            if mode == "const":
                assert mesh.is_uniform, (
                    "const grad coefficients require a uniform metric — "
                    "use diag3 (graded) / full6 (mapped)"
                )
                self.grad_kind = 1
                self.c_grad = tuple(float(c) for c in data)
            elif mode in ("diag3", "full6"):
                self.grad_kind = 2 if mode == "diag3" else 3
                K = 3 if mode == "diag3" else 6
                self.C = jnp.asarray(
                    self._to_qgrid(np.asarray(data), K), cdt
                )
            else:
                raise ValueError(f"unknown grad mode {mode!r}")
        if val is not None:
            mode, data = val
            if mode == "const":
                assert mesh.is_uniform, (
                    "const val coefficient (c*det) requires a uniform "
                    "metric — use a ('table', c*det_q) stream"
                )
                self.val_kind = 1
                self.c_val = float(data)
            elif mode == "table":
                self.val_kind = 2
                self.a_q = jnp.asarray(
                    self._to_qgrid(np.asarray(data)[:, :, None], 1)[0], cdt
                )
            else:
                raise ValueError(f"unknown val mode {mode!r}")
        if not (self.grad_kind or self.val_kind):
            raise ValueError("need at least one of grad/val")

    def _to_qgrid(self, tab, K):
        """[E, n_q, K] (cell order ez,ey,ex; qpoint order qz,qy,qx) ->
        [K, ZQ, YQ, MXQ]."""
        mx, my, mz = self.mesh.n_elements
        q = self.q
        t = tab.reshape(mz, my, mx, q, q, q, K)
        out = np.zeros((K, self.ZQ, self.YQ, self.mxq), tab.dtype)
        # element (ez,ey,ex) -> q rows: z block kb=ez//EZ offset
        # kb*EZ*q + (ez%EZ)*q; y block jb=ey//EY offset jb*EY*q + ...
        zi = (
            (np.arange(mz) // self.EZ) * self.EZ * q
            + (np.arange(mz) % self.EZ) * q
        )
        yi = (np.arange(my) // EY) * EY * q + (np.arange(my) % EY) * q
        for ez in range(mz):
            for ey in range(my):
                # t[ez, ey]: [mx, qz, qy, qx, K] -> [K, qz, qy, mx*qx]
                b = np.moveaxis(t[ez, ey], -1, 0)  # [K, mx, qz, qy, qx]
                b = np.moveaxis(b, 1, 3)  # [K, qz, qy, mx, qx]
                b = b.reshape(K, q, q, mx * q)
                out[
                    :, zi[ez] : zi[ez] + q, yi[ey] : yi[ey] + q, : mx * q
                ] = b
        return out

    # ----------------------- vector conversions ---------------------- #
    def pad_flat(self, u):
        nz, ny, nx = self.real_shape
        g = u.reshape(nz, ny, nx)
        out = jnp.zeros(self.padded_shape, g.dtype)
        return out.at[:nz, :ny, :nx].set(g).reshape(-1)

    def unpad_flat(self, up):
        nz, ny, nx = self.real_shape
        return up.reshape(self.padded_shape)[:nz, :ny, :nx].reshape(-1)

    def fold_scale(self, s):
        if self.grad_kind == 1:
            self.c_grad = tuple(c * s for c in self.c_grad)
        elif self.grad_kind:
            self.C = self.C * s
        if self.val_kind == 1:
            self.c_val = self.c_val * s
        elif self.val_kind:
            self.a_q = self.a_q * s


def _qgrid_kernel(
    u_hbm,
    *refs,
    L: QGridLayout,
    interpret: bool,
    constrained: bool,
):
    p, q, EZ = L.p, L.q, L.EZ
    nxp, mxq = L.nxp, L.mxq
    A = EZ * q  # q planes per block
    R = EZ * p  # node planes written per block (plus 1 at the last)
    YQ8 = EY * q  # in-block y extent (q grid AND node window storage)
    WYN = EY * p + 1  # real node cols per block window
    grad_kind, val_kind = L.grad_kind, L.val_kind

    it = iter(refs)
    cs_ref = next(it)  # SMEM [4]: cx, cy, cz, c_val (const-mode scalars)
    if grad_kind in (2, 3):
        C_ref = next(it)
    if val_kind == 2:
        a_ref = next(it)
    yF_S, yF_D, yB_S, yB_D = next(it), next(it), next(it), next(it)
    xF_S, xF_D, xB_S, xB_D = next(it), next(it), next(it), next(it)
    out_hbm = next(it)
    win, zcar, ycar, obuf, zbuf, in_sem, out_sem = (
        next(it), next(it), next(it), next(it), next(it), next(it),
        next(it),
    )

    j = pl.program_id(0)  # y block (outer)
    k = pl.program_id(1)  # z block (inner)
    nyb, nzb = pl.num_programs(0), pl.num_programs(1)

    f32 = jnp.float32 if L.dtype != jnp.float64 else jnp.float64

    # first step: zero the scratch buffers BEFORE any DMA lands — the
    # window cols beyond WYN are never rewritten and must stay zero (a
    # NaN bit pattern in uninitialized VMEM would survive the zero-tap
    # multiplies as 0 * NaN = NaN)
    @pl.when(jnp.logical_and(j == 0, k == 0))
    def _():
        win[...] = jnp.zeros_like(win)
        ycar[...] = jnp.zeros_like(ycar)
        zbuf[...] = jnp.zeros_like(zbuf)

    @pl.when(k == 0)
    def _():
        zcar[...] = jnp.zeros_like(zcar)

    # ---------------- input window DMA (synchronous v1) --------------- #
    # y (sublane-tiled dim) slices must be 8-aligned in offset AND size
    # once nxp > 128 (multi-lane-tile memrefs: Mosaic rejects partial-
    # tile `tpu.memref_slice` there, measured on chip) — so read the
    # aligned WYNP = 8*(p+1) window (fits: YQ8 = 8q >= 8(p+1), and the
    # last block's read ends exactly at YT) and zero the over-read
    # columns in-VALUE below. The window offset j*EY*p = 8pj is always
    # aligned.
    WYNP = WYN + 7 - (WYN + 7) % 8  # == 8 * (p + 1)
    cp = pltpu.make_async_copy(
        u_hbm.at[
            pl.ds(k * R, R + 1), pl.ds(j * (EY * p), WYNP), :
        ],
        win.at[: R + 1, :WYNP, :],
        in_sem,
    )
    cp.start()
    cp.wait()

    prec = L.precision
    split = prec == "split3"
    hi = None if split else (
        jax.lax.Precision.HIGHEST if prec == "highest" else prec
    )

    def _dot(a, b):
        return jax.lax.dot_general(
            a, b, ((((1,), (0,))), ((), ())),
            preferred_element_type=f32,
            precision=hi,
        )

    def mm(a, b):
        if not split:
            return _dot(a, b)
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(a.dtype)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(b.dtype)).astype(jnp.bfloat16)
        return _dot(ah, bh) + _dot(ah, bl) + _dot(al, bh)

    # --------------------------- z forward ---------------------------- #
    S_np, D_np = L.S_np, L.D_np
    w_all = win[...].astype(f32)
    # zero the aligned-over-read columns [WYN, WYNP) in-value (they hold
    # the NEXT y block's nodes; the sweeps below rely on zeros beyond the
    # real window, as the zero-initialized win provided before the
    # aligned DMA)
    ycol = jax.lax.broadcasted_iota(jnp.int32, (R + 1, YQ8, nxp), 1)
    w_all = jnp.where(ycol < WYN, w_all, jnp.zeros((), f32))
    if constrained:
        # constrained form M A M + in-kernel identity rows: M is a
        # tensor-product nodal mask, so masking the input WINDOW is
        # exactly A M (the same per-axis factorization the banded kernel
        # bakes into its tables); the output mask + identity rows are
        # applied to the assembled local block below, where the raw u
        # tile is still in VMEM (bp5/step-64.cu:275 with zero epilogue
        # traffic)
        nzr, nyr, nxr = L.real_shape
        sh = (R + 1, YQ8, nxp)
        zg = jax.lax.broadcasted_iota(jnp.int32, sh, 0) + k * R
        yg = jax.lax.broadcasted_iota(jnp.int32, sh, 1) + j * (EY * p)
        xg = jax.lax.broadcasted_iota(jnp.int32, sh, 2)
        bnd = (
            (zg == 0) | (zg == nzr - 1)
            | (yg == 0) | (yg == nyr - 1)
            | (xg == 0) | (xg == nxr - 1)
        )
        w_use = jnp.where(bnd, jnp.zeros((), f32), w_all)
    else:
        w_use = w_all

    def z_fwd(M):
        planes = []
        for jz in range(A):
            e, r = divmod(jz, q)
            acc = None
            for i in range(p + 1):
                c = float(M[r, i])
                if c == 0.0:
                    continue
                t = w_use[e * p + i] * c
                acc = t if acc is None else acc + t
            planes.append(
                acc
                if acc is not None
                else jnp.zeros((YQ8, nxp), f32)
            )
        return jnp.stack(planes)  # [A, YQ8, nxp]

    az = z_fwd(S_np)
    bz = z_fwd(D_np) if grad_kind else None

    # --------------------------- y forward ---------------------------- #
    def y_sweep(T, ts, tab_ref):
        out = None
        for ti, t in enumerate(ts):
            shift = (YQ8 - (t % YQ8)) % YQ8
            rolled = pltpu.roll(T, jnp.asarray(shift, jnp.int32), 1)
            term = rolled * tab_ref[ti][None, :, None].astype(f32)
            out = term if out is None else out + term
        return out

    ay = y_sweep(az, L.y_ts_f, yF_S)
    if grad_kind:
        cy = y_sweep(az, L.y_ts_f, yF_D)
        by = y_sweep(bz, L.y_ts_f, yF_S)

    # --------------------------- x forward ---------------------------- #
    rows = A * YQ8

    def x_fwd(T3, tab_ref, w0s, LW):
        T = T3.reshape(rows, nxp)
        outs = []
        for oc in range(mxq // 128):
            w0 = w0s[oc]
            outs.append(mm(T[:, w0 : w0 + LW], tab_ref[oc].astype(f32)))
        return jnp.concatenate(outs, axis=1)  # [rows, mxq]

    if grad_kind:
        gx = x_fwd(ay, xF_D, L.x_w0f, L.x_LW)
        gy = x_fwd(cy, xF_S, L.x_w0f, L.x_LW)
        gz = x_fwd(by, xF_S, L.x_w0f, L.x_LW)
    if val_kind:
        v = x_fwd(ay, xF_S, L.x_w0f, L.x_LW)

    # ---------------------- quad-point operation ---------------------- #
    # dead-element (ragged tail block) q values are nonzero — the const
    # modes mask them; streamed C / a tables are zero there already. The
    # dead set is a contiguous tail per axis, so the row mask is two
    # iota threshold compares in the kernel's native [rows, 1] layout
    # (the layout-table [A,YQ8]->[rows,1] reshape and the [A]->[A,1,1]
    # vector transpose are both "infer-vector-layout: unsupported shape
    # cast" in Mosaic — measured on chip; iota is the supported form).
    if grad_kind == 1 or val_kind == 1:
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        live = ((k * A + r // YQ8) < L.nq_live_z) & (
            (j * YQ8 + r % YQ8) < L.nq_live_y
        )
        mrow = jnp.where(live, f32(1.0), f32(0.0))
    if grad_kind == 1:
        cx, cyc, cz = cs_ref[0], cs_ref[1], cs_ref[2]
        fx, fy, fz = cx * gx * mrow, cyc * gy * mrow, cz * gz * mrow
    elif grad_kind == 2:
        Cq = C_ref[...].astype(f32).reshape(3, rows, mxq)
        fx, fy, fz = gx * Cq[0], gy * Cq[1], gz * Cq[2]
    elif grad_kind == 3:
        Cq = C_ref[...].astype(f32).reshape(6, rows, mxq)
        fx = Cq[0] * gx + Cq[1] * gy + Cq[2] * gz
        fy = Cq[1] * gx + Cq[3] * gy + Cq[4] * gz
        fz = Cq[2] * gx + Cq[4] * gy + Cq[5] * gz
    if val_kind == 1:
        fv = cs_ref[3] * v * mrow
    elif val_kind == 2:
        fv = v * a_ref[...].astype(f32).reshape(rows, mxq)

    # --------------------------- x backward --------------------------- #
    def x_bwd(T, tab_ref, w0s, LWb):
        outs = []
        for onc in range(nxp // 128):
            w0 = w0s[onc]
            outs.append(mm(T[:, w0 : w0 + LWb], tab_ref[onc].astype(f32)))
        return jnp.concatenate(outs, axis=1).reshape(A, YQ8, nxp)

    u14 = None
    if grad_kind:
        u14 = x_bwd(fx, xB_D, L.x_w0b, L.x_LWb)
        u2 = x_bwd(fy, xB_S, L.x_w0b, L.x_LWb)
        u3 = x_bwd(fz, xB_S, L.x_w0b, L.x_LWb)
    if val_kind:
        uv = x_bwd(fv, xB_S, L.x_w0b, L.x_LWb)
        u14 = uv if u14 is None else u14 + uv

    # --------------------------- y backward --------------------------- #
    sA = y_sweep(u14, L.y_ts_b, yB_S)
    if grad_kind:
        sA = sA + y_sweep(u2, L.y_ts_b, yB_D)
        sC = y_sweep(u3, L.y_ts_b, yB_S)

    # --------------------------- z backward --------------------------- #
    wz = L.w_np

    def z_bwd(T, M, row):
        """Node plane ``row`` (block-local, 0..R) from the q planes."""
        acc = None
        e_lo = max((row - p) // p, 0)
        e_hi = min(row // p, EZ - 1)
        for e in range(e_lo, e_hi + 1):
            i = row - e * p
            if not (0 <= i <= p):
                continue
            for r in range(q):
                c = float(M[r, i] * wz[r])
                if c == 0.0:
                    continue
                acc = (
                    T[e * q + r] * c
                    if acc is None
                    else acc + T[e * q + r] * c
                )
        return acc if acc is not None else jnp.zeros((YQ8, nxp), f32)

    out_rows = []
    for row in range(R + 1):
        o = z_bwd(sA, S_np, row)
        if grad_kind:
            o = o + z_bwd(sC, D_np, row)
        out_rows.append(o)
    loc = jnp.stack(out_rows)  # [R+1, YQ8, nxp] node grid

    # ------------------- carries + output assembly ------------------- #
    # (all updates are broadcasted elementwise adds — Mosaic has no
    # value-scatter, so row/column selection rides iota masks)
    sh3 = (R + 1, YQ8, nxp)
    riota = jax.lax.broadcasted_iota(jnp.int32, sh3, 0)
    yiota = jax.lax.broadcasted_iota(jnp.int32, sh3, 1)
    # z: first plane completes with the carry; last plane becomes it
    loc = loc + jnp.where(riota == 0, zcar[...][None].astype(f32), 0.0)
    zcar[...] = loc[R].astype(zcar.dtype)
    # y: first col completes with the previous COLUMN's carry. Ping-pong
    # slots — column j writes slot j%2 while reading column j-1's slot
    # (their row ranges overlap at shared z planes, so one buffer would
    # let the producer clobber the consumer). The shared z row R takes
    # its y-carry only when it reappears as the next step's row 0 (it is
    # z-carried WITHOUT the y add) — adding it here too would double it;
    # the final z step has no next step, so it adds row R explicitly.
    jr = jax.lax.rem(j + 1, jnp.asarray(2, jnp.int32))  # == (j-1) % 2
    jw = jax.lax.rem(j, jnp.asarray(2, jnp.int32))
    # per-z-block carry slots (dynamic indices only on the two leading
    # dims; a dynamic SUBLANE offset `k*R` into a flat [ZT, nxp] buffer
    # is an unsupported Mosaic vector.load once nxp > 128). Equivalent
    # to the flat overlapped layout: the slot's shared row R is consumed
    # only at the last z block (`rowscale` zeroes it otherwise), where
    # its partially-assembled value is exactly what the flat buffer held.
    ycr = ycar[jr, k, pl.ds(0, R + 1), :].astype(f32)
    lastf = (k == nzb - 1).astype(f32)
    rowscale = jnp.where(riota < R, 1.0, lastf)
    loc = loc + jnp.where(
        yiota == 0, ycr[:, None, :] * rowscale, 0.0
    )
    ycar[jw, k, pl.ds(0, R + 1), :] = loc[:, EY * p, :].astype(ycar.dtype)

    if constrained:
        # output-side mask + identity rows in one select: boundary rows
        # of the assembled block become the raw u values (boundary planes
        # are never block-shared, so this commutes with the carries)
        loc = jnp.where(bnd, w_all, loc)

    # zero the columns past the block's last real node (> EY*p): the
    # last-y-block edge write below ships an ALIGNED 8-wide slab (real
    # last column + 7 alignment-strip columns), which both satisfies the
    # multi-lane-tile DMA tiling rule and establishes the y-strip part
    # of the zero-padding invariant in one write
    loc = jnp.where(yiota <= EY * p, loc, jnp.zeros((), f32))
    obuf[...] = loc.astype(obuf.dtype)

    def wr(zsl, zrows, ysl, ycols):
        cp2 = pltpu.make_async_copy(
            obuf.at[pl.ds(zsl, zrows), pl.ds(ysl, ycols), :],
            out_hbm.at[
                pl.ds(k * R + zsl, zrows),
                pl.ds(j * (EY * p) + ysl, ycols),
                :,
            ],
            out_sem,
        )
        cp2.start()
        cp2.wait()

    wr(0, R, 0, EY * p)

    @pl.when(k == nzb - 1)
    def _():
        wr(R, 1, 0, EY * p)

    # last real y column + 7 zero strip columns, one aligned 8-wide write
    # (YT == nyb*EY*p + 8 always: EY*p is a multiple of 8)
    @pl.when(j == nyb - 1)
    def _():
        wr(0, R, EY * p, 8)

        @pl.when(k == nzb - 1)
        def _():
            wr(R, 1, EY * p, 8)

    # zero the never-written z alignment strip so the padded output obeys
    # the zero-padding invariant (whole solves run in this layout; f32
    # garbage could be NaN and 0 * NaN pollutes dots/chains)
    nzb_s, nyb_s = L.nzb, L.nyb  # static grid extents
    ZSTRIP = L.ZT - (nzb_s * R + 1)

    def wz_zero(z0, zrows, y0, ycols):
        cpz = pltpu.make_async_copy(
            zbuf.at[pl.ds(0, zrows), pl.ds(0, ycols), :],
            out_hbm.at[pl.ds(z0, zrows), pl.ds(y0, ycols), :],
            out_sem,
        )
        cpz.start()
        cpz.wait()

    if ZSTRIP > 0:

        @pl.when(k == nzb - 1)
        def _():
            wz_zero(nzb_s * R + 1, ZSTRIP, j * (EY * p), EY * p)

            @pl.when(j == nyb - 1)
            def _():
                wz_zero(nzb_s * R + 1, ZSTRIP, nyb_s * EY * p, 8)


@functools.partial(
    jax.jit, static_argnames=("L", "interpret", "constrained")
)
def _qgrid_call(u, C, a_q, consts, *, L: QGridLayout, interpret,
                constrained=False):
    p, q, EZ = L.p, L.q, L.EZ
    A, R = EZ * q, EZ * p
    YQ8 = EY * q
    dt = L.dtype
    f32 = jnp.float32 if dt != jnp.float64 else jnp.float64

    kernel = functools.partial(
        _qgrid_kernel, L=L, interpret=interpret, constrained=constrained
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    operands = [u.reshape(L.padded_shape), consts.astype(f32)]
    in_specs = [any_spec, pl.BlockSpec(memory_space=pltpu.SMEM)]
    if L.grad_kind in (2, 3):
        K = 3 if L.grad_kind == 2 else 6
        operands.append(C)
        in_specs.append(
            pl.BlockSpec((K, A, YQ8, L.mxq), lambda j, k: (0, k, j, 0))
        )
    if L.val_kind == 2:
        operands.append(a_q)
        in_specs.append(
            pl.BlockSpec((A, YQ8, L.mxq), lambda j, k: (k, j, 0))
        )
    operands += [
        L.yF_S, L.yF_D, L.yB_S, L.yB_D,
        L.xF_S, L.xF_D, L.xB_S, L.xB_D,
    ]
    in_specs += [vmem] * 8
    scratch = [
        pltpu.VMEM((R + 1, YQ8, L.nxp), dt),   # win (node window)
        pltpu.VMEM((YQ8, L.nxp), f32),         # z carry
        # y column carry, ping-pong x per-z-block slots (static sublane
        # offsets; see the kernel's ycar comment)
        pltpu.VMEM(
            (2, L.nzb, _round_up(L.EZ * L.p + 1, 8), L.nxp), f32
        ),
        pltpu.VMEM((R + 1, YQ8, L.nxp), dt),   # out buffer
        pltpu.VMEM((max(R + 1, 8), YQ8, L.nxp), dt),  # zeros (strips)
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ]
    x64_ctx = (
        contextlib.nullcontext() if dt == jnp.float64
        else jax.enable_x64(False)
    )
    with x64_ctx:
        out = pl.pallas_call(
            kernel,
            grid=(L.nyb, L.nzb),
            in_specs=in_specs,
            out_specs=any_spec,
            out_shape=jax.ShapeDtypeStruct(L.padded_shape, dt),
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=L.vmem_limit_bytes,
            ),
        )(*operands)
    return out.reshape(-1)


class build_qgrid_operator:
    """Callable cell loop on layout-padded flat nodal vectors:
    u -> (cell-loop A) u — constraint handling (zero + identity rows)
    stays in the operator epilogue, as the XLA backends do."""

    def __init__(self, mesh, basis, dtype, grad=None, val=None,
                 interpret=False, **opts):
        self.layout = QGridLayout(
            mesh, basis, dtype, grad=grad, val=val, **opts
        )
        self.interpret = interpret

    def _consts(self):
        L = self.layout
        cg = L.c_grad or (0.0, 0.0, 0.0)
        return jnp.asarray([*cg, L.c_val or 0.0])

    def __call__(self, u):
        L = self.layout
        return _qgrid_call(
            u, L.C, L.a_q, self._consts(), L=L, interpret=self.interpret
        )

    def constrained_call(self, u):
        """Constrained apply ``M A M + identity rows`` on padded-flat
        vectors, all in-kernel (input-window masking + boundary-row
        select — M factors per axis as a tensor-product nodal mask).
        Whole solves run in this layout; padding stays zero."""
        L = self.layout
        return _qgrid_call(
            u, L.C, L.a_q, self._consts(), L=L, interpret=self.interpret,
            constrained=True,
        )

    # ------------- explicit-tables form (for user jits) -------------- #
    def tables(self):
        """The operator's streamed-table pytree ``(C, a_q, consts)``.
        Thread these through your own jit and apply with
        :meth:`apply_tables` when the loop body would otherwise capture
        them as closure CONSTANTS — a jit that closes over ``op``
        embeds the coefficient arrays (286 MB of f32 full6 planes at
        mapped-Q3 4M DoFs) into the serialized program, which the axon
        tunnel's remote-compile rejects with HTTP 413 (and is pure
        waste on any backend)."""
        return (self.layout.C, self.layout.a_q, self._consts())

    def apply_tables(self, u, tables, constrained=False):
        C, a_q, consts = tables
        return _qgrid_call(
            u, C, a_q, consts, L=self.layout, interpret=self.interpret,
            constrained=constrained,
        )

    def fold_scale(self, s):
        self.layout.fold_scale(s)

"""Fused Pallas kernel for the separable (collocation) operator apply.

The TPU replacement of the reference hot kernel ``apply_kernel_shmem``
(``README.md:72``; cell kernel C3 ``bp5/step-64.cu:118-194``): one pass over
the nodal grid computing the symmetrically rescaled stencil form

    out = S .* ( Bz_z v + By_y v + Bx_x v ),     v = S .* u

where ``S = sqrt(dz (x) dy (x) dx)`` are the assembled pointwise quadrature
weights and ``B_d = c_d * d^{-1/2} A1_d d^{-1/2}`` the weight-normalized
banded global 1D stiffness factors (half-bandwidth p, see ops/separable.py).
The rescaling folds the three per-axis diagonal combines of the raw form
``cx (dz dy).*A1x u + ...`` into two pointwise scalings, so the inner loop
is exactly 3(2p+1) fused multiply-adds per point into ONE accumulator.

Kernel-owned **vector layout** (the TPU analog of the reference's padded
per-cell storage, ``padding_length`` in L-1): the nodal grid is stored as

    [ZOFF + nz + z_tail,  YOFF + ny + y_tail,  round128(nx)]

with ZOFF = p dead planes and YOFF = 8 dead rows in front. The offsets make
every DMA window start static *and* tile-aligned; dead rows/lanes hold
zeros, the scaled tables vanish there, so zero padding is an invariant of
the operator AND of every elementwise CG update — whole solves run in this
layout with no repacking.

**Z-streaming schedule** (v2): the measured Pallas HBM<->VMEM copy rate on
the dev chip is ~145 GB/s (4x below the chip's 600 GB/s XLA streaming
rate), so the kernel is DMA-bound and the old (z, y)-tiled grid paid a
~2-3.4x halo re-read. Here the grid is (y-blocks, z-blocks) with z
innermost: per y-column the window *slides* in VMEM — shift down BZ
planes, append one freshly DMA'd group of BZ planes — so every u plane is
read from HBM exactly once per y-column (read amplification = only the
y halo, (BY+16)/BY). Output tiles go back via double-buffered async DMA.
Requires BZ >= 2p (window overlap fits in the shifted tail).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "StencilLayout",
    "StackedStencilOperator",
    "build_stencil_operator",
    "constrained_vmult_padded",
    "stencil_plane_padded",
]


def constrained_vmult_padded(stencil, src: jnp.ndarray) -> jnp.ndarray:
    """dst = A src on layout-padded flat vectors with SURFACE-only
    constraint traffic: the kernel's scaling tables carry the Dirichlet
    mask (StencilLayout bakes zeros into the boundary rows of S, so the
    kernel itself computes ``M A M src``), leaving just (a) zeroing the
    pad strips output tiles never cover and (b) copying the 6 boundary
    faces from src (identity rows, ``bp5/step-64.cu:275``) — small
    strided updates XLA performs in place. Whole-plane copies are safe
    because src's dead strips are zero by the layout invariant. Shared by
    every stencil-backed operator (Poisson, Helmholtz)."""
    L = stencil.layout
    p = L.p
    nz, ny, nx = L.real_shape
    shp = L.padded_shape
    zhi = p + L.nzb * L.BZ
    yhi = YOFF + L.nyb * L.BY
    if hasattr(stencil, "constrained_call"):
        # banded kernel: identity faces are selected in-kernel; only the
        # grid-uncovered pad strips remain (one select, no src read)
        dst = stencil.constrained_call(src).reshape(shp)
        z = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        y = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        strip = (z < p) | (z >= zhi) | (y < YOFF) | (y >= yhi)
        dst = jnp.where(strip, jnp.zeros((), dst.dtype), dst)
        return dst.reshape(-1)
    s3 = src.reshape(shp)
    dst = stencil(src).reshape(shp)
    # ONE fused select pass with iota-expression masks (a chain of
    # .at[].set() dynamic-update-slices compiles to ~4 full passes —
    # measured 0.54 ms of a 1.74 ms banded apply at 9.5M padded elems;
    # this form is a single elementwise pass, and large boolean mask
    # constants would explode compile times).
    z = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
    y = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
    x = jax.lax.broadcasted_iota(jnp.int32, shp, 2)
    # (a) pad strips the output tiles never write (grid-uncovered rows)
    strip = (z < p) | (z >= zhi) | (y < YOFF) | (y >= yhi)
    # (b) Dirichlet identity faces; whole padded planes are safe because
    # src's dead strips are zero by the layout invariant
    face = (
        (z == p) | (z == p + nz - 1)
        | (y == YOFF) | (y == YOFF + ny - 1)
        | (x == 0) | (x == nx - 1)
    )
    # explicit-dtype zero: under jax_enable_x64 a weak 0.0 binds f64 and
    # selecting it into a bf16-streaming dst is an unsafe cast
    z0 = jnp.zeros((), dst.dtype)
    dst = jnp.where(strip, z0, jnp.where(face, s3, dst))
    return dst.reshape(-1)

YOFF = 8  # y front pad (supports p <= 8)


def _round_up(x, m):
    return (x + m - 1) // m * m


class StencilLayout:
    """Padded vector layout + scaled band tables for one (mesh, basis).

    Distributed (per-shard) construction: ``phys_elems=(mx_p, my_p, mz_p)``
    restricts table assembly to the first ``m_p`` *physical* elements per
    axis (the rest of the block is dead padding past the global extent,
    reference-style arbitrary-rank-count partitioning), and
    ``faces=(z_lo, z_hi, y_lo, y_hi)`` says which local block faces are
    GLOBAL Dirichlet boundaries (x walls always are — the x axis is never
    partitioned). On non-boundary (shared) faces the scaling vectors keep
    their locally-assembled *partial* weights: the kernel then emits
    partial sums on shared planes which neighboring shards combine with
    one plane exchange per axis — shard-local tables factorize so that
    partials sum exactly to the global operator (see
    ``parallel/dist_pallas.py``)."""

    @staticmethod
    def auto_opts(mesh, degree, dtype=jnp.float32, vmem_budget=96 << 20):
        """Padding-aware tile selection: choose ``(block_z, block_y)``
        minimizing the kernel's dominant cost — total DMA traffic per
        apply, ``padded_total * (1 + WY/BY)`` (window reads amplified by
        the y halo, output tiles written once) — under a conservative
        VMEM estimate. The grid-rounded padding varies 1.4-2.7x with tile
        choice at BP5 sweep shapes, and the measured effect matches the
        proxy (cycle 33: BY=88 beats the old BY=96 default 11.5 vs 10.5
        GDoF/s purely by dropping a third y block; SY-subtile width is
        second-order — the kernel is DMA-bound). Returns ``pallas_opts``
        for the operator constructors."""
        p = degree
        mx, my, mz = mesh.n_elements
        nx, ny, nz = mx * p + 1, my * p + 1, mz * p + 1
        nxp = _round_up(nx, 128)
        ny_eff = _round_up(ny, 8)
        itemsize = jnp.dtype(dtype).itemsize
        best = None
        for BZ in (16, 24, 32):
            if BZ < 2 * p:
                continue
            nzb = -(-(nz + p) // BZ)
            zt = nzb * BZ + 2 * p
            for BY in range(32, max(min(ny_eff, 160), 32) + 1, 8):
                BY = min(BY, ny_eff)
                WY = BY + 2 * YOFF
                nyb = -(-(ny + YOFF) // BY)
                yt = nyb * BY + 2 * YOFF
                SY = next(
                    s for s in range(min(BY, 32), 0, -1)
                    if BY % s == 0 and s % 8 == 0
                )
                # window + 2x input groups + 2x output tiles + the 2p+1
                # roll temporaries Mosaic's scoped accounting sums
                vmem = itemsize * nxp * (
                    (BZ + 2 * p) * WY
                    + 2 * BZ * WY
                    + 2 * BZ * BY
                    + (2 * p + 2) * BZ * SY
                )
                if vmem > vmem_budget:
                    continue
                proxy = zt * yt * (1.0 + WY / BY)
                key = (proxy, -SY, BZ, BY)
                if best is None or key < best[0]:
                    best = (key, BZ, BY)
        if best is None:  # tiny meshes: the constructor's own defaults
            return dict(vmem_limit_bytes=100 << 20)
        return dict(
            block_z=best[1], block_y=best[2], vmem_limit_bytes=100 << 20
        )

    def _setup_geometry(self, mesh, degree, dtype, block_z, block_y,
                        vmem_limit_bytes, stream_dtype):
        """Padded-layout geometry shared by every z-streaming kernel
        (collocated stencil here, banded-separable in ops/pallas_banded.py):
        tile sizes, block counts, padded shape. Table assembly is the
        subclass's job."""
        p = degree
        assert p <= YOFF, f"y halo fixed at {YOFF}, degree {p} too high"
        self.p = p
        self.dtype = jnp.dtype(dtype)
        # reduced-precision STREAMING mode: the padded HBM vectors (and the
        # kernel's DMA traffic, which bounds this kernel on-chip — see
        # ARCHITECTURE.md "measured bounds") are held at ``stream_dtype``
        # (bf16 halves the bytes) while the VMEM window, the band/scale
        # tables, and every tap accumulation stay at the full compute
        # dtype. Per-apply relative operator error is the bf16 rounding of
        # u and of the output (~1e-3); full-accuracy solves recover f64
        # residuals by using this operator as the inner stage of
        # iterative refinement (solvers/ir.py).
        self.stream_dtype = self.dtype if stream_dtype is None else jnp.dtype(
            stream_dtype
        )
        mx, my, mz = mesh.n_elements
        nx, ny, nz = mx * p + 1, my * p + 1, mz * p + 1
        self.real_shape = (nz, ny, nx)

        nxp = _round_up(nx, 128)
        # z-streaming needs the window overlap (2p planes) to fit in the
        # shifted tail: BZ >= 2p
        BZ = _round_up(max(block_z, 2 * p, 8), 8)
        # sublane alignment of the output-tile stores: 8 rows at f32, 16 at
        # bf16 (the packed-sublane granularity Mosaic must prove)
        y_align = 16 if jnp.dtype(self.stream_dtype).itemsize < 4 else 8
        ny_eff = _round_up(ny, y_align)
        if block_y is None:
            # Empirically best on the dev chip (sweep at 12.5M DoFs,
            # nxp=512): BY=32/SY=32. Mosaic's scoped-VMEM accounting sums
            # the 2p+1 roll temporaries, so larger y blocks fail to
            # compile at wide nxp; smaller subtiles run slower.
            block_y = 32
        BY = min(_round_up(block_y, y_align), ny_eff)
        self.BZ, self.BY = BZ, BY
        # Mosaic's scoped-VMEM accounting sums all 2p+1 roll temporaries
        # instead of crediting reuse, so tiles that fit fine at runtime
        # fail the default 16MB check; raising the limit unlocks them.
        self.vmem_limit_bytes = vmem_limit_bytes
        # y-subtile: largest divisor of BY that is <= 32 AND a multiple
        # of 8 — the subtile offsets (YOFF + ys) feed dynamic slices whose
        # sublane alignment Mosaic must prove statically (a non-8-aligned
        # SY, e.g. 22 when ny_eff=88 caps BY, fails to compile). Always
        # exists because BY is rounded up to a multiple of 8.
        self.SY = next(
            s for s in range(min(BY, 32), 0, -1)
            if BY % s == 0 and s % y_align == 0
        )

        self.nzb = -(-(nz + p) // BZ)  # z blocks cover padded rows [0, p+nz)
        self.nyb = -(-(ny + YOFF) // BY)
        zt = self.nzb * BZ + 2 * p  # window max extent
        yt = self.nyb * BY + 2 * YOFF
        self.padded_shape = (zt, yt, nxp)
        self.n = zt * yt * nxp

    def __init__(self, mesh, basis, dtype, block_z=16, block_y=None,
                 vmem_limit_bytes=None, phys_elems=None, faces=None,
                 stream_dtype=None):
        from .separable import _bands_from_dense, band_matrix_1d, diag_vector_1d

        assert basis.collocation, "stencil kernel requires GLL collocation"
        assert mesh.is_uniform, "stencil kernel: uniform meshes only (use separable)"
        self._setup_geometry(
            mesh, basis.degree, dtype, block_z, block_y, vmem_limit_bytes,
            stream_dtype,
        )
        p = self.p
        mx, my, mz = mesh.n_elements
        nz, ny, nx = self.real_shape
        zt, yt, nxp = self.padded_shape

        # ---------------- tables in PADDED coordinates ---------------- #
        # symmetric rescaling: B_d = c_d * d^{-1/2} A1_d d^{-1/2},
        # s_d = sqrt(d) (zeros on all dead rows)
        w, D = basis.q_weights, basis.D
        K_e = np.einsum("q,qa,qb->ab", w, D, D)
        hx, hy, hz = mesh.h
        det = hx * hy * hz
        coef = {"x": det / hx**2, "y": det / hy**2, "z": det / hz**2}
        if phys_elems is None:
            phys_elems = (mx, my, mz)
        if faces is None:
            faces = (True, True, True, True)
        z_lo, z_hi, y_lo, y_hi = faces
        mx_p, my_p, mz_p = phys_elems
        assert mx_p == mx, "x axis is never partitioned/padded"

        def axis(m, m_phys, n_real, off, n_to, c, face_lo, face_hi):
            # assemble over the PHYSICAL elements only: dead elements past
            # the global extent contribute exactly nothing
            n1 = m * p + 1
            A1 = np.zeros((n1, n1))
            d = np.zeros(n1)
            if m_phys > 0:
                n_phys = m_phys * p + 1
                A1[:n_phys, :n_phys] = band_matrix_1d(m_phys, p, K_e)
                d[:n_phys] = diag_vector_1d(m_phys, p, w)
            inv_s = np.where(d > 0, 1.0 / np.sqrt(np.where(d > 0, d, 1.0)), 0.0)
            B = c * (inv_s[:, None] * A1 * inv_s[None, :])
            bands = np.zeros((2 * p + 1, n_to))
            bands[:, off : off + n_real] = _bands_from_dense(B, p)
            s = np.zeros(n_to)
            s[off : off + n_real] = np.sqrt(d)
            # Dirichlet masking baked into the scaling tables: zeroing the
            # boundary rows of the per-axis sqrt-weight vectors makes the
            # pointwise product S vanish exactly on the constrained set (a
            # point is constrained iff ANY axis factor is zero), so the
            # kernel computes M A M — the constrained operator — with ZERO
            # extra traffic. Rows on shared (non-boundary) faces keep their
            # partial weights; rows at or beyond the global extent are all
            # constrained (the physical boundary is Dirichlet anyway).
            if m_phys == 0:
                s[:] = 0.0
                return bands, s
            if face_lo:
                s[off] = 0.0
            if m_phys < m:
                assert face_hi, "interior shards cannot hold dead padding"
            if face_hi:
                s[off + m_phys * p :] = 0.0
            return bands, s

        bx_b, sx = axis(mx, mx_p, nx, 0, nxp, coef["x"], True, True)
        by_b, sy = axis(my, my_p, ny, YOFF, yt, coef["y"], y_lo, y_hi)
        bz_b, sz = axis(mz, mz_p, nz, p, zt, coef["z"], z_lo, z_hi)
        # raw per-axis factors (host copies) for kernels that fold the
        # scaling into the band tables (ops/pallas_cg.py fused CG)
        self.sx_np, self.sy_np, self.sz_np = sx, sy, sz
        self.bx_np, self.by_np, self.bz_np = bx_b, by_b, bz_b
        self.faces = faces

        dt = self.dtype
        # Band-table layouts (see _kernel): z indexed by padded row
        # (sliced on the leading dim); y indexed by static tap row then
        # dynamically sliced on sublanes; x rows are lane vectors.
        self.bz = jnp.asarray(bz_b.T, dt)  # [zt, 2p+1]
        self.by = jnp.asarray(by_b[:, :, None], dt)  # [2p+1, yt, 1]
        self.bx = jnp.asarray(bx_b[:, None, :], dt)  # [2p+1, 1, nxp]
        self.sz = jnp.asarray(sz[:, None], dt)  # [zt, 1]
        self.syx = jnp.asarray(sy[:, None] * sx[None, :], dt)  # [yt, nxp]

    def pad_node_field(self, f3: np.ndarray) -> jnp.ndarray:
        """Place a nodal field ``[nz, ny, nx]`` into OUTPUT-TILE-aligned
        padded coordinates ``[nzb*BZ, nyb*BY, nxp]`` (shifted by
        (-ZOFF, -YOFF) relative to the vector layout, so grid block
        (k, j) starts at exactly (k*BZ, j*BY) — a clean BlockSpec operand
        for per-tile coefficient tables, e.g. the Helmholtz a(x))."""
        nz, ny, nx = self.real_shape
        zt = self.nzb * self.BZ
        yt = self.nyb * self.BY
        out = np.zeros((zt, yt, self.padded_shape[2]))
        out[:nz, :ny, :nx] = np.asarray(f3)
        return jnp.asarray(out, self.dtype)

    # -------------------------- vector transfer ----------------------- #
    def pad_flat(self, u: jnp.ndarray) -> jnp.ndarray:
        nz, ny, nx = self.real_shape
        zt, yt, nxp = self.padded_shape
        u3 = u.reshape(self.real_shape).astype(self.stream_dtype)
        return jnp.pad(
            u3,
            ((self.p, zt - nz - self.p), (YOFF, yt - ny - YOFF), (0, nxp - nx)),
        ).reshape(-1)

    def unpad_flat(self, up: jnp.ndarray) -> jnp.ndarray:
        nz, ny, nx = self.real_shape
        u3 = up.reshape(self.padded_shape)
        return u3[self.p : self.p + nz, YOFF : YOFF + ny, :nx].reshape(-1)

    def active_spec(self):
        """``(shape3, slices)`` of the real (z, y) sub-box for the CG
        solvers' ``active`` knob: elementwise solver updates and dots can
        skip the dead z planes / y rows entirely (they are zero by the
        layout invariant and a fixed point of every update). The x axis is
        kept whole — its dead lanes are zero too, but slicing to ``nx``
        would misalign the 128-lane minor dim for a ~6% traffic saving.
        Cuts solver-side HBM traffic by the z*y padding ratio (~1.5x at
        the BP5 cycle-33 layout)."""
        nz, ny, _ = self.real_shape
        return (
            self.padded_shape,
            (slice(self.p, self.p + nz), slice(YOFF, YOFF + ny), slice(None)),
        )

    def dirichlet_mask_padded(self, mesh) -> jnp.ndarray:
        """Materialized constrained mask (tests / host-side use only)."""
        nz, ny, nx = self.real_shape
        m = np.ones(self.padded_shape, dtype=bool)
        m[self.p : self.p + nz, YOFF : YOFF + ny, :nx] = np.asarray(
            mesh.boundary_dof_mask(self.p)
        ).reshape(self.real_shape)
        return jnp.asarray(m.reshape(-1))


def stencil_plane_padded(u3, bz, by, bx, sz, syx, a_pad, L: "StencilLayout",
                         axis: int, row: int):
    """One output plane of the stencil apply, in plain jnp: the padded-row
    ``row`` slice along ``axis`` (0 = z, 1 = y) of exactly what the fused
    kernel computes, from only the p+1 nearest input planes. This is the
    distributed boundary-partial fast path for the pallas backend (cf.
    ``ops.separable.apply_separable_plane``): the shared plane a shard must
    send depends only on this restricted computation, so the halo
    ``ppermute`` can be issued before — and overlap with — the full kernel.
    Tables are explicit arguments so per-shard shard_map tracers work.
    Returns the plane without the sliced axis (``[yt, nxp]`` or
    ``[zt, nxp]``)."""
    p = L.p
    zt, yt, nxp = L.padded_shape
    nt = 2 * p + 1
    if axis == 0:
        slab = (
            u3[row - p : row + p + 1]
            * sz[row - p : row + p + 1, :, None]
            * syx[None, :, :]
        )
        out = jnp.tensordot(bz[row], slab, axes=(0, 0))  # z taps
        center = slab[p]
        cpad = jnp.pad(center, ((p, p), (0, 0)))
        for t in range(nt):
            out = out + cpad[t : t + yt] * by[t]
        cpad = jnp.pad(center, ((0, 0), (p, p)))
        for t in range(nt):
            out = out + cpad[:, t : t + nxp] * bx[t]
        if a_pad is not None:
            a_plane = jnp.zeros((yt, nxp), a_pad.dtype)
            a_plane = a_plane.at[YOFF : YOFF + a_pad.shape[1]].set(
                a_pad[row - p]
            )
            out = out + center * a_plane
        return out * sz[row] * syx
    assert axis == 1
    slab = (
        u3[:, row - p : row + p + 1]
        * sz[:, 0][:, None, None]
        * syx[row - p : row + p + 1][None, :, :]
    )
    out = jnp.tensordot(by[:, row, 0], slab, axes=(0, 1))  # y taps
    center = slab[:, p]
    cpad = jnp.pad(center, ((p, p), (0, 0)))
    for t in range(nt):
        out = out + cpad[t : t + zt] * bz[:, t][:, None]
    cpad = jnp.pad(center, ((0, 0), (p, p)))
    for t in range(nt):
        out = out + cpad[:, t : t + nxp] * bx[t]
    if a_pad is not None:
        a_plane = jnp.zeros((zt, nxp), a_pad.dtype)
        a_plane = a_plane.at[p : p + a_pad.shape[0]].set(a_pad[:, row - YOFF])
        out = out + center * a_plane
    return out * sz[:, 0][:, None] * syx[row][None, :]


def _kernel(
    u_hbm,
    bz_ref,
    by_ref,
    bx_ref,
    sz_ref,
    syx_ref,
    *rest,
    p: int,
    BZ: int,
    BY: int,
    SY: int,
    nxp: int,
    nzb: int,
    has_value: bool = False,
    mixed: bool = False,
    donated: bool = False,
):
    # ``rest``: [a_ref (tile-blocked value-coefficient operand, Helmholtz
    # only)], [donated output buffer (aliased; written via out_hbm)],
    # out_hbm, then the scratch refs. ``mixed``: u/out stream at a
    # narrower dtype than the f32 window/tables (bf16 streaming mode) —
    # the initial window fill then lands in the narrow ginc/fill2 staging
    # buffers and upconverts on the scale_rows store.
    if has_value:
        a_ref, *rest = rest
    else:
        a_ref = None
    if donated:
        _, *rest = rest  # the donated input ref; written through out_hbm
    if mixed:
        out_hbm, win, ginc, obuf, fill2, fill_sem, inc_sem, out_sem = rest
    else:
        out_hbm, win, ginc, obuf, fill_sem, inc_sem, out_sem = rest
    j = pl.program_id(0)  # y block (outer)
    k = pl.program_id(1)  # z block (inner, fastest)
    WZ, WY = BZ + 2 * p, BY + 2 * YOFF

    def mod2(i):
        # NOT ``i % 2``: jnp.remainder embeds the Python literal as a weak
        # int64 constant under jax_enable_x64, and Mosaic's int64->int32
        # convert lowering self-recurses (RecursionError at trace time)
        return jax.lax.rem(i, jnp.asarray(2, jnp.int32))

    # window k = padded planes [k*BZ, k*BZ+WZ), pre-scaled by S; the output
    # tile is padded planes [k*BZ+p, ..+BZ) x y rows [j*BY+YOFF, ..+BY).
    def scale_rows(z0, rows):
        """S-scale freshly loaded planes (padded rows [z0, z0+len))."""
        return (
            rows
            * sz_ref[pl.ds(z0, rows.shape[0]), :][:, :, None]
            * syx_ref[pl.ds(j * BY, WY), :][None, :, :]
        )

    def prefetch(kk):
        # the BZ planes window kk adds on top of window kk-1
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(kk * BZ + 2 * p, BZ), pl.ds(j * BY, WY), :],
            ginc.at[mod2(kk)],
            inc_sem.at[mod2(kk)],
        )

    if not mixed:

        @pl.when(k == 0)
        def _():
            cp = pltpu.make_async_copy(
                u_hbm.at[pl.ds(0, WZ), pl.ds(j * BY, WY), :], win, fill_sem
            )
            cp.start()
            cp.wait()
            win[...] = scale_rows(0, win[...])

    else:

        @pl.when(k == 0)
        def _():
            # narrow u cannot land in the f32 window directly: stage the
            # first BZ planes in ginc[0] and the 2p overlap tail in fill2
            # (ginc[1] is the k=0 prefetch target), upconvert via the
            # scale_rows stores
            cpa = pltpu.make_async_copy(
                u_hbm.at[pl.ds(0, BZ), pl.ds(j * BY, WY), :],
                ginc.at[0],
                inc_sem.at[0],
            )
            cpb = pltpu.make_async_copy(
                u_hbm.at[pl.ds(BZ, 2 * p), pl.ds(j * BY, WY), :],
                fill2,
                fill_sem,
            )
            cpa.start()
            cpb.start()
            cpa.wait()
            cpb.wait()
            win[0:BZ] = scale_rows(0, ginc[0])
            win[BZ:WZ] = scale_rows(BZ, fill2[...])

    @pl.when(k + 1 < nzb)
    def _():
        prefetch(k + 1).start()

    @pl.when(k > 0)
    def _():
        # slide the window: keep the 2p-plane overlap, append the new group
        win[0 : 2 * p] = win[BZ:WZ]
        prefetch(k).wait()
        win[2 * p : WZ] = scale_rows(k * BZ + 2 * p, ginc[mod2(k)])

    def out_copy(kk):
        return pltpu.make_async_copy(
            obuf.at[mod2(kk)],
            out_hbm.at[pl.ds(kk * BZ + p, BZ), pl.ds(j * BY + YOFF, BY), :],
            out_sem.at[mod2(kk)],
        )

    # output slot reuse: wait for the DMA issued two z-steps ago
    @pl.when(k >= 2)
    def _():
        out_copy(k - 2).wait()

    bz_s = bz_ref[pl.ds(k * BZ + p, BZ), :]  # bands at the output rows
    oslot = mod2(k)

    for ys in range(0, BY, SY):
        # all 3(2p+1) taps accumulate into ONE value (the rescaled form
        # needs no per-axis coefficient combines)
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
        # x taps: STATIC lane rotates (a dynamic-shift roll lowers to
        # ~log2(nx) select stages); wrapped lanes are killed by the zero
        # band entries outside the domain. The shift operand must be an
        # explicit int32: under jax_enable_x64 a Python int binds as an
        # int64 jaxpr constant, and Mosaic's int64->int32 convert lowering
        # self-recurses (RecursionError at trace time).
        for t in range(2 * p + 1):
            shift = (p - t) % nxp  # pltpu.roll requires non-negative shifts
            acc = acc + pltpu.roll(
                c_tile, jnp.asarray(shift, jnp.int32), 2
            ) * bx_ref[t]
        if has_value:
            # Helmholtz value term: diag(d3*a) u = S diag(a) S u, so in the
            # rescaled form it is ONE extra multiply of the scaled input at
            # the output points against the plain a(x) node table
            acc = acc + c_tile * a_ref[:, ys : ys + SY, :]
        # final S scaling at the output coordinates
        acc = (
            acc
            * sz_ref[pl.ds(k * BZ + p, BZ), :][:, :, None]
            * syx_ref[pl.ds(j * BY + YOFF + ys, SY), :][None, :, :]
        )
        obuf[oslot, :, ys : ys + SY, :] = acc.astype(obuf.dtype)

    out_copy(k).start()

    # end of column: drain the outstanding output DMAs
    @pl.when(k == nzb - 1)
    def _():
        out_copy(k).wait()

        @pl.when(nzb >= 2)
        def _():
            out_copy(k - 1).wait()


@functools.partial(jax.jit, static_argnames=("layout", "interpret"))
def _stencil_call(u, bz, by, bx, sz, syx, a_pad=None, out_donate=None, *,
                  layout: StencilLayout, interpret):
    """One fused stencil apply. ``out_donate``: optional padded-flat buffer
    donated as the output (``input_output_aliases``) — the kernel only
    writes the grid-covered tiles, so a donated buffer whose dead strips
    are already zero keeps them zero with NO epilogue traffic (the
    solve-mode fast path, ``vmult_free``)."""
    L = layout
    zt, yt, nxp = L.padded_shape
    WZ, WY = L.BZ + 2 * L.p, L.BY + 2 * YOFF
    has_value = a_pad is not None
    sd = L.stream_dtype  # HBM vector dtype (bf16 streaming mode)
    cd = L.dtype  # window/table compute dtype
    mixed = sd != cd
    kernel = functools.partial(
        _kernel,
        p=L.p,
        BZ=L.BZ,
        BY=L.BY,
        SY=L.SY,
        nxp=nxp,
        nzb=L.nzb,
        has_value=has_value,
        mixed=mixed,
        donated=out_donate is not None,
    )
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + [
        pl.BlockSpec(memory_space=pltpu.VMEM)
    ] * 5
    operands = [u.reshape(L.padded_shape).astype(sd), bz, by, bx, sz, syx]
    if has_value:
        # tile-blocked coefficient operand in output-aligned coordinates
        # (pad_node_field); Pallas pipelines the per-tile DMA
        in_specs.append(
            pl.BlockSpec((L.BZ, L.BY, nxp), lambda j, k: (k, j, 0))
        )
        operands.append(a_pad)
    aliases = {}
    if out_donate is not None:
        aliases = {len(operands): 0}
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(out_donate.reshape(L.padded_shape))
    scratch = [
        pltpu.VMEM((WZ, WY, nxp), cd),
        pltpu.VMEM((2, L.BZ, WY, nxp), sd),
        pltpu.VMEM((2, L.BZ, L.BY, nxp), sd),
    ]
    if mixed:
        scratch.append(pltpu.VMEM((2 * L.p, WY, nxp), sd))
    scratch += [
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    # Trace the kernel call with x64 disabled: under jax_enable_x64 the
    # default BlockSpec index maps (and any Python-int index literal)
    # bind as weak int64 constants, which Mosaic cannot legalize
    # ("func.return (i64, i64)"). On the Mosaic path operands are
    # f32/bf16 and every in-kernel index is explicit int32, so the trace
    # is identical; the f64 interpret path (CPU tests) keeps x64 on.
    x64_ctx = (
        contextlib.nullcontext()
        if cd == jnp.float64
        else jax.enable_x64(False)
    )
    with x64_ctx:
        out = pl.pallas_call(
            kernel,
            grid=(L.nyb, L.nzb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((zt, yt, nxp), sd),
            scratch_shapes=scratch,
            interpret=interpret,
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=L.vmem_limit_bytes,
            ),
        )(*operands)
    return out.reshape(-1)


class StackedStencilOperator:
    """Vector-valued (BP4/6-style) stencil apply in ONE kernel call:
    ``n_components`` z-stacked component slabs share the y/x tables and
    the kernel's grid, so the kernel processes ``n_components *
    n_dofs`` points per launch — at sub-saturation sizes (the kernel
    saturates from ~6M points, RESULTS.md cycle sweep) this runs the
    components at the large-grid rate instead of three separate
    sub-saturated launches (measured: 3x4.17M DoFs p=5 vmult 6.2 vs 2.7
    GDoF/s f32, 6.8 vs 3.1 bf16-streaming — 2.2-2.3x).

    Layout: component k occupies padded z rows ``[k*Sz, (k+1)*Sz)`` with
    ``Sz = nzb*BZ`` (tile-aligned slab stride), its real rows at
    ``k*Sz + p``. Slab-gap rows carry zero band rows and zero scaling
    weights, so z taps never couple components (the same mechanism that
    isolates dead padding in the scalar layout); zero padding stays an
    invariant of the operator and of every CG update, so whole vector
    solves run in the stacked layout. Dirichlet handling mirrors
    ``parallel/dist_pallas.py``: the kernel computes ``M A M`` via the
    S-zeroed tables and one fused ``out + u * m3`` epilogue restores the
    identity rows (per-slab z faces, global y/x faces).

    TPU-native replacement for the reference's vector BPs, which run the
    scalar cell kernel on multi-component vectors sharing metric terms
    (SURVEY.md section 7 step 7; cf. ``bp5/step-64.cu:118-194``)."""

    def __init__(self, mesh, basis, dtype, n_components=3, interpret=False,
                 value_coef=None, **opts):
        base = StencilLayout(mesh, basis, dtype, **opts)
        zt3 = self._init_stacked(base, n_components, interpret)
        nc, Sz, p = self.n_components, self.Sz, base.p
        zt, yt, nxp = base.padded_shape

        # stacked z tables: the scalar band/scale vectors placed at each
        # slab offset (rows beyond p+nz are zero in the scalar tables, so
        # the 2p-row overlap between slab windows adds only zeros)
        bz_np = np.asarray(base.bz)
        sz_np = np.asarray(base.sz)
        bz3 = np.zeros((zt3, bz_np.shape[1]), bz_np.dtype)
        sz3 = np.zeros((zt3, 1), sz_np.dtype)
        for k in range(nc):
            bz3[k * Sz : k * Sz + zt] += bz_np
            sz3[k * Sz : k * Sz + zt] += sz_np

        import copy

        L = copy.copy(base)
        L.bz = jnp.asarray(bz3)
        L.sz = jnp.asarray(sz3)
        # private y/x copies so fold_scale cannot alias a scalar operator
        L.by = base.by * jnp.ones((), base.by.dtype)
        L.bx = base.bx * jnp.ones((), base.bx.dtype)
        L.padded_shape = (zt3, yt, nxp)
        L.nzb = nc * base.nzb
        L.n = zt3 * yt * nxp
        self.layout = L

        # optional collocated value term (vector Helmholtz): the scalar
        # OUTPUT-TILE-aligned coefficient field has exactly Sz = nzb*BZ
        # rows, so the stacked field is a clean per-slab tiling (slab-gap
        # rows never exist in output-tile coordinates)
        if value_coef is None:
            self._a = None
        else:
            a_np = np.asarray(base.pad_node_field(value_coef))
            self._a = jnp.asarray(
                np.tile(a_np, (nc, 1, 1)), base.dtype
            )

    def _init_stacked(self, base, n_components, interpret):
        """Shared stacked-layout geometry: slab stride, total z extent,
        and the identity-row indicator (Dirichlet faces per component
        slab; dead rows are zero in both u and out, so marking only the
        real faces suffices). Used by this class and the banded stacked
        operator (ops/pallas_banded.py)."""
        self.base = base
        self.n_components = nc = n_components
        self.interpret = interpret
        p = base.p
        zt, yt, nxp = base.padded_shape
        Sz = base.nzb * base.BZ  # tile-aligned slab stride (>= p + nz)
        self.Sz = Sz
        zt3 = nc * Sz + 2 * p

        nz, ny, nx = base.real_shape
        mz1 = np.zeros(zt3)
        for k in range(nc):
            mz1[k * Sz + p] = 1.0
            mz1[k * Sz + p + nz - 1] = 1.0
        my1 = np.zeros(yt)
        my1[YOFF] = my1[YOFF + ny - 1] = 1.0
        mx1 = np.zeros(nxp)
        mx1[0] = mx1[nx - 1] = 1.0
        dt = base.dtype
        self._m3 = (
            jnp.maximum(
                jnp.maximum(
                    jnp.asarray(mz1, dt)[:, None, None],
                    jnp.asarray(my1, dt)[None, :, None],
                ),
                jnp.asarray(mx1, dt)[None, None, :],
            )
        )
        return zt3

    # ------------------------- vector transfer ------------------------- #
    def pad_flat(self, u: jnp.ndarray) -> jnp.ndarray:
        """``[n_components, n_dofs]`` -> stacked padded flat vector."""
        B = self.base
        nc, p = self.n_components, B.p
        nz, ny, nx = B.real_shape
        _, yt, nxp = B.padded_shape
        u4 = u.reshape(nc, nz, ny, nx).astype(B.stream_dtype)
        u4 = jnp.pad(
            u4,
            (
                (0, 0),
                (p, self.Sz - p - nz),
                (YOFF, yt - ny - YOFF),
                (0, nxp - nx),
            ),
        ).reshape(nc * self.Sz, yt, nxp)
        return jnp.pad(u4, ((0, 2 * p), (0, 0), (0, 0))).reshape(-1)

    def unpad_flat(self, up: jnp.ndarray) -> jnp.ndarray:
        B = self.base
        nc, p = self.n_components, B.p
        nz, ny, nx = B.real_shape
        zt3, yt, nxp = self.layout.padded_shape
        u4 = up.reshape(zt3, yt, nxp)[: nc * self.Sz].reshape(
            nc, self.Sz, yt, nxp
        )
        return u4[:, p : p + nz, YOFF : YOFF + ny, :nx].reshape(nc, -1)

    # ----------------------------- apply ------------------------------- #
    def vmult_padded(self, u: jnp.ndarray) -> jnp.ndarray:
        L = self.layout
        p = L.p
        shp = L.padded_shape
        out = _stencil_call(
            u, L.bz, L.by, L.bx, L.sz, L.syx, self._a,
            layout=L, interpret=self.interpret,
        ).reshape(shp)
        return self._stacked_epilogue(out, u)

    def _stacked_epilogue(self, out, u):
        """ONE fused epilogue pass: zero the pad strips the output tiles
        never write (iota-expression masks — an .at[].set() chain
        compiles to ~4 full passes, see constrained_vmult_padded) and
        restore the identity faces (out is 0 there via the S-zeroed
        tables), cast back to the streaming dtype. Shared with the
        banded stacked operator."""
        L = self.layout
        p = L.p
        shp = L.padded_shape
        u3 = u.reshape(shp)
        z = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        y = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        strip = (
            (z < p) | (z >= p + L.nzb * L.BZ)
            | (y < YOFF) | (y >= YOFF + L.nyb * L.BY)
        )
        out = jnp.where(strip, jnp.zeros((), u.dtype),
                        (out + u3 * self._m3).astype(u.dtype))
        return out.reshape(-1)

    def vmult_free(self, u: jnp.ndarray, out_donate: jnp.ndarray):
        """Donated-buffer bare-kernel apply (see
        ``build_stencil_operator.vmult_free``): ``M A M`` on the stacked
        layout with no strip/face epilogue — exact on vectors that are
        zero on the constrained set and the dead strips (every CG vector
        of an assembled-rhs solve)."""
        L = self.layout
        return _stencil_call(
            u, L.bz, L.by, L.bx, L.sz, L.syx, self._a, out_donate,
            layout=L, interpret=self.interpret,
        )

    def __call__(self, u):
        return self.vmult_padded(u)

    def fold_scale(self, s: float) -> None:
        L = self.layout
        L.bz, L.by, L.bx = L.bz * s, L.by * s, L.bx * s
        if self._a is not None:
            self._a = self._a * s


class build_stencil_operator:
    """Callable: flat padded u -> flat padded A_cell_loop(u).

    ``value_coef``: optional nodal coefficient field ``[nz, ny, nx]``
    (host array) adding the collocated value term ``diag(d3 * a) u`` —
    the GLL Helmholtz kernel (one extra FMA per point + one streamed
    coefficient tile)."""

    def __init__(self, mesh, basis, dtype, block_z=16, block_y=None,
                 interpret=False, vmem_limit_bytes=None, value_coef=None,
                 phys_elems=None, faces=None, stream_dtype=None):
        self.layout = StencilLayout(
            mesh, basis, dtype, block_z, block_y,
            vmem_limit_bytes=vmem_limit_bytes,
            phys_elems=phys_elems, faces=faces, stream_dtype=stream_dtype,
        )
        self.interpret = interpret
        # raw field kept for the stacked (vector) wrapper, which re-pads
        # it per component slab (models/vector.py)
        self._value_coef_np = value_coef
        self._a = (
            None if value_coef is None
            else self.layout.pad_node_field(value_coef)
        )

    def __call__(self, u_padded_flat: jnp.ndarray) -> jnp.ndarray:
        L = self.layout
        return _stencil_call(
            u_padded_flat,
            L.bz,
            L.by,
            L.bx,
            L.sz,
            L.syx,
            self._a,
            layout=L,
            interpret=self.interpret,
        )

    def vmult_free(self, u_padded_flat, out_donate):
        """Bare-kernel apply ``M A M u`` with a DONATED output buffer: the
        kernel writes only the grid-covered tiles, so a donated buffer
        whose dead strips are zero keeps them zero with NO epilogue
        traffic. Solve-mode fast path: when the rhs is zero on Dirichlet
        rows (as every assembled rhs is), all CG vectors stay zero on the
        constrained set, the identity rows are inert, and
        ``constrained_vmult_padded``'s strip/face epilogue (~25% of the
        apply at cycle 33) is unnecessary. See solve_cg_merged's
        ``A_donate``."""
        L = self.layout
        return _stencil_call(
            u_padded_flat, L.bz, L.by, L.bx, L.sz, L.syx, self._a,
            out_donate, layout=L, interpret=self.interpret,
        )

"""Fused Pallas kernel for the separable (collocation) operator apply.

The TPU replacement of the reference hot kernel ``apply_kernel_shmem``
(``README.md:72``; cell kernel C3 ``bp5/step-64.cu:118-194``): one pass over
the nodal grid computing

    out = cx * (dz dy) .* A1x_x u  +  cy * (dz dx) .* A1y_y u
                                   +  cz * (dy dx) .* A1z_z u

where each ``A1`` is the banded global 1D stiffness (half-bandwidth p, see
ops/separable.py) applied as a (2p+1)-point stencil on the VPU, and ``d``
are the assembled pointwise quadrature weights. All three axis stencils and
the diagonal combine happen on one VMEM tile: u is read from HBM once per
tile (plus the stencil halo), dst written once — the traffic-optimal
schedule the CUDA kernel approximates with shared memory.

Kernel-owned **vector layout** (the TPU analog of the reference's padded
per-cell storage, ``padding_length`` in L-1): the nodal grid is stored as

    [ZOFF + nz + z_tail,  YOFF + ny + y_tail,  round128(nx)]

with ZOFF = p dead planes and YOFF = 8 dead rows in front. The offsets make
every DMA window start static *and* tile-aligned (z offsets live on the
untiled leading dim; y offsets are multiples of 8 = sublane tiles; x is
never blocked), so all stencil taps are static slices. Dead rows/lanes hold
zeros: the assembled band/diag tables vanish there, so zero padding is an
invariant of the operator AND of every elementwise CG update — whole solves
run in this layout with no repacking.

Grid = (z-blocks, y-blocks); each step DMAs its halo'd window
``[BZ+2p, BY+16, nxp]`` into scratch (halo overlap is the only re-read) and
writes its ``[BZ, BY, nxp]`` output tile back with an explicit DMA.

Specific to the "diag (x) diag (x) band" (GLL collocation) structure of
BP5/BP6 with p <= 8 (YOFF=8 bounds the y halo); full-Gauss variants use the
jnp separable path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["StencilLayout", "build_stencil_operator"]

YOFF = 8  # y front pad (supports p <= 8)


def _round_up(x, m):
    return (x + m - 1) // m * m


class StencilLayout:
    """Padded vector layout + band tables for one (mesh, basis, blocking)."""

    def __init__(self, mesh, basis, dtype, block_z=8, block_y=32, vmem_budget=2 * 2**20):
        from .separable import _bands_from_dense, band_matrix_1d, diag_vector_1d

        assert basis.collocation, "stencil kernel requires GLL collocation"
        assert mesh.is_uniform, "stencil kernel: uniform meshes only (use separable)"
        p = basis.degree
        assert p <= YOFF, f"y halo fixed at {YOFF}, degree {p} too high"
        self.p = p
        self.dtype = jnp.dtype(dtype)
        mx, my, mz = mesh.n_elements
        nx, ny, nz = mx * p + 1, my * p + 1, mz * p + 1
        self.real_shape = (nz, ny, nx)

        nxp = _round_up(nx, 128)
        BZ = _round_up(max(block_z, 8), 8)
        # pick BY from the VMEM budget for the window [BZ+2p, BY+16, nxp]
        if block_y is None:
            itemsize = self.dtype.itemsize
            by_max = vmem_budget // ((BZ + 2 * p) * nxp * itemsize) - 16
            block_y = max(8, by_max // 8 * 8)
        BY = _round_up(block_y, 8)
        ny_eff = _round_up(ny, 8)
        BY = min(BY, ny_eff)
        self.BZ, self.BY = BZ, BY

        self.nzb = -(-(nz + p) // BZ)  # blocks cover padded rows [0, p+nz)
        self.nyb = -(-(ny + YOFF) // BY)
        zt = self.nzb * BZ + 2 * p  # window max extent
        yt = self.nyb * BY + 2 * YOFF
        self.padded_shape = (zt, yt, nxp)
        self.n = zt * yt * nxp

        # tables in PADDED coordinates (zeros on all dead rows)
        w, D = basis.q_weights, basis.D
        K_e = np.einsum("q,qa,qb->ab", w, D, D)

        def axis(m, n_real, off, n_to):
            A1 = band_matrix_1d(m, p, K_e)
            b = np.zeros((2 * p + 1, n_to))
            b[:, off : off + n_real] = _bands_from_dense(A1, p)
            d = np.zeros(n_to)
            d[off : off + n_real] = diag_vector_1d(m, p, w)
            return b, d

        bx_b, dx = axis(mx, nx, 0, nxp)
        by_b, dy = axis(my, ny, YOFF, yt)
        bz_b, dz = axis(mz, nz, 0, self.nzb * BZ)  # tile coords (real z = row)

        hx, hy, hz = mesh.h
        det = hx * hy * hz
        self.coef = (det / hx**2, det / hy**2, det / hz**2)
        dt = self.dtype
        # Band-table layouts (see _kernel): z sliced on sublanes in tile
        # coords; y indexed by static tap row then dynamically sliced on
        # sublanes; x rows are lane vectors behind a leading singleton.
        self.bz = jnp.asarray(bz_b.T, dt)  # [nzb*BZ, 2p+1]
        self.by = jnp.asarray(by_b[:, :, None], dt)  # [2p+1, yt, 1]
        self.bx = jnp.asarray(bx_b[:, None, :], dt)  # [2p+1, 1, nxp]
        self.dz = jnp.asarray(dz[:, None], dt)  # [nzb*BZ, 1]
        self.dy = jnp.asarray(dy[:, None], dt)  # [yt, 1]
        self.dx = jnp.asarray(dx[None, :], dt)  # [1, nxp]

    # -------------------------- vector transfer ----------------------- #
    def pad_flat(self, u: jnp.ndarray) -> jnp.ndarray:
        nz, ny, nx = self.real_shape
        zt, yt, nxp = self.padded_shape
        u3 = u.reshape(self.real_shape)
        return jnp.pad(
            u3,
            ((self.p, zt - nz - self.p), (YOFF, yt - ny - YOFF), (0, nxp - nx)),
        ).reshape(-1)

    def unpad_flat(self, up: jnp.ndarray) -> jnp.ndarray:
        nz, ny, nx = self.real_shape
        u3 = up.reshape(self.padded_shape)
        return u3[self.p : self.p + nz, YOFF : YOFF + ny, :nx].reshape(-1)

    def constrained_mask_expr(self):
        """Constrained mask in padded coords as a *traced expression* (from
        iota comparisons — a materialized bool constant would bloat the jit
        program by n bytes and blow up compile times). Dead (padding)
        entries count as constrained: output tiles never cover them, so the
        final ``where(mask, src, dst)`` restores their zero src values —
        zero padding stays an invariant with no extra traffic.

        Constrained = NOT strictly-interior: on a full-Dirichlet brick the
        boundary plus all padding is exactly the complement of the open box.
        Returns broadcastable bool [zt, yt, nxp] factors combined lazily."""
        nz, ny, nx = self.real_shape
        zt, yt, nxp = self.padded_shape
        p = self.p
        zi = jax.lax.broadcasted_iota(jnp.int32, (zt, 1, 1), 0)
        yi = jax.lax.broadcasted_iota(jnp.int32, (1, yt, 1), 1)
        xi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nxp), 2)
        interior = (
            (zi >= p + 1)
            & (zi <= p + nz - 2)
            & (yi >= YOFF + 1)
            & (yi <= YOFF + ny - 2)
            & (xi >= 1)
            & (xi <= nx - 2)
        )
        return jnp.logical_not(interior)

    def dirichlet_mask_padded(self, mesh) -> jnp.ndarray:
        """Materialized constrained mask (tests / host-side use only)."""
        nz, ny, nx = self.real_shape
        m = np.ones(self.padded_shape, dtype=bool)
        m[self.p : self.p + nz, YOFF : YOFF + ny, :nx] = np.asarray(
            mesh.boundary_dof_mask(self.p)
        ).reshape(self.real_shape)
        return jnp.asarray(m.reshape(-1))


def _kernel(
    u_hbm,
    bz_ref,
    by_ref,
    bx_ref,
    dz_ref,
    dy_ref,
    dx_ref,
    out_hbm,
    win,
    obuf,
    in_sem,
    out_sem,
    *,
    p: int,
    BZ: int,
    BY: int,
    nxp: int,
    nyb: int,
    cx: float,
    cy: float,
    cz: float,
):
    s = pl.program_id(0)
    i = s // nyb
    j = s % nyb
    WZ, WY = BZ + 2 * p, BY + 2 * YOFF

    # window: padded rows [i*BZ, i*BZ+WZ) x [j*BY, j*BY+WY) x all lanes;
    # the output tile is padded rows [i*BZ+p, ..+BZ) x [j*BY+YOFF, ..+BY).
    # Windows are double-buffered: step s prefetches step s+1's window
    # before computing, so the HBM read overlaps the tile compute.
    def dma_for(step, slot):
        ii = step // nyb
        jj = step % nyb
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(ii * BZ, WZ), pl.ds(jj * BY, WY), :],
            win.at[slot],
            in_sem.at[slot],
        )

    slot = s % 2

    @pl.when(s == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(s + 1 < pl.num_programs(0))
    def _():
        dma_for(s + 1, (s + 1) % 2).start()

    dma_for(s, slot).wait()
    win = win.at[slot]

    dz_b = dz_ref[pl.ds(i * BZ, BZ), :][:, :, None]  # [BZ,1,1] (tile coords)
    dy_b = dy_ref[pl.ds(j * BY + YOFF, BY), :][None, :, :]  # [1,BY,1]
    dx_b = dx_ref[...][None, :, :]  # [1,1,nxp]
    bz_s = bz_ref[pl.ds(i * BZ, BZ), :]  # [BZ, 2p+1] (tile coords)

    # All three axis stencils run as taps on the VPU; each axis accumulates
    # in a register/VMEM value and lands in the output tile with one write
    # (one live accumulator + one tap transient — fits Mosaic's
    # conservative scoped-VMEM accounting and avoids 33 read-modify-writes
    # of the tile). Per-tile MXU matmuls were tried and lose: [BZ, WZ]-
    # sized operands leave the 128x128 systolic array ~1% utilized and the
    # y-result needs a swap.
    czz = cz * dy_b * dx_b
    cyy = cy * dz_b * dx_b
    cxx = cx * dz_b * dy_b

    # z taps: leading-dim window slices (free), band columns per tile row
    acc = win[0:BZ, YOFF : YOFF + BY, :] * bz_s[:, 0][:, None, None]
    for k in range(1, 2 * p + 1):
        acc = acc + win[k : k + BZ, YOFF : YOFF + BY, :] * bz_s[:, k][:, None, None]
    obuf[...] = (czz * acc).astype(obuf.dtype)

    # y taps: static sublane-shifted window slices; tap k reads window rows
    # (YOFF - p + k + yy) [out row yy sits at window row YOFF + yy]; band
    # rows at padded coords (by_ref is [2p+1, yt, 1])
    acc = None
    for k in range(2 * p + 1):
        o = YOFF - p + k
        t = win[p : p + BZ, o : o + BY, :] * by_ref[k, pl.ds(j * BY + YOFF, BY), :][
            None, :, :
        ]
        acc = t if acc is None else acc + t
    obuf[...] += (cyy * acc).astype(obuf.dtype)

    # x taps: STATIC lane rotates (a dynamic-shift roll lowers to
    # ~log2(nx) select stages and dominated the kernel). roll by (p-t)
    # puts u[x + (t-p)] at x; wrapped lanes are killed by the zero band
    # entries (bx[., x] = 0 whenever tap x+k falls outside the domain).
    c_tile = win[p : p + BZ, YOFF : YOFF + BY, :]
    acc = None
    for t in range(2 * p + 1):
        shift = (p - t) % nxp  # pltpu.roll requires non-negative shifts
        r = pltpu.roll(c_tile, shift, 2) * bx_ref[t]
        acc = r if acc is None else acc + r
    obuf[...] += (cxx * acc).astype(obuf.dtype)
    cp_out = pltpu.make_async_copy(
        obuf,
        out_hbm.at[pl.ds(i * BZ + p, BZ), pl.ds(j * BY + YOFF, BY), :],
        out_sem,
    )
    cp_out.start()
    cp_out.wait()


@functools.partial(jax.jit, static_argnames=("layout", "interpret"))
def _stencil_call(u, bz, by, bx, dz, dy, dx, *, layout: StencilLayout, interpret):
    L = layout
    zt, yt, nxp = L.padded_shape
    cx, cy, cz = L.coef
    kernel = functools.partial(
        _kernel,
        p=L.p,
        BZ=L.BZ,
        BY=L.BY,
        nxp=nxp,
        nyb=L.nyb,
        cx=cx,
        cy=cy,
        cz=cz,
    )
    out = pl.pallas_call(
        kernel,
        grid=(L.nzb * L.nyb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((zt, yt, nxp), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, L.BZ + 2 * L.p, L.BY + 2 * YOFF, nxp), u.dtype),
            pltpu.VMEM((L.BZ, L.BY, nxp), u.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(u.reshape(L.padded_shape), bz, by, bx, dz, dy, dx)
    return out.reshape(-1)


class build_stencil_operator:
    """Callable: flat padded u -> flat padded A_cell_loop(u)."""

    def __init__(self, mesh, basis, dtype, block_z=8, block_y=32, interpret=False):
        self.layout = StencilLayout(mesh, basis, dtype, block_z, block_y)
        self.interpret = interpret

    def __call__(self, u_padded_flat: jnp.ndarray) -> jnp.ndarray:
        L = self.layout
        return _stencil_call(
            u_padded_flat,
            L.bz,
            L.by,
            L.bx,
            L.dz,
            L.dy,
            L.dx,
            layout=L,
            interpret=self.interpret,
        )

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

        _, dx = axis(mx, nx, 0, nxp)
        _, dy = axis(my, ny, YOFF, yt)
        _, dz = axis(mz, nz, 0, self.nzb * BZ)  # tile coords (real z = row)

        # Per-tile dense band matrices: each axis stencil becomes one small
        # MXU matmul against the window (no shifted slices -> no vector
        # relayouts). A1 entries outside the real domain are zero, so dead
        # rows/halos contribute nothing.
        def dense_axis(m, n_real):
            return band_matrix_1d(m, p, K_e)  # [n_real, n_real]

        A1x = dense_axis(mx, nx)
        A1y = dense_axis(my, ny)
        A1z = dense_axis(mz, nz)

        def take(A, r0, nr, c0, nc):
            """A[r0:r0+nr, c0:c0+nc] with zero fill outside [0,n)^2."""
            out = np.zeros((nr, nc))
            rlo, rhi = max(0, -r0), min(nr, A.shape[0] - r0)
            clo, chi = max(0, -c0), min(nc, A.shape[1] - c0)
            if rlo < rhi and clo < chi:
                out[rlo:rhi, clo:chi] = A[r0 + rlo : r0 + rhi, c0 + clo : c0 + chi]
            return out

        WZ, WY = BZ + 2 * p, BY + 2 * YOFF
        # out real z = i*BZ + r; window col c <-> real z = i*BZ + c - p
        Bz_t = np.stack(
            [take(A1z, i * BZ, BZ, i * BZ - p, WZ) for i in range(self.nzb)]
        )
        # out real y = j*BY + r; window col c <-> real y = j*BY + c - YOFF
        By_t = np.stack(
            [take(A1y, j * BY, BY, j * BY - YOFF, WY) for j in range(self.nyb)]
        )
        # x stays in band (tap) form: lane shifts are cheap on the VPU and
        # a dense [nxp, nxp] matmul would dominate the FLOP count
        bx_bands = np.zeros((2 * p + 1, nxp))
        bx_bands[:, :nx] = _bands_from_dense(A1x, p)

        hx, hy, hz = mesh.h
        det = hx * hy * hz
        self.coef = (det / hx**2, det / hy**2, det / hz**2)
        dt = self.dtype
        self.bz = jnp.asarray(Bz_t, dt)  # [nzb, BZ, WZ]
        self.by = jnp.asarray(By_t, dt)  # [nyb, BY, WY]
        # leading singleton so dynamic tap indexing hits the unconstrained
        # leading dim: bx[t] -> [1, nxp]
        self.bx = jnp.asarray(bx_bands[:, None, :], dt)  # [2p+1, 1, nxp]
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

    dz_s = dz_ref[pl.ds(i * BZ, BZ), :]  # [BZ, 1] (tile coords)
    dy_s = dy_ref[pl.ds(j * BY + YOFF, BY), :]  # [BY, 1]
    dx_v = dx_ref[...]  # [1, nxp]
    Bz_i = bz_ref[i]  # [BZ, WZ]
    By_j = by_ref[j]  # [BY, WY]

    dz_b = dz_s[:, :, None]  # [BZ,1,1]
    dy_b = dy_s[None, :, :]  # [1,BY,1]
    dx_b = dx_v[None, :, :]  # [1,1,nxp]

    hp = jax.lax.Precision.HIGHEST
    acc_t = win.dtype

    # One small MXU matmul per axis (dot_general orders: batch, lhs-free,
    # rhs-free — chosen so no result transposes are needed for x and z).
    # Terms are accumulated into the VMEM-resident output tile one at a
    # time so at most one term transient is live (VMEM is the limit).

    # z term (MXU): Bz_i [BZ, WZ] x win[:, c, :] [WZ, BY, nxp]
    tz = jax.lax.dot_general(
        Bz_i, win[:, YOFF : YOFF + BY, :], (((1,), (0,)), ((), ())),
        precision=hp, preferred_element_type=acc_t,
    )
    obuf[...] = ((cz * dy_b * dx_b) * tz).astype(obuf.dtype)

    # y term (MXU): win[c] [BZ, WY, nxp] x By_j [BY, WY] -> swap last two
    ty = jax.lax.dot_general(
        win[p : p + BZ, :, :], By_j, (((1,), (1,)), ((), ())),
        precision=hp, preferred_element_type=acc_t,
    )
    obuf[...] += ((cy * dz_b * dx_b) * jnp.swapaxes(ty, 1, 2)).astype(obuf.dtype)

    # x term (VPU): 2p+1 lane-rotated taps, STATIC shifts (one cheap lane
    # rotate each; a dynamic-shift roll lowers to ~log2(nx) select stages
    # and dominated the kernel). roll(c, p-t)[x] = u[x + (t-p)]; wrapped
    # lanes are killed by the zero band entries (bx[., x] = 0 whenever tap
    # x+k falls outside the real domain). Accumulate into the VMEM tile so
    # only one tap transient is live.
    c_tile = win[p : p + BZ, YOFF : YOFF + BY, :]
    cxb = cx * dz_b * dy_b
    for t in range(2 * p + 1):
        shift = (p - t) % nxp  # pltpu.roll requires non-negative shifts
        obuf[...] += (cxb * (pltpu.roll(c_tile, shift, 2) * bx_ref[t])).astype(
            obuf.dtype
        )
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

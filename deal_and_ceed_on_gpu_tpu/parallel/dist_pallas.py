"""Distributed fused Pallas stencil operator: the flagship hot kernel
(``ops/pallas_stencil.py``, the TPU ``apply_kernel_shmem``) running under
``shard_map`` at any shard count — the reference's core property of one hot
kernel + ghost exchange at every rank count (``bp5/step-64.cu:241,704-708``).

Design: every shard runs the UNMODIFIED single-chip kernel on its padded
local block with *per-shard* scaling/band tables (stacked sharded operands):

- band factors ``A1_d`` are assembled from the shard's physical elements
  only, so rows on shared planes hold partial sums;
- the pointwise scalings ``s_d = sqrt(d_d)`` keep their locally-assembled
  partial weights on shared planes (and zeros on global-boundary/dead rows).

The shard-local output then factorizes exactly: per axis term the kernel
emits ``c_z * (dy_loc ⊗ dx) * A1z_loc`` — the z-partiality (band rows) and
y-partiality (weights) are independent factors, so summing the 2 (plane) or
4 (corner line) sharers' values reproduces the global operator bit-for-bit
in exact arithmetic. Two combine schedules:

- ``overlap=False``: one bidirectional plane ``ppermute``-and-add per
  partitioned axis after the kernel (z first, so corner lines resolve by
  the y exchange carrying z-pair sums — ``halo_combine`` in padded
  coordinates). Coherent across sharers by commutativity of fp addition.
- ``overlap=True`` (default): the shared-plane values are computed first by
  the restricted plane apply (:func:`..ops.pallas_stencil
  .stencil_plane_padded` — one plane's work), the halo ``ppermute``s are
  issued on those, and the full kernel — which depends on none of the
  received data — runs while they fly; shared planes are then *replaced*
  by position-ordered symmetric sums (the reference's
  ``overlap_communication_computation``, same structure as
  ``dist_operator._vmult_overlap`` incl. the 4-quadrant corner exchange).

Constraint handling stays in-kernel (S-zeroing on global Dirichlet rows
computes ``M A M``); the identity rows cost one fused ``out + u * mask``
epilogue built from three tiny per-shard 1D mask vectors.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..fe_space import FESpace
from ..ops.pallas_stencil import (
    YOFF,
    StencilLayout,
    _stencil_call,
    stencil_plane_padded,
)
from ..solvers.cg import solve_cg
from ..solvers.cg_merged import solve_cg_merged
from ..solvers.control import SolverControl
from .dist_solve import make_device_mesh
from .partition import BlockPartition

__all__ = [
    "DistStencilOperator",
    "make_dist_vmult_pallas",
    "solve_cg_dist_pallas",
    "solve_cg_merged_dist_pallas",
]

_TABLE_NAMES = ("bz", "by", "bx", "sz", "syx", "mz1", "my1", "mx1", "wz", "wy")


class DistStencilOperator:
    """SPMD fused-stencil operator over a :class:`BlockPartition`.

    ``operator``: "poisson" (BP5) or "helmholtz" (adds the collocated value
    term ``a(x)``, streamed as one per-shard coefficient operand).
    ``pallas_opts``: block_z / block_y / vmem_limit_bytes tile tuning,
    identical to the single-chip ``PoissonOperator(backend="pallas")``.
    """

    def __init__(
        self,
        part: BlockPartition,
        dtype=jnp.float32,
        operator: str = "poisson",
        coefficient_fn=None,
        pallas_opts: dict | None = None,
        interpret: bool = False,
        overlap: bool = True,
    ):
        if not part.mesh.is_uniform:
            raise ValueError("stencil kernel: uniform meshes only")
        if getattr(part, "px", 1) > 1:
            raise ValueError(
                "stencil layout: the x (lane) axis is never partitioned — "
                "use a pz x py decomposition"
            )
        self.part = part
        self.interpret = interpret
        self.overlap = overlap
        self.dtype = jnp.dtype(dtype)
        self._solver_cache = {}
        if pallas_opts is None:
            # padding-aware tile selection on the shard-local block (the
            # same auto default as the single-chip operator path)
            pallas_opts = StencilLayout.auto_opts(
                part.local_mesh, part.degree, dtype
            )

        space_loc = FESpace.create(
            part.local_mesh, part.degree, rule="gauss_lobatto", dtype=dtype
        )
        basis = space_loc.basis
        p = part.degree
        mx, my_g, mz_g = part.mesh.n_elements
        mzl, myl = part.mz_local, part.my_local
        nz_g, ny_g, nx = part.global_grid_shape

        self._has_value = operator == "helmholtz"
        if self._has_value:
            if coefficient_fn is None:
                from ..models.helmholtz import default_coefficient

                coefficient_fn = default_coefficient
            # a(x) * det on the GLOBAL node grid (the kernel's S^2 is the
            # unit-cell weight product; cf. models/helmholtz.py pallas path)
            nodes = basis.nodes
            cx, cy, cz = part.mesh.node_coords_1d(p, nodes)
            X = np.zeros((nz_g, ny_g, nx, 3))
            X[..., 0] = cx[None, None, :]
            X[..., 1] = cy[None, :, None]
            X[..., 2] = cz[:, None, None]
            hx, hy, hz = part.mesh.h
            a_glob = np.asarray(coefficient_fn(X), dtype=np.float64) * (
                hx * hy * hz
            )
            a_blocks = part.to_blocks(a_glob)
        elif operator != "poisson":
            raise ValueError(f"unknown stencil operator {operator!r}")

        # ------------- per-shard layouts + stacked tables ------------- #
        layouts = []
        tables = {name: [] for name in _TABLE_NAMES}
        a_pads = []
        nzl_nodes, nyl_nodes, _ = part.local_grid_shape
        for iz in range(part.pz):
            for iy in range(part.py):
                mz_p = int(np.clip(mz_g - iz * mzl, 0, mzl))
                my_p = int(np.clip(my_g - iy * myl, 0, myl))
                faces = (
                    iz == 0,
                    (iz + 1) * mzl >= mz_g,
                    iy == 0,
                    (iy + 1) * myl >= my_g,
                )
                L = StencilLayout(
                    part.local_mesh,
                    basis,
                    dtype,
                    **(pallas_opts or {}),
                    phys_elems=(mx, my_p, mz_p),
                    faces=faces,
                )
                layouts.append(L)
                tables["bz"].append(L.bz)
                tables["by"].append(L.by)
                tables["bx"].append(L.bx)
                tables["sz"].append(L.sz)
                tables["syx"].append(L.syx)
                zt, yt, nxp = L.padded_shape
                # constrained-row indicator vectors (global Dirichlet
                # boundary or beyond — subsumes dead padding rows)
                gz = iz * mzl * p + np.arange(nzl_nodes)
                mz1 = np.zeros(zt)
                mz1[p : p + nzl_nodes] = (gz == 0) | (gz >= nz_g - 1)
                gy = iy * myl * p + np.arange(nyl_nodes)
                my1 = np.zeros(yt)
                my1[YOFF : YOFF + nyl_nodes] = (gy == 0) | (gy >= ny_g - 1)
                mx1 = np.zeros(nxp)
                mx1[0] = mx1[nx - 1] = 1.0
                tables["mz1"].append(jnp.asarray(mz1, self.dtype))
                tables["my1"].append(jnp.asarray(my1, self.dtype))
                tables["mx1"].append(jnp.asarray(mx1, self.dtype))
                # dot weights: own all local physical rows except the
                # shared last plane (owned by the axis-next shard)
                wz = np.zeros(zt)
                wz[p : p + nzl_nodes] = 1.0
                if iz < part.pz - 1:
                    wz[p + nzl_nodes - 1] = 0.0
                wy = np.zeros(yt)
                wy[YOFF : YOFF + nyl_nodes] = 1.0
                if iy < part.py - 1:
                    wy[YOFF + nyl_nodes - 1] = 0.0
                tables["wz"].append(jnp.asarray(wz, self.dtype))
                tables["wy"].append(jnp.asarray(wy, self.dtype))
                if self._has_value:
                    a_loc = a_blocks[
                        iz * nzl_nodes : (iz + 1) * nzl_nodes,
                        iy * nyl_nodes : (iy + 1) * nyl_nodes,
                    ]
                    a_pads.append(L.pad_node_field(a_loc))

        self.layout = layouts[0]  # identical static geometry on all shards
        self.layouts = layouts
        names = list(_TABLE_NAMES) + (["apad"] if self._has_value else [])
        stacked = [jnp.stack(tables[n]) for n in _TABLE_NAMES]
        if self._has_value:
            stacked.append(jnp.stack(a_pads))
        self._table_names = tuple(names)
        self.shard_tables = tuple(stacked)

    # ------------------------- host conversions ------------------------ #
    @property
    def padded_flat_shape(self):
        zt, yt, nxp = self.layout.padded_shape
        return (self.part.pz * zt, self.part.py * yt, nxp)

    def to_padded_blocks(self, u_global: np.ndarray) -> np.ndarray:
        """Global nodal grid ``[nz, ny, nx]`` (or flat) -> concatenated
        per-shard PADDED blocks (the shard_map operand layout)."""
        part = self.part
        L = self.layout
        zt, yt, nxp = L.padded_shape
        nzl, nyl, nx = part.local_grid_shape
        blocks = part.to_blocks(
            np.asarray(u_global).reshape(part.global_grid_shape)
        )
        out = np.zeros(self.padded_flat_shape, dtype=blocks.dtype)
        p = L.p
        for iz in range(part.pz):
            for iy in range(part.py):
                out[
                    iz * zt + p : iz * zt + p + nzl,
                    iy * yt + YOFF : iy * yt + YOFF + nyl,
                    :nx,
                ] = blocks[
                    iz * nzl : (iz + 1) * nzl, iy * nyl : (iy + 1) * nyl
                ]
        return out

    def from_padded_blocks(self, padded: np.ndarray) -> np.ndarray:
        part = self.part
        L = self.layout
        zt, yt, nxp = L.padded_shape
        nzl, nyl, nx = part.local_grid_shape
        b = np.asarray(padded).reshape(self.padded_flat_shape)
        p = L.p
        blocks = np.zeros(part.flat_grid_shape, dtype=b.dtype)
        for iz in range(part.pz):
            for iy in range(part.py):
                blocks[
                    iz * nzl : (iz + 1) * nzl, iy * nyl : (iy + 1) * nyl
                ] = b[
                    iz * zt + p : iz * zt + p + nzl,
                    iy * yt + YOFF : iy * yt + YOFF + nyl,
                    :nx,
                ]
        return part.from_blocks(blocks)

    # --------------------------- SPMD apply ---------------------------- #
    def _unpack(self, tables):
        tabs = {
            name: t.reshape(t.shape[1:])
            for name, t in zip(self._table_names, tables)
        }
        return tabs

    def vmult_local(self, u: jnp.ndarray, *tables: jnp.ndarray) -> jnp.ndarray:
        """Per-shard apply on the padded local block ``[zt, yt, nxp]``."""
        T = self._unpack(tables)
        L = self.layout
        part = self.part
        p = L.p
        zt, yt, nxp = L.padded_shape
        nzl, nyl, _ = part.local_grid_shape
        apad = T.get("apad")

        multi = part.pz > 1 or part.py > 1
        if self.overlap and multi:
            sets = self._plane_exchange(u, T, apad)
        out = _stencil_call(
            u.reshape(-1),
            T["bz"],
            T["by"],
            T["bx"],
            T["sz"],
            T["syx"],
            apad,
            layout=L,
            interpret=self.interpret,
        ).reshape(L.padded_shape)
        # zero the pad strips the output tiles never write
        out = out.at[:p].set(0.0).at[p + L.nzb * L.BZ :].set(0.0)
        out = out.at[:, :YOFF].set(0.0).at[:, YOFF + L.nyb * L.BY :].set(0.0)

        zl, zh = p, p + nzl - 1
        ylo, yh = YOFF, YOFF + nyl - 1
        if self.overlap and multi:
            for slot, val in sets:
                # explicit downcast: plane partials are computed at the
                # compute dtype even when out streams at bf16
                out = out.at[slot].set(val.astype(out.dtype))
        else:
            # halo_combine in padded coordinates: z first so the y exchange
            # carries z-pair sums across shared corner lines
            if part.pz > 1:
                up = [(k, k + 1) for k in range(part.pz - 1)]
                down = [(k + 1, k) for k in range(part.pz - 1)]
                from_prev = lax.ppermute(out[zh : zh + 1], part.axis_z, up)
                from_next = lax.ppermute(out[zl : zl + 1], part.axis_z, down)
                out = out.at[zl : zl + 1].add(from_prev)
                out = out.at[zh : zh + 1].add(from_next)
            if part.py > 1:
                up = [(k, k + 1) for k in range(part.py - 1)]
                down = [(k + 1, k) for k in range(part.py - 1)]
                from_prev = lax.ppermute(out[:, yh : yh + 1], part.axis_y, up)
                from_next = lax.ppermute(out[:, ylo : ylo + 1], part.axis_y, down)
                out = out.at[:, ylo : ylo + 1].add(from_prev)
                out = out.at[:, yh : yh + 1].add(from_next)

        # identity (constrained) rows: S-zeroing made them 0 in out, so one
        # fused FMA epilogue restores src there. Cast back to the streaming
        # dtype: in bf16-streaming mode the f32 tables/plane-partials
        # promote intermediates to f32, and the solver loop carries must
        # keep the narrow HBM dtype.
        m3 = jnp.maximum(
            jnp.maximum(T["mz1"][:, None, None], T["my1"][None, :, None]),
            T["mx1"][None, None, :],
        )
        return (out + u * m3).astype(u.dtype)

    def _plane_exchange(self, u, T, apad):
        """Overlapped path: restricted plane applies -> ppermutes (fly
        during the kernel) -> position-ordered symmetric shared-plane
        values. Mirrors ``dist_operator._vmult_overlap`` (incl. the
        4-quadrant corner-line association) in padded coordinates."""
        part = self.part
        L = self.layout
        p = L.p
        nzl, nyl, _ = part.local_grid_shape
        zl, zh = p, p + nzl - 1
        ylo, yh = YOFF, YOFF + nyl - 1
        az, ay = part.axis_z, part.axis_y

        def plane(axis, row):
            return stencil_plane_padded(
                u, T["bz"], T["by"], T["bx"], T["sz"], T["syx"], apad, L,
                axis, row,
            )

        def echo(x, axis_name, n):
            # Self-ppermute: pins ONE materialization of the partial. The
            # partial feeds both the neighbor ppermute and the local
            # shared-plane sum; XLA may clone the producing computation into
            # different fusion contexts whose reductions differ at 1 ulp
            # (observed on CPU), silently breaking bitwise ghost coherence.
            # Every consumer below reads this single collective output, so
            # the local copy is bit-identical to the bits on the wire.
            return lax.ppermute(x, axis_name, [(k, k) for k in range(n)])

        sets = []
        if part.pz > 1:
            up = [(k, k + 1) for k in range(part.pz - 1)]
            down = [(k + 1, k) for k in range(part.pz - 1)]
            both = echo(jnp.stack([plane(0, zl), plane(0, zh)]), az, part.pz)
            pz_first, pz_last = both[0], both[1]  # [yt, nxp]
            from_prev_z = lax.ppermute(pz_last, az, up)
            from_next_z = lax.ppermute(pz_first, az, down)
            sets.append((zl, from_prev_z + pz_first))
            sets.append((zh, pz_last + from_next_z))
        if part.py > 1:
            upy = [(k, k + 1) for k in range(part.py - 1)]
            downy = [(k + 1, k) for k in range(part.py - 1)]
            both = echo(jnp.stack([plane(1, ylo), plane(1, yh)]), ay, part.py)
            py_first, py_last = both[0], both[1]  # [zt, nxp]
            from_prev_y = lax.ppermute(py_last, ay, upy)
            from_next_y = lax.ppermute(py_first, ay, downy)
            sets.append(((slice(None), ylo), from_prev_y + py_first))
            sets.append(((slice(None), yh), py_last + from_next_y))
        if part.pz > 1 and part.py > 1:
            # corner lines shared by four diagonal neighbors — all four
            # quadrant partials in their z-plane version (see
            # dist_operator._vmult_overlap for the association rationale)
            def diag_recv(x, zpairs, ypairs):
                return lax.ppermute(
                    lax.ppermute(x, ay, ypairs), az, zpairs
                )

            d00 = diag_recv(pz_last[yh], up, upy)  # from (iz-1, iy-1)
            d01 = diag_recv(pz_last[ylo], up, downy)  # from (iz-1, iy+1)
            d10 = diag_recv(pz_first[yh], down, upy)  # from (iz+1, iy-1)
            d11 = diag_recv(pz_first[ylo], down, downy)  # from (iz+1, iy+1)
            yl_up = jnp.stack([pz_first[yh], pz_last[yh]])
            yl_dn = jnp.stack([pz_first[ylo], pz_last[ylo]])
            from_prev_yl = lax.ppermute(yl_up, ay, upy)  # from (iz, iy-1)
            from_next_yl = lax.ppermute(yl_dn, ay, downy)  # from (iz, iy+1)

            sets.append((
                (zl, ylo),
                (d00 + from_prev_z[ylo]) + (from_prev_yl[0] + pz_first[ylo]),
            ))
            sets.append((
                (zl, yh),
                (from_prev_z[yh] + d01) + (pz_first[yh] + from_next_yl[0]),
            ))
            sets.append((
                (zh, ylo),
                (from_prev_yl[1] + pz_last[ylo]) + (d10 + from_next_z[ylo]),
            ))
            sets.append((
                (zh, yh),
                (pz_last[yh] + from_next_yl[1]) + (from_next_z[yh] + d11),
            ))
        return sets

    def local_dot_weight(self, tables):
        T = self._unpack(tables)
        return T["wz"][:, None, None] * T["wy"][None, :, None]


# ------------------------- jitted SPMD wrappers ------------------------ #
def _mixed_kwargs(dop: DistStencilOperator, kwargs: dict) -> dict:
    """bf16-streaming mode: dots must accumulate at the compute dtype (a
    bf16 sum over 10^7 entries is meaningless); explicit caller dot_dtype
    wins."""
    if dop.layout.stream_dtype != dop.layout.dtype:
        kwargs = dict(kwargs)
        kwargs.setdefault("dot_dtype", dop.layout.dtype)
    return kwargs


def _mesh_for(dop: DistStencilOperator, mesh: Optional[Mesh]) -> Mesh:
    part = dop.part
    return mesh or make_device_mesh(part.pz, part.py, part.axis_z, part.axis_y)


def _specs(dop: DistStencilOperator):
    part = dop.part
    grid = P(part.axis_z, part.axis_y, None)
    tspecs = tuple(
        P((part.axis_z, part.axis_y), *([None] * (t.ndim - 1)))
        for t in dop.shard_tables
    )
    return grid, tspecs


def make_dist_vmult_pallas(dop: DistStencilOperator, mesh: Optional[Mesh] = None):
    """Jitted SPMD apply on ``padded_flat_shape`` arrays (cached)."""
    mesh = _mesh_for(dop, mesh)
    key = ("vmult", mesh)
    if key in dop._solver_cache:
        return dop._solver_cache[key]
    grid, tspecs = _specs(dop)
    shmapped = jax.shard_map(
        dop.vmult_local,
        mesh=mesh,
        in_specs=(grid,) + tspecs,
        out_specs=grid,
        check_vma=False,  # pallas_call output has no vma annotation
    )
    sd = dop.layout.stream_dtype  # = dtype unless bf16-streaming mode
    fn = jax.jit(lambda u: shmapped(u.astype(sd), *dop.shard_tables))
    dop._solver_cache[key] = fn
    return fn


def _make_solver(solver_fn, dop, control, mesh, with_diag, **kwargs):
    mesh = _mesh_for(dop, mesh)
    key = (solver_fn, control, mesh, with_diag, tuple(sorted(kwargs.items())))
    if key in dop._solver_cache:
        return dop._solver_cache[key]
    part = dop.part
    az, ay = part.axis_z, part.axis_y
    grid, tspecs = _specs(dop)

    def local_solve(b_loc, diag_loc, *tables):
        w = dop.local_dot_weight(tables)
        x, info = solver_fn(
            lambda u: dop.vmult_local(u, *tables),
            b_loc,
            control,
            diag=diag_loc,
            dot_weight=w,
            psum_axis=(az, ay),
            **kwargs,
        )
        return x, info["n_iterations"], info["res_norm"], info["res0"]

    if with_diag:
        jitted = jax.jit(
            jax.shard_map(
                local_solve,
                mesh=mesh,
                in_specs=(grid, grid) + tspecs,
                out_specs=(grid, P(), P(), P()),
                check_vma=False,  # pallas_call output has no vma annotation
            )
        )

        def run(b, diag):
            x, it, res, res0 = jitted(b, diag, *dop.shard_tables)
            return x, {"n_iterations": it, "res_norm": res, "res0": res0}

    else:
        jitted = jax.jit(
            jax.shard_map(
                lambda b_loc, *tables: local_solve(b_loc, None, *tables),
                mesh=mesh,
                in_specs=(grid,) + tspecs,
                out_specs=(grid, P(), P(), P()),
                check_vma=False,  # pallas_call output has no vma annotation
            )
        )

        def run(b):
            x, it, res, res0 = jitted(b, *dop.shard_tables)
            return x, {"n_iterations": it, "res_norm": res, "res0": res0}

    dop._solver_cache[key] = run
    return run


def solve_cg_merged_dist_pallas(
    dop: DistStencilOperator,
    b_padded: jnp.ndarray,
    control: SolverControl,
    mesh: Optional[Mesh] = None,
    diag_padded: Optional[jnp.ndarray] = None,
    **kwargs,
):
    """Distributed fused CG on the fused stencil kernel. ``b_padded``:
    ``padded_flat_shape`` operand (see :meth:`DistStencilOperator
    .to_padded_blocks`). Returns ``(x_padded, info)``. In bf16-streaming
    mode (``pallas_opts=dict(stream_dtype=...)``) b is cast to the narrow
    dtype and the seven dot products accumulate at the compute dtype."""
    kwargs = _mixed_kwargs(dop, kwargs)
    run = _make_solver(
        solve_cg_merged, dop, control, mesh, diag_padded is not None, **kwargs
    )
    b = jnp.asarray(b_padded, dop.layout.stream_dtype).reshape(
        dop.padded_flat_shape
    )
    if diag_padded is not None:
        return run(b, jnp.asarray(diag_padded).reshape(dop.padded_flat_shape))
    return run(b)


def solve_cg_dist_pallas(
    dop: DistStencilOperator,
    b_padded: jnp.ndarray,
    control: SolverControl,
    mesh: Optional[Mesh] = None,
    diag_padded: Optional[jnp.ndarray] = None,
    **kwargs,
):
    kwargs = _mixed_kwargs(dop, kwargs)
    run = _make_solver(
        solve_cg, dop, control, mesh, diag_padded is not None, **kwargs
    )
    b = jnp.asarray(b_padded, dop.layout.stream_dtype).reshape(
        dop.padded_flat_shape
    )
    if diag_padded is not None:
        return run(b, jnp.asarray(diag_padded).reshape(dop.padded_flat_shape))
    return run(b)

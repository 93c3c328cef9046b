"""Distributed geometric multigrid: the V-cycle as an SPMD per-shard program.

Composition of :mod:`..solvers.multigrid` with the (z, y) block
decomposition (:class:`.partition.BlockPartition`): mesh-independent CG
iteration counts AT SCALE — the production solver configuration the
reference (Jacobi-CG only, one rank per GPU) does not reach.

Everything the single-device V-cycle does maps onto the existing
distributed primitives because the 2:1 coarsening is *block-aligned*
(each level's shard owns exactly the parents of its fine cells, enforced
by the hierarchy conditions):

- **Smoothing** = Chebyshev over the level's :class:`DistOperator`
  ``vmult_local`` (plane-``ppermute`` halo exchange per apply, the same
  comm/compute-overlapped path as the distributed solvers).
- **Prolongation is communication-free**: every fine cell's coarse
  parent lives in the same shard, and the interpolation row of a fine
  node on a shared block plane involves only coarse nodes ON that plane
  (which are consistent duplicates) — both sharers compute bit-identical
  ghost values with zero messages.
- **Restriction** = ghost-duplicate weighting (each shared fine plane
  counted once) -> local transpose sweeps -> the SAME one-plane-per-axis
  ``halo_combine`` the operator apply uses (partial coarse sums on shared
  planes add across neighbors).
- **Coarse solve**: the coarsest residual is ``all_gather``-ed (it is
  tiny by construction), the dense f64-factored inverse is applied
  redundantly on every shard, and each shard slices its ghosted block
  back out — no special-casing of shard counts exceeding the coarse grid.

Setup (per-level Jacobi diagonals, Chebyshev bounds, dense coarse
inverse) runs on the single-device GLOBAL operator per level — the
spectrum is identical, and setup is one-time.

Scope: uniform, graded (per-shard width-aware prolongation stacks) and
mapped global meshes.
"""

from __future__ import annotations

from typing import Optional, Type

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..fe_space import FESpace
from ..models.operator_base import MatrixFreeOperator
from ..models.poisson import PoissonOperator
from ..ops.sum_factorization import sweep
from ..solvers.cg import solve_cg
from ..solvers.control import SolverControl
from ..solvers.multigrid import (
    bounds_from_dense,
    chebyshev_smooth,
    coarsen_mesh,
    prolongation_1d,
)
from .dist_operator import DistOperator, halo_combine
from .dist_solve import _mesh_for
from .partition import BlockPartition

__all__ = ["DistMultigrid", "solve_cg_mg_dist"]


def _coarse_partition(part: BlockPartition) -> BlockPartition:
    return BlockPartition(
        coarsen_mesh(part.mesh), part.degree, part.pz, part.py,
        part.axis_z, part.axis_y, part.px, part.axis_x,
    )


def _can_coarsen(part: BlockPartition) -> bool:
    """Block-aligned 2:1 coarsening: all global axes even, and each
    shard's local element block halves exactly (parents stay in-shard,
    dead padding coarsens to dead padding)."""
    mx, my, mz = part.mesh.n_elements
    if mx % 2 or my % 2 or mz % 2:
        return False
    if part.mz_local % 2 or part.my_local % 2:
        return False
    if part.px > 1 and part.mx_local % 2:
        return False
    cpart = _coarse_partition(part)
    return (
        cpart.mz_local == part.mz_local // 2
        and cpart.my_local == part.my_local // 2
        and cpart.mx_local == part.mx_local // 2
    )


class DistMultigrid:
    """SPMD geometric multigrid over a :class:`BlockPartition`.

    Constructor parameters mirror :class:`DistOperator` (op_cls, dtype,
    backend, rule, n_q, op_kwargs) plus the :class:`Multigrid` knobs.
    ``vcycle_local`` is the per-shard preconditioner callable used inside
    ``shard_map`` by :func:`solve_cg_mg_dist`.
    """

    def __init__(
        self,
        part: BlockPartition,
        op_cls: Type[MatrixFreeOperator] = PoissonOperator,
        dtype=jnp.float64,
        backend: str = "separable",
        rule: str = "gauss_lobatto",
        n_q: Optional[int] = None,
        smooth_degree: int = 3,
        smoothing_range: float = 20.0,
        coarse_max_dofs: int = 4000,
        **op_kwargs,
    ):
        self.smooth_degree = smooth_degree
        self.dtype = jnp.dtype(dtype)

        # ---------------- level hierarchy ---------------- #
        parts = [part]
        while parts[-1].mesh.n_dofs(part.degree) > coarse_max_dofs and _can_coarsen(
            parts[-1]
        ):
            parts.append(_coarse_partition(parts[-1]))
        if len(parts) < 2:
            raise ValueError(
                f"mesh {part.mesh.n_elements} over {part.pz}x{part.py} "
                "shards cannot build a block-aligned hierarchy"
            )
        if parts[-1].mesh.n_dofs(part.degree) > max(coarse_max_dofs, 8000):
            # mirror the single-device Multigrid guard: refuse rather than
            # silently materializing an n^2 dense coarse inverse that every
            # shard would all-gather and apply redundantly per V-cycle
            raise ValueError(
                f"coarsest level {parts[-1].mesh.n_elements} still has "
                f"{parts[-1].mesh.n_dofs(part.degree)} DoFs "
                f"(> {max(coarse_max_dofs, 8000)}) — block-aligned "
                "coarsening stops too early for a dense coarse solve; "
                "choose a mesh/shard layout with more halvable element "
                "counts"
            )
        self.parts = parts
        self.dist_ops = [
            DistOperator(
                pl, op_cls, dtype=dtype, backend=backend, rule=rule, n_q=n_q,
                **op_kwargs,
            )
            for pl in parts[:-1]
        ]

        # per-level GLOBAL operator: Jacobi blocks (same spectrum as the
        # distributed one), the dense coarse matrix, and the Chebyshev
        # bounds from one host estimate on it (see
        # solvers.multigrid.bounds_from_dense)
        gbackend = "structured" if part.mesh.is_mapped else backend
        self._dinv_blocks = []
        gops = []
        for pl in parts:
            gspace = FESpace.create(pl.mesh, pl.degree, n_q=n_q, rule=rule, dtype=dtype)
            gop = op_cls(gspace, backend=gbackend, **op_kwargs)
            gops.append((gspace, gop))
        for (gspace, gop), pl in zip(gops[:-1], parts[:-1]):
            jac = gop.jacobi_preconditioner()  # one exact-diagonal build
            blocks = pl.to_blocks(np.asarray(jac).reshape(gspace.grid_shape))
            blocks[blocks == 0.0] = 1.0  # identity on dead padding
            self._dinv_blocks.append(jnp.asarray(blocks, dtype=dtype))

        # dense coarse matrix, assembled on the host (operator-generic
        # via weak_form; f64 factorization)
        from ..models.operator_base import assemble_dense

        A_c = assemble_dense(gops[-1][1], max_dofs=max(coarse_max_dofs, 8000))
        self._coarse_inv = jnp.asarray(np.linalg.inv(A_c), dtype=dtype)
        self.bounds = [bounds_from_dense(A_c, smoothing_range)] * (
            len(parts) - 1
        )

        # Per-level-pair 1D prolongation tables: per-SHARD stacks along the
        # partitioned z/y axes (graded meshes split each coarse cell at
        # the true width ratio, and every shard's local block has its own
        # widths; dead-padding cells get unit widths — their P block only
        # ever sees exact zeros), plus one global x table. The stacks are
        # tiny, so they ride as replicated closure constants indexed by
        # axis_index inside shard_map.
        p = part.degree
        nodes = gops[0][0].basis.nodes

        def _axis_stacks(fine, coarse, which):
            if which == "z":
                n_sh, mloc_c, ax = fine.pz, coarse.mz_local, 2
            elif which == "y":
                n_sh, mloc_c, ax = fine.py, coarse.my_local, 1
            else:  # "x" (only taken when px > 1)
                n_sh, mloc_c, ax = fine.px, coarse.mx_local, 0
            if fine.mesh.widths is None:
                Pm = prolongation_1d(mloc_c, p, nodes)
                return np.broadcast_to(Pm, (n_sh,) + Pm.shape)
            w = np.asarray(fine.mesh.widths[ax])
            w = np.pad(w, (0, n_sh * 2 * mloc_c - w.size), constant_values=1.0)
            return np.stack([
                prolongation_1d(
                    mloc_c, p, nodes,
                    w[k * 2 * mloc_c : (k + 1) * 2 * mloc_c],
                )
                for k in range(n_sh)
            ])

        self.prolong_mats = []
        for fine, coarse in zip(parts[:-1], parts[1:]):
            if part.px > 1:
                Px = _axis_stacks(fine, coarse, "x")  # per-shard stack
            else:
                fx = None if fine.mesh.widths is None else np.asarray(fine.mesh.widths[0])
                Px = prolongation_1d(coarse.mesh.n_elements[0], p, nodes, fx)
            self.prolong_mats.append((
                jnp.asarray(_axis_stacks(fine, coarse, "z"), dtype=dtype),
                jnp.asarray(_axis_stacks(fine, coarse, "y"), dtype=dtype),
                jnp.asarray(Px, dtype=dtype),
            ))

        # shard_map operand bookkeeping: [dinv_l, *tables_l] per level < last
        self.operands = []
        self.operand_specs = []
        self._slices = []
        az, ay, ax = part.axis_z, part.axis_y, part.axis_x
        grid_spec = P(az, ay, ax) if part.px > 1 else P(az, ay, None)
        self.grid_spec = grid_spec
        shard_axes = (az, ay, ax) if part.px > 1 else (az, ay)
        self.shard_axes = shard_axes
        for dinv, dop in zip(self._dinv_blocks, self.dist_ops):
            start = len(self.operands)
            self.operands.append(dinv)
            self.operand_specs.append(grid_spec)
            for t in dop.shard_tables:
                self.operands.append(t)
                self.operand_specs.append(
                    P(shard_axes, *([None] * (t.ndim - 1)))
                )
            self._slices.append((start, 1 + len(dop.shard_tables)))
        self.operands = tuple(self.operands)
        self.operand_specs = tuple(self.operand_specs)
        self._solver_cache = {}

    @property
    def n_levels(self) -> int:
        return len(self.parts)

    # ----------------------- per-shard components ---------------------- #
    def _level_opnds(self, level, opnds):
        start, count = self._slices[level]
        return opnds[start], opnds[start + 1 : start + count]

    def _smooth(self, level, r, opnds, z0=None):
        dinv, tables = self._level_opnds(level, opnds)
        dop = self.dist_ops[level]
        return chebyshev_smooth(
            lambda u: dop.vmult_local(u, *tables),
            dinv,
            self.bounds[level],
            self.smooth_degree,
            r,
            z0,
        )

    def _level_mats(self, level):
        """This shard's (Pz, Py, Px) for the level -> level+1 pair."""
        part = self.parts[level]
        Pz_s, Py_s, Px_s = self.prolong_mats[level]
        iz = lax.axis_index(part.axis_z)
        iy = lax.axis_index(part.axis_y)
        Px = (
            lax.dynamic_index_in_dim(
                Px_s, lax.axis_index(part.axis_x), 0, keepdims=False
            )
            if part.px > 1
            else Px_s
        )
        return (
            lax.dynamic_index_in_dim(Pz_s, iz, 0, keepdims=False),
            lax.dynamic_index_in_dim(Py_s, iy, 0, keepdims=False),
            Px,
        )

    def _restrict(self, level, r):
        """fine level -> level+1: count each shared/dup fine plane once,
        local P^T sweeps, add partial coarse sums across neighbors, zero
        coarse constrained rows."""
        part_f, part_c = self.parts[level], self.parts[level + 1]
        iz = lax.axis_index(part_f.axis_z)
        iy = lax.axis_index(part_f.axis_y)
        ix = lax.axis_index(part_f.axis_x) if part_f.px > 1 else 0
        w = part_f.local_dot_weight(iz, iy, r.dtype, ix)
        Pz, Py, Px = self._level_mats(level)
        rc = sweep(
            sweep(sweep(r * w, Px, 2, transpose=True), Py, 1, transpose=True),
            Pz,
            0,
            transpose=True,
        )
        rc = halo_combine(rc, part_c)
        mask_c = part_c.local_dirichlet_mask(iz, iy, ix)
        return jnp.where(mask_c, jnp.zeros((), rc.dtype), rc)

    def _prolong(self, level, u_c):
        """level+1 -> fine level: communication-free local sweeps (ghost
        planes come out bit-identical on all sharers)."""
        Pz, Py, Px = self._level_mats(level)
        return sweep(sweep(sweep(u_c, Px, 2), Py, 1), Pz, 0)

    def _coarse_solve(self, r):
        """all_gather the tiny coarsest residual, apply the dense inverse
        redundantly, slice this shard's ghosted block back out."""
        part = self.parts[-1]
        p = part.degree
        nzl, nyl, nxl = part.local_grid_shape
        nz, ny, nx = part.global_grid_shape
        sz, sy, sx = part.mz_local * p, part.my_local * p, part.mx_local * p
        g = lax.all_gather(r, part.axis_z, axis=0)  # [pz, nzl, nyl, nxl]
        g = lax.all_gather(g, part.axis_y, axis=0)  # [py, pz, ...]
        if part.px > 1:
            g = lax.all_gather(g, part.axis_x, axis=0)  # [px, py, pz, ...]
        pad_z, pad_y = (part.pz - 1) * sz + nzl, (part.py - 1) * sy + nyl
        pad_x = (part.px - 1) * sx + nxl
        glob = jnp.zeros((pad_z, pad_y, pad_x), dtype=r.dtype)
        for iz in range(part.pz):
            for iy in range(part.py):
                for ixg in range(part.px):
                    blk = g[ixg, iy, iz] if part.px > 1 else g[iy, iz]
                    glob = glob.at[
                        iz * sz : iz * sz + nzl,
                        iy * sy : iy * sy + nyl,
                        ixg * sx : ixg * sx + nxl,
                    ].set(blk)
        x = jnp.matmul(
            self._coarse_inv,
            glob[:nz, :ny, :nx].reshape(-1),
            precision=jax.lax.Precision.HIGHEST,
        )
        xp = jnp.zeros((pad_z, pad_y, pad_x), dtype=r.dtype)
        xp = xp.at[:nz, :ny, :nx].set(x.reshape(nz, ny, nx))
        iz = lax.axis_index(part.axis_z)
        iy = lax.axis_index(part.axis_y)
        ix = (
            lax.axis_index(part.axis_x)
            if part.px > 1
            else jnp.zeros((), dtype=iz.dtype)
        )
        return lax.dynamic_slice(
            xp, (iz * sz, iy * sy, ix * sx), (nzl, nyl, nxl)
        )

    # --------------------------- V-cycle --------------------------- #
    def vcycle_local(self, r, opnds):
        """One symmetric V(k,k) cycle, per shard (call inside shard_map
        with ``opnds = self.operands`` routed through the in_specs)."""
        return self._vcycle(0, r, opnds)

    def _vcycle(self, level, r, opnds):
        if level == self.n_levels - 1:
            return self._coarse_solve(r)
        z = self._smooth(level, r, opnds)
        dinv, tables = self._level_opnds(level, opnds)
        res = r - self.dist_ops[level].vmult_local(z, *tables)
        zc = self._vcycle(level + 1, self._restrict(level, res), opnds)
        z = z + self._prolong(level, zc)
        return self._smooth(level, r, opnds, z0=z)


def solve_cg_mg_dist(
    dist_mg: DistMultigrid,
    b_stacked: jnp.ndarray,
    control: SolverControl,
    mesh: Optional[Mesh] = None,
):
    """Distributed multigrid-preconditioned CG on ghosted-block operands
    (``BlockPartition.to_blocks`` layout). Returns ``(x_flat, info)``."""
    part = dist_mg.parts[0]
    dist_op = dist_mg.dist_ops[0]
    mesh = _mesh_for(dist_op, mesh)
    key = (control, mesh)
    run = dist_mg._solver_cache.get(key)
    if run is None:
        grid_spec = dist_mg.grid_spec
        psum_axes = dist_mg.shard_axes
        n_lvl0 = dist_mg._slices[0][1] - 1

        def local_solve(b_loc, *opnds):
            w = dist_op.dot_weight(b_loc.dtype)
            tables0 = opnds[1 : 1 + n_lvl0]
            x, info = solve_cg(
                lambda u: dist_op.vmult_local(u, *tables0),
                b_loc,
                control,
                diag=lambda r: dist_mg.vcycle_local(r, opnds),
                dot_weight=w,
                psum_axis=psum_axes,
            )
            return x, info["n_iterations"], info["res_norm"], info["res0"]

        jitted = jax.jit(
            jax.shard_map(
                local_solve,
                mesh=mesh,
                in_specs=(grid_spec,) + dist_mg.operand_specs,
                out_specs=(grid_spec, P(), P(), P()),
            )
        )

        def run(b_flat):
            x, it, res, res0 = jitted(b_flat, *dist_mg.operands)
            return x, {"n_iterations": it, "res_norm": res, "res0": res0}

        dist_mg._solver_cache[key] = run
    b = jnp.asarray(b_stacked).reshape(part.flat_grid_shape)
    return run(b)

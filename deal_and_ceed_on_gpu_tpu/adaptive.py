"""Adaptive (2:1-refined) meshes with hanging-node constraints.

TPU-native equivalent of the reference's adaptive-mesh support: deal.II's
``make_hanging_node_constraints`` (reference L-15) plus the device-side
``internal::resolve_hanging_nodes`` hooks in the collocation evaluator
(``bp5/fe_evaluation_gl.h:150-151,167-168``, consumed via the per-cell
``constraint_mask`` from MatrixFree L-1). Where the CUDA code applies the
interpolation in-place on each element's shared-memory values (and its
transpose on the scatter side), the TPU formulation keeps the whole
constraint application **global and dense-indexed**: one weighted gather
fills hanging DoFs from their coarse-side masters before the cell loop
(``distribute``), one weighted segment-sum accumulates hanging residuals
back onto the masters after it (``condense`` — the transpose), and
constrained rows act as identity. The effective operator is the standard
``C^T A C`` on the conforming subspace — identical algebra, no per-cell
masks, no atomics, bitwise deterministic.

Scope: arbitrary-depth isotropic refinement of a uniform brick under a
vertex 2:1 balance (enforced automatically, like p4est's balance step),
zero Dirichlet boundary, Q_p with GLL nodes; constraint chains across
levels are resolved by substitution. Host-side setup is plain numpy over
the (tiny, test-scale) cell lists; the apply itself is the regular
batched gather cell loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .basis import Basis1D, lagrange_eval
from .mesh import BrickMesh
from .ops import local_global as lg
from .ops import sum_factorization as sf

__all__ = [
    "AdaptiveMesh",
    "AdaptiveSpace",
    "AdaptivePoissonOperator",
    "assemble_rhs_adaptive",
    "estimate_gradient_recovery",
    "mark_doerfler",
    "evaluate_at_points",
    "amr_loop",
]

_TOL = 1e-9


def _key(x):
    return tuple(np.round(np.asarray(x, dtype=np.float64) / _TOL).astype(np.int64))


@dataclasses.dataclass(frozen=True)
class AdaptiveMesh:
    """Active cells of an adaptively refined brick: ``cells[i] = (origin,
    h, level)`` with ``h`` the per-axis cell extents. Supports arbitrary
    refinement depth under a *vertex* 2:1 balance (any two active cells
    with touching closures differ by at most one level — the invariant
    p4est maintains for the reference, ``bp5/step-64.cu:310``)."""

    origins: np.ndarray  # [n_cells, 3]
    sizes: np.ndarray  # [n_cells, 3]
    levels: np.ndarray  # [n_cells]
    lower: tuple
    upper: tuple

    @staticmethod
    def from_brick(base: BrickMesh) -> "AdaptiveMesh":
        assert base.is_uniform and not base.is_mapped
        mx, my, mz = base.n_elements
        hx, hy, hz = base.h
        origins = []
        for e in range(base.n_cells):
            ez, rem = divmod(e, my * mx)
            ey, ex = divmod(rem, mx)
            origins.append(
                [
                    base.lower[0] + ex * hx,
                    base.lower[1] + ey * hy,
                    base.lower[2] + ez * hz,
                ]
            )
        n = base.n_cells
        return AdaptiveMesh(
            np.asarray(origins),
            np.tile(np.array([hx, hy, hz]), (n, 1)),
            np.zeros(n, dtype=np.int64),
            base.lower,
            base.upper,
        )

    @staticmethod
    def refine(base: BrickMesh, marks) -> "AdaptiveMesh":
        """Refine the marked coarse cells of a uniform brick once (8
        children each)."""
        return AdaptiveMesh.from_brick(base).refine_active(marks)

    def refine_active(self, marks) -> "AdaptiveMesh":
        """Refine the marked *active* cells (8 children each), then restore
        the vertex 2:1 balance by refining any active cell whose closure
        touches a cell two or more levels finer (the p4est balance step)."""
        marks = np.asarray(marks)
        if marks.dtype == bool:
            marks = np.flatnonzero(marks)
        marked = set(int(m) for m in marks)
        origins, sizes, levels = [], [], []
        for e in range(self.n_cells):
            o, h, lv = self.origins[e], self.sizes[e], int(self.levels[e])
            if e in marked:
                for cz in range(2):
                    for cy in range(2):
                        for cx in range(2):
                            origins.append(
                                o + 0.5 * h * np.array([cx, cy, cz], dtype=float)
                            )
                            sizes.append(0.5 * h)
                            levels.append(lv + 1)
            else:
                origins.append(o)
                sizes.append(h)
                levels.append(lv)
        out = AdaptiveMesh(
            np.asarray(origins),
            np.asarray(sizes),
            np.asarray(levels, dtype=np.int64),
            self.lower,
            self.upper,
        )
        return out._balance()

    def _closure_touch(self) -> np.ndarray:
        """bool [n, n]: closures of cells i and j intersect (within tol)."""
        lo = self.origins
        hi = self.origins + self.sizes
        t = _TOL
        touch = np.ones((self.n_cells, self.n_cells), dtype=bool)
        for d in range(3):
            touch &= lo[:, None, d] <= hi[None, :, d] + t
            touch &= lo[None, :, d] <= hi[:, None, d] + t
        return touch

    def _balance(self) -> "AdaptiveMesh":
        """Refine until no two closure-touching active cells differ by
        more than one level."""
        mesh = self
        while True:
            touch = mesh._closure_touch()
            lv = mesh.levels
            viol = (touch & (lv[None, :] - lv[:, None] >= 2)).any(axis=1)
            if not viol.any():
                return mesh
            mesh = mesh.refine_active(np.flatnonzero(viol))

    def is_balanced(self) -> bool:
        touch = self._closure_touch()
        lv = self.levels
        return not (touch & (np.abs(lv[None, :] - lv[:, None]) >= 2)).any()

    @property
    def n_cells(self) -> int:
        return self.origins.shape[0]


class AdaptiveSpace:
    """DoF handler + hanging-node constraints for an AdaptiveMesh.

    DoFs = unique nodal points over all active cells. A node is *hanging*
    iff it lies on the closure of a coarse active cell without being one
    of its nodes; its masters are that coarse cell's nodes with tensor
    Lagrange weights (nonzero only on the shared face/edge)."""

    def __init__(self, mesh: AdaptiveMesh, degree: int, dtype=jnp.float64):
        self.mesh = mesh
        self.degree = degree
        self.dtype = jnp.dtype(dtype)
        self.basis = Basis1D.make(degree, rule="gauss_lobatto")
        p1 = degree + 1
        gll = self.basis.nodes

        # ---- global DoF ids by unique nodal coordinates ----
        coords: list[np.ndarray] = []
        ids: dict[tuple, int] = {}
        n_cells = mesh.n_cells
        dof_map = np.empty((n_cells, p1**3), dtype=np.int64)
        cell_nodes: list[set] = []
        for e in range(n_cells):
            o, h = mesh.origins[e], mesh.sizes[e]
            xs = o[0] + h[0] * gll
            ys = o[1] + h[1] * gll
            zs = o[2] + h[2] * gll
            loc = 0
            nodes_here = set()
            for k in range(p1):
                for j in range(p1):
                    for i in range(p1):
                        x = (xs[i], ys[j], zs[k])
                        kk = _key(x)
                        g = ids.get(kk)
                        if g is None:
                            g = len(coords)
                            ids[kk] = g
                            coords.append(np.asarray(x))
                        dof_map[e, loc] = g
                        nodes_here.add(g)
                        loc += 1
            cell_nodes.append(nodes_here)

        # Bucket-keyed dedupe can split two fp representations of the same
        # geometric node across adjacent 1e-9 buckets; merge any remaining
        # near-duplicates with a true tolerance query.
        coords_arr = np.asarray(coords)
        from scipy.spatial import cKDTree

        pairs = cKDTree(coords_arr).query_pairs(10 * _TOL)
        if pairs:
            parent = np.arange(len(coords))

            def find(i):
                while parent[i] != i:
                    parent[i] = parent[parent[i]]
                    i = parent[i]
                return i

            for a, b in pairs:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            roots = np.array([find(i) for i in range(len(coords))])
            uniq, new_ids = np.unique(roots, return_inverse=True)
            coords_arr = coords_arr[uniq]
            dof_map = new_ids[dof_map]
            cell_nodes = [set(new_ids[list(s)]) for s in cell_nodes]

        self.n_dofs = coords_arr.shape[0]
        self.node_coords = coords_arr
        self.elem_dof_map = jnp.asarray(dof_map.astype(np.int32))
        self._dof_map_np = dof_map

        # ---- hanging-node constraints (multi-level, chain-resolved) ----
        # A node is hanging iff it is NOT a node of any *coarsest*-level
        # active cell whose closure contains it; its raw masters are that
        # cell's nodes with tensor Lagrange weights. Under the vertex 2:1
        # balance a raw master can itself be hanging (one level coarser);
        # chains are resolved by substitution — levels strictly decrease,
        # so the closure terminates (deal.II resolves the same chains
        # inside make_hanging_node_constraints).
        lo, sz = mesh.origins, mesh.sizes
        X = self.node_coords
        inside = np.ones((n_cells, self.n_dofs), dtype=bool)
        for d in range(3):
            td = (X[None, :, d] - lo[:, None, d]) / sz[:, None, d]
            inside &= (td > -_TOL) & (td < 1.0 + _TOL)
        levels = mesh.levels
        raw: dict[int, list] = {}
        hanging = np.zeros(self.n_dofs, dtype=bool)
        for g in range(self.n_dofs):
            cells_g = np.flatnonzero(inside[:, g])
            lmin = int(levels[cells_g].min())
            lmin_cells = [int(e) for e in cells_g if levels[e] == lmin]
            if any(g in cell_nodes[e] for e in lmin_cells):
                continue  # conforming (master) DoF
            e = lmin_cells[0]
            t = (X[g] - lo[e]) / sz[e]
            wloc = np.ones((p1, p1, p1))
            for d, td in enumerate(t):
                S, _ = lagrange_eval(gll, np.array([np.clip(td, 0, 1)]))
                shape = [1, 1, 1]
                shape[2 - d] = p1  # local order (k, j, i) = (z, y, x)
                wloc = wloc * S[0].reshape(shape)
            wflat = wloc.reshape(-1)
            nzm = np.abs(wflat) > 1e-12
            raw[g] = list(zip(dof_map[e][nzm].tolist(), wflat[nzm].tolist()))
            hanging[g] = True

        changed = True
        while changed:
            changed = False
            for g, row in raw.items():
                if any(hanging[m] for m, _ in row):
                    new: dict[int, float] = {}
                    for m, w in row:
                        if hanging[m]:
                            for m2, w2 in raw[m]:
                                new[m2] = new.get(m2, 0.0) + w * w2
                        else:
                            new[m] = new.get(m, 0.0) + w
                    raw[g] = [
                        (m, w) for m, w in new.items() if abs(w) > 1e-12
                    ]
                    changed = True

        hang_rows, hang_cols, hang_w = [], [], []
        for g, row in raw.items():
            for m, w in row:
                hang_rows.append(g)
                hang_cols.append(m)
                hang_w.append(w)
        self.hanging_mask_np = hanging
        self.hang_rows = jnp.asarray(np.asarray(hang_rows, dtype=np.int32))
        self.hang_cols = jnp.asarray(np.asarray(hang_cols, dtype=np.int32))
        self.hang_w = jnp.asarray(np.asarray(hang_w), dtype=self.dtype)

        # ---- Dirichlet boundary (whole domain boundary) ----
        lo = np.asarray(mesh.lower)
        up = np.asarray(mesh.upper)
        on_b = np.zeros(self.n_dofs, dtype=bool)
        for d in range(3):
            on_b |= np.abs(self.node_coords[:, d] - lo[d]) < _TOL
            on_b |= np.abs(self.node_coords[:, d] - up[d]) < _TOL
        self.boundary_mask_np = on_b
        # all constrained rows act as identity in vmult
        self.constrained_mask_np = on_b | hanging
        self.constrained_mask = jnp.asarray(self.constrained_mask_np)
        self.hanging_mask = jnp.asarray(hanging)

    # ------------------- constraint application ---------------------- #
    def distribute(self, u: jnp.ndarray) -> jnp.ndarray:
        """Fill hanging DoFs from their masters (deal.II
        ``constraints.distribute`` / the forward ``resolve_hanging_nodes``)."""
        if self.hang_rows.size == 0:
            return u
        vals = jax.ops.segment_sum(
            self.hang_w * u[self.hang_cols], self.hang_rows, self.n_dofs
        )
        return jnp.where(self.hanging_mask, vals, u)

    def condense(self, v: jnp.ndarray) -> jnp.ndarray:
        """Accumulate hanging residuals onto masters and zero the hanging
        rows (the transpose application on the scatter side,
        ``bp5/fe_evaluation_gl.h:167-168``)."""
        if self.hang_rows.size == 0:
            return v
        add = jax.ops.segment_sum(
            self.hang_w * v[self.hang_rows], self.hang_cols, self.n_dofs
        )
        v = v + add
        return jnp.where(self.hanging_mask, jnp.zeros((), v.dtype), v)

    def constraint_matrix(self):
        """scipy C with u_full = C u (identity on real DoFs, interpolation
        rows on hanging DoFs) — oracle/test use."""
        import scipy.sparse as sp

        n = self.n_dofs
        eye_rows = np.flatnonzero(~self.hanging_mask_np)
        rows = np.concatenate([eye_rows, np.asarray(self.hang_rows)])
        cols = np.concatenate([eye_rows, np.asarray(self.hang_cols)])
        vals = np.concatenate([np.ones(eye_rows.size), np.asarray(self.hang_w)])
        return sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()


class AdaptivePoissonOperator:
    """Matrix-free Poisson vmult on an adaptive space (gather backend):

        zero constrained -> distribute (hanging interpolation) -> gather
        -> sum-factorized cell apply (per-cell diagonal Jacobians)
        -> scatter-add -> condense (transpose) -> identity on constrained
    """

    def __init__(self, space: AdaptiveSpace):
        self.space = space
        b = space.basis
        self.S = jnp.asarray(b.S, dtype=space.dtype)
        self.D = jnp.asarray(b.D, dtype=space.dtype)
        h = space.mesh.sizes  # [E, 3]
        det = h.prod(axis=1)
        md = np.stack([det / h[:, 0] ** 2, det / h[:, 1] ** 2, det / h[:, 2] ** 2], -1)
        w = b.q_weights
        w3 = (w[:, None, None] * w[None, :, None] * w[None, None, :])[None]
        self._cw = tuple(
            jnp.asarray(md[:, d, None, None, None] * w3, dtype=space.dtype)
            for d in range(3)
        )
        self._jxw = jnp.asarray(det[:, None, None, None] * w3, dtype=space.dtype)

    def apply_cell_loop(self, u: jnp.ndarray) -> jnp.ndarray:
        s = self.space
        ul = lg.gather_indexed(u, s.elem_dof_map, s.degree)
        _, grads = sf.evaluate(ul, self.S, self.D, (1, 2, 3), False, True, True)
        gx, gy, gz = grads
        cx, cy, cz = self._cw
        vl = sf.integrate(None, (gx * cx, gy * cy, gz * cz), self.S, self.D, (1, 2, 3), True)
        return lg.scatter_indexed(vl, s.elem_dof_map, s.n_dofs)

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        s = self.space
        u = jnp.where(s.constrained_mask, jnp.zeros((), src.dtype), src)
        u = s.distribute(u)
        dst = self.apply_cell_loop(u)
        dst = s.condense(dst)
        return jnp.where(s.constrained_mask, src, dst)

    def __call__(self, src):
        return self.vmult(src)

    def diagonal(self) -> jnp.ndarray:
        return jnp.ones((self.space.n_dofs,), dtype=self.space.dtype)


def _cell_qpoints(space: AdaptiveSpace) -> np.ndarray:
    """Physical quadrature (= nodal, GLL collocation) points per active
    cell: ``[n_cells, q, q, q, 3]`` in local (z, y, x) order."""
    gll = space.basis.nodes
    o, h = space.mesh.origins, space.mesh.sizes
    q1 = gll.shape[0]
    X = np.zeros((space.mesh.n_cells, q1, q1, q1, 3))
    for d in range(3):
        axis_pts = o[:, d, None] + h[:, d, None] * gll[None, :]  # [E, q1]
        shape = [1, 1, 1]
        shape[2 - d] = q1  # local (k, j, i) = (z, y, x)
        X[..., d] = axis_pts.reshape((-1,) + tuple(shape))
    return X


def assemble_rhs_adaptive(space: AdaptiveSpace, f=1.0) -> jnp.ndarray:
    """b_i = integral(f phi_i) over the adaptive mesh, condensed onto the
    conforming subspace and zeroed on constrained rows. ``f`` may be a
    constant or a callable of physical coordinates ``f(x[..., 3])``."""
    op = AdaptivePoissonOperator(space)
    q1 = space.basis.n_q
    if callable(f):
        fq = np.asarray(f(_cell_qpoints(space)), dtype=np.float64)
        integrand = (jnp.asarray(fq, dtype=space.dtype) * op._jxw).astype(
            space.dtype
        )
    else:
        integrand = jnp.broadcast_to(
            float(f) * op._jxw, (space.mesh.n_cells, q1, q1, q1)
        ).astype(space.dtype)
    vl = sf.integrate(integrand, None, op.S, op.D, (1, 2, 3), True)
    b = lg.scatter_indexed(vl, space.elem_dof_map, space.n_dofs)
    b = space.condense(b)
    return jnp.where(space.constrained_mask, jnp.zeros((), b.dtype), b)


# --------------------------------------------------------------------- #
# error estimation + marking: the AMR workflow (framework extra — the
# reference relies on uniform sweeps; this is the deal.II step-6-style
# solve -> estimate -> mark -> refine loop on the TPU formulation)
# --------------------------------------------------------------------- #
def estimate_gradient_recovery(
    space: AdaptiveSpace, op: AdaptivePoissonOperator, u: jnp.ndarray
) -> np.ndarray:
    """Per-active-cell error indicators ``eta_K`` by Zienkiewicz-Zhu
    gradient recovery:

        eta_K^2 = int_K | grad u_h - R(grad u_h) |^2

    with ``R`` the node-averaged (multiplicity-weighted) recovery of the
    elementwise-discontinuous gradient field — the smoothness of
    ``R grad u_h`` makes the difference a classic a-posteriori indicator
    concentrating on inter-element gradient jumps (the same role deal.II's
    KellyErrorEstimator plays for its tutorial AMR loops). Fully reuses
    the collocation cell loop: one gather + D sweeps, one scatter-mean,
    one gather, one weighted reduction. Returns host ``[n_cells]``."""
    s = space
    uf = s.distribute(jnp.where(s.hanging_mask, jnp.zeros((), u.dtype), u))
    ul = lg.gather_indexed(uf, s.elem_dof_map, s.degree)
    _, grads = sf.evaluate(ul, op.S, op.D, (1, 2, 3), False, True, True)
    h = jnp.asarray(s.mesh.sizes, dtype=s.dtype)  # [E, 3]
    phys = [
        grads[d] / h[:, d, None, None, None] for d in range(3)
    ]  # d/dx, d/dy, d/dz at the nodal points

    counts = lg.scatter_indexed(
        jnp.ones_like(ul), s.elem_dof_map, s.n_dofs
    )
    eta2 = jnp.zeros((s.mesh.n_cells,), dtype=s.dtype)
    for g in phys:
        Rg = lg.scatter_indexed(g, s.elem_dof_map, s.n_dofs) / counts
        diff = g - lg.gather_indexed(Rg, s.elem_dof_map, s.degree)
        eta2 = eta2 + jnp.sum(diff * diff * op._jxw, axis=(1, 2, 3))
    return np.sqrt(np.asarray(eta2))


def mark_doerfler(eta: np.ndarray, theta: float = 0.5) -> np.ndarray:
    """Doerfler (bulk-chasing) marking: the smallest set of cells whose
    squared indicators sum to ``theta`` of the total."""
    eta2 = np.asarray(eta, dtype=np.float64) ** 2
    order = np.argsort(eta2)[::-1]
    csum = np.cumsum(eta2[order])
    k = int(np.searchsorted(csum, theta * csum[-1])) + 1
    return order[:k]


def evaluate_at_points(
    space: AdaptiveSpace, u: jnp.ndarray, pts: np.ndarray
) -> np.ndarray:
    """Point evaluation of the FE function on the adaptive mesh (host):
    locate the active cell containing each point, tensor Lagrange eval."""
    s = space
    uf = np.asarray(s.distribute(jnp.asarray(u)))
    gll = s.basis.nodes
    lo, sz = s.mesh.origins, s.mesh.sizes
    out = np.zeros(len(pts))
    dof_map = s._dof_map_np
    p1 = s.degree + 1
    for i, x in enumerate(np.asarray(pts, dtype=np.float64)):
        t = (x[None, :] - lo) / sz
        inside = np.all((t > -_TOL) & (t < 1 + _TOL), axis=1)
        hits = np.flatnonzero(inside)
        if hits.size == 0:
            raise ValueError(
                f"evaluate_at_points: point {x.tolist()} lies outside "
                "every active cell (outside the domain?)"
            )
        e = int(hits[0])
        w = np.ones((p1, p1, p1))
        for d in range(3):
            S, _ = lagrange_eval(gll, np.array([np.clip(t[e, d], 0.0, 1.0)]))
            shape = [1, 1, 1]
            shape[2 - d] = p1
            w = w * S[0].reshape(shape)
        out[i] = float(uf[dof_map[e]].reshape(-1) @ w.reshape(-1))
    return out


def amr_loop(
    base: BrickMesh,
    degree: int,
    f=1.0,
    n_steps: int = 3,
    theta: float = 0.5,
    reduction: float = 1e-10,
    max_iterations: int = 800,
):
    """The solve -> estimate -> mark -> refine loop. Returns the per-step
    history: dicts with ``space``, ``x``, ``n_dofs``, ``n_cells``,
    ``eta`` (global estimate), ``n_iterations``."""
    from .solvers import ReductionControl, solve_cg_merged

    mesh = AdaptiveMesh.from_brick(base)
    history = []
    for step in range(n_steps + 1):
        space = AdaptiveSpace(mesh, degree)
        op = AdaptivePoissonOperator(space)
        b = assemble_rhs_adaptive(space, f)
        control = ReductionControl(
            max_iterations, tolerance=0.0, reduction=reduction
        )
        x, info = solve_cg_merged(op.vmult, b, control)
        eta = estimate_gradient_recovery(space, op, x)
        history.append(
            {
                "space": space,
                "x": x,
                "n_dofs": space.n_dofs,
                "n_cells": mesh.n_cells,
                "eta": float(np.sqrt((eta**2).sum())),
                "eta_cells": eta,
                "n_iterations": int(info["n_iterations"]),
            }
        )
        if step < n_steps:
            mesh = mesh.refine_active(mark_doerfler(eta, theta))
    return history

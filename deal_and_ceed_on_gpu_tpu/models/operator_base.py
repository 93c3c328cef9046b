"""Matrix-free operator base: the cell-loop pipeline.

TPU-native equivalent of the reference's operator wrappers
(``PoissonOperator::vmult``, ``bp5/step-64.cu:263-276``) and of the lib
``cell_loop`` / ``apply_kernel_shmem`` contract (reference L-2): the apply is

    mask constrained src -> gather -> evaluate -> quad-point op
        -> integrate -> scatter-add -> Dirichlet identity rows

expressed as one pure jittable function. Subclasses provide only the
quad-point operation (the ``apply_quad_point_operations`` hook,
``bp5/fe_evaluation_gl.h:373-393``) plus which of values/gradients they need
— exactly the knobs ``FEEvaluation::evaluate/integrate`` expose.

Backends:
- ``structured``: index-free axis-separable gather/scatter, interleaved
  local layout ``[mz, p1, my, p1, mx, p1]`` — the TPU fast path.
- ``gather``: explicit ``local_to_global`` + segment-sum scatter, batched
  layout ``[E, p1, p1, p1]`` — the general path (adaptive meshes later).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fe_space import FESpace
from ..ops import local_global as lg
from ..ops import sum_factorization as sf

__all__ = [
    "MatrixFreeOperator",
    "assemble_rhs",
    "assemble_dense",
    "l2_norm_function",
]

_LAYOUT_AXES = {
    "structured": (1, 3, 5),
    "gather": (1, 2, 3),
    "separable": None,
    # fused general-quadrature Pallas kernel (any rule, any geometry):
    # gather -> dense-basis MXU kernel -> scatter (ops/pallas_general.py)
    "pallas_general": (1, 2, 3),
    # q-grid streaming kernel (any Gauss rule, any brick geometry incl.
    # mapped) — no element-major layout at all (ops/pallas_qgrid.py);
    # fast path is vmult_padded on the kernel-owned padded layout
    "pallas_qgrid": (1, 2, 3),
}


class MatrixFreeOperator:
    """Base class; instances are pytree-free — all arrays are captured as
    trace-time constants/closures, so ``jax.jit(op.vmult)`` just works."""

    needs_values: bool = False
    needs_gradients: bool = False

    def __init__(self, space: FESpace, backend: str = "structured"):
        if backend not in _LAYOUT_AXES:
            raise ValueError(f"unknown backend {backend!r}")
        self.space = space
        self.backend = backend
        self.axes = _LAYOUT_AXES[backend]
        # separable backend: subclasses that support it fill _sep_terms
        self._sep_terms = None
        self.sep_mode = "matmul"
        # accumulated fold_scale factor; compute_diagonal applies it so a
        # Jacobi/MG preconditioner built AFTER fold_scale stays consistent
        # with the scaled operator
        self._fold_factor = 1.0
        # materialize cached device constants eagerly: a first access inside
        # a jit trace would cache a tracer (which then escapes)
        _ = space.S, space.D, space.dirichlet_mask

    # -------------------------- subclass hook ------------------------- #
    def quad_point_op(self, vals, grads):
        """Map (values, reference-cell gradients) at quadrature points to the
        integrands to be tested against (phi_i, grad phi_i). JxW and metric
        terms are the subclass's responsibility (merged-coefficient design)."""
        raise NotImplementedError

    # ------------------------- layout helpers ------------------------- #
    def to_layout(self, per_cell_q: np.ndarray) -> np.ndarray:
        """Reshape a host array ``[n_cells, n_q(, c)]`` (cell order (ez,ey,ex),
        qpoint order (qz,qy,qx)) into the backend's broadcastable layout."""
        mx, my, mz = self.space.mesh.n_elements
        q = self.space.basis.n_q
        trailing = per_cell_q.shape[2:]
        a = per_cell_q.reshape((mz, my, mx, q, q, q) + trailing)
        if self.backend == "structured":
            a = np.moveaxis(a, (3, 4, 5), (1, 3, 5))  # [mz,q,my,q,mx,q,...]
        else:
            a = a.reshape((mz * my * mx, q, q, q) + trailing)
        return a

    def w3d_layout(self) -> np.ndarray:
        """Tensorized quadrature weights, broadcastable in the local layout."""
        w = self.space.geometry.w3d  # [qz,qy,qx]
        q = w.shape[0]
        if self.backend == "structured":
            return w.reshape(1, q, 1, q, 1, q)
        return w.reshape(1, q, q, q)

    def jxw_layout(self) -> np.ndarray:
        """JxW in the local layout: a tiny broadcastable array on uniform
        meshes, per-element tensor factors on graded ones (still a
        broadcastable outer product), a full per-qpoint table only on
        mapped meshes."""
        geo = self.space.geometry
        w3 = self.w3d_layout()
        if geo.uniform:
            return geo.det_j * w3
        if geo.mapped:
            return self.to_layout(geo.jxw_full())
        hx, hy, hz = self.space.mesh.h_axes()
        mx, my, mz = self.space.mesh.n_elements
        if self.backend == "structured":
            det = (
                hz.reshape(mz, 1, 1, 1, 1, 1)
                * hy.reshape(1, 1, my, 1, 1, 1)
                * hx.reshape(1, 1, 1, 1, mx, 1)
            )
        else:
            det = geo.det_per_cell().reshape(-1, 1, 1, 1)
        return det * w3

    # ----------------------------- apply ------------------------------ #
    def gather(self, u_flat: jnp.ndarray) -> jnp.ndarray:
        s = self.space
        if self.backend == "structured":
            return lg.gather_structured(
                u_flat.reshape(s.grid_shape), s.mesh.n_elements, s.degree
            )
        return lg.gather_indexed(u_flat, s.elem_dof_map, s.degree)

    def scatter(self, v_local: jnp.ndarray) -> jnp.ndarray:
        s = self.space
        if self.backend == "structured":
            return lg.scatter_structured(v_local, s.degree).reshape(-1)
        return lg.scatter_indexed(v_local, s.elem_dof_map, s.n_dofs)

    def apply_cell_loop(self, u_flat: jnp.ndarray) -> jnp.ndarray:
        """The raw cell loop (no constraint handling): reference L-2."""
        s = self.space
        if self.backend == "separable":
            from ..ops.separable import apply_separable

            if self._sep_terms is None:
                raise NotImplementedError(
                    f"{type(self).__name__} has no separable form"
                )
            u = u_flat.reshape(s.grid_shape)
            return apply_separable(u, self._sep_terms, self.sep_mode).reshape(-1)
        if self.backend == "pallas_general":
            return self._general(u_flat)
        if self.backend == "pallas_qgrid":
            L = self._qgrid.layout
            return L.unpad_flat(self._qgrid(L.pad_flat(u_flat)))
        ul = self.gather(u_flat)
        vals, grads = sf.evaluate(
            ul,
            s.S,
            s.D,
            self.axes,
            self.needs_values,
            self.needs_gradients,
            s.basis.collocation,
        )
        vals, grads = self.quad_point_op(vals, grads)
        vl = sf.integrate(vals, grads, s.S, s.D, self.axes, s.basis.collocation)
        return self.scatter(vl)

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        """dst = A src with Dirichlet rows acting as identity
        (``bp5/step-64.cu:263-276``). Pure function: returns a fresh dst
        (the reference's ``do_zero_out`` dance is a CUDA-accumulation
        artifact with no XLA analog)."""
        s = self.space
        u = s.zero_constrained_values(src)
        dst = self.apply_cell_loop(u)
        return s.copy_constrained_values(src, dst)

    def __call__(self, src: jnp.ndarray) -> jnp.ndarray:
        return self.vmult(src)

    def fold_scale(self, s: float) -> None:
        """Rescale the operator in place: ``A <- s * A`` on unconstrained
        rows (identity rows unaffected). Benchmark utility: chained-vmult
        throughput loops fold their ``1/lambda_est`` normalization into
        the coefficient tables so each iteration is one pure back-to-back
        apply — the elementwise rescaling pass would otherwise add a full
        read+write of the vector (~10% at 12.5M DoFs) that the reference's
        vmult benchmark (``bp5/step-64.cu:519-548``) does not pay."""
        self._apply_fold_scale(s)
        self._fold_factor *= s
        # the eager-solve jit cache keys on operator IDENTITY and bakes the
        # (pre-scaling) tables into its executables — drop it so a later
        # eager solve on this operator cannot return stale results
        from ..solvers._dispatch import invalidate_cache

        invalidate_cache()

    def _apply_fold_scale(self, s: float) -> None:
        """Subclass hook: rescale the coefficient tables by ``s``."""
        if self._sep_terms is not None:
            for t in self._sep_terms:
                t["coef"] = t["coef"] * s
            return
        raise NotImplementedError(
            f"{type(self).__name__} ({self.backend}) has no fold_scale"
        )

    def diagonal(self) -> jnp.ndarray:
        """Preconditioner diagonal slot (reference L-12 ``DiagonalMatrix``).
        Both reference drivers fill it with 1.0 (``bp5/step-64.cu:428-432``);
        kept as a real vector so true Jacobi plugs in."""
        return jnp.ones((self.space.n_dofs,), dtype=self.space.dtype)

    def compute_diagonal(self) -> jnp.ndarray:
        """Exact diagonal of the constrained operator (1.0 on Dirichlet
        rows), consistent with any accumulated :meth:`fold_scale` factor.
        Subclasses implement :meth:`_compute_diagonal` (usually via
        :func:`tensor_product_diagonal`); an improvement over the
        reference's identity placeholder."""
        d = self._compute_diagonal()
        if self._fold_factor != 1.0:
            # fold_scale rescales unconstrained rows only (Dirichlet rows
            # stay identity)
            d = jnp.where(
                self.space.dirichlet_mask, d, self._fold_factor * d
            )
        return d

    def _compute_diagonal(self) -> jnp.ndarray:
        raise NotImplementedError

    def weak_form(self):
        """``(gradient, value_q, value_const)`` describing the bilinear
        form — the same parametrization :func:`tensor_product_diagonal`
        takes. Drives the host-side dense assembly (multigrid coarse
        solves, :func:`assemble_dense`); subclasses with a quad-point op
        beyond gradient+value terms must override :func:`assemble_dense`
        instead."""
        raise NotImplementedError(f"{type(self).__name__} has no weak_form")

    def jacobi_preconditioner(self) -> jnp.ndarray:
        """1/diag(A) with identity on constrained rows — a true Jacobi
        preconditioner for the ``diag`` slot of the CG solvers."""
        d = self.compute_diagonal()
        return 1.0 / d

    # ------------------------ fused-CG kernel ------------------------- #
    @property
    def fused_cg_step(self):
        """The fully-fused CG iteration kernel for this operator
        (``ops/pallas_cg.py``) — pallas (stencil) backend only. Cached so
        repeated ``solve_cg_fused`` calls hit the same jit executable
        through the solver dispatch cache (which keys on this object)."""
        if getattr(self, "_stencil", None) is None:
            raise NotImplementedError(
                f"{type(self).__name__} ({self.backend}): the fused CG "
                "kernel requires the pallas stencil backend"
            )
        from ..ops.pallas_banded import build_banded_operator

        if isinstance(self._stencil, build_banded_operator):
            raise NotImplementedError(
                f"{type(self).__name__}: the fused CG kernel covers the "
                "collocated stencil backend only (banded operators solve "
                "via solve_cg_merged on the padded layout)"
            )
        step = getattr(self, "_fused_cg_step", None)
        if step is None:
            from ..ops.pallas_cg import CGFusedStep

            step = CGFusedStep(
                self._stencil, interpret=getattr(self._stencil, "interpret", False)
            )
            self._fused_cg_step = step
        return step

    def vmult_free(self, src: jnp.ndarray, out_donate: jnp.ndarray):
        """Donated-buffer bare-kernel apply (pallas backend only) — the
        solve-mode fast path; see ``build_stencil_operator.vmult_free``."""
        if getattr(self, "_stencil", None) is None:
            raise NotImplementedError(
                f"{type(self).__name__} ({self.backend}): vmult_free "
                "requires the pallas stencil backend"
            )
        return self._stencil.vmult_free(src, out_donate)

    # --------------------- distributed-table hooks -------------------- #
    def shard_table_names(self) -> tuple[str, ...]:
        """Names of coefficient-table attributes that depend on the
        element block's physical position (empty for position-invariant
        operators such as uniform-mesh Poisson/mass). The distributed
        layer builds these on the padded global mesh, slices per shard,
        and feeds them through shard_map as sharded operands."""
        return ()

    def bind_shard_tables(self, tables: dict) -> "MatrixFreeOperator":
        """Shallow copy with the given table attributes substituted (the
        values may be tracers inside shard_map)."""
        import copy

        new = copy.copy(self)
        for name, value in tables.items():
            setattr(new, name, value)
        return new


def tensor_product_diagonal(
    space: FESpace,
    gradient: bool = False,
    value_q: Optional[np.ndarray] = None,
    value_const: Optional[float] = None,
) -> jnp.ndarray:
    """diag(A) for diagonal-Jacobian tensor-product operators (uniform or
    graded brick meshes).

    The per-element local diagonal separates into 1D quadrature sums:
    ``diag_e[k,j,i] = sum_d c_{d,e} (m1 x m1 x k1)_d + det_e*(value part)``
    with ``m1_a = sum_q w_q S[q,a]^2``, ``k1_a = sum_q w_q D[q,a]^2`` and
    ``c_{d,e}`` the per-element merged-coefficient diagonal; for a varying
    value coefficient the per-axis contractions run over ``a_q``.
    Host-side numpy (setup cost), then one scatter-add. Mapped meshes take
    the general (dense basis-table) path in :func:`_general_local_diagonal`.
    """
    basis, geo = space.basis, space.geometry
    if geo.mapped:
        local_e = _general_local_diagonal(space, gradient, value_q, value_const)
        return _scatter_local_diagonal(space, local_e)
    S2 = basis.S**2  # [q, p+1]
    D2 = basis.D**2
    w = basis.q_weights
    m1 = np.einsum("q,qa->a", w, S2)
    k1 = np.einsum("q,qa->a", w, D2)
    p1 = basis.n_dofs
    n_cells = space.mesh.n_cells

    local_e = np.zeros((n_cells, p1, p1, p1))
    if gradient:
        md = geo.merged_diag_per_cell()  # [E, 3] in (x, y, z) order
        local_e += md[:, 0, None, None, None] * np.einsum(
            "k,j,i->kji", m1, m1, k1
        )
        local_e += md[:, 1, None, None, None] * np.einsum(
            "k,j,i->kji", m1, k1, m1
        )
        local_e += md[:, 2, None, None, None] * np.einsum(
            "k,j,i->kji", k1, m1, m1
        )
    det_e = geo.det_per_cell()[:, None, None, None]
    if value_const is not None:
        local_e += value_const * det_e * np.einsum("k,j,i->kji", m1, m1, m1)

    if value_q is not None:
        q = basis.n_q
        aq = value_q.reshape(n_cells, q, q, q)
        t = np.einsum("ezyx,xi->ezyi", aq, w[:, None] * S2, optimize=True)
        t = np.einsum("ezyi,yj->ezji", t, w[:, None] * S2, optimize=True)
        local_e = local_e + det_e * np.einsum(
            "ezji,zk->ekji", t, w[:, None] * S2, optimize=True
        )

    return _scatter_local_diagonal(space, local_e)


def _scatter_local_diagonal(space: FESpace, local_e: np.ndarray) -> jnp.ndarray:
    """Scatter-add per-element local diagonals and pin Dirichlet rows."""
    dof_map = space.mesh.element_dof_map(space.degree)
    diag = np.zeros(space.n_dofs)
    np.add.at(diag, dof_map.reshape(-1), local_e.reshape(-1))
    mask = space.mesh.boundary_dof_mask(space.degree)
    diag[mask] = 1.0
    return jnp.asarray(diag, dtype=space.dtype)


def _general_local_diagonal(
    space: FESpace,
    gradient: bool,
    value_q: Optional[np.ndarray],
    value_const: Optional[float],
) -> np.ndarray:
    """Per-element diagonal on general (mapped) geometry:
    ``diag_e[a] = sum_q grad phi_a(q)^T C_e(q) grad phi_a(q) + value terms``
    with the 6-plane merged coefficient tables."""
    from ..basis import basis_tables_3d

    geo = space.geometry
    V, G = basis_tables_3d(space.basis)
    n_cells = space.mesh.n_cells
    local_e = np.zeros((n_cells, V.shape[0]))
    if gradient:
        C = geo.merged_coef_full()  # [E, n_q, 6]
        # one GEMM: fold the six planes' basis products into a small
        # [n_q*6, n_dofs] table so the element dimension is a single
        # contiguous matmul (per-plane strided einsums over C paid ~20 s
        # at 1M DoFs on the slow-allocation dev box)
        n_q = C.shape[1]
        T = np.empty((n_q, 6, V.shape[0]))
        planes = [(0, 0, 0), (1, 0, 1), (2, 0, 2), (3, 1, 1), (4, 1, 2), (5, 2, 2)]
        for plane, r, s in planes:
            f = 1.0 if r == s else 2.0
            T[:, plane, :] = f * (G[r] * G[s]).T
        local_e += C.reshape(n_cells, n_q * 6) @ T.reshape(n_q * 6, -1)
    if value_const is not None or value_q is not None:
        jxw = geo.jxw_full()  # [E, n_q]
        if value_q is not None:
            jxw = jxw * value_q.reshape(n_cells, -1)
        elif value_const != 1.0:
            jxw = jxw * value_const
        local_e += np.einsum("aq,aq,eq->ea", V, V, jxw, optimize=True)
    return local_e


def assemble_dense(op: MatrixFreeOperator, max_dofs: int = 20000) -> np.ndarray:
    """Dense matrix of the CONSTRAINED operator (``vmult`` semantics: zero
    constrained src columns, cell loop, Dirichlet identity rows), assembled
    on the host from the geometry tables and the operator's
    :meth:`~MatrixFreeOperator.weak_form`.

    Replaces the vmapped ``vmult``-over-identity-columns materialization
    for multigrid coarse solves: no device round-trips, no XLA compile
    (~95 s for a 2k-DoF coarse matrix through the tunneled dev chip), just
    one batched host GEMM per coefficient plane. Brick meshes only (no
    hanging-node constraints); guarded by ``max_dofs``.
    """
    space = op.space
    if space.n_dofs > max_dofs:
        raise ValueError(
            f"assemble_dense: {space.n_dofs} DoFs > max_dofs={max_dofs} "
            "(dense assembly is for coarse solves)"
        )
    gradient, value_q, value_const = op.weak_form()
    from ..basis import basis_tables_3d

    geo = space.geometry
    V, G = basis_tables_3d(space.basis)  # V [nl, n_q], G [3, nl, n_q]
    n_local = V.shape[0]
    n_cells = space.mesh.n_cells
    K = np.zeros((n_cells, n_local, n_local))
    if gradient:
        C = geo.merged_coef_full()  # [E, n_q, 6], JxW-weighted
        planes = [(0, 0, 0), (1, 0, 1), (2, 0, 2), (3, 1, 1), (4, 1, 2), (5, 2, 2)]
        for plane, r, s in planes:
            # K_e[a,b] += sum_q C[e,q] G_r[a,q] G_s[b,q]  (+ sym for r!=s)
            K += (C[:, None, :, plane] * G[r][None]) @ G[s].T
            if r != s:
                K += (C[:, None, :, plane] * G[s][None]) @ G[r].T
    if value_const is not None or value_q is not None:
        jxw = geo.jxw_full()  # [E, n_q]
        if value_q is not None:
            jxw = jxw * np.asarray(value_q, dtype=np.float64).reshape(n_cells, -1)
        elif value_const != 1.0:
            jxw = jxw * value_const
        K += (jxw[:, None, :] * V[None]) @ V.T

    dof_map = space.mesh.element_dof_map(space.degree)  # [E, nl]
    n = space.n_dofs
    A = np.zeros((n, n))
    rows = np.repeat(dof_map, n_local, axis=1).reshape(-1)
    cols = np.tile(dof_map, (1, n_local)).reshape(-1)
    np.add.at(A, (rows, cols), K.reshape(-1))
    mask = space.mesh.boundary_dof_mask(space.degree)
    if op._fold_factor != 1.0:
        A[~mask, :] *= op._fold_factor
    A[mask, :] = 0.0
    A[:, mask] = 0.0
    A[mask, mask] = 1.0
    return A


# --------------------------------------------------------------------- #
# RHS assembly and validation norms (reference L-17 / L-18)
# --------------------------------------------------------------------- #
def assemble_rhs(
    space: FESpace,
    f: float | Callable[[np.ndarray], np.ndarray] = 1.0,
    backend: str = "structured",
) -> jnp.ndarray:
    """Assemble the load vector b_i = integral(f * phi_i), zeroing constrained
    rows. The reference does this with a host FEValues loop and stages to the
    device (``bp5/step-64.cu:372-418``); here it reuses the device integrate/
    scatter pipeline directly.
    """
    if backend not in ("structured", "gather"):
        # separable/pallas are vmult-only fast paths; RHS assembly is a
        # one-time setup cost, served by the structured cell loop
        backend = "structured"
    op = MatrixFreeOperator(space, backend)
    geo = space.geometry
    if callable(f):
        xq = geo.q_points_phys()  # [n_cells, n_q, 3]
        f_q = np.asarray(f(xq), dtype=np.float64).reshape(space.mesh.n_cells, geo.n_q)
        integrand = jnp.asarray(
            op.to_layout(f_q * geo.jxw_full()), dtype=space.dtype
        )
    else:
        integrand = jnp.asarray(float(f) * op.jxw_layout(), dtype=space.dtype)
        # broadcast to full local shape so integrate sees the right rank
        shape = _local_shape(space, backend)
        integrand = jnp.broadcast_to(integrand, shape)
    vl = sf.integrate(integrand, None, space.S, space.D, op.axes, space.basis.collocation)
    b = op.scatter(vl)
    return space.zero_constrained_values(b)


def _local_shape(space: FESpace, backend: str) -> tuple[int, ...]:
    q = space.basis.n_q
    mx, my, mz = space.mesh.n_elements
    if backend == "structured":
        return (mz, q, my, q, mx, q)
    return (mx * my * mz, q, q, q)


def l2_norm_function(space: FESpace, u_flat: jnp.ndarray, n_q: int | None = None):
    """L2 norm of the FE function u_h, via quadrature with ``n_q`` (default
    p+2, matching the reference's ``QGauss(p+2)`` validation rule,
    ``bp5/step-64.cu:602-616``)."""
    from ..basis import Basis1D

    p = space.degree
    vb = Basis1D.make(p, p + 2 if n_q is None else n_q, "gauss")
    S = jnp.asarray(vb.S, dtype=space.dtype)
    D = jnp.asarray(vb.D, dtype=space.dtype)
    op = MatrixFreeOperator(space, "structured")
    ul = op.gather(u_flat)
    vals, _ = sf.evaluate(ul, S, D, op.axes, True, False, False)
    w = vb.q_weights
    q = w.shape[0]
    w3d = (w[:, None, None] * w[None, :, None] * w[None, None, :]).reshape(
        1, q, 1, q, 1, q
    )
    mx, my, mz = space.mesh.n_elements
    if space.mesh.is_mapped:
        # per-qpoint det(J) at the validation rule's points
        from ..geometry import Geometry

        det_q = Geometry.from_mesh(space.mesh, vb).det_q_full()
        det = np.moveaxis(
            det_q.reshape(mz, my, mx, q, q, q), (3, 4, 5), (1, 3, 5)
        )
        jxw = jnp.asarray(det * np.broadcast_to(w3d, det.shape), dtype=space.dtype)
    else:
        hx, hy, hz = space.mesh.h_axes()
        det = (
            hz.reshape(mz, 1, 1, 1, 1, 1)
            * hy.reshape(1, 1, my, 1, 1, 1)
            * hx.reshape(1, 1, 1, 1, mx, 1)
        )
        jxw = jnp.asarray(det * w3d, dtype=space.dtype)
    return jnp.sqrt(jnp.sum(vals * vals * jxw))

"""step-64 Helmholtz operator: dst = (-laplace + a(x)) src.

Rebuild of ``HelmholtzOperator`` + ``LocalHelmholtzOperator`` +
``HelmholtzOperatorQuad`` (``step-64/step-64.cu:131-311``): full
evaluate(values, gradients) -> ``submit_value(a(x)*u*JxW)`` +
``submit_gradient(JxW * J^{-1}J^{-T} grad u)`` -> integrate(values,
gradients). The varying coefficient ``a(x) = 10 / (0.05 + 2|x|^2)``
(``step-64/step-64.cu:96-118``) is evaluated once at setup over the physical
quadrature points — the ``evaluate_coefficients``/``VaryingCoefficientFunctor``
equivalent (reference L-3).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..fe_space import FESpace
from .operator_base import MatrixFreeOperator

__all__ = ["HelmholtzOperator", "default_coefficient"]


def default_coefficient(x: np.ndarray) -> np.ndarray:
    """a(x) = 10 / (0.05 + 2 |x|^2)  (step-64/step-64.cu:96-118)."""
    return 10.0 / (0.05 + 2.0 * np.sum(x * x, axis=-1))


class HelmholtzOperator(MatrixFreeOperator):
    needs_values = True
    needs_gradients = True

    def __init__(
        self,
        space: FESpace,
        backend: str = "structured",
        coefficient_fn: Callable[[np.ndarray], np.ndarray] = default_coefficient,
        pallas_opts: dict | None = None,
    ):
        if backend == "pallas":
            # fused stencil kernel + the collocated value term as one
            # extra FMA against a streamed a(x) node-table tile (GLL
            # collocation: quadrature points ARE the nodes, so the
            # assembled value diagonal is d3(i)*a(x_i) = S diag(a) S)
            if not space.basis.collocation:
                raise ValueError(
                    "pallas Helmholtz requires GLL collocation (the value "
                    "term is pointwise only when nodes = quadrature points)"
                )
            from ..ops.pallas_stencil import build_stencil_operator

            super().__init__(space, "separable")
            self.backend = "pallas"
            nodes = space.basis.nodes
            cx, cy, cz = space.mesh.node_coords_1d(space.degree, nodes)
            nz, ny, nx = space.grid_shape
            X = np.zeros((nz, ny, nx, 3))
            X[..., 0] = cx[None, None, :]
            X[..., 1] = cy[None, :, None]
            X[..., 2] = cz[:, None, None]
            # the kernel's S^2 is the UNIT-cell weight product (geometry
            # lives in the band coefficients), so the physical value
            # diagonal a*det*S^2 needs det = hx*hy*hz folded in here
            hx, hy, hz = space.mesh.h
            a_nodes = np.asarray(coefficient_fn(X), dtype=np.float64) * (
                hx * hy * hz
            )
            self._stencil = build_stencil_operator(
                space.mesh,
                space.basis,
                space.dtype,
                value_coef=a_nodes,
                **(pallas_opts or {}),
            )
            # qpoint-layout coefficient for compute_diagonal
            self._a_q_raw = np.asarray(
                coefficient_fn(space.geometry.q_points_phys()), dtype=np.float64
            )
            return
        if backend == "pallas_qgrid":
            # q-grid streaming kernel at the reference's NATIVE step-64
            # configuration (Gauss rule, varying a(x), value+gradient),
            # any brick geometry incl. mapped — no element-major layout
            # (ops/pallas_qgrid.py; step-64/step-64.cu:153-219)
            from ..ops.pallas_qgrid import build_qgrid_operator

            super().__init__(space, backend)
            self._dist_unsupported = (
                "pallas_qgrid Helmholtz streams a position-dependent "
                "a(x)*det value table inside the kernel; use "
                "backend='structured' for the distributed operator"
            )
            geo = space.geometry
            w3 = np.asarray(geo.w3d).reshape(-1)
            xq = geo.q_points_phys()
            a_q = np.asarray(coefficient_fn(xq), dtype=np.float64)
            self._a_q_raw = a_q
            if geo.uniform:
                grad = ("const", geo.const_merged_diag)
            elif not geo.mapped:
                grad = (
                    "diag3",
                    geo.merged_coef_full()[:, :, (0, 3, 5)]
                    / w3[None, :, None],
                )
            else:
                grad = ("full6", geo.merged_coef_full() / w3[None, :, None])
            self._qgrid = build_qgrid_operator(
                space.mesh, space.basis, space.dtype, grad=grad,
                val=("table", a_q * geo.det_q_full()),
                **(pallas_opts or {}),
            )
            return
        if backend == "pallas_general":
            # fused general-quadrature kernel at the reference's native
            # step-64 configuration (Gauss rule, value+gradient), any
            # geometry: gradient planes as for Poisson plus the streamed
            # a(x)*JxW value table
            from ..ops.pallas_general import build_general_operator

            super().__init__(space, backend)
            # the a(x)*JxW value table is position-dependent on EVERY mesh
            # and lives inside the kernel operator (not a sliceable named
            # table), so this backend cannot ride the shard-table path
            self._dist_unsupported = (
                "pallas_general Helmholtz streams a position-dependent "
                "a(x)*JxW value table inside the kernel; use "
                "backend='structured' for the distributed operator"
            )
            geo = space.geometry
            xq = geo.q_points_phys()
            a_q = np.asarray(coefficient_fn(xq), dtype=np.float64)
            self._a_q_raw = a_q
            if geo.uniform:
                grad = ("const", geo.const_merged_diag)
            elif not geo.mapped:
                grad = ("diag3", geo.merged_coef_full()[:, :, (0, 3, 5)])
            else:
                grad = ("full6", geo.merged_coef_full())
            self._general = build_general_operator(
                space,
                grad=grad,
                val=("table", a_q * geo.jxw_full()),
                **(pallas_opts or {}),
            )
            return
        if backend == "separable":
            # GLL collocation only: the varying-coefficient mass term is a
            # GLOBAL DIAGONAL (gather-diag-scatter over coinciding
            # node/quadrature points), so Helmholtz = Poisson Kronecker
            # terms + one diagonal term — the full fast path survives
            if not space.basis.collocation:
                raise ValueError(
                    "separable Helmholtz requires GLL collocation (the "
                    "Gauss-rule mass term with varying a(x) is not separable)"
                )
            from ..ops.separable import poisson_terms

            super().__init__(space, backend)
            # the assembled a(x)*JxW diagonal depends on the block's
            # physical position and cannot be sliced per shard
            self._dist_unsupported = (
                "separable Helmholtz has a position-dependent global "
                "diagonal; use backend='structured' for distribution"
            )
            geo = space.geometry
            xq = geo.q_points_phys()
            a_q = np.asarray(coefficient_fn(xq), dtype=np.float64)
            self._a_q_raw = a_q
            ajxw = (a_q * geo.jxw_full()).reshape(-1)
            dvec = np.zeros(space.n_dofs)
            np.add.at(dvec, space.mesh.element_dof_map(space.degree).reshape(-1), ajxw)
            nz, ny, nx = space.grid_shape
            self._sep_terms = poisson_terms(space.mesh, space.basis, space.dtype) + [
                {
                    "coef": 1.0,
                    "band": [],
                    "diag": jnp.asarray(dvec.reshape(nz, ny, nx), space.dtype),
                }
            ]
            return
        super().__init__(space, backend)
        geo = space.geometry
        xq = geo.q_points_phys()  # [n_cells, n_q, 3]
        a_q = np.asarray(coefficient_fn(xq), dtype=np.float64)
        self._a_q_raw = a_q  # kept for compute_diagonal
        # fold JxW into the value coefficient: a(x_q) * JxW(e, q)
        self._coef_val = jnp.asarray(
            self.to_layout(a_q * geo.jxw_full()), dtype=space.dtype
        )
        self._full_contraction = geo.mapped
        if geo.uniform:
            self._cdiag = tuple(
                jnp.asarray(c, dtype=space.dtype) for c in geo.const_merged_diag
            )
            self._w3d = jnp.asarray(self.w3d_layout(), dtype=space.dtype)
            self._coef_g = None
        else:
            # graded: diagonal planes only; mapped: all six planes live
            self._coef_g = jnp.asarray(
                self.to_layout(geo.merged_coef_full()), dtype=space.dtype
            )

    # ------------------- pallas (padded-layout) path ------------------- #
    @property
    def layout(self):
        if self.backend == "pallas_qgrid":
            return self._qgrid.layout
        return self._stencil.layout

    def vmult_padded(self, src: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas_stencil import constrained_vmult_padded

        if self.backend == "pallas_qgrid":
            return self._qgrid.constrained_call(src)
        return constrained_vmult_padded(self._stencil, src)

    def vmult(self, src: jnp.ndarray) -> jnp.ndarray:
        if self.backend in ("pallas", "pallas_qgrid"):
            L = self.layout
            if src.shape[0] == L.n:
                return self.vmult_padded(src)
            return L.unpad_flat(self.vmult_padded(L.pad_flat(src)))
        return super().vmult(src)

    def _apply_fold_scale(self, s: float) -> None:
        if self.backend == "pallas_general":
            self._general.fold_scale(s)
            return
        if self.backend == "pallas_qgrid":
            self._qgrid.fold_scale(s)
            return
        if self.backend == "pallas":
            L = self._stencil.layout
            L.bz, L.by, L.bx = L.bz * s, L.by * s, L.bx * s
            self._stencil._a = self._stencil._a * s
            L.bz_np, L.by_np, L.bx_np = L.bz_np * s, L.by_np * s, L.bx_np * s
            self._fused_cg_step = None
            return
        if self.backend in ("structured", "gather"):
            self._coef_val = self._coef_val * s
            if self._coef_g is None:
                self._cdiag = tuple(c * s for c in self._cdiag)
            else:
                self._coef_g = self._coef_g * s
            return
        super()._apply_fold_scale(s)

    def _compute_diagonal(self):
        from .operator_base import tensor_product_diagonal

        return tensor_product_diagonal(
            self.space, gradient=True, value_q=self._a_q_raw
        )

    def weak_form(self):
        return True, self._a_q_raw, None

    def shard_table_names(self):
        """The value coefficient a(x_q)*JxW depends on the block's physical
        position (reference ``VaryingCoefficientFunctor``,
        ``step-64/step-64.cu:69-118``); the gradient tables do too on
        graded/mapped meshes."""
        if self.backend == "separable":
            return ()
        if self._coef_g is not None:
            return ("_coef_val", "_coef_g")
        return ("_coef_val",)

    def quad_point_op(self, vals, grads):
        gx, gy, gz = grads
        if self._coef_g is None:
            cx, cy, cz = self._cdiag
            w = self._w3d
            flux = (gx * (cx * w), gy * (cy * w), gz * (cz * w))
        elif self._full_contraction:
            c = self._coef_g
            # symmetric 3x3 contraction (bp5/step-64.cu:164-188)
            flux = (
                c[..., 0] * gx + c[..., 1] * gy + c[..., 2] * gz,
                c[..., 1] * gx + c[..., 3] * gy + c[..., 4] * gz,
                c[..., 2] * gx + c[..., 4] * gy + c[..., 5] * gz,
            )
        else:
            c = self._coef_g
            flux = (c[..., 0] * gx, c[..., 3] * gy, c[..., 5] * gz)
        return vals * self._coef_val, flux

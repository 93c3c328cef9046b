"""Element geometry: Jacobians, JxW, and merged diffusion coefficients.

TPU-native equivalent of the reference's geometry tables
(``MappingQGeneric`` -> per-qpoint ``inv_jacobian``/``JxW`` consumed at
``bp5/step-64.cu:90-113``) and of the ``JacobianFunctor`` coefficient
precompute (``bp5/step-64.cu:60-114``): the merged symmetric tensor
``C(q) = JxW(q) * J^{-1} J^{-T}`` with dim*(dim+1)/2 = 6 independent entries,
so the Poisson quad-point operation is a single symmetric 3x3 contraction
(the ``MERGED_COEFFICIENTS`` switch, ``bp5/step-64.cu:47``).

Two representations:

- **constant** (uniform brick meshes, the only case the reference benchmarks):
  the Jacobian is diagonal and identical for every element, so the merged
  tensor factorizes as ``C(q) = det(J) * w3d(q) * diag(1/h_d^2)`` — three
  scalars plus the tensorized quadrature weights. No per-element geometry
  arrays exist at all; HBM traffic for metric terms is zero.
- **general** (per-element, per-qpoint arrays ``[n_cells, n_q, 6]``): the
  layout the reference stores (SoA planes, ``bp5/step-64.cu:107-113``),
  needed once meshes deform. Kept as dense arrays for the gather backend.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .basis import Basis1D
from .mesh import BrickMesh

__all__ = ["Geometry"]


def _tensor_weights(basis: Basis1D) -> np.ndarray:
    """w3d[qz,qy,qx] = wz*wy*wx."""
    w = basis.q_weights
    return w[:, None, None] * w[None, :, None] * w[None, None, :]


@dataclasses.dataclass(frozen=True)
class Geometry:
    """Metric terms for a mesh + quadrature rule.

    Attributes (constant path):
      h:        element extents (hx, hy, hz)
      det_j:    hx*hy*hz
      w3d:      ``[qz,qy,qx]`` tensorized quadrature weights
      inv_h2:   (1/hx^2, 1/hy^2, 1/hz^2) — diagonal of J^{-1} J^{-T}

    Attributes (general path, built on demand):
      merged_coef: ``[n_cells, n_q, 6]`` with symmetric index order
                   (xx, xy, xz, yy, yz, zz) — reference plane layout C2.
      jxw:         ``[n_cells, n_q]``
    """

    mesh: BrickMesh
    basis: Basis1D
    h: tuple[float, float, float]
    det_j: float
    w3d: np.ndarray
    inv_h2: tuple[float, float, float]

    @staticmethod
    def from_mesh(mesh: BrickMesh, basis: Basis1D) -> "Geometry":
        h = mesh.h
        det_j = h[0] * h[1] * h[2]
        w3d = _tensor_weights(basis)
        w3d.setflags(write=False)
        inv_h2 = (1.0 / h[0] ** 2, 1.0 / h[1] ** 2, 1.0 / h[2] ** 2)
        return Geometry(mesh, basis, h, det_j, w3d, inv_h2)

    @property
    def n_q(self) -> int:
        return self.basis.n_q ** 3

    # ---------------------------------------------------------------- #
    # constant fast path: scalars folded into the apply
    # ---------------------------------------------------------------- #
    @property
    def const_merged_diag(self) -> tuple[float, float, float]:
        """diag of det(J) * J^{-1} J^{-T}; multiply by w3d(q) to get C(q)."""
        return tuple(self.det_j * ih2 for ih2 in self.inv_h2)

    # ---------------------------------------------------------------- #
    # general path: dense per-(cell, qpoint) arrays
    # ---------------------------------------------------------------- #
    def jxw_full(self, dtype=np.float64) -> np.ndarray:
        """``[n_cells, n_q]`` JxW table (constant-J mesh: identical rows)."""
        row = (self.det_j * self.w3d.reshape(-1)).astype(dtype)
        return np.broadcast_to(row, (self.mesh.n_cells, self.n_q)).copy()

    def merged_coef_full(self, dtype=np.float64) -> np.ndarray:
        """``[n_cells, n_q, 6]`` merged coefficient in (xx,xy,xz,yy,yz,zz)
        order — what ``JacobianFunctor`` writes (``bp5/step-64.cu:98-113``)."""
        n_q = self.n_q
        coef = np.zeros((n_q, 6), dtype=dtype)
        jxw = self.det_j * self.w3d.reshape(-1)
        coef[:, 0] = jxw * self.inv_h2[0]
        coef[:, 3] = jxw * self.inv_h2[1]
        coef[:, 5] = jxw * self.inv_h2[2]
        return np.broadcast_to(coef, (self.mesh.n_cells, n_q, 6)).copy()

    def inv_jacobian_full(self, dtype=np.float64) -> np.ndarray:
        """``[n_cells, n_q, 3, 3]`` inverse Jacobian (constant diagonal here)."""
        inv = np.diag([1.0 / self.h[0], 1.0 / self.h[1], 1.0 / self.h[2]]).astype(dtype)
        return np.broadcast_to(inv, (self.mesh.n_cells, self.n_q, 3, 3)).copy()

    # ---------------------------------------------------------------- #
    # physical coordinates of quadrature points (evaluate_coefficients
    # support: reference L-3, ``bp5/step-64.cu:256-258``)
    # ---------------------------------------------------------------- #
    def q_points_phys(self) -> np.ndarray:
        """``[n_cells, n_q, 3]`` physical quadrature-point coordinates,
        cell order (ez,ey,ex) flattened, qpoint order (qz,qy,qx) flattened
        with x fastest."""
        mesh, basis = self.mesh, self.basis
        qp = basis.q_points
        axes = []
        for d in range(3):
            m = mesh.n_elements[d]
            hd = self.h[d]
            axes.append(mesh.lower[d] + hd * (np.arange(m)[:, None] + qp[None, :]))
        ax, ay, az = axes  # [m_d, n_q1]
        mx, my, mz = mesh.n_elements
        q1 = basis.n_q
        X = np.zeros((mz, my, mx, q1, q1, q1, 3))
        X[..., 0] = ax[None, None, :, None, None, :]
        X[..., 1] = ay[None, :, None, None, :, None]
        X[..., 2] = az[:, None, None, :, None, None]
        return X.reshape(mesh.n_cells, self.n_q, 3)

"""FESpace: the matrix-free data container (reference
``CUDAWrappers::MatrixFree`` L-1/L-5, ``bp5/step-64.cu:235-258``).

Bundles mesh + basis + geometry and precomputes, once, everything the
operator apply needs:

- the Dirichlet (constrained-DoF) mask (replaces ``AffineConstraints``),
- basis matrices as trace-time constants,
- for the *gather* backend: the int32 ``local_to_global`` table,
- for the *structured* backend: nothing — the map is arithmetic.

Global DoF vectors are flat ``jnp.ndarray[n_dofs]`` (the solver-facing
layout, reference L-9/L-10); the operator reshapes to the ``[nz, ny, nx]``
nodal grid internally. ``initialize_dof_vector`` mirrors
``MatrixFree::initialize_dof_vector`` (``bp5/step-64.cu:211-215``).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax.numpy as jnp
import numpy as np

from .basis import Basis1D
from .geometry import Geometry
from .mesh import BrickMesh

__all__ = ["FESpace"]


@dataclasses.dataclass(frozen=True)
class FESpace:
    mesh: BrickMesh
    basis: Basis1D
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def create(
        mesh: BrickMesh,
        degree: int,
        n_q: int | None = None,
        rule: str = "gauss_lobatto",
        dtype=jnp.float32,
    ) -> "FESpace":
        return FESpace(mesh, Basis1D.make(degree, n_q, rule), jnp.dtype(dtype))

    # ------------------------------------------------------------------ #
    @property
    def degree(self) -> int:
        return self.basis.degree

    @property
    def n_dofs(self) -> int:
        return self.mesh.n_dofs(self.degree)

    @property
    def grid_shape(self) -> tuple[int, int, int]:
        """(nz, ny, nx) nodal grid shape."""
        nx, ny, nz = self.mesh.n_nodes(self.degree)
        return (nz, ny, nx)

    @cached_property
    def geometry(self) -> Geometry:
        return Geometry.from_mesh(self.mesh, self.basis)

    # trace-time constant basis matrices in the working dtype
    @cached_property
    def S(self) -> jnp.ndarray:
        return jnp.asarray(self.basis.S, dtype=self.dtype)

    @cached_property
    def D(self) -> jnp.ndarray:
        return jnp.asarray(self.basis.D, dtype=self.dtype)

    # ------------------------------------------------------------------ #
    @cached_property
    def dirichlet_mask(self) -> jnp.ndarray:
        """bool ``[n_dofs]``; True on constrained (boundary) DoFs."""
        return jnp.asarray(self.mesh.boundary_dof_mask(self.degree))

    @cached_property
    def elem_dof_map(self) -> jnp.ndarray:
        """int32 ``[n_cells, (p+1)^3]`` local_to_global (gather backend only)."""
        return jnp.asarray(self.mesh.element_dof_map(self.degree))

    # ------------------------------------------------------------------ #
    def initialize_dof_vector(self) -> jnp.ndarray:
        return jnp.zeros((self.n_dofs,), dtype=self.dtype)

    def node_coords(self) -> np.ndarray:
        """``[n_dofs, 3]`` physical coordinates of the global DoFs
        (x fastest), host-side; includes the mesh deformation if any."""
        cx, cy, cz = self.mesh.node_coords_1d(self.degree, self.basis.nodes)
        nz, ny, nx = self.grid_shape
        X = np.zeros((nz, ny, nx, 3))
        X[..., 0] = cx[None, None, :]
        X[..., 1] = cy[None, :, None]
        X[..., 2] = cz[:, None, None]
        return self.mesh.map_points(X).reshape(-1, 3)

    def copy_constrained_values(
        self, src: jnp.ndarray, dst: jnp.ndarray
    ) -> jnp.ndarray:
        """Dirichlet rows act as identity (reference L-4,
        ``bp5/step-64.cu:275``)."""
        return jnp.where(self.dirichlet_mask, src, dst)

    def zero_constrained_values(self, src: jnp.ndarray) -> jnp.ndarray:
        """Zero constrained entries (keeps the operator symmetric: the
        effective operator is identity on the constrained subspace plus the
        interior stiffness on its complement)."""
        return jnp.where(self.dirichlet_mask, jnp.zeros((), dtype=src.dtype), src)

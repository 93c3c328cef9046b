"""Domain decomposition over a TPU device mesh.

TPU-native replacement of the reference's L0 distribution stack (p4est
partitioning + owned/ghost DoF index sets + CUDA-aware-MPI transport;
``bp5/step-64.cu:310,345-348``, ``tests/cuda_aware_mpi.cc``): the element
grid is block-partitioned along the z axis over a 1D ``jax.sharding.Mesh``
axis. There are no index sets and no transport code — the ghost layer is a
single shared nodal plane between neighboring slabs, and its exchange is a
``ppermute`` over ICI inside ``shard_map``.

Representation ("ghosted slab"): every device holds
``[mz_loc * p + 1, ny, nx]`` nodal planes; the *last* plane is a duplicate of
the next device's first plane (the final device genuinely owns its last
plane). Elementwise vector updates keep duplicates consistent by
construction, so only two operations need communication:

- ``vmult``: the two partial sums computed for a shared plane by its two
  neighboring slabs are combined with one bidirectional plane ``ppermute``
  (the ``update_ghost_values``/``compress(add)`` pair, reference L-2/L-9);
- dot products: duplicated planes are weighted out, then one ``psum``
  (the 7-scalar ``MPI_Allreduce``, ``bp5/solver.h:493-494``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh import BrickMesh

__all__ = ["SlabPartition"]


@dataclasses.dataclass(frozen=True)
class SlabPartition:
    """Z-axis slab decomposition of a :class:`BrickMesh` over ``n_shards``."""

    mesh: BrickMesh
    degree: int
    n_shards: int
    axis_name: str = "z"

    def __post_init__(self):
        mz = self.mesh.n_elements[2]
        if mz % self.n_shards != 0:
            raise ValueError(
                f"mz={mz} not divisible by n_shards={self.n_shards}"
            )

    @property
    def mz_local(self) -> int:
        return self.mesh.n_elements[2] // self.n_shards

    @property
    def local_mesh(self) -> BrickMesh:
        """The per-shard element slab. Geometry (h) is identical on every
        shard, so one traced program serves all of them."""
        mx, my, mz = self.mesh.n_elements
        lo, up = self.mesh.lower, self.mesh.upper
        hz = self.mesh.h[2]
        # z-extent of one slab; absolute offset differs per shard but only
        # enters coefficient evaluation, which is passed in as data.
        return BrickMesh(
            (mx, my, self.mz_local),
            lo,
            (up[0], up[1], lo[2] + hz * self.mz_local),
        )

    @property
    def local_grid_shape(self) -> tuple[int, int, int]:
        nx, ny, _ = self.mesh.n_nodes(self.degree)
        return (self.mz_local * self.degree + 1, ny, nx)

    @property
    def global_grid_shape(self) -> tuple[int, int, int]:
        nx, ny, nz = self.mesh.n_nodes(self.degree)
        return (nz, ny, nx)

    # ---------------------------------------------------------------- #
    # host-side conversions between a global grid array and the stacked
    # ghosted-slab representation [n_shards, nz_loc, ny, nx]
    # ---------------------------------------------------------------- #
    def to_slabs(self, u_global: np.ndarray) -> np.ndarray:
        nz, ny, nx = self.global_grid_shape
        nzl = self.local_grid_shape[0]
        u = np.asarray(u_global).reshape(nz, ny, nx)
        p_step = self.mz_local * self.degree
        out = np.stack(
            [u[k * p_step : k * p_step + nzl] for k in range(self.n_shards)]
        )
        return out

    def from_slabs(self, slabs: np.ndarray) -> np.ndarray:
        """Inverse of :meth:`to_slabs` (drops duplicated ghost planes)."""
        nz, ny, nx = self.global_grid_shape
        p_step = self.mz_local * self.degree
        out = np.zeros((nz, ny, nx), dtype=slabs.dtype)
        for k in range(self.n_shards):
            out[k * p_step : k * p_step + p_step] = slabs[k][:p_step]
        out[-1] = slabs[-1][-1]
        return out

    # ---------------------------------------------------------------- #
    # per-shard masks (built inside shard_map from the axis index)
    # ---------------------------------------------------------------- #
    def local_dirichlet_mask(self, shard_index) -> jnp.ndarray:
        """bool ``[nz_loc, ny, nx]``: x/y walls everywhere; z walls only on
        the first/last shard. ``shard_index`` may be traced
        (``lax.axis_index``)."""
        nzl, ny, nx = self.local_grid_shape
        bx = (jnp.arange(nx) == 0) | (jnp.arange(nx) == nx - 1)
        by = (jnp.arange(ny) == 0) | (jnp.arange(ny) == ny - 1)
        base = by[None, :, None] | bx[None, None, :]
        zi = jnp.arange(nzl)
        z_first = (zi == 0)[:, None, None] & (shard_index == 0)
        z_last = (zi == nzl - 1)[:, None, None] & (shard_index == self.n_shards - 1)
        return jnp.broadcast_to(base, (nzl, ny, nx)) | z_first | z_last

    def local_dot_weight(self, shard_index, dtype) -> jnp.ndarray:
        """``[nz_loc, 1, 1]`` weights: 1 on owned planes, 0 on the ghost
        plane (every shard's last plane except the final shard's)."""
        nzl = self.local_grid_shape[0]
        w = jnp.ones((nzl, 1, 1), dtype=dtype)
        is_last = shard_index == self.n_shards - 1
        return w.at[-1].set(jnp.where(is_last, 1.0, 0.0).astype(dtype))

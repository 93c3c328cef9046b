"""Distributed matrix-free operators: local cell loop + ICI halo exchange.

The per-shard program (traced once, SPMD over the mesh axis):

    mask constrained -> local structured cell loop (pure compute)
        -> bidirectional one-plane ppermute (combine shared-plane partials)
        -> Dirichlet identity rows

This is the reference's ``cell_loop`` with
``overlap_communication_computation=true`` (``bp5/step-64.cu:241``) in XLA
form: the plane ``ppermute`` is asynchronous in the XLA schedule and only the
two boundary planes depend on it, so the compiler overlaps it with the
interior compute — no manual interior/boundary cell split is needed.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..fe_space import FESpace
from ..models.poisson import PoissonOperator
from .partition import SlabPartition

__all__ = ["DistPoissonOperator", "halo_combine"]


def halo_combine(dst: jnp.ndarray, axis_name: str, n_shards: int) -> jnp.ndarray:
    """Combine partial sums on the shared planes between z-neighboring slabs:
    shard k's last plane and shard k+1's first plane are the same global
    plane; each side adds the other's partial so both duplicates end up with
    the full value (``compress(add)`` + ``update_ghost_values`` in one
    bidirectional exchange)."""
    if n_shards == 1:
        return dst
    up = [(k, k + 1) for k in range(n_shards - 1)]  # send to next shard
    down = [(k + 1, k) for k in range(n_shards - 1)]  # send to prev shard
    # my last plane partial -> next shard's first plane; my first plane
    # partial -> prev shard's last plane. Non-receivers get zeros.
    from_prev = lax.ppermute(dst[-1:], axis_name, up)
    from_next = lax.ppermute(dst[:1], axis_name, down)
    dst = dst.at[:1].add(from_prev)
    dst = dst.at[-1:].add(from_next)
    return dst


class DistPoissonOperator:
    """SPMD BP5 Poisson operator over a :class:`SlabPartition`.

    ``vmult_local`` is the per-shard function to be called *inside*
    ``shard_map``; arrays are local ghosted slabs ``[nz_loc, ny, nx]``.
    """

    def __init__(self, part: SlabPartition, dtype=jnp.float32, backend: str = "separable"):
        self.part = part
        self.space = FESpace.create(
            part.local_mesh, part.degree, rule="gauss_lobatto", dtype=dtype
        )
        # Local operator WITHOUT constraint handling; masks are shard-aware.
        # Any backend whose apply equals the sum of local element
        # contributions is valid here — including the separable fast path:
        # the per-shard band matrices are assembled from local elements
        # only, so interior planes are complete and exactly the shared
        # plane carries cross-shard partial sums (combined in halo_combine).
        self._local_op = PoissonOperator(self.space, backend=backend)

    def vmult_local(self, u: jnp.ndarray) -> jnp.ndarray:
        part = self.part
        i = lax.axis_index(part.axis_name)
        mask = part.local_dirichlet_mask(i)
        us = jnp.where(mask, jnp.zeros((), u.dtype), u)
        dst = self._local_op.apply_cell_loop(us.reshape(-1)).reshape(u.shape)
        dst = halo_combine(dst, part.axis_name, part.n_shards)
        return jnp.where(mask, u, dst)

    def dot_weight(self, dtype):
        i = lax.axis_index(self.part.axis_name)
        return self.part.local_dot_weight(i, dtype)

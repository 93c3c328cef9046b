"""Distributed matrix-free operators: local cell loop + ICI halo exchange.

The per-shard program (traced once, SPMD over the 2D (z, y) device mesh):

    mask constrained -> local cell loop (pure compute)
        -> bidirectional one-plane ppermute per partitioned axis
        -> Dirichlet identity rows

This is the reference's ``cell_loop`` with
``overlap_communication_computation=true`` (``bp5/step-64.cu:241``) in XLA
form: the plane ``ppermute`` is asynchronous in the XLA schedule and only
the boundary planes depend on it, so the compiler overlaps it with the
interior compute — no manual interior/boundary cell split is needed.

:class:`DistOperator` wraps ANY :class:`~..models.operator_base
.MatrixFreeOperator` (Poisson, Helmholtz, mass, vector BPs — the
reference's whole-driver-at-any-rank-count property,
``bp5/step-64.cu:704-708``). Operators whose coefficient tables depend on
the shard's physical position (e.g. Helmholtz's ``a(x)``) declare them via
``shard_table_names()``; the tables are built once on the padded global
mesh, sliced per shard, and fed through ``shard_map`` as sharded operands.
"""

from __future__ import annotations

from typing import Callable, Optional, Type

import jax
import jax.numpy as jnp
from jax import lax

from ..fe_space import FESpace
from ..models.operator_base import MatrixFreeOperator
from ..models.poisson import PoissonOperator
from .partition import BlockPartition

__all__ = ["DistOperator", "DistPoissonOperator", "halo_combine"]


def halo_combine(dst: jnp.ndarray, part: BlockPartition) -> jnp.ndarray:
    """Combine partial sums on planes shared between neighboring blocks:
    one bidirectional plane exchange per partitioned axis; z first so the
    subsequent y exchange carries z-pair sums across shared edges
    (``compress(add)`` + ``update_ghost_values`` in one pass)."""
    if part.pz > 1:
        up = [(k, k + 1) for k in range(part.pz - 1)]
        down = [(k + 1, k) for k in range(part.pz - 1)]
        from_prev = lax.ppermute(dst[-1:], part.axis_z, up)
        from_next = lax.ppermute(dst[:1], part.axis_z, down)
        dst = dst.at[:1].add(from_prev)
        dst = dst.at[-1:].add(from_next)
    if part.py > 1:
        up = [(k, k + 1) for k in range(part.py - 1)]
        down = [(k + 1, k) for k in range(part.py - 1)]
        from_prev = lax.ppermute(dst[:, -1:], part.axis_y, up)
        from_next = lax.ppermute(dst[:, :1], part.axis_y, down)
        dst = dst.at[:, :1].add(from_prev)
        dst = dst.at[:, -1:].add(from_next)
    if part.px > 1:
        # x last: its planes then carry the z/y pair sums across shared
        # edges and the 8-corner points resolve automatically
        up = [(k, k + 1) for k in range(part.px - 1)]
        down = [(k + 1, k) for k in range(part.px - 1)]
        from_prev = lax.ppermute(dst[:, :, -1:], part.axis_x, up)
        from_next = lax.ppermute(dst[:, :, :1], part.axis_x, down)
        dst = dst.at[:, :, :1].add(from_prev)
        dst = dst.at[:, :, -1:].add(from_next)
    return dst


class DistOperator:
    """SPMD matrix-free operator over a :class:`BlockPartition`.

    ``vmult_local`` is the per-shard function called *inside*
    ``shard_map``; arrays are local ghosted blocks ``[nz_loc, ny_loc, nx]``.

    Parameters mirror the single-device operator constructors:
    ``op_cls(space, backend=..., **op_kwargs)``.
    """

    def __init__(
        self,
        part: BlockPartition,
        op_cls: Type[MatrixFreeOperator] = PoissonOperator,
        dtype=jnp.float32,
        backend: str = "separable",
        rule: str = "gauss_lobatto",
        n_q: Optional[int] = None,
        n_components: int = 1,
        **op_kwargs,
    ):
        if backend not in ("separable", "structured", "gather", "pallas_general"):
            raise ValueError(
                f"distributed backend {backend!r} unsupported: the per-shard "
                "apply must be a plain cell loop (separable/structured/"
                "gather/pallas_general); the fused stencil kernel owns its "
                "own padded layout (parallel/dist_pallas.py)"
            )
        if backend == "pallas_general" and not part.mesh.is_uniform:
            # the general kernel streams per-element coefficient tables in
            # its own [K, E, Q] layout; per-shard slicing of those tables
            # is not wired up — graded/mapped distributed runs take the
            # structured backend's sliced global tables instead
            raise ValueError(
                "distributed pallas_general supports uniform global meshes "
                "(const-coefficient path); use backend='structured' for "
                "graded/mapped meshes"
            )
        self.part = part
        self.n_components = n_components
        self.space = FESpace.create(
            part.local_mesh, part.degree, n_q=n_q, rule=rule, dtype=dtype
        )
        # Local operator WITHOUT constraint handling; masks are shard-aware.
        # Any backend whose apply equals the sum of local element
        # contributions is valid here — including the separable fast path:
        # per-shard band matrices are assembled from local elements only, so
        # interior planes are complete and exactly the shared planes carry
        # cross-shard partials (combined in halo_combine).
        self.backend = backend
        self._local_op = op_cls(self.space, backend=backend, **op_kwargs)
        reason = getattr(self._local_op, "_dist_unsupported", None)
        if reason:
            raise ValueError(f"{op_cls.__name__}: {reason}")
        self._table_names = self._local_op.shard_table_names()
        if not part.mesh.is_uniform and not self._table_names:
            raise ValueError(
                f"{op_cls.__name__}: graded/mapped global meshes need "
                "position-dependent shard tables (shard_table_names); "
                "use backend='structured'"
            )
        if self._table_names:
            if backend != "structured":
                raise ValueError(
                    f"{op_cls.__name__} has position-dependent tables; "
                    "use backend='structured' for the distributed operator"
                )
            # Build the tables once on the PHYSICAL global mesh, zero-pad
            # over the dead padding elements (zero coefficients make dead
            # cells contribute exactly nothing), slice per shard in device
            # order. Evaluating geometry/coefficients outside the physical
            # domain is never needed.
            import numpy as np

            gspace = FESpace.create(
                part.mesh, part.degree, n_q=n_q, rule=rule, dtype=dtype
            )
            gop = op_cls(gspace, backend=backend, **op_kwargs)
            mz_pad = part.mz_local * part.pz - part.mesh.n_elements[2]
            my_pad = part.my_local * part.py - part.mesh.n_elements[1]
            mx_pad = part.mx_local * part.px - part.mesh.n_elements[0]
            tables = []
            for name in self._table_names:
                t = np.asarray(getattr(gop, name))
                pad = [(0, 0)] * t.ndim
                pad[0] = (0, mz_pad)  # structured layout [MZ,q,MY,q,MX,q,...]
                pad[2] = (0, my_pad)
                pad[4] = (0, mx_pad)
                tables.append(jnp.asarray(part.slice_table(np.pad(t, pad))))
            self.shard_tables = tuple(tables)
        else:
            self.shard_tables = ()
        self._solver_cache = {}

    def vmult_local(self, u: jnp.ndarray, *tables: jnp.ndarray) -> jnp.ndarray:
        """Per-shard apply; ``tables`` are this shard's slices of
        :attr:`shard_tables` (leading stack axis already consumed by
        shard_map, may keep a leading length-1 axis). Vector-valued
        (``n_components > 1``) inputs carry a leading component axis and
        are vmapped over it — the components share all metric tables
        (reference BP2/BP4/BP6 structure)."""
        if u.ndim == 4:
            return jax.vmap(lambda c: self.vmult_local(c, *tables))(u)
        part = self.part
        iz = lax.axis_index(part.axis_z)
        iy = lax.axis_index(part.axis_y)
        ix = lax.axis_index(part.axis_x) if part.px > 1 else 0
        mask = part.local_dirichlet_mask(iz, iy, ix)
        us = jnp.where(mask, jnp.zeros((), u.dtype), u)
        op = self._local_op
        if tables:
            squeezed = {
                name: t.reshape(t.shape[1:])
                for name, t in zip(self._table_names, tables)
            }
            op = op.bind_shard_tables(squeezed)
        if (
            op._sep_terms is not None
            and (part.pz > 1 or part.py > 1)
            and part.px == 1
        ):
            # overlapped path (plane partials fly during the full apply);
            # with x partitioned too, the 12-edge/8-corner association is
            # not implemented — take the plain halo_combine schedule
            dst = self._vmult_overlap(us, op)
        else:
            dst = op.apply_cell_loop(us.reshape(-1)).reshape(u.shape)
            dst = halo_combine(dst, part)
        return jnp.where(mask, u, dst)

    def _vmult_overlap(self, us: jnp.ndarray, op) -> jnp.ndarray:
        """Communication/computation-overlapped apply (separable backend):
        the shared-plane partials a shard must send are computed first via
        restricted plane applies (one plane's work each), the halo
        ``ppermute``s are issued on those, and the full local apply — which
        does not depend on any received data — runs while they fly. XLA's
        latency-hiding scheduler places the independent full apply between
        ``collective-permute-start`` and ``-done`` (verified on an AOT
        v5e:2x4 compile; see ARCHITECTURE.md). The reference engineers the
        same overlap with split interior/boundary cell batches
        (``overlap_communication_computation``, ``bp5/step-64.cu:241``)."""
        from ..ops.separable import apply_separable, apply_separable_plane

        part = self.part
        terms, mode = op._sep_terms, op.sep_mode
        sets = []  # (index expression, combined boundary value)

        # Bitwise duplicate coherence is preserved: every shared entity's
        # final value is assembled from the SAME bit-identical owner
        # partials in the SAME position-sorted association on all sharers
        # (2-term sums are commutative; 4-term corner sums pair
        # lower-position with lower-position).
        if part.pz > 1:
            up = [(k, k + 1) for k in range(part.pz - 1)]
            down = [(k + 1, k) for k in range(part.pz - 1)]
            pz_first = apply_separable_plane(us, terms, 0, 0, mode)
            pz_last = apply_separable_plane(us, terms, 0, -1, mode)
            from_prev_z = lax.ppermute(pz_last, part.axis_z, up)
            from_next_z = lax.ppermute(pz_first, part.axis_z, down)
            sets.append(((slice(0, 1), slice(None)), from_prev_z + pz_first))
            sets.append(((slice(-1, None), slice(None)), pz_last + from_next_z))
        if part.py > 1:
            upy = [(k, k + 1) for k in range(part.py - 1)]
            downy = [(k + 1, k) for k in range(part.py - 1)]
            py_first = apply_separable_plane(us, terms, 1, 0, mode)
            py_last = apply_separable_plane(us, terms, 1, -1, mode)
            from_prev_y = lax.ppermute(py_last, part.axis_y, upy)
            from_next_y = lax.ppermute(py_first, part.axis_y, downy)
            sets.append(((slice(None), slice(0, 1)), from_prev_y + py_first))
            sets.append(((slice(None), slice(-1, None)), py_last + from_next_y))
        if part.pz > 1 and part.py > 1:
            # Corner lines shared by four diagonal neighbors: all four
            # quadrant partials are used in their z-plane (pz_*) version —
            # the z-neighbor's arrives inside its z-plane, the y-neighbor's
            # via two extra corner-line permutes, the diagonal's via a
            # chained two-hop permute.
            def diag_recv(x, zpairs, ypairs):
                return lax.ppermute(
                    lax.ppermute(x, part.axis_y, ypairs), part.axis_z, zpairs
                )

            d00 = diag_recv(pz_last[:, -1:], up, upy)  # from (iz-1, iy-1)
            d01 = diag_recv(pz_last[:, :1], up, downy)  # from (iz-1, iy+1)
            d10 = diag_recv(pz_first[:, -1:], down, upy)  # from (iz+1, iy-1)
            d11 = diag_recv(pz_first[:, :1], down, downy)  # from (iz+1, iy+1)
            # y-neighbors' z-corner partials (pz-version), batched per dir
            yl_up = jnp.concatenate([pz_first[:, -1:], pz_last[:, -1:]], axis=0)
            yl_dn = jnp.concatenate([pz_first[:, :1], pz_last[:, :1]], axis=0)
            from_prev_yl = lax.ppermute(yl_up, part.axis_y, upy)  # (iz, iy-1)
            from_next_yl = lax.ppermute(yl_dn, part.axis_y, downy)  # (iz, iy+1)

            sets.append((
                (slice(0, 1), slice(0, 1)),
                (d00 + from_prev_z[:, :1]) + (from_prev_yl[0:1] + pz_first[:, :1]),
            ))
            sets.append((
                (slice(0, 1), slice(-1, None)),
                (from_prev_z[:, -1:] + d01) + (pz_first[:, -1:] + from_next_yl[0:1]),
            ))
            sets.append((
                (slice(-1, None), slice(0, 1)),
                (from_prev_yl[1:2] + pz_last[:, :1]) + (d10 + from_next_z[:, :1]),
            ))
            sets.append((
                (slice(-1, None), slice(-1, None)),
                (pz_last[:, -1:] + from_next_yl[1:2]) + (from_next_z[:, -1:] + d11),
            ))

        dst = apply_separable(us, terms, mode)  # independent of the permutes
        for slot, val in sets:
            dst = dst.at[slot].set(val)
        return dst

    def dot_weight(self, dtype):
        part = self.part
        iz = lax.axis_index(part.axis_z)
        iy = lax.axis_index(part.axis_y)
        ix = lax.axis_index(part.axis_x) if part.px > 1 else 0
        return part.local_dot_weight(iz, iy, dtype, ix)

    def jacobi_blocks(self, op_cls=None, **op_kwargs):
        """Host-side: the true-Jacobi preconditioner (1/diag) of the global
        operator in concatenated-block layout — a shard_map ``diag``
        operand for preconditioned distributed solves."""
        import numpy as np

        rule = "gauss_lobatto" if self.space.basis.collocation else "gauss"
        gspace = FESpace.create(
            self.part.mesh,
            self.part.degree,
            n_q=self.space.basis.n_q,
            rule=rule,
            dtype=self.space.dtype,
        )
        gop = (op_cls or type(self._local_op))(
            gspace, backend="structured", **op_kwargs
        )
        d = np.asarray(gop.jacobi_preconditioner()).reshape(gspace.grid_shape)
        blocks = self.part.to_blocks(d)
        # padding rows: identity so the preconditioner is benign there
        blocks[blocks == 0.0] = 1.0
        return jnp.asarray(blocks, dtype=self.space.dtype)


def DistPoissonOperator(part, dtype=jnp.float32, backend: str = "separable"):
    """Back-compat alias: the BP5 Poisson distributed operator."""
    return DistOperator(part, PoissonOperator, dtype=dtype, backend=backend)

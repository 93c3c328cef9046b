"""Baseline preconditioned conjugate gradients — the "pcg-standard" mode.

Textbook PCG as a ``lax.while_loop`` (rebuild of deal.II ``SolverCG`` as
used at ``bp5/step-64.cu:434-475``): separate AXPY-style updates and 2-3
reductions per iteration. This is deliberately the *unfused* comparator the
reference benchmarks the merged solver against; the optimized solver lives in
``cg_merged.py``. All scalars stay on device — there is never a host
round-trip inside the loop.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ._dispatch import dispatch
from .control import SolverControl

__all__ = ["solve_cg"]


def solve_cg(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    control: SolverControl,
    diag: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    dot_dtype=None,
    dot_weight: Optional[jnp.ndarray] = None,
    psum_axis: Optional[str] = None,
    active=None,
):
    """Solve A x = b with Jacobi-preconditioned CG.

    Returns ``(x, info)`` with ``info = {"n_iterations", "res_norm"}`` (both
    device scalars). ``diag`` is multiplied like the reference's
    ``DiagonalMatrix`` (both drivers fill it with 1.0,
    ``bp5/step-64.cu:428-432``); it may also be a CALLABLE preconditioner
    (FDM inverse, multigrid V-cycle).

    Eager calls are routed through a per-(A, control, diag) jit cache
    (``solvers._dispatch``): repeated solves with the same operator and
    preconditioner objects reuse one compiled executable instead of
    re-tracing the while_loop every call. Inside an existing trace the
    solve inlines unchanged.

    Distributed use (inside ``shard_map``): pass ``dot_weight`` to zero out
    ghost-duplicated entries and ``psum_axis`` to all-reduce the scalars over
    the device mesh axis (the ``MPI_Allreduce`` equivalent).

    ``active``: optional ``(shape3, slices)`` restricting the elementwise
    updates and dots to the real sub-box of a kernel-owned padded layout
    (see ``solve_cg_merged``); requires a vector ``diag`` (or None), not a
    callable preconditioner."""
    return dispatch(
        _solve_cg,
        A,
        b,
        control,
        diag,
        x0,
        dot_dtype,
        dot_weight,
        psum_axis,
        active,
    )


def _solve_cg(
    A,
    b,
    control,
    diag=None,
    x0=None,
    dot_dtype=None,
    dot_weight=None,
    psum_axis=None,
    active=None,
):
    dt = b.dtype
    dd = dot_dtype or dt

    if active is None:
        rd = lambda v: v  # noqa: E731

        def wr(v, new):
            return new

    else:
        assert not callable(diag), "active-region CG needs a vector diag"
        shape3, sl = active

        def rd(v):
            return v.reshape(shape3)[sl]

        def wr(v, new):
            return v.reshape(shape3).at[sl].set(new).reshape(v.shape)

    def dot(u, v):
        uv = u * v if dot_weight is None else u * v * rd(dot_weight)
        s = jnp.sum(uv.astype(dd))
        return jax.lax.psum(s, psum_axis) if psum_axis else s

    if callable(diag):
        precond = diag
    else:
        diag_a = 1.0 if diag is None else rd(diag)
        precond = lambda r: diag_a * r  # noqa: E731

    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - A(x0)

    ra = rd(r)
    res0 = jnp.sqrt(dot(ra, ra))
    za = precond(ra) if active is not None else precond(r)
    d = wr(jnp.zeros_like(b), za)
    rz = dot(ra, za)

    def cond(state):
        x, r, d, rz, it, res = state
        return control.continue_pred(it, res, res0)

    def body(state):
        x, r, d, rz, it, res = state
        h = A(d)
        da, ha = rd(d), rd(h)
        dh = dot(da, ha)
        alpha = jnp.where(dh != 0.0, rz / jnp.where(dh != 0.0, dh, 1.0), 0.0).astype(dt)
        x = wr(x, rd(x) + alpha * da)
        ra = rd(r) - alpha * ha
        r = wr(r, ra)
        za = precond(ra) if active is not None else precond(r)
        rz_new = dot(ra, za)
        beta = jnp.where(rz != 0.0, rz_new / jnp.where(rz != 0.0, rz, 1.0), 0.0).astype(dt)
        d = wr(d, za + beta * da)
        res = jnp.sqrt(dot(ra, ra)).astype(res.dtype)
        return (x, r, d, rz_new, it + 1, res)

    state = (x, r, d, rz, jnp.int32(0), res0.astype(dt))
    x, r, d, rz, it, res = jax.lax.while_loop(cond, body, state)
    return x, {"n_iterations": it, "res_norm": res, "res0": res0}

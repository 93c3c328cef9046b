"""Merged CG with the fully-fused Pallas iteration kernel.

The production form of ``solve_cg_merged`` on the padded stencil layout:
identical algorithm (``SolverCGFullMerge``, ``bp5/solver.h:343-542``) but
the per-iteration vector work — the ``update_a*`` pass, the operator
apply, and the ``update_b`` 7-dot pass — all run inside ONE Pallas kernel
(:class:`..ops.pallas_cg.CGFusedStep`); the ``lax.while_loop`` body is
that kernel plus O(1) scalar recurrences. Identity-diagonal
preconditioner only (both reference drivers fill the ``DiagonalMatrix``
with 1.0, ``bp5/step-64.cu:428-432``); pass a real ``diag`` to
``solve_cg_merged`` instead, which takes the XLA path.

Iteration mapping (call i of the kernel performs)::

    g <- g + alpha_{i-1} h        # completes iteration i-1's update
    d <- beta_{i-1} d - g
    x <- x + alpha_{i-1} d_old    # via (alpha/beta)(d_new + g_new)
    h <- A d
    dots = (d.h, h.h, g.h, g.g)   # feeds alpha_i, beta_i, |g_i| recurrence

so after the loop one XLA axpy applies the pending ``alpha_K d_K``
(the reference's deferred ``update_c`` epilogue, ``bp5/solver.h:509-526``).
Residual norms use the reduction-free recurrence
``|g_i| = sqrt(g.g + 2 a g.h + a^2 h.h)`` (``bp5/solver.h:504-505``), so
iteration counts and stopping match ``solve_cg_merged`` exactly (modulo
floating-point reduction order).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ._dispatch import dispatch
from .control import SolverControl

__all__ = ["solve_cg_fused"]


def solve_cg_fused(
    step,
    b: jnp.ndarray,
    control: SolverControl,
    x0: Optional[jnp.ndarray] = None,
    psum_axis: Optional[str] = None,
):
    """Solve ``A x = b`` with the fused-kernel merged CG.

    ``step``: a :class:`~..ops.pallas_cg.CGFusedStep` (or an operator
    exposing ``.fused_cg_step``). ``b``/``x0`` are padded-flat vectors at
    the layout's stream dtype. Returns ``(x, info)`` like the other
    solvers."""
    step = getattr(step, "fused_cg_step", step)
    return dispatch(
        _solve_cg_fused,
        step,
        b,
        control,
        None,  # diag (identity only)
        x0,
        None,  # dot_dtype (kernel accumulates f32)
        None,  # dot_weight
        psum_axis,
        None,  # active
    )


def _solve_cg_fused(
    step,
    b,
    control,
    diag=None,
    x0=None,
    dot_dtype=None,
    dot_weight=None,
    psum_axis=None,
    active=None,
):
    assert diag is None and dot_weight is None and active is None
    del dot_dtype
    from ..ops.pallas_cg import D as _D, X as _X

    sd = b.dtype
    f32 = jnp.float32
    zero = jnp.zeros((), f32)

    def reduce4(s):
        if psum_axis:
            return jax.lax.psum(s, psum_axis)
        return s

    # init (bp5/solver.h:373-383): g = A x0 - b; the x0 != None case pays
    # one extra operator apply through a throwaway kernel call
    zeros = jnp.zeros_like(b)
    g0 = -b
    if x0 is not None:
        scal0 = jnp.array([0.0, 0.0, 0.0], f32)
        # one throwaway fused call computes h = A x0: with alpha=beta=0 the
        # kernel sets d_new = -g_new = -g, so feed g := -x0
        s_tmp = step.stack_state(zeros, -x0, zeros, zeros)
        s_tmp, _ = step(s_tmp, jnp.zeros_like(s_tmp), scal0)
        g0 = step.unstack(s_tmp, 2) - b

    res0_sq = reduce4(jnp.sum(g0.astype(f32) * g0.astype(f32)))
    res0 = jnp.sqrt(res0_sq)

    x_init = zeros if x0 is None else x0
    s_state = step.stack_state(zeros, g0, zeros, x_init)
    state = {
        "s": s_state,                     # stacked (d, g, h, x) read side
        "sw": jnp.zeros_like(s_state),    # donated write side
        "dots": jnp.zeros(4, f32),
        "it": jnp.int32(0),
        "res": res0,
    }

    def scalars(dots, first):
        s0, s1, s2, s3 = dots[0], dots[1], dots[2], dots[3]
        alpha = jnp.where(s0 != 0.0, s3 / jnp.where(s0 != 0.0, s0, 1.0), zero)
        beta = jnp.where(
            s3 != 0.0, alpha * (s2 + alpha * s1) / jnp.where(s3 != 0.0, s3, 1.0),
            zero,
        )
        alpha = jnp.where(first, zero, alpha)
        beta = jnp.where(first, zero, beta)
        return alpha, beta

    def cond(st):
        return control.continue_pred(st["it"], st["res"], res0)

    def body(st):
        it = st["it"] + 1
        alpha, beta = scalars(st["dots"], st["it"] == 0)
        xa = jnp.where(beta != 0.0, alpha / jnp.where(beta != 0.0, beta, 1.0), zero)
        scal = jnp.stack([alpha, beta, xa])
        s2, dvec = step(st["s"], st["sw"], scal)
        ndots = reduce4(jnp.sum(dvec[:4], axis=1))
        a_n, _ = scalars(ndots, False)
        res = jnp.sqrt(jnp.maximum(
            ndots[3] + 2.0 * a_n * ndots[2] + a_n * a_n * ndots[1], 0.0
        ))
        # ping-pong: the stale read buffer becomes the next donation
        return {"s": s2, "sw": st["s"], "dots": ndots, "it": it, "res": res}

    st = jax.lax.while_loop(cond, body, state)
    # pending update_c epilogue: x += alpha_K d_K (bp5/solver.h:509-526)
    alpha_K, _ = scalars(st["dots"], st["it"] == 0)
    x = step.unstack(st["s"], _X) + alpha_K.astype(sd) * step.unstack(
        st["s"], _D
    )
    return x, {
        "n_iterations": st["it"],
        "res_norm": st["res"],
        "res0": res0,
    }

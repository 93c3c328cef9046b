"""Measure the general-quadrature Pallas kernel vs the XLA backends on the
dev chip (VERDICT r2 item 2). Chained applies inside one jit — the axon
tunnel has a ~30 ms per-call dispatch floor, so per-call timings are
meaningless. Run from the repo root: python scripts/bench_general.py"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.mesh import sine_map
from deal_and_ceed_on_gpu_tpu.models import MassOperator, PoissonOperator
from deal_and_ceed_on_gpu_tpu.utils import enable_compilation_cache

enable_compilation_cache()
N_AP, REPS = 50, 3


def measure(op, n):
    u0 = jnp.asarray(
        np.random.default_rng(0).standard_normal(n), op.space.dtype
    )
    u0 = u0 / jnp.linalg.norm(u0)
    v = jax.block_until_ready(jax.jit(op.vmult)(u0))
    op.fold_scale(1.0 / max(float(jnp.linalg.norm(v)), 1.0))
    vm = jax.jit(op.vmult)

    @jax.jit
    def chain(u):
        return jax.lax.fori_loop(0, N_AP, lambda i, w: vm(w), u)

    jax.block_until_ready(chain(u0))
    best = 0.0
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(u0))
        best = max(best, n * N_AP / (time.perf_counter() - t0))
    return best / 1e9


def bench(tag, make):
    try:
        op, n = make()
        print(f"{tag}: {measure(op, n):.3f} GDoF/s  ({n} DoFs)", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    m_uni = BrickMesh((32, 32, 32))
    sp_bp3 = FESpace.create(m_uni, 5, n_q=7, rule="gauss", dtype=jnp.float32)
    bench("BP3 p5 q7 structured", lambda: (PoissonOperator(sp_bp3, backend="structured"), sp_bp3.n_dofs))
    for prec in ("highest", "split3"):
        bench(
            f"BP3 p5 q7 pallas_general {prec}",
            lambda prec=prec: (
                PoissonOperator(sp_bp3, backend="pallas_general",
                                pallas_opts=dict(block_e=2048, precision=prec)),
                sp_bp3.n_dofs,
            ),
        )
    bench("BP1 p5 q7 pallas_general", lambda: (MassOperator(sp_bp3, backend="pallas_general", pallas_opts=dict(block_e=2048)), sp_bp3.n_dofs))

    phi, jac = sine_map(0.05)
    m_map = BrickMesh((52, 52, 52)).deform(phi, jac)
    sp_map = FESpace.create(m_map, 3, rule="gauss", dtype=jnp.float32)
    bench("mapped p3 structured", lambda: (PoissonOperator(sp_map, backend="structured"), sp_map.n_dofs))
    for prec in ("highest", "split3"):
        bench(
            f"mapped p3 pallas_general {prec}",
            lambda prec=prec: (
                PoissonOperator(sp_map, backend="pallas_general",
                                pallas_opts=dict(block_e=4096, precision=prec)),
                sp_map.n_dofs,
            ),
        )

"""Stage-level timing of the pallas_general mapped apply on the dev chip:
isolate (a) gather+transpose, (b) the pallas kernel, (c) scatter+transpose,
(d) coefficient-stream lower bound, to find where the ~9x gap to the
bandwidth roofline goes. Run: python scripts/profile_general_stages.py"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.mesh import sine_map
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator
from deal_and_ceed_on_gpu_tpu.ops import local_global as lg
from deal_and_ceed_on_gpu_tpu.ops.pallas_general import _gen_call
from deal_and_ceed_on_gpu_tpu.utils import enable_compilation_cache

enable_compilation_cache()
N_AP, REPS = 50, 3
STAGE_MS = []


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = 1e30
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    phi, jac = sine_map(0.05)
    m = BrickMesh((52, 52, 52)).deform(phi, jac)
    p = 3
    sp = FESpace.create(m, p, rule="gauss", dtype=jnp.float32)
    n = sp.n_dofs
    op = PoissonOperator(sp, backend="pallas_general",
                         pallas_opts=dict(block_e=4096))
    g = op._general
    E, N, Q, BE = g._E, g._N, g._Q, g._BE
    print(f"mapped p={p} n={n} E={E} N={N} Q={Q} BE={BE}")
    C = g._streamed["C"]
    print(f"C bytes = {C.size * C.dtype.itemsize / 1e6:.1f} MB; "
          f"u_local bytes = {E * N * 4 / 1e6:.1f} MB")

    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal(n), sp.dtype)
    p1 = p + 1
    mx, my, mz = m.n_elements

    # each iteration's input must DEPEND on the previous iteration's
    # output, or XLA's while-loop invariant code motion hoists the whole
    # gather out of the loop and the ms/apply is a fiction (ADVICE r3).
    # A 1-element in-place donate-able update on the carried vector is the
    # cheapest true dependence (no extra full pass).
    @jax.jit
    def gather_chain(u):
        def body(i, u):
            ul = lg.gather_structured(u.reshape(sp.grid_shape), m.n_elements, p)
            ul = ul.transpose(0, 2, 4, 1, 3, 5).reshape(E, N)
            return u.at[0].add(ul[0, 0] * 1e-30)
        return jax.lax.fori_loop(0, N_AP, body, u)

    t, _ = timeit(gather_chain, u0)
    STAGE_MS.append(t / N_AP * 1e3)
    print(f"gather+transpose: {t / N_AP * 1e3:.3f} ms/apply")

    ul0 = lg.gather_structured(u0.reshape(sp.grid_shape), m.n_elements, p)
    ul0 = ul0.transpose(0, 2, 4, 1, 3, 5).reshape(E, N)

    @jax.jit
    def kernel_chain(ul, tabs, streamed):
        def body(i, w):
            return _gen_call(
                w, tabs, streamed,
                shapes=(E, N, Q, BE), grad_kind=g.grad_kind,
                val_kind=g.val_kind, interpret=False,
                precision=g.precision,
                vmem_limit_bytes=g.vmem_limit_bytes)
        return jax.lax.fori_loop(0, N_AP, body, ul)

    t, wl0 = timeit(kernel_chain, ul0 / jnp.linalg.norm(ul0), g._tabs, g._streamed)
    STAGE_MS.append(t / N_AP * 1e3)
    print(f"kernel only:      {t / N_AP * 1e3:.3f} ms/apply")

    wl1 = ul0

    @jax.jit
    def scatter_chain(wl):
        def body(i, wl):
            w6 = wl.reshape(mz, my, mx, p1, p1, p1).transpose(0, 3, 1, 4, 2, 5)
            out = lg.scatter_structured(w6, p).reshape(-1)
            return wl.at[0, 0].add(out[0] * 1e-30)  # true data dependence
        return jax.lax.fori_loop(0, N_AP, body, wl)

    t, _ = timeit(scatter_chain, wl1)
    STAGE_MS.append(t / N_AP * 1e3)
    print(f"scatter+transpose: {t / N_AP * 1e3:.3f} ms/apply")

    # full apply for reference
    v = jax.block_until_ready(jax.jit(op.vmult)(u0))
    op.fold_scale(1.0 / max(float(jnp.linalg.norm(v)), 1.0))
    vm = jax.jit(op.vmult)

    @jax.jit
    def full_chain(u):
        return jax.lax.fori_loop(0, N_AP, lambda i, w: vm(w), u)

    t, _ = timeit(full_chain, u0 / jnp.linalg.norm(u0))
    full_ms = t / N_AP * 1e3
    print(f"full apply:       {full_ms:.3f} ms/apply "
          f"-> {n * 1e-9 / (t / N_AP):.3f} GDoF/s")
    stage_sum = sum(STAGE_MS)
    print(f"stage sum:        {stage_sum:.3f} ms/apply "
          f"({stage_sum / full_ms * 100:.0f}% of full)")
    if not 0.7 <= stage_sum / full_ms <= 1.3:
        print("WARNING: stage sum diverges >30% from the measured full "
              "apply — a stage timing is being hoisted or double-counted")


if __name__ == "__main__":
    main()

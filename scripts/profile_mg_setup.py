"""Phase-by-phase timing of Multigrid setup on the mapped ~900k-DoF f64
mesh (the bench_mg_mapped config) to find where the minutes go."""
import sys
import time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.mesh import sine_map
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator
from deal_and_ceed_on_gpu_tpu.solvers.multigrid import (
    Multigrid,
    _chebyshev_bounds,
    coarsen_mesh,
)
from deal_and_ceed_on_gpu_tpu.utils import enable_compilation_cache

enable_compilation_cache()
T = time.time

phi, jac = sine_map(0.05)
mesh = BrickMesh((32, 32, 32)).deform(phi, jac)
space = FESpace.create(mesh, 3, rule="gauss_lobatto", dtype=jnp.float64)
print(f"{space.n_dofs} DoFs f64 mapped", flush=True)

t0 = T()
fine_op = PoissonOperator(space, backend="structured")
print(f"fine op build: {T()-t0:.1f}s", flush=True)

# hierarchy spaces
t0 = T()
spaces = [space]
while all(m % 2 == 0 for m in spaces[-1].mesh.n_elements) and spaces[-1].n_dofs > 4000:
    spaces.append(FESpace(coarsen_mesh(spaces[-1].mesh), space.basis, space.dtype))
print(f"{len(spaces)} level spaces: {T()-t0:.1f}s "
      f"(sizes {[s.n_dofs for s in spaces]})", flush=True)

ops = [fine_op]
for s in spaces[1:]:
    t0 = T()
    ops.append(PoissonOperator(s, backend="structured"))
    print(f"  level op build ({s.n_dofs}): {T()-t0:.1f}s", flush=True)

dinv = []
for op, s in zip(ops[:-1], spaces[:-1]):
    t0 = T()
    dinv.append(op.jacobi_preconditioner())
    print(f"  jacobi diag ({s.n_dofs}): {T()-t0:.1f}s", flush=True)

for op, d, s in zip(ops[:-1], dinv, spaces[:-1]):
    t0 = T()
    b = _chebyshev_bounds(op.vmult, d, s, 20.0)
    print(f"  cheb bounds ({s.n_dofs}): {T()-t0:.1f}s -> {b}", flush=True)

t0 = T()
cs = spaces[-1]
eye = jnp.eye(cs.n_dofs, dtype=cs.dtype)
cols = jax.vmap(ops[-1].vmult)(eye)
A_c = np.asarray(cols, dtype=np.float64).T
inv = np.linalg.inv(A_c)
print(f"coarse inverse ({cs.n_dofs}): {T()-t0:.1f}s", flush=True)

# full Multigrid (should now be fast since pieces are warm in the compile
# cache — reports the residual overhead of __init__ itself)
t0 = T()
mg = Multigrid(space, fine_op=fine_op)
print(f"Multigrid.__init__ (warm): {T()-t0:.1f}s", flush=True)

# the V-cycle compile + 12-iteration solve
from deal_and_ceed_on_gpu_tpu import ReductionControl
from deal_and_ceed_on_gpu_tpu.models import assemble_rhs
from deal_and_ceed_on_gpu_tpu.solvers import solve_cg

b = jax.block_until_ready(assemble_rhs(space, 1.0))
control = ReductionControl(2000, tolerance=0.0, reduction=1e-10)
t0 = T()
x, info = solve_cg(fine_op.vmult, b, control, diag=mg.vcycle)
jax.block_until_ready(x)
print(f"MG-CG solve (incl compile): {T()-t0:.1f}s "
      f"({int(info['n_iterations'])} its)", flush=True)
t0 = T()
x, info = solve_cg(fine_op.vmult, b, control, diag=mg.vcycle)
jax.block_until_ready(x)
print(f"MG-CG solve (warm): {T()-t0:.1f}s", flush=True)
res = float(jnp.linalg.norm(b - fine_op.vmult(x)) / jnp.linalg.norm(b))
print(f"true rel res {res:.1e}", flush=True)

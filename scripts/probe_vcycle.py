"""Isolate mapped-mesh MG-CG cost: V-cycle compile vs per-application
device time vs the CG while_loop program around it."""
import sys
import time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace, ReductionControl
from deal_and_ceed_on_gpu_tpu.mesh import sine_map
from deal_and_ceed_on_gpu_tpu.models import PoissonOperator, assemble_rhs
from deal_and_ceed_on_gpu_tpu.solvers import Multigrid, solve_cg
from deal_and_ceed_on_gpu_tpu.utils import enable_compilation_cache

enable_compilation_cache()
T = time.time

phi, jac = sine_map(0.05)
mesh = BrickMesh((32, 32, 32)).deform(phi, jac)
space = FESpace.create(mesh, 3, rule="gauss_lobatto", dtype=jnp.float64)

t0 = T()
op = PoissonOperator(space, backend="structured")
b = jax.block_until_ready(assemble_rhs(space, 1.0))
print(f"op+rhs {T()-t0:.1f}s", flush=True)

t0 = T()
mg = Multigrid(space, fine_op=op)
print(f"MG setup {T()-t0:.1f}s", flush=True)

# plain fine vmult timing (reference point)
vm = jax.jit(op.vmult)
jax.block_until_ready(vm(b))
t0 = T()
for _ in range(10):
    x = vm(x if "x" in dir() else b)
jax.block_until_ready(x)
print(f"fine vmult warm: {(T()-t0)/10*1e3:.1f} ms", flush=True)

# V-cycle alone
vc = jax.jit(mg.vcycle)
t0 = T()
z = jax.block_until_ready(vc(b))
print(f"vcycle cold (compile+run): {T()-t0:.1f}s", flush=True)
t0 = T()
for _ in range(5):
    z = vc(b)
jax.block_until_ready(z)
print(f"vcycle warm: {(T()-t0)/5*1e3:.1f} ms", flush=True)

# CG with MG preconditioner
control = ReductionControl(2000, tolerance=0.0, reduction=1e-10)
t0 = T()
x, info = solve_cg(op.vmult, b, control, diag=mg.vcycle)
jax.block_until_ready(x)
print(f"MG-CG solve #1: {T()-t0:.1f}s ({int(info['n_iterations'])} its)", flush=True)
t0 = T()
x, info = solve_cg(op.vmult, b, control, diag=mg.vcycle)
jax.block_until_ready(x)
print(f"MG-CG solve #2 (same process): {T()-t0:.1f}s", flush=True)

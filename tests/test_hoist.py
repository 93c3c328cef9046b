"""utils.jit_hoisted: captured constants become jit arguments."""

import jax
import jax.numpy as jnp
import numpy as np

from deal_and_ceed_on_gpu_tpu.utils import jit_hoisted


def test_jit_hoisted_matches_plain_jit():
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 64, 64), jnp.int32)
    w = jnp.asarray(np.random.default_rng(1).standard_normal(64), jnp.float32)

    def f(x):
        return (x * w)[idx], jnp.sum(x * w)

    x = jnp.asarray(np.random.default_rng(2).standard_normal(64), jnp.float32)
    a1, b1 = jax.jit(f)(x)
    g = jit_hoisted(f, x)
    a2, b2 = g(x)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(float(b1), float(b2))
    # every captured array (incl. the INT index table closure_convert
    # would leave behind) is an argument of the underlying jaxpr
    closed = jax.make_jaxpr(f)(x)
    assert len(closed.consts) == 2


def test_jit_hoisted_solver_closure():
    """A solve with while_loop + operator closure (the adaptive-MG
    shape of the problem) round-trips through jit_hoisted."""
    from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace, SolverControl
    from deal_and_ceed_on_gpu_tpu.models import PoissonOperator, assemble_rhs
    from deal_and_ceed_on_gpu_tpu.solvers import solve_cg

    mesh = BrickMesh((3, 3, 3))
    space = FESpace.create(mesh, 2, rule="gauss_lobatto", dtype=jnp.float64)
    op = PoissonOperator(space, backend="separable")
    b = assemble_rhs(space, 1.0)
    control = SolverControl(50, 1e-8 * float(jnp.linalg.norm(b)))
    x1, info1 = jax.jit(lambda bb: solve_cg(op.vmult, bb, control))(b)
    f = jit_hoisted(lambda bb: solve_cg(op.vmult, bb, control), b)
    x2, info2 = f(b)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-12)
    assert int(info1["n_iterations"]) == int(info2["n_iterations"])

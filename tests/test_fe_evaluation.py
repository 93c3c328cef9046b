"""FEEvaluation facade: a hand-written cell kernel must reproduce the
built-in operators (the way LocalPoissonOperator / LocalHelmholtzOperator
are written against the reference's FEEvaluation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace
from deal_and_ceed_on_gpu_tpu.fe_evaluation import FEEvaluation
from deal_and_ceed_on_gpu_tpu.models import MassOperator, PoissonOperator


@pytest.mark.parametrize("backend", ["structured", "gather"])
@pytest.mark.parametrize("rule", ["gauss_lobatto", "gauss"])
def test_hand_written_poisson_kernel(backend, rule):
    mesh = BrickMesh((2, 3, 2), upper=(1.0, 1.2, 0.7))
    space = FESpace.create(mesh, 3, rule=rule, dtype=jnp.float64)
    fe = FEEvaluation(space, backend)
    u = jnp.asarray(np.random.default_rng(0).standard_normal(space.n_dofs))

    def my_vmult(src):
        src_i = space.zero_constrained_values(src)
        ul = fe.read_dof_values(src_i)
        _, grads = fe.evaluate(ul, values=False, gradients=True)
        grads = fe.submit_gradient(grads)
        dst = fe.distribute_local_to_global(fe.integrate(None, grads))
        return space.copy_constrained_values(src, dst)

    want = PoissonOperator(space, backend=backend).vmult(u)
    np.testing.assert_allclose(np.asarray(my_vmult(u)), np.asarray(want), rtol=1e-12)


def test_hand_written_mass_kernel_graded():
    mesh = BrickMesh.graded(
        np.array([0.0, 0.1, 0.4, 1.0]), np.linspace(0, 1, 4), np.linspace(0, 1, 3)
    )
    space = FESpace.create(mesh, 2, rule="gauss", n_q=4, dtype=jnp.float64)
    fe = FEEvaluation(space)
    u = jnp.asarray(np.random.default_rng(1).standard_normal(space.n_dofs))

    def my_vmult(src):
        src_i = space.zero_constrained_values(src)
        vals, _ = fe.evaluate(fe.read_dof_values(src_i), values=True)
        dst = fe.distribute_local_to_global(fe.integrate(fe.submit_value(vals)))
        return space.copy_constrained_values(src, dst)

    want = MassOperator(space).vmult(u)
    np.testing.assert_allclose(np.asarray(my_vmult(u)), np.asarray(want), rtol=1e-12)

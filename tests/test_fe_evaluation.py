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


def test_get_gradient_physical():
    """get_gradient returns physical-space gradients (J^{-T} transform,
    bp5/fe_evaluation_gl.h:328-344): a field linear in PHYSICAL x must
    have the constant analytic gradient at every qpoint, on uniform
    anisotropic bricks (diagonal fast path) and on isoparametrically
    mapped meshes (full J^{-T})."""
    from deal_and_ceed_on_gpu_tpu.mesh import sine_map

    phi, jac = sine_map(0.04)
    meshes = [
        BrickMesh((3, 2, 2), upper=(1.0, 1.3, 0.8)),
        BrickMesh((3, 3, 3)).deform(phi, jac),
    ]
    a = np.array([0.7, -1.3, 2.1])
    for mesh in meshes:
        space = FESpace.create(mesh, 3, rule="gauss", dtype=jnp.float64)
        fe = FEEvaluation(space)
        u = jnp.asarray(space.node_coords() @ a)
        _, grads = fe.evaluate(fe.read_dof_values(u), gradients=True)
        phys = fe.get_gradient(grads)
        for comp, want in zip(phys, a):
            np.testing.assert_allclose(
                np.asarray(comp), want, rtol=1e-9, atol=1e-9
            )


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

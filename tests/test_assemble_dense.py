"""Host-side dense assembly (models/operator_base.assemble_dense).

assemble_dense replaces the vmapped vmult-over-identity-columns
materialization for multigrid coarse solves (solvers/multigrid.py,
parallel/dist_multigrid.py). Acceptance: the host matrix equals the
device operator's action column for column — same constrained semantics
(zeroed constrained src columns, cell loop, Dirichlet identity rows),
same fold_scale behavior — for every operator that declares a
weak_form(), on uniform and mapped meshes, GLL and Gauss rules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu import BrickMesh, FESpace, sine_map
from deal_and_ceed_on_gpu_tpu.models import (
    HelmholtzOperator,
    MassOperator,
    PoissonOperator,
)
from deal_and_ceed_on_gpu_tpu.models.operator_base import assemble_dense
from deal_and_ceed_on_gpu_tpu.solvers.multigrid import bounds_from_dense


def _vmult_matrix(op, n):
    """A^T rows are A e_i (A is symmetric, but keep the transpose so the
    test would catch a symmetry bug too)."""
    eye = jnp.eye(n, dtype=op.space.dtype)
    return np.asarray(jax.vmap(op.vmult)(eye), dtype=np.float64).T


def _check(op):
    A_host = assemble_dense(op)
    A_dev = _vmult_matrix(op, op.space.n_dofs)
    np.testing.assert_allclose(A_host, A_dev, rtol=1e-10, atol=1e-12)


def test_poisson_uniform_gll():
    mesh = BrickMesh((3, 3, 3))
    space = FESpace.create(mesh, 2, rule="gauss_lobatto", dtype=jnp.float64)
    _check(PoissonOperator(space, backend="separable"))


def test_poisson_mapped_gauss():
    phi, jac = sine_map(0.05)
    mesh = BrickMesh((3, 3, 3)).deform(phi, jac)
    space = FESpace.create(mesh, 2, rule="gauss", dtype=jnp.float64)
    _check(PoissonOperator(space, backend="structured"))


def test_helmholtz_value_coefficient():
    mesh = BrickMesh((3, 3, 3))
    space = FESpace.create(mesh, 3, rule="gauss", dtype=jnp.float64)
    _check(HelmholtzOperator(space, backend="structured"))


def test_mass_graded():
    bx = np.array([0.0, 0.15, 0.45, 1.0])
    mesh = BrickMesh.graded(bx, np.linspace(0, 1, 4), np.linspace(0, 1, 4))
    space = FESpace.create(mesh, 2, rule="gauss", dtype=jnp.float64)
    _check(MassOperator(space, backend="structured"))


def test_fold_scale_consistent():
    """fold_scale rescales unconstrained rows of the operator; the host
    assembly must mirror that (identity rows stay identity)."""
    mesh = BrickMesh((3, 3, 3))
    space = FESpace.create(mesh, 2, rule="gauss_lobatto", dtype=jnp.float64)
    op = PoissonOperator(space, backend="separable")
    op.fold_scale(0.37)
    _check(op)


def test_max_dofs_guard():
    mesh = BrickMesh((8, 8, 8))
    space = FESpace.create(mesh, 3, dtype=jnp.float64)
    op = PoissonOperator(space, backend="separable")
    with pytest.raises(ValueError, match="max_dofs"):
        assemble_dense(op, max_dofs=1000)


def test_bounds_from_dense_covers_spectrum():
    """lam_max must upper-bound the true top eigenvalue of D^-1 A on the
    unconstrained subspace (an underestimate would make Chebyshev amplify
    high modes); lam_min = lam_max / smoothing_range."""
    mesh = BrickMesh((3, 3, 3))
    space = FESpace.create(mesh, 2, rule="gauss_lobatto", dtype=jnp.float64)
    A = assemble_dense(PoissonOperator(space, backend="separable"))
    lo, hi = bounds_from_dense(A, smoothing_range=20.0)
    d = np.diag(A)
    lam_true = np.max(np.linalg.eigvalsh(A / np.sqrt(np.outer(d, d))))
    assert hi >= lam_true, (hi, lam_true)
    assert hi <= 1.6 * lam_true, (hi, lam_true)
    np.testing.assert_allclose(lo, hi / 20.0)

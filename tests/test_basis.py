import numpy as np
import pytest

from deal_and_ceed_on_gpu_tpu.basis import (
    Basis1D,
    gauss_lobatto_points,
    gauss_points,
    lagrange_eval,
)


@pytest.mark.parametrize("n", [2, 3, 5, 9])
def test_gauss_weights_sum_to_one(n):
    for fn in (gauss_points, gauss_lobatto_points):
        x, w = fn(n)
        assert np.all((0 <= x) & (x <= 1))
        assert abs(w.sum() - 1.0) < 1e-14


@pytest.mark.parametrize("n", [3, 5, 8])
def test_gauss_exactness(n):
    # Gauss: exact for degree 2n-1; GLL: exact for degree 2n-3
    x, w = gauss_points(n)
    for k in range(2 * n):
        assert abs(np.sum(w * x**k) - 1.0 / (k + 1)) < 1e-13, k
    x, w = gauss_lobatto_points(n)
    for k in range(2 * n - 2):
        assert abs(np.sum(w * x**k) - 1.0 / (k + 1)) < 1e-13, k


@pytest.mark.parametrize("p", list(range(1, 9)))
def test_lagrange_partition_of_unity(p):
    b = Basis1D.make(p, rule="gauss")
    assert np.allclose(b.S.sum(axis=1), 1.0, atol=1e-12)
    assert np.allclose(b.D.sum(axis=1), 0.0, atol=1e-10)


@pytest.mark.parametrize("p", list(range(1, 9)))
def test_collocation_identity(p):
    b = Basis1D.make(p, rule="gauss_lobatto")
    assert b.collocation
    assert np.array_equal(b.S, np.eye(p + 1))


@pytest.mark.parametrize("p", [2, 4, 6])
def test_derivative_exact_for_polynomials(p):
    b = Basis1D.make(p, n_q=p + 2, rule="gauss")
    # interpolate x^k (k <= p) at nodes; D must reproduce k x^(k-1) at qpoints
    for k in range(p + 1):
        coeffs = b.nodes**k
        deriv = b.D @ coeffs
        exact = k * b.q_points ** max(k - 1, 0) if k > 0 else np.zeros_like(deriv)
        assert np.allclose(deriv, exact, atol=1e-10)

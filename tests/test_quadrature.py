"""Spectral primitive correctness: GLL rules, Lagrange/edge/Legendre bases."""

import numpy as np
import pytest
from scipy.integrate import quad

from mfv2d_tpu.ops.quadrature import (
    compute_gll,
    compute_legendre,
    dlagrange1d,
    edge_basis_values,
    gauss_lobatto_nodes_weights,
    lagrange1d,
)


@pytest.mark.parametrize("n", [2, 3, 4, 5, 8, 12, 16])
def test_gll_weights_sum(n):
    nodes, weights = gauss_lobatto_nodes_weights(n)
    assert nodes[0] == -1.0 and nodes[-1] == 1.0
    assert np.all(np.diff(nodes) > 0)
    assert np.allclose(np.sum(weights), 2.0, rtol=1e-14)
    # Symmetry
    assert np.allclose(nodes, -nodes[::-1], atol=1e-14)
    assert np.allclose(weights, weights[::-1], atol=1e-14)


@pytest.mark.parametrize("n", [3, 5, 9])
def test_gll_polynomial_exactness(n):
    """GLL with n points integrates polynomials up to degree 2n - 3 exactly."""
    nodes, weights = gauss_lobatto_nodes_weights(n)
    rng = np.random.default_rng(1234)
    for deg in range(2 * n - 2):
        coeffs = rng.uniform(-1, 1, deg + 1)
        p = np.polynomial.Polynomial(coeffs)
        exact = p.integ()(1.0) - p.integ()(-1.0)
        approx = np.sum(weights * p(nodes))
        assert np.isclose(approx, exact, rtol=1e-13, atol=1e-13), deg


def test_gll_against_scipy():
    nodes, weights = compute_gll(12)

    def f(x):
        return np.cos(3 * x) * np.exp(x / 2)

    exact = quad(f, -1, 1)[0]
    assert np.isclose(np.sum(weights * f(nodes)), exact, rtol=1e-6)


@pytest.mark.parametrize("order", [1, 2, 4, 7])
def test_lagrange_cardinal(order):
    roots = compute_gll(order)[0]
    vals = lagrange1d(roots, roots)
    assert np.allclose(vals, np.eye(order + 1), atol=1e-13)


def test_lagrange_partition_of_unity():
    roots = compute_gll(5)[0]
    x = np.linspace(-1, 1, 51)
    vals = lagrange1d(roots, x)
    assert np.allclose(np.sum(vals, axis=-1), 1.0, atol=1e-12)
    dvals = dlagrange1d(roots, x)
    assert np.allclose(np.sum(dvals, axis=-1), 0.0, atol=1e-11)


def test_dlagrange_matches_fd():
    roots = compute_gll(4)[0]
    x = np.linspace(-0.9, 0.9, 11)
    h = 1e-6
    fd = (lagrange1d(roots, x + h) - lagrange1d(roots, x - h)) / (2 * h)
    assert np.allclose(dlagrange1d(roots, x), fd, atol=1e-8)


@pytest.mark.parametrize("order", [1, 3, 5])
def test_edge_basis_integral(order):
    """Integral of edge basis j over [roots[j], roots[j+1]] is exactly 1."""
    roots = compute_gll(order)[0]
    rule_nodes, rule_weights = compute_gll(order + 4)
    for j in range(order):
        a, b = roots[j], roots[j + 1]
        x = (a + b) / 2 + (b - a) / 2 * rule_nodes
        vals = edge_basis_values(roots, x)[..., j]
        integral = np.sum(vals * rule_weights) * (b - a) / 2
        assert np.isclose(integral, 1.0, atol=1e-12)
    # Edge basis integrates to 0 over other intervals' complements: total
    # integral over [-1, 1] of e_j is 1 (only one interval contributes).
    x_full = compute_gll(order + 6)
    for j in range(order):
        vals = edge_basis_values(roots, x_full[0])[..., j]
        assert np.isclose(np.sum(vals * x_full[1]), 1.0, atol=1e-12)


def test_edge_basis_is_derivative_sum():
    """Edge basis = -cumsum of nodal derivatives (histopolation identity)."""
    roots = compute_gll(3)[0]
    x = np.linspace(-1, 1, 9)
    dl = dlagrange1d(roots, x)
    ev = edge_basis_values(roots, x)
    # Sum of all dL is 0 so e_j = sum_{k > j} dL_k as well.
    for j in range(3):
        expected = np.sum(dl[..., j + 1 :], axis=-1)
        assert np.allclose(ev[..., j], expected, atol=1e-12)


def test_legendre_values():
    x = np.linspace(-1, 1, 21)
    vals = compute_legendre(4, x)
    assert vals.shape == (5, 21)
    assert np.allclose(vals[0], 1.0)
    assert np.allclose(vals[1], x)
    assert np.allclose(vals[2], (3 * x**2 - 1) / 2, atol=1e-14)
    assert np.allclose(vals[3], (5 * x**3 - 3 * x) / 2, atol=1e-14)
    # Orthogonality under GLL quadrature (exact for deg <= 2n-3)
    nodes, weights = compute_gll(10)
    v = compute_legendre(4, nodes)
    gram = np.einsum("ip,jp,p->ij", v, v, weights)
    expected = np.diag(2 / (2 * np.arange(5) + 1))
    assert np.allclose(gram, expected, atol=1e-12)

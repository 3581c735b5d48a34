"""Incidence operator tests: exact-sequence identities and interpolation."""

import numpy as np
import pytest

from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.ops.incidence import (
    form_dof_counts,
    incidence_10,
    incidence_21,
)
from mfv2d_tpu.ops.quadrature import compute_gll


@pytest.mark.parametrize("p1,p2", [(1, 1), (2, 2), (3, 5), (4, 2)])
def test_shapes(p1, p2):
    n0, n1, n2 = form_dof_counts(p1, p2)
    assert incidence_10(p1, p2).shape == (n1, n0)
    assert incidence_21(p1, p2).shape == (n2, n1)


@pytest.mark.parametrize("p1,p2", [(1, 1), (2, 3), (5, 4)])
def test_exact_sequence(p1, p2):
    """d(d(u)) = 0: E21 @ E10 must vanish identically."""
    assert np.all(incidence_21(p1, p2) @ incidence_10(p1, p2) == 0)


@pytest.mark.parametrize("p", [1, 2, 4, 6])
def test_gradient_exactness(p):
    """E10 applied to nodal samples of f gives exact edge integrals of -df.

    With the sign convention of the reference (mimetic2d.py:60-71) the
    eta-component rows are u_i - u_{i+1} = -(u_{i+1} - u_i).
    """
    nodes = compute_gll(p)[0]

    def f(x, y):
        return x**2 + 3 * x * y - y**2

    xx, yy = np.meshgrid(nodes, nodes)
    u = f(xx, yy).ravel()  # index i2 * (p+1) + i1
    du = incidence_10(p, p) @ u

    n_h = p * (p + 1)
    # eta-component rows: f(x_i1, y_i2) - f(x_{i1+1}, y_i2)
    for i2 in range(p + 1):
        for i1 in range(p):
            expected = f(nodes[i1], nodes[i2]) - f(nodes[i1 + 1], nodes[i2])
            assert np.isclose(du[i2 * p + i1], expected, atol=1e-13)
    # xi-component rows: f(x_i1, y_{i2+1}) - f(x_i1, y_i2)
    for i2 in range(p):
        for i1 in range(p + 1):
            expected = f(nodes[i1], nodes[i2 + 1]) - f(nodes[i1], nodes[i2])
            assert np.isclose(du[n_h + i2 * (p + 1) + i1], expected, atol=1e-13)


def test_curl_of_gradient_samples():
    """E21 of a gradient field vanishes (discrete Stokes identity)."""
    p = 4
    rng = np.random.default_rng(7)
    u = rng.normal(size=(p + 1) ** 2)
    assert np.allclose(incidence_21(p, p) @ (incidence_10(p, p) @ u), 0.0)


def test_derivative_commutes_with_1d_structure():
    """E10 rows each have exactly one +1 and one -1 (boundary operator)."""
    e = incidence_10(3, 5)
    assert np.all(np.sum(e == 1, axis=1) == 1)
    assert np.all(np.sum(e == -1, axis=1) == 1)
    e2 = incidence_21(3, 5)
    assert np.all(np.sum(e2 == 1, axis=1) == 2)
    assert np.all(np.sum(e2 == -1, axis=1) == 2)


def test_derivative_reconstruction_consistency():
    """Reconstructing d(u) from E10 @ u matches the analytic gradient.

    This validates the full chain: DoF layout, incidence signs, edge basis
    and the Piola reconstruction map on an affine element.
    """
    from mfv2d_tpu.projection import reconstruct

    p = 5
    cache = FemCache(2)
    basis = cache.get_basis2d(p, p)
    corners = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
    nodes = compute_gll(p)[0]

    def f(x, y):
        return np.sin(x) * np.cos(y)

    xx, yy = np.meshgrid(nodes, nodes)
    u = f(xx, yy).ravel()
    du = incidence_10(p, p) @ u

    xi = np.linspace(-0.9, 0.9, 5)[None, :]
    eta = np.linspace(-0.8, 0.8, 4)[:, None]
    recon = reconstruct(corners, basis, 2, du, xi, eta)  # 1-form
    # In the flux convention (1-form f_x dy - f_y dx, mimetic2d.py:1036-1043)
    # d(f) reconstructs as the rotated gradient (+df/dy, -df/dx).
    dfdx = np.cos(xi + 0 * eta) * np.cos(0 * xi + eta)
    dfdy = -np.sin(xi + 0 * eta) * np.sin(0 * xi + eta)
    assert np.allclose(recon[..., 0], dfdy, atol=1e-3)
    assert np.allclose(recon[..., 1], -dfdx, atol=1e-3)

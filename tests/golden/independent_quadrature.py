"""Independent GLL basis + mass-matrix construction for golden fixtures.

Everything here is built from numpy.polynomial primitives and dense
Gauss-LEGENDRE quadrature (``leggauss``), sharing NO code with
mfv2d_tpu's GLL/Newton-on-Legendre, barycentric Lagrange, or batched
mass kernels — so fixtures that use these masses pin the package against
an independent derivation (the reference's own tests do the same with
sympy/scipy integrals, reference tests/test_gll.py).

Self-checks (exactness of quadrature on polynomials, the histopolation
defining property, projection consistency) run at import so a silent
convention drift cannot produce plausible-but-wrong fixtures.
"""

from __future__ import annotations

import numpy as np
from numpy.polynomial import Polynomial
from numpy.polynomial import legendre as npleg


def gll_nodes(p: int) -> np.ndarray:
    """Gauss-Lobatto-Legendre nodes: roots of (1-x^2) P_p'(x)."""
    coeffs = np.zeros(p + 1)
    coeffs[p] = 1.0
    inner = npleg.legroots(npleg.legder(coeffs))
    return np.concatenate(([-1.0], np.sort(np.real(inner)), [1.0]))


def lagrange_polynomials(nodes: np.ndarray) -> list[Polynomial]:
    """Exact Lagrange cardinal polynomials through ``nodes``."""
    polys = []
    for i, xi in enumerate(nodes):
        poly = Polynomial([1.0])
        for j, xj in enumerate(nodes):
            if j != i:
                poly = poly * Polynomial([-xj, 1.0]) / (xi - xj)
        polys.append(poly)
    return polys


def edge_polynomials(nodes: np.ndarray) -> list[Polynomial]:
    """Histopolation ("edge") polynomials: e_j = -sum_{k<=j} psi_k'.

    Defining property (checked below): the integral of e_j over
    [x_i, x_{i+1}] is the Kronecker delta_ij.
    """
    lag = lagrange_polynomials(nodes)
    out = []
    acc = Polynomial([0.0])
    for j in range(len(nodes) - 1):
        acc = acc + lag[j].deriv()
        out.append(-acc)
    return out


_GAUSS_N = 48
_GX, _GW = npleg.leggauss(_GAUSS_N)


def gll_rule(order: int):
    """GLL rule of the given order (order+1 points), derived independently.

    Nodes are the GLL points; weights w_i = 2 / (n (n-1) P_{n-1}(x_i)^2)
    with n = order + 1 points (classical Lobatto formula, evaluated with
    numpy.polynomial Legendre values — no mfv2d_tpu code involved).
    """
    n = order + 1
    nodes = gll_nodes(order)
    coeffs = np.zeros(n)
    coeffs[n - 1] = 1.0
    pvals = npleg.legval(nodes, coeffs)
    weights = 2.0 / (n * (n - 1) * pvals**2)
    return nodes, weights


def _quad2d(int_orders=None):
    """Tensor quadrature on [-1,1]^2: (xi, eta, w) flattened.

    With ``int_orders=(o1, o2)`` uses the SAME GLL rule the production
    assembly uses (the discretization choice being pinned — a finer rule
    integrates the 1/det rational integrands of M1/M2 on bilinear elements
    to a DIFFERENT, "more exact" value); without it, the dense 48-point
    Gauss-Legendre rule.
    """
    if int_orders is None:
        gx1 = gx2 = _GX
        gw1 = gw2 = _GW
    else:
        gx1, gw1 = gll_rule(int_orders[0])
        gx2, gw2 = gll_rule(int_orders[1])
    xi = np.repeat(gx1, gx2.size)
    eta = np.tile(gx2, gx1.size)
    w = np.repeat(gw1, gw2.size) * np.tile(gw2, gx1.size)
    return xi, eta, w


def bilinear_jacobian(corners: np.ndarray, xi: np.ndarray, eta: np.ndarray):
    """Jacobian entries in the REFERENCE's layout (mimetic2d.jacobian):

    ``(j00, j01, j10, j11) = (dx/dxi, dy/dxi, dx/deta, dy/deta)`` — note
    the row-major pairing is (d{x,y}/dxi, then d{x,y}/deta), NOT the
    textbook [[dx/dxi, dx/deta], ...] ordering.
    """
    (x0, y0), (x1, y1), (x2, y2), (x3, y3) = corners
    dx_dxi = ((x1 - x0) * (1 - eta) + (x2 - x3) * (1 + eta)) / 4
    dx_deta = ((x3 - x0) * (1 - xi) + (x2 - x1) * (1 + xi)) / 4
    dy_dxi = ((y1 - y0) * (1 - eta) + (y2 - y3) * (1 + eta)) / 4
    dy_deta = ((y3 - y0) * (1 - xi) + (y2 - y1) * (1 + xi)) / 4
    return dx_dxi, dy_dxi, dx_deta, dy_deta


def _eval_many(polys, x):
    return np.stack([p(x) for p in polys])  # [n_basis, n_pts]


def basis_0(p1: int, p2: int, xi, eta):
    """0-form tensor basis values [n0, npts]; index = i_eta*(p1+1)+i_xi."""
    lx = _eval_many(lagrange_polynomials(gll_nodes(p1)), xi)
    ly = _eval_many(lagrange_polynomials(gll_nodes(p2)), eta)
    return (ly[:, None, :] * lx[None, :, :]).reshape(-1, xi.size)


def basis_2(p1: int, p2: int, xi, eta):
    """2-form tensor basis values [p1*p2, npts]; index = i_eta*p1 + i_xi."""
    ex = _eval_many(edge_polynomials(gll_nodes(p1)), xi)
    ey = _eval_many(edge_polynomials(gll_nodes(p2)), eta)
    return (ey[:, None, :] * ex[None, :, :]).reshape(-1, xi.size)


def basis_1(p1: int, p2: int, xi, eta):
    """1-form basis reference components, matching the reference layout
    (reference mimetic2d.py reconstruct, FORM_ORDER_1 branch).

    Returns ``[n1, npts, 2]`` pairs ``(out_xi, out_eta)``:

    - first block, ``(p2+1)*p1`` functions indexed ``i_eta*p1 + j_xi``:
      ``e_xi(j) psi_eta(i)`` carrying the *eta* reference component;
    - second block, ``p2*(p1+1)`` functions indexed ``i_eta*(p1+1)+j_xi``:
      ``psi_xi(j) e_eta(i)`` carrying the *xi* component.

    The physical (flux/Piola) field is
    ``(out_xi j00 + out_eta j10, out_xi j01 + out_eta j11) / det``.
    """
    lx = _eval_many(lagrange_polynomials(gll_nodes(p1)), xi)
    ly = _eval_many(lagrange_polynomials(gll_nodes(p2)), eta)
    ex = _eval_many(edge_polynomials(gll_nodes(p1)), xi)
    ey = _eval_many(edge_polynomials(gll_nodes(p2)), eta)
    n_a = (p2 + 1) * p1
    n_b = p2 * (p1 + 1)
    out = np.zeros((n_a + n_b, xi.size, 2))
    blk = (ly[:, None, :] * ex[None, :, :]).reshape(n_a, xi.size)
    out[:n_a, :, 1] = blk  # eta component
    blk = (ey[:, None, :] * lx[None, :, :]).reshape(n_b, xi.size)
    out[n_a:, :, 0] = blk  # xi component
    return out


def mass_matrices(p1: int, p2: int, corners: np.ndarray, int_orders=None):
    """(M0, M1, M2) by independent quadrature.

    ``int_orders=(o1, o2)`` reproduces the production GLL rule (the value
    the package and the reference actually compute); the default dense
    rule gives the near-exact integrals (used by the self-checks).
    """
    xi, eta, w = _quad2d(int_orders)
    j00, j01, j10, j11 = bilinear_jacobian(corners, xi, eta)
    det = j00 * j11 - j01 * j10

    b0 = basis_0(p1, p2, xi, eta)
    m0 = np.einsum("ip,jp,p->ij", b0, b0, w * det)

    b2 = basis_2(p1, p2, xi, eta)
    m2 = np.einsum("ip,jp,p->ij", b2, b2, w / det)

    b1 = basis_1(p1, p2, xi, eta)
    # Physical field per the reference's Piola combination
    # ((out_xi j00 + out_eta j10), (out_xi j01 + out_eta j11)) / det;
    # the physical L2 product integrates F_i . F_j det dxi deta, i.e.
    # (G_i . G_j) / det with G the undivided combination.
    jf = np.empty_like(b1)
    jf[..., 0] = j00 * b1[..., 0] + j10 * b1[..., 1]
    jf[..., 1] = j01 * b1[..., 0] + j11 * b1[..., 1]
    m1 = np.einsum("ipc,jpc,p->ij", jf, jf, w / det)
    return m0, m1, m2


def _self_check() -> None:
    rng = np.random.default_rng(11)
    # Quadrature exactness on a degree-20 polynomial.
    c = rng.normal(size=21)
    exact = np.polynomial.polynomial.Polynomial(c).integ()(1.0) - \
        np.polynomial.polynomial.Polynomial(c).integ()(-1.0)
    approx = float(np.sum(_GW * np.polynomial.polynomial.polyval(_GX, c)))
    assert abs(exact - approx) < 1e-12 * max(1.0, abs(exact))

    # Lagrange cardinality and the histopolation defining property.
    for p in (3, 4):
        nodes = gll_nodes(p)
        lag = lagrange_polynomials(nodes)
        vals = np.stack([f(nodes) for f in lag])
        assert np.allclose(vals, np.eye(p + 1), atol=1e-12)
        edges = edge_polynomials(nodes)
        for j, e in enumerate(edges):
            prim = e.integ()
            for i in range(p):
                seg = prim(nodes[i + 1]) - prim(nodes[i])
                assert abs(seg - (1.0 if i == j else 0.0)) < 1e-11, (i, j, seg)

    # GLL nodes agree with the classical p=3 values, and the GLL rule
    # integrates degree <= 2n-3 polynomials exactly.
    assert np.allclose(gll_nodes(3), [-1.0, -np.sqrt(1 / 5), np.sqrt(1 / 5), 1.0])
    for order in (3, 5):
        nodes, weights = gll_rule(order)
        n = order + 1
        for deg in range(2 * n - 2):
            exact = (1.0 - (-1.0) ** (deg + 1)) / (deg + 1)
            got = float(np.sum(weights * nodes**deg))
            assert abs(got - exact) < 1e-12, (order, deg, got, exact)

    # Mass matrices are SPD on a skewed quad.
    corners = np.array([(-1.0, -2.0), (2.0, 0.0), (1.75, 0.75), (1.0, 1.0)])
    for m in mass_matrices(3, 4, corners):
        assert np.allclose(m, m.T, atol=1e-12)
        assert np.linalg.eigvalsh(m).min() > 0


_self_check()

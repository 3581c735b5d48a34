"""Batched mass matrices vs a slow independent quadrature implementation."""

import numpy as np
import pytest

from mfv2d_tpu.evaluation import ElementBatch
from mfv2d_tpu.kform import UnknownFormOrder
from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.ops.geometry import jacobian
from mfv2d_tpu.ops.mass import (
    batch_jacobian,
    mass_edge,
    mass_node,
    mass_node_edge,
    mass_edge_surf,
    mass_surf,
    tensor_basis,
)

DEFORMED = np.array([(-1.1, -0.9), (0.8, -1.2), (1.3, 1.1), (-0.7, 0.8)])
SQUARE = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])


def _slow_mass_node(basis, corners):
    """Direct quadrature triple loop (independent of the batched path)."""
    bx, be = basis.basis_xi, basis.basis_eta
    jac = jacobian(corners, bx.rule.nodes[None, :], be.rule.nodes[:, None])
    det = np.asarray(jac.det)
    w = be.rule.weights[:, None] * bx.rule.weights[None, :]
    n0 = (bx.order + 1) * (be.order + 1)
    out = np.zeros((n0, n0))
    for a in range(n0):
        ia2, ia1 = divmod(a, bx.order + 1)
        pa = be.node[ia2][:, None] * bx.node[ia1][None, :]
        for b in range(n0):
            ib2, ib1 = divmod(b, bx.order + 1)
            pb = be.node[ib2][:, None] * bx.node[ib1][None, :]
            out[a, b] = np.sum(pa * pb * det * w)
    return out


@pytest.mark.parametrize("corners", [SQUARE, DEFORMED])
@pytest.mark.parametrize("orders", [(1, 1), (3, 3), (2, 4)])
def test_mass_node_matches_slow(corners, orders):
    cache = FemCache(2)
    basis = cache.get_basis2d(*orders)
    tb = tensor_basis(basis)
    jac = batch_jacobian(tb, corners[None])
    m = np.asarray(mass_node(tb, jac))[0]
    expected = _slow_mass_node(basis, corners)
    assert np.allclose(m, expected, atol=1e-13)
    # symmetric positive definite
    assert np.allclose(m, m.T, atol=1e-14)
    assert np.all(np.linalg.eigvalsh(m) > 0)


@pytest.mark.parametrize("corners", [SQUARE, DEFORMED])
def test_mass_edge_surf_spd(corners):
    cache = FemCache(2)
    basis = cache.get_basis2d(3, 3)
    tb = tensor_basis(basis)
    jac = batch_jacobian(tb, corners[None])
    m1 = np.asarray(mass_edge(tb, jac))[0]
    m2 = np.asarray(mass_surf(tb, jac))[0]
    assert np.allclose(m1, m1.T, atol=1e-13)
    assert np.allclose(m2, m2.T, atol=1e-13)
    assert np.all(np.linalg.eigvalsh(m1) > 0)
    assert np.all(np.linalg.eigvalsh(m2) > 0)


def test_mass_on_square_is_tensor_product():
    """On the reference square det = 1 and M0 = M1d (x) M1d."""
    cache = FemCache(3)
    basis = cache.get_basis2d(3, 3)
    tb = tensor_basis(basis)
    jac = batch_jacobian(tb, SQUARE[None])
    m0 = np.asarray(mass_node(tb, jac))[0]
    b = basis.basis_xi
    m1d = np.einsum("ip,jp,p->ij", b.node, b.node, b.rule.weights)
    assert np.allclose(m0, np.kron(m1d, m1d), atol=1e-13)


def test_mass_scaling_with_element_size():
    """Scaling the element by h scales M0 by h^2 and M2 by h^-2."""
    cache = FemCache(2)
    basis = cache.get_basis2d(2, 2)
    tb = tensor_basis(basis)
    h = 0.5
    jac1 = batch_jacobian(tb, SQUARE[None])
    jac2 = batch_jacobian(tb, (h * SQUARE)[None])
    m0_1 = np.asarray(mass_node(tb, jac1))[0]
    m0_2 = np.asarray(mass_node(tb, jac2))[0]
    assert np.allclose(m0_2, h * h * m0_1, atol=1e-13)
    m2_1 = np.asarray(mass_surf(tb, jac1))[0]
    m2_2 = np.asarray(mass_surf(tb, jac2))[0]
    assert np.allclose(m2_2, m2_1 / (h * h), atol=1e-12)


def test_mass_1form_l2_norm():
    """u^T M1 u equals the L2 norm^2 of the reconstructed vector field."""
    from mfv2d_tpu.projection import element_dual_dofs, element_primal_dofs

    cache = FemCache(4)
    basis = cache.get_basis2d(5, 5)
    batch = ElementBatch(basis, DEFORMED[None])

    def f(x, y):
        return np.stack([x + 0.5 * y, y - x * 0.2], axis=-1)

    primal = np.asarray(
        element_primal_dofs(UnknownFormOrder.FORM_ORDER_1, batch, f)
    )[0]
    m1 = np.asarray(batch.mass(UnknownFormOrder.FORM_ORDER_1, False))[0]
    norm2 = primal @ m1 @ primal

    # Direct: integrate |f|^2 over the element with high-order quadrature.
    tb = batch.tb
    x, y = (np.asarray(v)[0] for v in batch.quad_points())
    vals = f(x, y)
    det = np.asarray(batch.jac.det)[0]
    direct = np.sum((vals**2).sum(-1) * det * tb.w)
    assert np.isclose(norm2, direct, rtol=1e-12)


def test_interior_product_against_quadrature():
    """node_edge interior product block vs direct integral identity.

    For constant field F and an affine square element, the (weight, basis)
    entry equals  int psi_w (F x psi_b-ish) terms; we verify through the
    action on primal DoFs: w^T N u  ==  int_W  psi_w * (F . u_perp-form).
    The cleanest exact identity: for a 1-form u and 0-form weight w,
        w^T (node_edge(F)) u = int w(x) * (F_x u_y - ... )
    We check against dense quadrature computed independently.
    """
    cache = FemCache(3)
    basis = cache.get_basis2d(2, 3)
    batch = ElementBatch(basis, DEFORMED[None])
    tb = batch.tb
    rng = np.random.default_rng(5)
    field = rng.normal(size=(1, batch.n_quad, 2))
    m = np.asarray(mass_node_edge(tb, batch.jac, field, False))[0]

    # slow direct computation
    jac = batch.jac
    j00, j01, j10, j11 = (np.asarray(v)[0] for v in (jac.j00, jac.j01, jac.j10, jac.j11))
    comp_h = field[0, :, 0] * j11 - field[0, :, 1] * j10
    comp_v = field[0, :, 0] * j01 - field[0, :, 1] * j00
    slow = np.concatenate(
        [
            np.einsum("nq,q,mq->nm", tb.b0, comp_h * tb.w, tb.bh),
            np.einsum("nq,q,mq->nm", tb.b0, comp_v * tb.w, tb.bv),
        ],
        axis=1,
    )
    assert np.allclose(m, slow, atol=1e-13)

    mt = np.asarray(mass_node_edge(tb, batch.jac, field, True))[0]
    assert np.allclose(mt, m.T, atol=1e-14)

    ms = np.asarray(mass_edge_surf(tb, batch.jac, field, False))[0]
    mst = np.asarray(mass_edge_surf(tb, batch.jac, field, True))[0]
    assert np.allclose(mst, ms.T, atol=1e-14)


def test_sum_factorized_matches_direct():
    """Sum-factorized grams equal the single-GEMM path to roundoff."""
    import mfv2d_tpu.ops.mass as mass_mod
    from mfv2d_tpu.config import config
    from mfv2d_tpu.ops.basis import FemCache

    rng = np.random.default_rng(9)
    basis = FemCache(2).get_basis2d(4, 3)
    tb = mass_mod.tensor_basis(basis)
    base = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
    corners = np.tile(base, (16, 1, 1)) + 0.08 * rng.normal(size=(16, 4, 2))
    jac = mass_mod.batch_jacobian(tb, corners)
    field = rng.normal(size=(16, tb.w.size))
    vec_field = rng.normal(size=(16, tb.w.size, 2))

    results = {}
    old = config.sum_factorization
    try:
        for mode in ("never", "always"):
            config.sum_factorization = mode
            results[mode] = [
                np.asarray(mass_mod.mass_node(tb, jac)),
                np.asarray(mass_mod.mass_edge(tb, jac)),
                np.asarray(mass_mod.mass_edge(tb, jac, field)),
                np.asarray(mass_mod.mass_surf(tb, jac)),
                np.asarray(mass_mod.mass_edge_edge_dual(tb, jac, field)),
                np.asarray(mass_mod.mass_node_edge(tb, jac, vec_field, False)),
                np.asarray(mass_mod.mass_edge_surf(tb, jac, vec_field, True)),
            ]
    finally:
        config.sum_factorization = old
    for a, b in zip(results["never"], results["always"]):
        assert np.allclose(a, b, rtol=1e-12, atol=1e-12), np.abs(a - b).max()


def test_sum_factorized_solve_identical():
    """A p=5 end-to-end solve is identical under both assembly paths."""
    import mfv2d_tpu as mf
    from mfv2d_tpu.config import config
    from mfv2d_tpu.models import poisson

    model = poisson.mixed_poisson()
    out = {}
    old = config.sum_factorization
    try:
        for mode in ("never", "always"):
            config.sum_factorization = mode
            mesh = mf.examples.unit_square_mesh(2, 2, 5)
            sols, _, _ = mf.solve_system_2d(
                mesh, mf.SystemSettings(model.system), recon_order=6
            )
            out[mode] = np.array(sols[-1].point_data["u"])
    finally:
        config.sum_factorization = old
    assert np.allclose(out["never"], out["always"], atol=1e-11), np.abs(
        out["never"] - out["always"]
    ).max()

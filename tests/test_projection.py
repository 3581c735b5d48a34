"""Projection / reconstruction exactness on deformed quads.

Mirrors the strategy of the reference test_projections.py: polynomials of
degree <= p must be reproduced to machine precision.
"""

import numpy as np
import pytest

from mfv2d_tpu.evaluation import ElementBatch
from mfv2d_tpu.kform import UnknownFormOrder
from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.projection import (
    element_dual_dofs,
    element_primal_dofs,
    reconstruct,
)

DEFORMED = np.array([(-1.0, -1.0), (1.2, -0.8), (0.9, 1.3), (-1.1, 0.9)])


@pytest.mark.parametrize("p", [2, 3, 5])
def test_0form_polynomial_exact(p):
    cache = FemCache(3)
    basis = cache.get_basis2d(p, p)
    batch = ElementBatch(basis, DEFORMED[None])

    def f(x, y):
        return 2.0 + x + 0.5 * y + 0.25 * x * y + 0.1 * x**2 - 0.2 * y**2

    primal = np.asarray(element_primal_dofs(UnknownFormOrder.FORM_ORDER_0, batch, f))[0]
    xi = np.linspace(-1, 1, 7)[None, :]
    eta = np.linspace(-1, 1, 6)[:, None]
    vals = reconstruct(DEFORMED, basis, UnknownFormOrder.FORM_ORDER_0, primal, xi, eta)

    from mfv2d_tpu.ops.geometry import physical_coordinates

    x, y = physical_coordinates(DEFORMED, xi, eta)
    assert np.allclose(vals, f(np.asarray(x), np.asarray(y)), atol=1e-11)


@pytest.mark.parametrize("p", [4, 5])
def test_2form_polynomial_exact(p):
    cache = FemCache(3)
    basis = cache.get_basis2d(p, p)
    batch = ElementBatch(basis, DEFORMED[None])

    def f(x, y):
        return 1.0 + 0.3 * x - 0.7 * y + 0.2 * x * y

    primal = np.asarray(element_primal_dofs(UnknownFormOrder.FORM_ORDER_2, batch, f))[0]
    xi = np.linspace(-0.9, 0.9, 5)[None, :]
    eta = np.linspace(-0.9, 0.9, 5)[:, None]
    vals = reconstruct(DEFORMED, basis, UnknownFormOrder.FORM_ORDER_2, primal, xi, eta)

    from mfv2d_tpu.ops.geometry import physical_coordinates

    x, y = physical_coordinates(DEFORMED, xi, eta)
    assert np.allclose(vals, f(np.asarray(x), np.asarray(y)), atol=1e-10)


@pytest.mark.parametrize("p", [3, 5])
def test_1form_polynomial_exact(p):
    cache = FemCache(3)
    basis = cache.get_basis2d(p, p)
    batch = ElementBatch(basis, DEFORMED[None])

    def f(x, y):
        return np.stack(
            [0.5 + x - 0.3 * y + 0.1 * x * y, -0.2 + 0.4 * x + y], axis=-1
        )

    primal = np.asarray(element_primal_dofs(UnknownFormOrder.FORM_ORDER_1, batch, f))[0]
    xi = np.linspace(-0.95, 0.95, 5)[None, :]
    eta = np.linspace(-0.95, 0.95, 4)[:, None]
    vals = reconstruct(DEFORMED, basis, UnknownFormOrder.FORM_ORDER_1, primal, xi, eta)

    from mfv2d_tpu.ops.geometry import physical_coordinates

    x, y = physical_coordinates(DEFORMED, xi, eta)
    expected = f(np.asarray(x), np.asarray(y))
    assert np.allclose(vals, expected, atol=1e-10)


def test_batched_reconstruct_matches_host():
    """Device 1-form reconstruction at quad points matches the host path."""
    cache = FemCache(2)
    basis = cache.get_basis2d(3, 4)
    corners = np.stack([DEFORMED, DEFORMED * 0.5 + 0.2])
    batch = ElementBatch(basis, corners)
    rng = np.random.default_rng(11)
    n1 = UnknownFormOrder.FORM_ORDER_1.full_unknown_count(3, 4)
    dofs = rng.normal(size=(2, n1))
    dev = np.asarray(batch.reconstruct_one_form(dofs))
    for e in range(2):
        host = reconstruct(
            corners[e],
            basis,
            UnknownFormOrder.FORM_ORDER_1,
            dofs[e],
            batch.tb.nodes_xi[None, :],
            batch.tb.nodes_eta[:, None],
        ).reshape(-1, 2)
        assert np.allclose(dev[e], host, atol=1e-12)


def test_dual_primal_roundtrip():
    cache = FemCache(2)
    basis = cache.get_basis2d(4, 4)
    batch = ElementBatch(basis, DEFORMED[None])

    def f(x, y):
        return np.cos(x) * y

    dual = np.asarray(element_dual_dofs(UnknownFormOrder.FORM_ORDER_0, batch, f))[0]
    primal = np.asarray(element_primal_dofs(UnknownFormOrder.FORM_ORDER_0, batch, f))[0]
    m = np.asarray(batch.mass(UnknownFormOrder.FORM_ORDER_0, False))[0]
    assert np.allclose(m @ primal, dual, atol=1e-12)


def test_projector_chunked_dispatch_matches():
    """Past the 512-element dispatch cap the projector build runs in
    chunks (the 48x48 VMS compile asked 39 GB of HBM in one piece) and
    must agree with the small-batch path exactly."""
    import numpy as np

    from mfv2d_tpu.evaluation import jit_element_projector, ElementBatch
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.system import ElementFormSpecification
    from mfv2d_tpu.kform import UnknownFormOrder

    rng = np.random.default_rng(11)
    base = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
    corners = np.tile(base, (600, 1, 1)) + 0.05 * rng.normal(size=(600, 4, 2))
    spec = ElementFormSpecification(("u", UnknownFormOrder.FORM_ORDER_2))
    cache = FemCache(1)
    big = jit_element_projector(
        spec,
        ElementBatch(cache.get_basis2d(2, 2, 5, 5), corners),
        ElementBatch(cache.get_basis2d(3, 3, 5, 5), corners),
    )
    small = jit_element_projector(
        spec,
        ElementBatch(cache.get_basis2d(2, 2, 5, 5), corners[300:500]),
        ElementBatch(cache.get_basis2d(3, 3, 5, 5), corners[300:500]),
    )
    assert np.allclose(
        np.asarray(big[0][300:500]), np.asarray(small[0]), atol=1e-13
    )

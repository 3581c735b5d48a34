"""Pallas fused assembly kernel vs the XLA einsum path (interpret mode)."""

import numpy as np
import pytest

from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.ops.mass import batch_jacobian, mass_edge, tensor_basis
from mfv2d_tpu.ops.pallas_mass import mass_edge_pallas

BASE = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])


@pytest.mark.parametrize("orders", [(2, 2), (4, 4), (3, 5)])
def test_mass_edge_pallas_matches(orders):
    basis = FemCache(2).get_basis2d(*orders)
    tb = tensor_basis(basis)
    rng = np.random.default_rng(1)
    e = 8
    corners = np.tile(BASE, (e, 1, 1)) + 0.05 * rng.normal(size=(e, 4, 2))
    jac = batch_jacobian(tb, corners)
    ref = np.asarray(mass_edge(tb, jac))
    out = np.asarray(mass_edge_pallas(tb, jac, tile=4))
    assert np.allclose(out, ref, atol=1e-11), np.abs(out - ref).max()


def test_mass_edge_pallas_tile_validation():
    basis = FemCache(2).get_basis2d(3, 3)
    tb = tensor_basis(basis)
    corners = np.tile(BASE, (6, 1, 1))
    jac = batch_jacobian(tb, corners)
    with pytest.raises(ValueError):
        mass_edge_pallas(tb, jac, tile=4)  # 6 not a multiple of 4


def test_gj_inverse_pallas_matches(monkeypatch):
    """VMEM-resident blocked GJ kernel vs LAPACK (interpret mode), across
    pad/no-pad sizes and both pivot strategies."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mfv2d_tpu.ops.pallas_factor import gj_inverse_pallas

    rng = np.random.default_rng(3)
    for e, n, kw in (
        (8, 64, {}),                        # single level (block >= n)
        (8, 289, {}),                       # padded to 384, two-level
        (4, 128, {"pivot_block": 128}),     # masked GJ directly at block
    ):
        a = (rng.normal(size=(e, n, n)) + n * np.eye(n)).astype(np.float32)
        with jax.enable_x64(False):
            inv = np.asarray(gj_inverse_pallas(jnp.asarray(a), tile=4, **kw))
        ref = np.linalg.inv(a.astype(np.float64))
        scale = np.abs(ref).max()
        assert np.abs(inv - ref).max() / scale < 5e-5, (e, n)


def test_gj_inverse_pallas_validation():
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from mfv2d_tpu.ops.pallas_factor import gj_inverse_pallas

    a = jnp.asarray(np.eye(16)[None].repeat(6, 0))
    with pytest.raises(ValueError, match="multiple of tile"):
        gj_inverse_pallas(a, tile=4)

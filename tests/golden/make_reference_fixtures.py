"""Generate golden parity fixtures by RUNNING the reference's NumPy layer.

The reference package (/root/reference) normally needs its C extension
``mfv2d._mfv2d``; its pure-NumPy layer (python/mfv2d/mimetic2d.py:33-391
incidence appliers, :1003-1279 projections/reconstruction, :876-1000
geometry) only touches a small attribute surface of that extension, which
this script satisfies with mfv2d_tpu's primitives (themselves pinned by
quadrature/basis golden tests).  The reference functions then execute their
own quadrature loops and produce the fixture values saved to
``reference_fixtures.npz``; ``test_reference_parity.py`` asserts mfv2d_tpu
matches them to 1e-10.

Run from the repo root:  python tests/golden/make_reference_fixtures.py
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference/python")
OUT = Path(__file__).parent / "reference_fixtures.npz"


def _install_shim() -> None:
    """Install a fake ``mfv2d`` package backed by mfv2d_tpu primitives."""
    from mfv2d_tpu.evaluation import ElementBatch
    from mfv2d_tpu.ops.basis import Basis1D, Basis2D, IntegrationRule1D
    from mfv2d_tpu.ops.quadrature import dlagrange1d, lagrange1d

    class ElementFemSpace2D:
        """Reference C type shim: corners + basis + cached mass matrices."""

        def __init__(self, basis_2d, corners):
            self.basis_2d = basis_2d
            self.corners = np.asarray(corners, np.float64)
            self._batch = ElementBatch(basis_2d, self.corners[None])

        def mass_from_order(self, order, inverse=False):
            m = np.asarray(self._batch.mass(order, False))[0]
            return np.linalg.inv(m) if inverse else m

    ext = types.ModuleType("mfv2d._mfv2d")
    ext.Basis1D = Basis1D
    ext.Basis2D = Basis2D
    ext.IntegrationRule1D = IntegrationRule1D
    ext.ElementFemSpace2D = ElementFemSpace2D
    ext.lagrange1d = lagrange1d
    ext.dlagrange1d = dlagrange1d
    # Topology types are imported by mimetic2d but unused by the functions
    # exercised here.
    for name in ("Manifold2D", "Mesh", "Surface", "GeoID", "Line"):
        setattr(ext, name, type(name, (), {}))

    pkg = types.ModuleType("mfv2d")
    pkg.__path__ = [str(REFERENCE / "mfv2d")]
    pkg._mfv2d = ext
    sys.modules["mfv2d"] = pkg
    sys.modules["mfv2d._mfv2d"] = ext


QUADS = np.array(
    [
        [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)],
        [(-1.0, -2.0), (2.0, 0.0), (1.75, 0.75), (1.0, 1.0)],
        [(-0.2, -1.5), (0.2, -1.5), (0.3, 1.4), (-0.25, 1.6)],
        [(0.0, 0.0), (2.0, 0.2), (2.3, 1.9), (-0.1, 2.1)],
    ]
)


def scalar_f(x, y):
    return np.sin(x) * np.exp(0.5 * y) + 2.0


def vector_f(x, y):
    return np.stack((np.cos(x * y), x**2 - y), axis=-1)


def main() -> None:
    _install_shim()
    from mfv2d import mimetic2d as ref
    from mfv2d.kform import UnknownFormOrder
    from mfv2d._mfv2d import Basis1D, Basis2D, ElementFemSpace2D, IntegrationRule1D

    rng = np.random.default_rng(2024)
    out: dict[str, np.ndarray] = {"quads": QUADS}

    # Incidence matrices + left/right (transposed) applications.
    for p in (2, 3, 4, 5):
        e10 = ref.incidence_10(p)
        e21 = ref.incidence_21(p)
        out[f"e10_p{p}"] = e10
        out[f"e21_p{p}"] = e21
        m0 = rng.normal(size=(e10.shape[1], 3))
        m1 = rng.normal(size=(e21.shape[1], 3))
        m2 = rng.normal(size=(e21.shape[0], 3))
        out[f"in0_p{p}"] = m0
        out[f"in1_p{p}"] = m1
        out[f"in2_p{p}"] = m2
        out[f"apply_e10_p{p}"] = ref.apply_e10(p, m0)
        out[f"apply_e21_p{p}"] = ref.apply_e21(p, m1)
        out[f"apply_e10_t_p{p}"] = ref.apply_e10_t(p, m1)
        out[f"apply_e21_t_p{p}"] = ref.apply_e21_t(p, m2)
        out[f"apply_e10_r_p{p}"] = ref.apply_e10_r(p, m1.T)
        out[f"apply_e21_rt_p{p}"] = ref.apply_e21_rt(p, m1.T)

    # Geometry: Jacobian entries at a sample grid.
    xi = np.linspace(-1, 1, 7)[None, :]
    eta = np.linspace(-1, 1, 5)[:, None]
    out["jac_xi"] = xi
    out["jac_eta"] = eta
    for qi, corners in enumerate(QUADS):
        (j00, j01), (j10, j11) = ref.jacobian(corners, xi, eta)
        out[f"jac_q{qi}"] = np.stack(
            [np.broadcast_to(a, (5, 7)) for a in (j00, j01, j10, j11)]
        )

    # Projections (dual + primal) and reconstruction per quad/order/form.
    orders = [(3, 3), (5, 5), (3, 5)]
    xi_s = rng.uniform(-1, 1, size=11)
    eta_s = rng.uniform(-1, 1, size=11)
    out["recon_xi"] = xi_s
    out["recon_eta"] = eta_s
    for qi, corners in enumerate(QUADS[:3]):
        for p1, p2 in orders:
            basis = Basis2D(
                Basis1D(p1, IntegrationRule1D(p1 + 2)),
                Basis1D(p2, IntegrationRule1D(p2 + 2)),
            )
            space = ElementFemSpace2D(basis, corners)
            tag = f"q{qi}_p{p1}{p2}"
            for order, fn in (
                (UnknownFormOrder.FORM_ORDER_0, scalar_f),
                (UnknownFormOrder.FORM_ORDER_1, vector_f),
                (UnknownFormOrder.FORM_ORDER_2, scalar_f),
            ):
                k = order.value - 1
                dual = ref.element_dual_dofs(order, space, fn)
                primal = ref.element_primal_dofs(order, space, fn)
                recon = ref.reconstruct(space, order, primal, xi_s, eta_s)
                out[f"dual_{tag}_k{k}"] = dual
                out[f"primal_{tag}_k{k}"] = primal
                out[f"recon_{tag}_k{k}"] = np.asarray(recon)

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} with {len(out)} arrays")


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    main()

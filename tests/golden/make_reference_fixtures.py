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
    """Install a fake ``mfv2d`` package backed by INDEPENDENT primitives.

    Mass matrices come from ``independent_quadrature`` (numpy.polynomial
    Lagrange/edge polynomials + dense 48-point Gauss-Legendre), NOT from
    mfv2d_tpu's kernels — so the dual/primal-projection fixtures pin the
    package against an independent derivation instead of its own masses
    (round-2 VERDICT circularity finding).  Basis TABLES (node values for
    the reference's reconstruction loops) still come from mfv2d_tpu, which
    the exact-polynomial reproduction check below pins independently.
    """
    import independent_quadrature as iq
    from mfv2d_tpu.ops.basis import Basis1D, Basis2D, IntegrationRule1D
    from mfv2d_tpu.ops.quadrature import dlagrange1d, lagrange1d

    class ElementFemSpace2D:
        """Reference C type shim: corners + basis + independent masses."""

        def __init__(self, basis_2d, corners):
            self.basis_2d = basis_2d
            self.corners = np.asarray(corners, np.float64)

        def mass_from_order(self, order, inverse=False):
            p1 = self.basis_2d.basis_xi.order
            p2 = self.basis_2d.basis_eta.order
            m = iq.mass_matrices(
                p1, p2, self.corners,
                int_orders=tuple(self.basis_2d.integration_orders),
            )[order.value - 1]
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


def _bilinear_xy(corners, xi, eta):
    (x0, y0), (x1, y1), (x2, y2), (x3, y3) = corners
    sh = np.stack([(1 - xi) * (1 - eta), (1 + xi) * (1 - eta),
                   (1 + xi) * (1 + eta), (1 - xi) * (1 + eta)]) / 4
    return (
        x0 * sh[0] + x1 * sh[1] + x2 * sh[2] + x3 * sh[3],
        y0 * sh[0] + y1 * sh[1] + y2 * sh[2] + y3 * sh[3],
    )


def _solution_fixture(out, ref, UnknownFormOrder, Basis1D, Basis2D,
                      IntegrationRule1D, ElementFemSpace2D) -> None:
    """Full-solution golden fixture: 4x4 p=3 mixed Poisson, solved from
    independently-assembled parts.

    Element matrices come from the pinned compiler block structure
    (golden reference_compiler_strings.txt, mixed_poisson row)

        [[-M1, E21^T M2], [M2 E21, 0]]

    with INDEPENDENT masses (independent_quadrature) and the reference's
    own NumPy incidence matrices; the RHS uses the reference's dual-DoF
    quadrature loops; the manufactured solution vanishes on the boundary,
    so the weak boundary term is identically zero.  The constraint matrix
    G (mfv2d_tpu continuity) is validated in place: the primal DoFs of an
    in-space polynomial flux field satisfy G dofs = 0 exactly.  The saddle
    system is then solved with SciPy and the DoF vector stored —
    ``test_reference_parity`` checks the package's production pipeline
    reproduces it to 1e-10.
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as sla

    import independent_quadrature as iq
    import mfv2d_tpu as mf
    from mfv2d_tpu.continuity import add_system_constraints
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.solver.discretization import discretize_mesh

    def u_exact(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def source_exact(x, y):
        return -(np.pi**2) / 2 * np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    p = 3
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(4, 4, p)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(2))
    bucket = disc.buckets[0]
    int_orders = bucket.batch.basis.integration_orders
    corners_all = np.asarray(bucket.batch.corners)
    n_elem = corners_all.shape[0]

    e21 = ref.incidence_21(p)
    n1 = e21.shape[1]
    n2 = e21.shape[0]
    n_el_dofs = n1 + n2

    lagrange_mat, lagrange_vec = add_system_constraints(
        system, disc.mesh, disc.basis_cache, [], [],
        disc.leaf_indices, disc.element_offsets, None,
    )
    assert np.abs(lagrange_vec).max() == 0.0

    # G validation: primal DoFs of an in-space polynomial vector field are
    # exact, so continuity rows must annihilate them.
    def poly_flux(px, py):
        return np.stack((0.4 - 0.3 * px + 0.2 * py, -0.1 + 0.5 * px), axis=-1)

    blocks = []
    rhs = np.zeros(n_elem * n_el_dofs)
    poly_dofs = np.zeros(n_elem * n_el_dofs)
    for e in range(n_elem):
        corners = corners_all[e]
        basis = Basis2D(
            Basis1D(p, IntegrationRule1D(int_orders[0])),
            Basis1D(p, IntegrationRule1D(int_orders[1])),
        )
        space = ElementFemSpace2D(basis, corners)
        _, m1, m2 = iq.mass_matrices(p, p, corners)
        a_e = np.zeros((n_el_dofs, n_el_dofs))
        a_e[:n1, :n1] = -m1
        a_e[:n1, n1:] = e21.T @ m2
        a_e[n1:, :n1] = m2 @ e21
        blocks.append(a_e)
        # Weak boundary term B<q, u_exact> vanishes (u_exact = 0 on the
        # boundary); the u-row carries -E<u, source>.
        dual2 = np.asarray(ref.element_dual_dofs(
            UnknownFormOrder.FORM_ORDER_2, space, source_exact))
        rhs[e * n_el_dofs + n1 : (e + 1) * n_el_dofs] = -dual2
        poly_dofs[e * n_el_dofs : e * n_el_dofs + n1] = np.asarray(
            ref.element_primal_dofs(UnknownFormOrder.FORM_ORDER_1, space, poly_flux)
        )
    # Vanishing-boundary premise: u_exact must be ~0 at EVERY hull point
    # (otherwise the omitted weak boundary term is nonzero and the fixture
    # is wrong).  The mesh spans [-1, 1]^2, so hull corners are those with
    # |x| = 1 or |y| = 1; check corners and edge midpoints.
    cx = corners_all[..., 0]
    cy = corners_all[..., 1]
    on_hull = (np.abs(np.abs(cx) - 1.0) < 1e-12) | (
        np.abs(np.abs(cy) - 1.0) < 1e-12
    )
    assert on_hull.any()
    hull_vals = np.abs(u_exact(cx, cy))[on_hull]
    mid_x = np.linspace(-1, 1, 33)
    for edge in (u_exact(mid_x, -1.0 + 0 * mid_x),
                 u_exact(mid_x, 1.0 + 0 * mid_x),
                 u_exact(-1.0 + 0 * mid_x, mid_x),
                 u_exact(1.0 + 0 * mid_x, mid_x)):
        hull_vals = np.concatenate([hull_vals, np.abs(edge)])
    assert float(hull_vals.max()) < 1e-12, float(hull_vals.max())
    g_res = np.abs(lagrange_mat @ poly_dofs).max()
    assert g_res < 1e-10, g_res

    a_mat = sp.block_diag(blocks, format="csr")
    saddle = sp.block_array(
        [[a_mat, lagrange_mat.T], [lagrange_mat, None]], format="csc"
    )
    full_rhs = np.concatenate([rhs, np.zeros(lagrange_mat.shape[0])])
    solution = sla.splu(sp.csc_matrix(saddle)).solve(full_rhs)
    dofs = solution[: n_elem * n_el_dofs]

    # The fixture solution must itself track the manufactured solution at
    # the discretization-error level (guards sign/layout mistakes).
    errs = []
    for e in range(n_elem):
        corners = corners_all[e]
        basis = Basis2D(
            Basis1D(p, IntegrationRule1D(int_orders[0])),
            Basis1D(p, IntegrationRule1D(int_orders[1])),
        )
        space = ElementFemSpace2D(basis, corners)
        u_dofs = dofs[e * n_el_dofs + n1 : (e + 1) * n_el_dofs]
        xi_s = np.linspace(-0.9, 0.9, 5)
        recon = np.asarray(ref.reconstruct(
            space, UnknownFormOrder.FORM_ORDER_2, u_dofs, xi_s, xi_s))
        x, y = _bilinear_xy(corners, xi_s, xi_s)
        errs.append(np.abs(recon - u_exact(x, y)).max())
    assert max(errs) < 5e-3, max(errs)

    out["solution_mixed_poisson_4x4_p3"] = dofs
    out["solution_mixed_poisson_4x4_p3_lam"] = solution[n_elem * n_el_dofs:]


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

    # -- independent masses + exact-polynomial pin ----------------------
    # Store the independently-derived mass matrices for direct comparison
    # tests, and pin the whole shim (tables + masses) with exact
    # reproduction of in-space polynomials: the L2 projection of a
    # polynomial inside the basis space must reconstruct it exactly, which
    # breaks for ANY mass/basis convention drift.
    import independent_quadrature as iq

    for qi, corners in enumerate(QUADS[:3]):
        for p1, p2 in [(3, 3), (3, 5)]:
            m0, m1, m2 = iq.mass_matrices(
                p1, p2, corners, int_orders=(p1 + 2, p2 + 2)
            )
            tag = f"q{qi}_p{p1}{p2}"
            out[f"imass0_{tag}"] = m0
            out[f"imass1_{tag}"] = m1
            out[f"imass2_{tag}"] = m2
            basis = Basis1D(p1, IntegrationRule1D(p1 + 2))
            basis = Basis2D(basis, Basis1D(p2, IntegrationRule1D(p2 + 2)))
            space = ElementFemSpace2D(basis, corners)
            xi_s = out["recon_xi"]
            eta_s = out["recon_eta"]
            x, y = _bilinear_xy(corners, xi_s, eta_s)

            def poly_scalar(px, py):
                return 0.3 + px - 0.5 * py + 0.25 * px * py

            def poly_affine(px, py):
                # 2-form reproduction needs f(x(xi,eta)) * det in the
                # degree-(p-1) tensor space: affine f keeps it there on
                # bilinear elements.
                return 0.4 - 0.6 * px + 0.35 * py

            def poly_vec(px, py):
                return np.stack(
                    (1.0 - 0.5 * px + 0.2 * py, 0.7 + 0.1 * px * py), axis=-1
                )

            checks = [
                (UnknownFormOrder.FORM_ORDER_0, poly_scalar),
                (UnknownFormOrder.FORM_ORDER_2, poly_affine),
            ]
            if qi == 0:
                # The 1-form Piola pullback of a polynomial field is only
                # polynomial (hence exactly reproducible) on AFFINE
                # elements; skewed-quad 1-form masses are pinned by the
                # primal/recon fixture comparisons instead.
                checks.append((UnknownFormOrder.FORM_ORDER_1, poly_vec))
            for order, fn in checks:
                primal = ref.element_primal_dofs(order, space, fn)
                recon = np.asarray(ref.reconstruct(space, order, primal, xi_s, eta_s))
                want = np.asarray(fn(x, y))
                err = np.abs(recon - want).max()
                assert err < 1e-10, (tag, order, err)

    _solution_fixture(out, ref, UnknownFormOrder,
                      Basis1D, Basis2D, IntegrationRule1D, ElementFemSpace2D)

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} with {len(out)} arrays")


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main()

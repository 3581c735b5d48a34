"""VMS fine-scale Green's function tests (mirrors reference test_vms.py)."""

import numpy as np
import pytest

import mfv2d_tpu as mf
from mfv2d_tpu.compiler import CompiledSystem
from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.solver.discretization import discretize_mesh
from mfv2d_tpu.solver.solve import SystemEvaluator, ConvergenceSettings, VMSSettings
from mfv2d_tpu.solver.vms import SuyashGreenOperator


@pytest.mark.parametrize(
    ("nh", "nv", "element_order", "k"), ((3, 4, 3, 2), (2, 3, 4, 3), (2, 2, 1, 1))
)
def test_fine_green_annihilates_coarse(nh, nv, element_order, k):
    """G' output has no coarse-space component.

    Applying the symmetric operator to G' x and projecting to the coarse
    space must give zero after a coarse solve (reference tests/test_vms.py).
    """
    mesh = mf.examples.unit_square_mesh(
        nh,
        nv,
        element_order,
        deformation=lambda xi, eta: (
            xi + 0.1 * np.sin(np.pi * xi) * np.sin(np.pi * eta),
            eta - 0.1 * np.sin(np.pi * xi) * np.sin(np.pi * eta),
        ),
    )

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    v = u.weight
    p = q.weight
    system = mf.KFormSystem(
        p @ q + p.derivative @ u == 0,
        v @ q.derivative == 0,
        sorting=lambda f: f.order,
    )

    cache = FemCache(order_difference=k)
    disc = discretize_mesh(mesh, system.unknown_forms, cache)
    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
    settings = VMSSettings(
        symmetric_system=system,
        nonsymmetric_system=system,
        order_increase=k,
        fine_scale_convergence=ConvergenceSettings(10, 1e-10, 1e-10),
    )
    op = SuyashGreenOperator(system, settings, disc, evaluator, [], [])

    rng = np.random.default_rng(0)
    n_fine = op.fine_offsets[-1]
    forcing = rng.uniform(-1, 1, n_fine)

    g = op.fine_scale_greens_function(forcing)

    # Apply the fine symmetric saddle operator and project to coarse space.
    fine_forcing = (op.fine_sym_mat @ np.pad(g, (0, op.fine_padding)))[
        : n_fine
    ] @ op.projector_c2f
    res = op.coarse_decomp.solve(np.pad(fine_forcing, (0, op.coarse_padding)))
    res = res[: res.size - op.coarse_padding]
    assert np.max(np.abs(res)) < 1e-8 * max(1.0, np.max(np.abs(g)))


def test_vms_solve_runs():
    """solve_system_2d with vms_settings produces vms point data."""

    def u_exact(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def source_exact(x, y):
        return -(np.pi**2) / 2 * np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    p = q.weight
    system = mf.KFormSystem(
        p.derivative @ u - p @ q == p ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(system, over_integration_order=3),
        mf.SolverSettings(mf.ConvergenceSettings(20, 1e-8, 0)),
        vms_settings=mf.VMSSettings(
            symmetric_system=system,
            nonsymmetric_system=system,
            order_increase=2,
            fine_scale_convergence=mf.ConvergenceSettings(10, 1e-10, 1e-8),
        ),
        recon_order=6,
    )
    grid = sols[-1]
    assert "vms-u" in grid.point_data
    assert np.all(np.isfinite(grid.point_data["vms-u"]))
    # The solution itself should still be accurate.
    err = np.sqrt(
        np.mean((grid.point_data["u"] - u_exact(grid.points[:, 0], grid.points[:, 1])) ** 2)
    )
    assert err < 5e-2


def test_matrix_free_greens_matches_splu():
    """Matrix-free Schur-CG G' equals the sparse-LU G' on the same problem."""
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    v = u.weight
    p = q.weight
    system = mf.KFormSystem(
        p @ q + p.derivative @ u == 0,
        v @ q.derivative == 0,
        sorting=lambda f: f.order,
    )
    cache = FemCache(order_difference=2)
    disc = discretize_mesh(mesh, system.unknown_forms, cache)
    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)

    ops = {}
    for matrix_free in (False, True):
        settings = VMSSettings(
            symmetric_system=system,
            nonsymmetric_system=system,
            order_increase=2,
            fine_scale_convergence=ConvergenceSettings(10, 1e-10, 1e-10),
            matrix_free=matrix_free,
        )
        ops[matrix_free] = SuyashGreenOperator(
            system, settings, disc, evaluator, [], []
        )
    assert ops[True].matrix_free and not ops[False].matrix_free

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, int(ops[False].fine_offsets[-1]))
    g_lu = ops[False].fine_scale_greens_function(x)
    g_mf = ops[True].fine_scale_greens_function(x)
    assert np.allclose(g_mf, g_lu, atol=1e-8), np.abs(g_mf - g_lu).max()


def test_gmres_unresolved_scales_match_fixed_point():
    """The Krylov unresolved-scale solve equals the stationary iteration."""

    def u_exact(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def source_exact(x, y):
        return -(np.pi**2) / 2 * u_exact(x, y)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    p = q.weight
    system = mf.KFormSystem(
        p.derivative @ u - p @ q == p ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    outs = {}
    for mode in ("gmres", "fixed-point"):
        sols, _, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(system, over_integration_order=3),
            mf.SolverSettings(mf.ConvergenceSettings(20, 1e-9, 0)),
            vms_settings=mf.VMSSettings(
                symmetric_system=system,
                nonsymmetric_system=system,
                order_increase=2,
                fine_scale_convergence=mf.ConvergenceSettings(60, 1e-12, 1e-10),
                iteration=mode,
            ),
            recon_order=5,
        )
        outs[mode] = sols[-1].point_data["vms-u"]
    assert np.allclose(outs["gmres"], outs["fixed-point"], atol=1e-8), np.abs(
        outs["gmres"] - outs["fixed-point"]
    ).max()


def test_vms_matrix_free_full_solve():
    """solve_system_2d with matrix_free=True VMS (regression: the GMRES
    unresolved-scale LinearOperator must declare its dtype, else scipy
    probes the jitted matvec with an int8 vector)."""

    def u_exact(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def source_exact(x, y):
        return -(np.pi**2) / 2 * np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    p = q.weight
    system = mf.KFormSystem(
        p.derivative @ u - p @ q == p ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(system, over_integration_order=3),
        mf.SolverSettings(mf.ConvergenceSettings(20, 1e-8, 0)),
        vms_settings=mf.VMSSettings(
            symmetric_system=system,
            nonsymmetric_system=system,
            order_increase=2,
            fine_scale_convergence=mf.ConvergenceSettings(10, 1e-10, 1e-8),
            matrix_free=True,
        ),
        recon_order=3,
    )
    grid = sols[-1]
    assert np.all(np.isfinite(grid.point_data["vms-u"]))
    # Resolved problem: the fine scales are numerically zero.
    assert np.abs(grid.point_data["vms-u"]).max() < 1e-10


def test_nonlinear_vms_device_ops_match_host_csr():
    """The device-resident fine-operator path (uniform meshes) equals the
    host-CSR path on a NONLINEAR flow with VMS — exercising the per-Picard
    nonlinear advection update and every projector/advection application."""
    from mfv2d_tpu.models import transport

    nu = -1.0

    def u_exact(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def q_exact(x, y):
        return np.stack(
            (
                -np.pi / 2 * np.sin(np.pi / 2 * x) * np.cos(np.pi / 2 * y),
                -np.pi / 2 * np.cos(np.pi / 2 * x) * np.sin(np.pi / 2 * y),
            ),
            axis=-1,
        )

    def source_exact(x, y):
        return np.sum(q_exact(x, y) ** 2, axis=-1) - nu * np.pi**2 * u_exact(
            x, y
        ) / 2

    model = transport.nonlinear_flow(nu, u_exact, source_exact)
    u, q = model.u, model.q
    v, pw = u.weight, q.weight
    symmetric = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        nu * (v @ q.derivative) == -(v @ source_exact),
    )
    results = {}
    for mfree in (False, True):
        mesh = mf.examples.unit_square_mesh(4, 4, 3)
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system, over_integration_order=3),
            mf.SolverSettings(
                mf.ConvergenceSettings(40, 1e-9, 0),
                linear_solver="schur_direct",
            ),
            vms_settings=mf.VMSSettings(
                symmetric_system=symmetric,
                nonsymmetric_system=model.system,
                order_increase=2,
                fine_scale_convergence=mf.ConvergenceSettings(10, 1e-10, 1e-8),
                matrix_free=mfree,
            ),
            recon_order=6,
        )
        grid = sols[-1]
        results[mfree] = (
            np.asarray(grid.point_data["u"]),
            np.asarray(grid.point_data["vms-u"]),
        )
    # matrix_free=True uses the device block ops (incl. the nonlinear
    # update); matrix_free=False the host LU + CSR.  Same answers.
    assert np.allclose(results[True][0], results[False][0], atol=1e-8)
    assert np.allclose(results[True][1], results[False][1], atol=1e-9)


def test_reference_inclusion_matches_per_element_projector():
    """The shared inclusion matrix equals the per-element L2 projector.

    For nested p -> p+dk spaces on the same element the L2 projection is
    the reference-space inclusion, independent of (bilinear) geometry —
    this is what lets the dev-mode VMS store one [n_f, n_c] matrix instead
    of [E, n_f, n_c].  Checked against compute_element_projector with an
    exact quadrature rule on random deformed quads.
    """
    from mfv2d_tpu.evaluation import (
        ElementBatch,
        compute_element_projector,
        reference_inclusion_matrix,
    )
    from mfv2d_tpu.system import ElementFormSpecification

    rng = np.random.default_rng(3)
    base = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
    corners = base[None] + 0.25 * rng.uniform(-1, 1, (6, 4, 2))
    spec = ElementFormSpecification(
        ("q", mf.UnknownFormOrder.FORM_ORDER_1),
        ("u", mf.UnknownFormOrder.FORM_ORDER_2),
    )
    p, dk = 3, 2
    incl = reference_inclusion_matrix(spec, (p, p), (p + dk, p + dk))
    cache = FemCache(0)
    io = p + dk + 3  # exact for the fine mass
    bc = ElementBatch(cache.get_basis2d(p, p, io, io), corners)
    bf = ElementBatch(cache.get_basis2d(p + dk, p + dk, io, io), corners)
    projs = compute_element_projector(spec, bc, bf)
    off_c = spec.form_offsets(p, p)
    off_f = spec.form_offsets(p + dk, p + dk)
    for i, pr in enumerate(projs):
        blk = incl[off_f[i] : off_f[i + 1], off_c[i] : off_c[i + 1]]
        assert np.abs(np.asarray(pr) - blk).max() < 1e-12


def test_fine_green_annihilates_coarse_hp_mesh():
    """G' annihilation on a mixed-order (two-bucket) mesh.

    Exercises the non-dev VMS path (per-element projectors + host CSR
    operators) that uniform meshes no longer touch.
    """
    orders = np.array([[2, 2], [3, 3]] * 2)
    mesh = mf.examples.unit_square_mesh(2, 2, orders)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    v = u.weight
    p = q.weight
    system = mf.KFormSystem(
        p @ q + p.derivative @ u == 0,
        v @ q.derivative == 0,
        sorting=lambda f: f.order,
    )
    cache = FemCache(order_difference=2)
    disc = discretize_mesh(mesh, system.unknown_forms, cache)
    assert len(disc.buckets) > 1  # the point of this test
    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
    settings = VMSSettings(
        symmetric_system=system,
        nonsymmetric_system=system,
        order_increase=2,
        fine_scale_convergence=ConvergenceSettings(10, 1e-10, 1e-10),
    )
    op = SuyashGreenOperator(system, settings, disc, evaluator, [], [])
    assert not op._dev_ops

    rng = np.random.default_rng(0)
    forcing = rng.uniform(-1, 1, op.fine_offsets[-1])
    g = op.fine_scale_greens_function(forcing)
    fine_forcing = (op.fine_sym_mat @ np.pad(g, (0, op.fine_padding)))[
        : forcing.size
    ] @ op.projector_c2f
    res = op.coarse_decomp.solve(np.pad(fine_forcing, (0, op.coarse_padding)))
    res = res[: res.size - op.coarse_padding]
    assert np.max(np.abs(res)) < 1e-8 * max(1.0, np.max(np.abs(g)))


def test_device_galerkin_matches_host_triple_product(monkeypatch):
    """The exact-Ozaki device Galerkin build must match the host f64
    triple product to f64-GEMM roundoff (consistency requirement: an
    independent coarse-side perturbation is inadmissible in G')."""
    import jax
    import jax.numpy as jnp

    from mfv2d_tpu.solver.vms import SuyashGreenOperator

    rng = np.random.default_rng(12)
    e, n_f, n_c = 6, 40, 24
    m = rng.standard_normal((e, n_f, n_f))
    m = m + np.swapaxes(m, 1, 2)
    p = np.zeros((n_f, n_c))
    p[:n_c] = np.eye(n_c)
    p += 0.01 * rng.standard_normal((n_f, n_c))

    ref = np.matmul(p.T, np.matmul(m, p))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = SuyashGreenOperator._galerkin_coarse(jnp.asarray(m), p, m)
    monkeypatch.undo()
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-13


def test_vms_anticipatory_strict_solve(monkeypatch):
    """Near convergence the in-loop unresolved solve runs strictly.

    Once the previous outer residual is within ``anticipate_factor`` of the
    Picard exit threshold, the unresolved-scale solve must run at the
    configured tolerance (``atol_override=None``) so the convergence exit
    needs no guarded re-solve — with ``anticipate_factor=0`` the exit pays
    one extra re-solve call.  Both modes must converge to the same answer.
    """
    from mfv2d_tpu.models import transport
    from mfv2d_tpu.solver.vms import SuyashGreenOperator

    nu = -1.0

    def u_exact(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def q_exact(x, y):
        return np.stack(
            (
                -np.pi / 2 * np.sin(np.pi / 2 * x) * np.cos(np.pi / 2 * y),
                -np.pi / 2 * np.cos(np.pi / 2 * x) * np.sin(np.pi / 2 * y),
            ),
            axis=-1,
        )

    def source_exact(x, y):
        return np.sum(q_exact(x, y) ** 2, axis=-1) - nu * np.pi**2 * u_exact(
            x, y
        ) / 2

    model = transport.nonlinear_flow(nu, u_exact, source_exact)
    u, q = model.u, model.q
    v, pw = u.weight, q.weight
    symmetric = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        nu * (v @ q.derivative) == -(v @ source_exact),
    )

    overrides: list[float | None] = []
    orig = SuyashGreenOperator.compute_unresolved_contributions

    def spy(self, coarse, guess, rtol_override=None, atol_override=None):
        overrides.append(atol_override)
        return orig(
            self,
            coarse,
            guess,
            rtol_override=rtol_override,
            atol_override=atol_override,
        )

    monkeypatch.setattr(
        SuyashGreenOperator, "compute_unresolved_contributions", spy
    )

    results = {}
    for factor in (0.0, 3.0):
        overrides.clear()
        mesh = mf.examples.unit_square_mesh(4, 4, 3)
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system, over_integration_order=3),
            mf.SolverSettings(
                mf.ConvergenceSettings(40, 1e-9, 0),
                linear_solver="schur_direct",
            ),
            vms_settings=mf.VMSSettings(
                symmetric_system=symmetric,
                nonsymmetric_system=model.system,
                order_increase=2,
                fine_scale_convergence=mf.ConvergenceSettings(10, 1e-12, 1e-10),
                anticipate_factor=factor,
            ),
            recon_order=6,
        )
        n_it = int(stats.iter_history[-1])
        results[factor] = (
            np.asarray(sols[-1].point_data["u"]),
            list(overrides),
            n_it,
        )

    u0, seq0, it0 = results[0.0]
    u3, seq3, it3 = results[3.0]
    # Same converged solution either way (the final scales are strict in
    # both modes).
    assert np.allclose(u0, u3, atol=1e-8)
    # anticipate_factor=0: every in-loop solve is loosened; the exit pays
    # the guarded re-solve (the one call with no override).
    assert seq0[-1] is None and all(o is not None for o in seq0[:-1])
    assert len(seq0) == it0 + 2  # it0+1 in-loop solves + the re-solve
    # Default: the last in-loop solve anticipated the exit and ran strict,
    # so no re-solve call follows.
    assert seq3[-1] is None
    assert len(seq3) == it3 + 1
    # Anticipation must not have fired from the start (the early
    # iterations still run loosened).
    assert any(o is not None for o in seq3)

"""Edge cases: tiny meshes, p=1, validation errors, sampling rates."""

import numpy as np
import pytest

import mfv2d_tpu as mf
from mfv2d_tpu.models import poisson


def test_single_element_mesh():
    """A 1x1 mesh has no continuity constraints, only weak BCs."""
    model = poisson.mixed_poisson()
    mesh = mf.examples.unit_square_mesh(1, 1, 4)
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system),
        mf.SolverSettings(mf.ConvergenceSettings(10, 1e-10, 0)),
        recon_order=6,
    )
    assert stats.n_lagrange == 0
    g = sols[-1]
    err = np.sqrt(
        np.mean((g.point_data["u"] - poisson.u_exact(g.points[:, 0], g.points[:, 1])) ** 2)
    )
    assert err < 0.2  # single coarse element; just well-posedness


def test_p1_everywhere():
    model = poisson.mixed_poisson()
    mesh = mf.examples.unit_square_mesh(6, 6, 1)
    sols, stats, _ = mf.solve_system_2d(
        mesh, mf.SystemSettings(model.system), recon_order=2
    )
    assert np.all(np.isfinite(sols[-1].point_data["u"]))


def test_invalid_time_settings():
    model = poisson.mixed_poisson()
    mesh = mf.examples.unit_square_mesh(2, 2, 2)
    with pytest.raises(ValueError, match="no time march relations"):
        mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system),
            time_settings=mf.TimeSettings(dt=0.1, nt=2, time_march_relations={}),
        )
    u = model.u
    v = u.weight
    with pytest.raises(ValueError, match="Sample rate"):
        mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system),
            time_settings=mf.TimeSettings(
                dt=0.1, nt=2, time_march_relations={v: u}, sample_rate=0
            ),
        )


def test_constrained_form_validation():
    model = poisson.mixed_poisson()
    other = mf.KFormUnknown("zz", mf.UnknownFormOrder.FORM_ORDER_2)
    mesh = mf.examples.unit_square_mesh(2, 2, 2)
    with pytest.raises(ValueError, match="not involved"):
        mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system, constrained_forms=[(0.0, other)]),
        )


def test_sample_rate_subsampling():
    from mfv2d_tpu.models import transport

    def steady_u(x, y):
        return np.cos(np.pi * x / 2) * np.cos(np.pi * y / 2)

    model = transport.heat_direct(0.02, 1.0, steady_u)
    mesh = mf.examples.unit_square_mesh(2, 2, 2)
    bc = mf.BoundaryCondition2DSteady(model.u, mesh.boundary_indices, steady_u)
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system, boundary_conditions=[bc]),
        mf.SolverSettings(mf.ConvergenceSettings(10, 1e-9, 0)),
        time_settings=mf.TimeSettings(
            dt=0.1, nt=8, time_march_relations=model.time_march_relations,
            sample_rate=4,
        ),
        recon_order=3,
    )
    # initial + steps 0, 4 (sampled) + final step 7
    assert len(sols) == 4
    times = [float(s.field_data["time"][0]) for s in sols]
    assert times == [0.0, pytest.approx(0.1), pytest.approx(0.5), pytest.approx(0.8)]


def test_upper_order_limit_forces_splits():
    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    model = poisson.mixed_poisson()
    settings = mf.RefinementSettings(
        error_estimate=mf.ErrorEstimateExplicit(model.u, poisson.u_exact),
        refinement_limit=mf.RefinementLimitElementCount(1.0, 2),
        h_refinement_ratio=0.0,
        upper_order_limit=3,  # p already at the cap -> must h-split
    )
    sols, stats, new_mesh = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system),
        refinement_settings=settings,
        recon_order=4,
    )
    assert new_mesh.leaf_count > mesh.leaf_count


def test_tracer_stages(tmp_path):
    """Stage tracing records solve phases and writes the JSONL sink."""
    import json

    from mfv2d_tpu.models import poisson
    from mfv2d_tpu.tracing import tracer

    sink = tmp_path / "trace.jsonl"
    tracer.reset()
    tracer.enable(str(sink))
    try:
        model = poisson.mixed_poisson()
        mesh = mf.examples.unit_square_mesh(2, 2, 2)
        mf.solve_system_2d(mesh, mf.SystemSettings(model.system), recon_order=3)
    finally:
        tracer.disable()
    names = set(tracer.stages)
    assert {"setup", "assembly+constraints", "factorize", "solve+reconstruct"} <= names
    report = tracer.report()
    assert "assembly+constraints" in report
    events = [json.loads(ln) for ln in sink.read_text().splitlines()]
    assert {e["stage"] for e in events} >= {"setup", "factorize"}
    tracer.reset()


def test_anisotropic_orders_solve():
    """Mixed-anisotropy (p1 != p2) mesh converges under h-refinement.

    The p=1-limited interfaces dominate the error, so the check is the
    convergence trend (measured 0.46 / 0.21 / 0.098 at n=2/4/8) rather
    than an absolute threshold.
    """
    model = poisson.mixed_poisson()
    pattern = [[1, 3], [3, 1], [2, 2], [3, 3]]
    errors = []
    for n in (2, 4):
        orders = np.array(
            [pattern[(i + j) % 4] for j in range(n) for i in range(n)]
        )
        mesh = mf.examples.unit_square_mesh(n, n, orders)
        sols, stats, _ = mf.solve_system_2d(
            mesh, mf.SystemSettings(model.system), recon_order=4
        )
        if n == 2:
            # (i+j)%4 over 2x2 yields indices 0,1,1,2 -> three distinct orders
            assert len(stats.element_orders) == 3
        g = sols[-1]
        assert np.all(np.isfinite(g.point_data["u"]))
        errors.append(
            np.sqrt(
                np.mean(
                    (
                        g.point_data["u"]
                        - poisson.u_exact(g.points[:, 0], g.points[:, 1])
                    )
                    ** 2
                )
            )
        )
    assert errors[1] < 0.6 * errors[0], errors


def test_schur_direct_in_picard_loop():
    """schur_direct as the inner solver of a nonlinear Picard iteration."""
    from mfv2d_tpu.models import flow

    model = flow.navier_stokes(5.0)
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    bc = mf.BoundaryCondition2DSteady(
        model.velocity, mesh.boundary_indices, flow.ns_velocity_exact
    )
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system, [bc], [(0.0, model.pressure)]),
        mf.SolverSettings(
            mf.ConvergenceSettings(40, 1e-9, 0), linear_solver="schur_direct"
        ),
        recon_order=6,
    )
    assert int(stats.iter_history[-1]) > 1
    v_ex = flow.ns_velocity_exact(sols[-1].points[:, 0], sols[-1].points[:, 1])
    err = np.sqrt(np.mean(np.sum((sols[-1].point_data["vel"] - v_ex) ** 2, -1)))
    # coarse 3x3 p=3 mesh: discretization error ~1.5e-3
    assert err < 5e-3, err


def test_checkpoint_with_unsteady_bcs():
    """Checkpoint/resume composes with time-dependent boundary values."""
    from mfv2d_tpu.checkpoint import load_march_state

    def exact(x, y, t):
        return np.exp(t) * np.cosh(x)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
    v = u.weight
    system = mf.KFormSystem(v.derivative @ u.derivative == 0 * (v @ u))
    dt, nt = 0.05, 8

    def settings(mesh):
        return mf.SystemSettings(
            system,
            boundary_conditions=[
                mf.BoundaryCondition2DUnsteady(u, mesh.boundary_indices, exact)
            ],
            initial_conditions={u: lambda x, y: np.cosh(x)},
        )

    solver = mf.SolverSettings(mf.ConvergenceSettings(20, 1e-11, 0))
    ts = lambda n: mf.TimeSettings(dt=dt, nt=n, time_march_relations={v: u})  # noqa: E731

    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    full, _, _ = mf.solve_system_2d(
        mesh, settings(mesh), solver, time_settings=ts(nt), recon_order=4
    )

    import tempfile, os
    ckpt = os.path.join(tempfile.mkdtemp(), "m.npz")
    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    mf.solve_system_2d(
        mesh, settings(mesh), solver, time_settings=ts(nt // 2), recon_order=4,
        checkpoint_settings=mf.CheckpointSettings(ckpt, every=nt // 2),
    )
    state = load_march_state(ckpt)
    mesh2 = state["mesh"]
    res, _, _ = mf.solve_system_2d(
        mesh2, settings(mesh2), solver, time_settings=ts(nt), recon_order=4,
        checkpoint_settings=mf.CheckpointSettings(ckpt, resume_from=ckpt),
    )
    assert np.allclose(
        res[-1].point_data["u"], full[-1].point_data["u"], atol=1e-12
    ), np.abs(res[-1].point_data["u"] - full[-1].point_data["u"]).max()


def test_two_strong_bc_forms_share_corners():
    """Two 0-forms with strong BCs must BOTH get corner constraint rows.

    Regression: the corner-dedup set was shared across equations, so the
    second form's corner DoFs silently lost their constraints.
    """

    def ua(x, y):
        return x + 2 * y

    def ub(x, y):
        return 3 * x - y

    a = mf.KFormUnknown("a", mf.UnknownFormOrder.FORM_ORDER_0)
    va = a.weight
    b = mf.KFormUnknown("b", mf.UnknownFormOrder.FORM_ORDER_0)
    vb = b.weight
    system = mf.KFormSystem(
        va.derivative @ a.derivative == 0 * (va @ ua),
        vb.derivative @ b.derivative == 0 * (vb @ ub),
    )
    mesh = mf.examples.unit_square_mesh(2, 2, 2)
    bcs = [
        mf.BoundaryCondition2DSteady(a, mesh.boundary_indices, ua),
        mf.BoundaryCondition2DSteady(b, mesh.boundary_indices, ub),
    ]
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(system, boundary_conditions=bcs),
        mf.SolverSettings(mf.ConvergenceSettings(10, 1e-12, 0)),
    )
    grid = sols[-1]
    x, y = grid.points[:, 0], grid.points[:, 1]
    # Both harmonic solutions with linear boundary data ARE the linear
    # functions; any lost corner row shows up as a boundary error.
    assert np.abs(grid.point_data["a"] - ua(x, y)).max() < 1e-9
    assert np.abs(grid.point_data["b"] - ub(x, y)).max() < 1e-9

"""Unsteady (trapezoidal time march) and nonlinear solve tests."""

import numpy as np
import pytest

import mfv2d_tpu as mf

ALPHA = 0.02
BETA = 1.0


def steady_u(x, y):
    return np.cos(np.pi * x / 2) * np.cos(np.pi * y / 2)


def _solve_heat(nt, t_end=1.0, n=4, p=3):
    """Reaction-diffusion march whose exact solution is s(x,y)(1-e^{-bt})."""
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
    v = u.weight
    system = mf.KFormSystem(
        ALPHA * (v.derivative @ u.derivative)
        == BETA * (v @ steady_u) - (BETA - ALPHA * np.pi**2 / 2) * (v @ u),
    )
    mesh = mf.examples.unit_square_mesh(n, n, p)
    dt = t_end / nt
    solutions, stats, _ = mf.solve_system_2d(
        mesh,
        system_settings=mf.SystemSettings(
            system,
            boundary_conditions=[
                mf.BoundaryCondition2DSteady(u, mesh.boundary_indices, steady_u)
            ],
        ),
        solver_settings=mf.SolverSettings(
            mf.ConvergenceSettings(
                maximum_iterations=20, relative_tolerance=0, absolute_tolerance=1e-10
            )
        ),
        time_settings=mf.TimeSettings(dt=dt, nt=nt, time_march_relations={v: u}),
        recon_order=8,
    )
    return solutions, stats


def _final_error(solutions):
    sol = solutions[-1]
    t = float(sol.field_data["time"][0])
    exact = steady_u(sol.points[:, 0], sol.points[:, 1]) * (1 - np.exp(-BETA * t))
    return float(np.sqrt(np.mean((sol.point_data["u"] - exact) ** 2)))


def test_heat_march_accuracy_and_dt_convergence():
    errors = []
    for nt in (4, 8, 16):
        solutions, stats = _solve_heat(nt)
        errors.append(_final_error(solutions))
        # One output grid per sampled step + initial state.
        assert len(solutions) == nt + 1
        assert float(solutions[0].field_data["time"][0]) == 0.0
        assert np.isclose(float(solutions[-1].field_data["time"][0]), 1.0)
    # Trapezoidal rule: second order in dt.
    rate1 = errors[0] / errors[1]
    rate2 = errors[1] / errors[2]
    assert rate1 > 3.0, errors
    assert rate2 > 3.0, errors
    assert errors[-1] < 1e-3


def test_heat_march_initial_conditions():
    """Start from the exact steady state: the solution must stay there."""
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
    v = u.weight
    # du/dt + alpha lap u = alpha * pi^2/2 * steady -> steady_u is stationary.
    system = mf.KFormSystem(
        ALPHA * (v.derivative @ u.derivative)
        == (ALPHA * np.pi**2 / 2) * (v @ steady_u),
    )
    mesh = mf.examples.unit_square_mesh(4, 4, 4)
    solutions, _, _ = mf.solve_system_2d(
        mesh,
        system_settings=mf.SystemSettings(
            system,
            boundary_conditions=[
                mf.BoundaryCondition2DSteady(u, mesh.boundary_indices, steady_u)
            ],
            initial_conditions={u: steady_u},
        ),
        solver_settings=mf.SolverSettings(
            mf.ConvergenceSettings(
                maximum_iterations=20, relative_tolerance=0, absolute_tolerance=1e-10
            )
        ),
        time_settings=mf.TimeSettings(dt=0.1, nt=5, time_march_relations={v: u}),
        recon_order=8,
    )
    for sol in solutions:
        exact = steady_u(sol.points[:, 0], sol.points[:, 1])
        err = np.max(np.abs(sol.point_data["u"] - exact))
        assert err < 2e-5, err


RE = 10.0


def exact_velocity(x, y):
    return np.stack((np.sin(y) + 0 * x, np.cos(x) + 0 * y), axis=-1)


def exact_vorticity(x, y):
    return -(np.sin(x) + np.cos(y))


def exact_forcing(x, y):
    return np.stack(
        (
            np.cos(x) * np.cos(y) + 1 / RE * np.sin(y),
            -np.sin(x) * np.sin(y) + 1 / RE * np.cos(x),
        ),
        axis=-1,
    )


def test_steady_navier_stokes():
    """Nonlinear steady NS in vorticity-velocity-pressure form.

    Exercises the lowered interior product (solution-dependent field), the
    Picard loop with rhs_codes, and the constrained pressure form.
    """
    pre = mf.KFormUnknown("pre", mf.UnknownFormOrder.FORM_ORDER_2)
    w_pre = pre.weight
    vel = mf.KFormUnknown("vel", mf.UnknownFormOrder.FORM_ORDER_1)
    w_vel = vel.weight
    vor = mf.KFormUnknown("vor", mf.UnknownFormOrder.FORM_ORDER_0)
    w_vor = vor.weight

    system = mf.KFormSystem(
        w_vor.derivative @ vel - w_vor @ vor == w_vor ^ exact_velocity,
        (1 / RE) * (w_vel @ vor.derivative) + w_vel.derivative @ pre
        == w_vel @ exact_forcing - (vel * w_vel @ vor),
        (w_pre @ vel.derivative) == 0,
    )

    mesh = mf.examples.unit_square_mesh(4, 4, 4)
    solutions, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(
            system,
            [mf.BoundaryCondition2DSteady(vel, mesh.boundary_indices, exact_velocity)],
            [(0.0, pre)],
        ),
        solver_settings=mf.SolverSettings(
            mf.ConvergenceSettings(
                maximum_iterations=80, absolute_tolerance=1e-7, relative_tolerance=0
            ),
            # Frozen-operator Picard at Re=10 needs under-relaxation (the
            # reference iteration has the same stability limit).
            relaxation=0.7,
        ),
        recon_order=8,
    )
    sol = solutions[-1]
    # Nonlinear: must have taken more than one iteration, and converged.
    n_it = int(stats.iter_history[-1])
    assert n_it > 1
    assert n_it < 80  # converged before hitting the iteration cap

    v_exact = exact_velocity(sol.points[:, 0], sol.points[:, 1])
    w_exact = exact_vorticity(sol.points[:, 0], sol.points[:, 1])
    err_vel = np.sqrt(np.mean(np.sum((sol.point_data["vel"] - v_exact) ** 2, -1)))
    err_vor = np.sqrt(np.mean((sol.point_data["vor"] - w_exact) ** 2))
    assert err_vel < 1e-4, err_vel
    assert err_vor < 1e-3, err_vor


def test_newton_navier_stokes_high_re():
    """Exact-Jacobian Newton converges where frozen Picard cannot (Re=50)."""
    from mfv2d_tpu.models import flow

    model = flow.navier_stokes(50.0)
    mesh = mf.examples.unit_square_mesh(4, 4, 4)
    bc = mf.BoundaryCondition2DSteady(
        model.velocity, mesh.boundary_indices, flow.ns_velocity_exact
    )
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system, [bc], [(0.0, model.pressure)]),
        mf.SolverSettings(
            mf.ConvergenceSettings(10, 1e-11, 0), method="newton"
        ),
        recon_order=8,
    )
    sol = sols[-1]
    assert int(stats.iter_history[-1]) <= 4  # quadratic convergence
    v_exact = flow.ns_velocity_exact(sol.points[:, 0], sol.points[:, 1])
    err_vel = np.sqrt(np.mean(np.sum((sol.point_data["vel"] - v_exact) ** 2, -1)))
    assert err_vel < 1e-4, err_vel


def test_fused_device_march_matches_host_loop():
    """The on-device scanned march equals the host-loop march exactly."""
    results = {}
    for solver in ("direct", "dense"):
        u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
        v = u.weight
        system = mf.KFormSystem(
            ALPHA * (v.derivative @ u.derivative)
            == (ALPHA * np.pi**2 / 2) * (v @ steady_u),
        )
        mesh = mf.examples.unit_square_mesh(3, 3, 3)
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(
                system,
                boundary_conditions=[
                    mf.BoundaryCondition2DSteady(u, mesh.boundary_indices, steady_u)
                ],
                initial_conditions={u: steady_u},
            ),
            mf.SolverSettings(
                mf.ConvergenceSettings(20, 1e-10, 0), linear_solver=solver
            ),
            time_settings=mf.TimeSettings(
                dt=0.05, nt=6, time_march_relations={v: u}
            ),
            recon_order=5,
        )
        results[solver] = [np.array(s.point_data["u"]) for s in sols]
    assert len(results["direct"]) == len(results["dense"])
    for a, b in zip(results["direct"], results["dense"]):
        assert np.allclose(a, b, atol=1e-9), np.abs(a - b).max()


def test_fused_device_picard_matches_host_loop():
    """On-device while_loop Picard (dense solver) bit-matches the host loop."""
    from mfv2d_tpu.models import flow

    model = flow.navier_stokes(5.0)
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    bc = mf.BoundaryCondition2DSteady(
        model.velocity, mesh.boundary_indices, flow.ns_velocity_exact
    )
    results = {}
    for solver in ("direct", "dense"):
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system, [bc], [(0.0, model.pressure)]),
            mf.SolverSettings(
                mf.ConvergenceSettings(15, 1e-9, 0), linear_solver=solver
            ),
            recon_order=5,
        )
        results[solver] = (
            np.array(sols[-1].point_data["vel"]),
            int(stats.iter_history[-1]),
            np.array(stats.residual_history),
        )
    assert results["direct"][1] == results["dense"][1]
    assert np.allclose(results["direct"][0], results["dense"][0], atol=1e-10)
    assert np.allclose(results["direct"][2], results["dense"][2], rtol=1e-10)


def test_unsteady_boundary_conditions():
    """Heat equation driven by time-dependent Dirichlet data.

    u(x, y, t) = e^t cosh(x) satisfies u_t = lap(u) with no source, so the
    entire dynamics enters through the boundary values; second order in dt.
    """

    def exact(x, y, t):
        return np.exp(t) * np.cosh(x)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
    v = u.weight
    system = mf.KFormSystem(v.derivative @ u.derivative == 0 * (v @ u))
    t_end = 0.5

    def run(nt):
        mesh = mf.examples.unit_square_mesh(4, 4, 4)
        sols, _, _ = mf.solve_system_2d(
            mesh,
            system_settings=mf.SystemSettings(
                system,
                boundary_conditions=[
                    mf.BoundaryCondition2DUnsteady(
                        u, mesh.boundary_indices, exact
                    )
                ],
                initial_conditions={u: lambda x, y: np.cosh(x)},
            ),
            solver_settings=mf.SolverSettings(
                mf.ConvergenceSettings(20, 1e-11, 0)
            ),
            time_settings=mf.TimeSettings(
                dt=t_end / nt, nt=nt, time_march_relations={v: u}
            ),
            recon_order=6,
        )
        sol = sols[-1]
        assert np.isclose(float(sol.field_data["time"][0]), t_end)
        return np.max(
            np.abs(
                sol.point_data["u"] - exact(sol.points[:, 0], sol.points[:, 1], t_end)
            )
        )

    errors = [run(nt) for nt in (8, 16, 32)]
    assert errors[0] / errors[1] > 3.0, errors
    assert errors[1] / errors[2] > 3.0, errors
    assert errors[-1] < 5e-5, errors


def test_unsteady_bc_requires_time_settings():
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
    v = u.weight
    system = mf.KFormSystem(v.derivative @ u.derivative == 0 * (v @ u))
    mesh = mf.examples.unit_square_mesh(2, 2, 2)
    with pytest.raises(ValueError, match="time_settings"):
        mf.solve_system_2d(
            mesh,
            mf.SystemSettings(
                system,
                boundary_conditions=[
                    mf.BoundaryCondition2DUnsteady(
                        u, mesh.boundary_indices, lambda x, y, t: x + t
                    )
                ],
            ),
        )

def test_fused_nonlinear_march_matches_host_loop():
    """Unsteady NS: the device-scanned Picard march equals the host loop."""
    results = {}
    for solver in ("direct", "dense"):
        pre = mf.KFormUnknown("pre", mf.UnknownFormOrder.FORM_ORDER_2)
        w_pre = pre.weight
        vel = mf.KFormUnknown("vel", mf.UnknownFormOrder.FORM_ORDER_1)
        w_vel = vel.weight
        vor = mf.KFormUnknown("vor", mf.UnknownFormOrder.FORM_ORDER_0)
        w_vor = vor.weight
        system = mf.KFormSystem(
            w_vor.derivative @ vel - w_vor @ vor == w_vor ^ exact_velocity,
            (1 / RE) * (w_vel @ vor.derivative) + w_vel.derivative @ pre
            == w_vel @ exact_forcing - (vel * w_vel @ vor),
            (w_pre @ vel.derivative) == 0,
        )
        mesh = mf.examples.unit_square_mesh(3, 3, 3)
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(
                system,
                [
                    mf.BoundaryCondition2DSteady(
                        vel, mesh.boundary_indices, exact_velocity
                    )
                ],
                [(0.0, pre)],
            ),
            mf.SolverSettings(
                mf.ConvergenceSettings(30, 1e-9, 0), linear_solver=solver
            ),
            time_settings=mf.TimeSettings(
                dt=0.05, nt=4, time_march_relations={w_vel: vel}
            ),
            recon_order=5,
        )
        results[solver] = (
            [np.array(s.point_data["vel"]) for s in sols],
            np.asarray(stats.iter_history),
        )
    sols_a, iters_a = results["direct"]
    sols_b, iters_b = results["dense"]
    assert np.array_equal(iters_a, iters_b), (iters_a, iters_b)
    assert int(iters_a[-1]) > 1  # actually nonlinear
    for a, b in zip(sols_a, sols_b):
        assert np.allclose(a, b, atol=1e-9), np.abs(a - b).max()

def test_fused_newton_matches_host_newton():
    """Steady NS Re=50: device-fused Newton equals the host Newton loop."""
    from mfv2d_tpu.models import flow

    results = {}
    for solver in ("direct", "dense"):
        model = flow.navier_stokes(50.0)
        mesh = mf.examples.unit_square_mesh(3, 3, 4)
        bc = mf.BoundaryCondition2DSteady(
            model.velocity, mesh.boundary_indices, flow.ns_velocity_exact
        )
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system, [bc], [(0.0, model.pressure)]),
            mf.SolverSettings(
                mf.ConvergenceSettings(10, 1e-11, 0),
                method="newton",
                linear_solver=solver,
            ),
            recon_order=6,
        )
        results[solver] = (
            np.array(sols[-1].point_data["vel"]),
            int(stats.iter_history[-1]),
        )
    vel_a, it_a = results["direct"]
    vel_b, it_b = results["dense"]
    assert it_a == it_b, (it_a, it_b)
    assert it_a <= 5  # quadratic convergence
    assert np.allclose(vel_a, vel_b, atol=1e-8), np.abs(vel_a - vel_b).max()

def test_fused_newton_march_matches_host():
    """Unsteady NS with Newton: the fused march equals the host loop."""
    results = {}
    for solver in ("direct", "dense"):
        pre = mf.KFormUnknown("pre", mf.UnknownFormOrder.FORM_ORDER_2)
        w_pre = pre.weight
        vel = mf.KFormUnknown("vel", mf.UnknownFormOrder.FORM_ORDER_1)
        w_vel = vel.weight
        vor = mf.KFormUnknown("vor", mf.UnknownFormOrder.FORM_ORDER_0)
        w_vor = vor.weight
        system = mf.KFormSystem(
            w_vor.derivative @ vel - w_vor @ vor == w_vor ^ exact_velocity,
            (1 / RE) * (w_vel @ vor.derivative) + w_vel.derivative @ pre
            == w_vel @ exact_forcing - (vel * w_vel @ vor),
            (w_pre @ vel.derivative) == 0,
        )
        mesh = mf.examples.unit_square_mesh(3, 3, 3)
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(
                system,
                [
                    mf.BoundaryCondition2DSteady(
                        vel, mesh.boundary_indices, exact_velocity
                    )
                ],
                [(0.0, pre)],
            ),
            mf.SolverSettings(
                mf.ConvergenceSettings(15, 1e-10, 0),
                linear_solver=solver,
                method="newton",
            ),
            time_settings=mf.TimeSettings(
                dt=0.1, nt=3, time_march_relations={w_vel: vel}
            ),
            recon_order=5,
        )
        results[solver] = (
            np.array(sols[-1].point_data["vel"]),
            np.asarray(stats.iter_history),
        )
    vel_a, it_a = results["direct"]
    vel_b, it_b = results["dense"]
    assert np.array_equal(it_a, it_b), (it_a, it_b)
    assert int(it_a[0]) > 1
    assert np.allclose(vel_a, vel_b, atol=1e-8), np.abs(vel_a - vel_b).max()

def test_time_dependent_forcing():
    """Heat march with a TimeDependent source: second order in dt.

    u(x, y, t) = sin(t) phi with phi = cos(pi x/2) cos(pi y/2);
    u_t = alpha lap(u) + f requires f = cos(t) phi + alpha pi^2/2 sin(t) phi.
    """
    ALPHA_ = 0.7

    def phi(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def source(x, y, t):
        return (np.cos(t) + ALPHA_ * np.pi**2 / 2 * np.sin(t)) * phi(x, y)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
    v = u.weight
    system = mf.KFormSystem(
        ALPHA_ * (v.derivative @ u.derivative) == v @ mf.TimeDependent(source),
    )
    t_end = 1.0

    def run(nt):
        mesh = mf.examples.unit_square_mesh(4, 4, 4)
        bc = mf.BoundaryCondition2DSteady(
            u, mesh.boundary_indices, lambda x, y: 0.0 * x
        )
        sols, _, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(system, boundary_conditions=[bc]),
            mf.SolverSettings(mf.ConvergenceSettings(20, 1e-11, 0)),
            time_settings=mf.TimeSettings(
                dt=t_end / nt, nt=nt, time_march_relations={v: u}
            ),
            recon_order=6,
        )
        g = sols[-1]
        exact = np.sin(t_end) * phi(g.points[:, 0], g.points[:, 1])
        return np.max(np.abs(g.point_data["u"] - exact))

    errors = [run(nt) for nt in (8, 16, 32)]
    assert errors[0] / errors[1] > 3.0, errors
    assert errors[1] / errors[2] > 3.0, errors
    assert errors[-1] < 2e-4, errors


def test_time_dependent_requires_time_settings():
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
    v = u.weight
    system = mf.KFormSystem(
        v.derivative @ u.derivative == v @ mf.TimeDependent(lambda x, y, t: x + t),
    )
    mesh = mf.examples.unit_square_mesh(2, 2, 2)
    with pytest.raises(ValueError, match="TimeDependent"):
        mf.solve_system_2d(mesh, mf.SystemSettings(system))

def test_time_dependent_operator_field_guards():
    """TD operator fields: steady solves and VMS marches still fail loudly.

    Round 5 added per-step reassembly for TimeDependent interior-product
    fields in single-device marches (see the convergence test below); the
    remaining loud guards are a STEADY solve (no time to evaluate at) and
    a VMS march (the fine-scale operator would need per-step rebuild).
    """
    from mfv2d_tpu.models import transport

    wind = mf.TimeDependent(lambda x, y, t: np.stack((x + t, y), axis=-1))
    model = transport.linear_advection_diffusion(
        0.1, wind, lambda x, y: 0.0 * x, lambda x, y: 0.0 * x
    )
    mesh = mf.examples.unit_square_mesh(2, 2, 2)
    with pytest.raises(ValueError, match="require time_settings"):
        mf.solve_system_2d(mesh, mf.SystemSettings(model.system))
    u, q = model.u, model.q
    sym = mf.KFormSystem(
        q.weight.derivative @ u - q.weight @ q == 0 * (q.weight @ q),
        0.1 * (u.weight @ q.derivative) == 0 * (u.weight @ u),
    )
    with pytest.raises(NotImplementedError, match="vms"):
        mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system, over_integration_order=2),
            time_settings=mf.TimeSettings(
                0.1, 2, {model.u.weight: model.u}
            ),
            vms_settings=mf.VMSSettings(
                symmetric_system=sym,
                nonsymmetric_system=model.system,
                order_increase=2,
                fine_scale_convergence=mf.ConvergenceSettings(5, 1e-8, 1e-6),
            ),
        )


def test_fused_march_sampling_matches_dense_steps():
    """sample_rate > 1 stores only sampled steps, bit-equal to full output."""
    from mfv2d_tpu.models import transport

    model = transport.reaction(1.0, lambda x, y: 0 * x + 1.0)
    mesh = mf.examples.unit_square_mesh(2, 2, 2)
    settings_full = mf.TimeSettings(
        dt=0.05, nt=7, time_march_relations=model.time_march_relations
    )
    settings_s3 = mf.TimeSettings(
        dt=0.05, nt=7, time_march_relations=model.time_march_relations,
        sample_rate=3,
    )
    solver = mf.SolverSettings(
        mf.ConvergenceSettings(20, 1e-10, 0), linear_solver="dense"
    )
    sols_full, _, _ = mf.solve_system_2d(
        mesh, mf.SystemSettings(model.system), solver,
        time_settings=settings_full, recon_order=3,
    )
    mesh2 = mf.examples.unit_square_mesh(2, 2, 2)
    sols_s3, _, _ = mf.solve_system_2d(
        mesh2, mf.SystemSettings(model.system), solver,
        time_settings=settings_s3, recon_order=3,
    )
    # Steps 0,3,6 are sampled; the final step (index 6) coincides here.
    times_s3 = [float(g.field_data["time"][0]) for g in sols_s3]
    assert np.allclose(times_s3, [0.0, 0.05, 0.2, 0.35])
    full_by_time = {round(float(g.field_data["time"][0]), 9): g for g in sols_full}
    for g in sols_s3[1:]:
        ref = full_by_time[round(float(g.field_data["time"][0]), 9)]
        assert np.allclose(g.point_data["u"], ref.point_data["u"], atol=1e-13)


def test_fused_march_anderson_converges_same():
    """In-trace Anderson in the fused nonlinear march: same solutions,
    no more iterations than plain Picard."""
    from mfv2d_tpu.models import flow
    from mfv2d_tpu.solver.solve import TimeSettings

    def lid(x, y):
        on = np.isclose(y, 1.0)
        return np.stack((np.where(on, 1.0, 0.0), np.zeros_like(y)), axis=-1)

    model = flow.cavity_flow(10.0, lid)

    def run(m):
        mesh = mf.examples.unit_square_mesh(2, 2, 3)
        bc = mf.BoundaryCondition2DSteady(
            model.velocity, mesh.boundary_indices, lid
        )
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(
                model.system,
                boundary_conditions=[bc],
                constrained_forms=[(0.0, model.pressure)],
            ),
            mf.SolverSettings(
                mf.ConvergenceSettings(30, 1e-9, 0),
                linear_solver="dense",
                anderson_m=m,
            ),
            time_settings=TimeSettings(
                dt=0.25, nt=3, time_march_relations=model.time_march_relations
            ),
            recon_order=4,
        )
        return np.asarray(sols[-1].point_data["vel"]), stats.iter_history

    u0, it0 = run(0)
    u3, it3 = run(3)
    assert int(np.sum(it3)) <= int(np.sum(it0))
    assert np.allclose(u3, u0, atol=1e-8)


def test_time_dependent_operator_field_convergence():
    """March with a time-VARYING advecting wind: second order in dt.

    u(x, y, t) = sin(t) phi, wind = (cos(t), 0); the march re-evaluates
    the interior-product field, re-assembles, and re-factorizes at every
    time level (round-5 closure of the TimeDependent-operator guard;
    reference interior-product machinery:
    src/evaluation/integrating_fields.c:13-353).
    """
    NU = 0.8

    def phi(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def wind(x, y, t):
        return np.stack(
            (np.cos(t) * np.ones_like(x), np.zeros_like(y)), axis=-1
        )

    def phi_x(x, y):
        return -np.pi / 2 * np.sin(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def source(x, y, t):
        # Empirically pinned convention of this mixed form (sign probe,
        # round 5): the marched system encodes
        #   u_t = nu lap u + wind . grad u - f,
        # so f = nu lap u + wind . grad u - u_t for the manufactured u.
        return (
            np.sin(t) * (-NU * np.pi**2 / 2) * phi(x, y)
            + np.sin(t) * np.cos(t) * phi_x(x, y)
            - np.cos(t) * phi(x, y)
        )

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    p = q.weight
    system = mf.KFormSystem(
        p.derivative @ u - p @ q == p ^ (lambda x, y: 0.0 * x),
        NU * (v @ q.derivative) - (mf.TimeDependent(wind) * v @ q)
        == -(v @ mf.TimeDependent(source)),
    )
    t_end = 1.0

    def run(nt):
        mesh = mf.examples.unit_square_mesh(4, 4, 6)
        sols, _, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(system),
            mf.SolverSettings(mf.ConvergenceSettings(20, 1e-11, 0)),
            time_settings=mf.TimeSettings(
                dt=t_end / nt, nt=nt, time_march_relations={v: u}
            ),
            recon_order=6,
        )
        g = sols[-1]
        exact = np.sin(t_end) * phi(g.points[:, 0], g.points[:, 1])
        return np.max(np.abs(g.point_data["u"] - exact))

    errors = [run(nt) for nt in (8, 16)]
    assert errors[0] / errors[1] > 3.0, errors
    assert errors[1] < 5e-4, errors


def test_time_dependent_operator_field_constant_matches_steady():
    """A constant-in-time TimeDependent wind reproduces the steady-wind march."""

    def phi(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def steady_wind(x, y):
        return np.stack((0.5 + 0.0 * x, -0.25 + 0.0 * y), axis=-1)

    def src(x, y):
        return phi(x, y)

    def build(wind):
        u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
        v = u.weight
        q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
        p = q.weight
        system = mf.KFormSystem(
            p.derivative @ u - p @ q == p ^ (lambda x, y: 0.0 * x),
            0.7 * (v @ q.derivative) - (wind * v @ q) == -(v @ src),
        )
        return system, u, v

    def run(wind):
        system, u, v = build(wind)
        mesh = mf.examples.unit_square_mesh(3, 3, 3)
        sols, _, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(system),
            mf.SolverSettings(mf.ConvergenceSettings(20, 1e-11, 0)),
            time_settings=mf.TimeSettings(
                dt=0.25, nt=3, time_march_relations={v: u}
            ),
            recon_order=4,
        )
        return sols[-1].point_data["u"]

    a = run(steady_wind)
    b = run(mf.TimeDependent(lambda x, y, t: steady_wind(x, y)))
    assert np.allclose(a, b, atol=1e-12), np.abs(a - b).max()

"""Model-family smoke/accuracy tests: Stokes, advection-diffusion, reaction."""

import numpy as np
import pytest

import mfv2d_tpu as mf
from mfv2d_tpu.models import flow, poisson, transport


def test_stokes_flow():
    model = flow.stokes_flow()
    mesh = mf.examples.unit_square_mesh(4, 4, 4)
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        # No pressure constraint: the weak pressure boundary term already
        # fixes the pressure level (reference plot_stokes_flow.py).
        mf.SystemSettings(model.system),
        mf.SolverSettings(
            mf.ConvergenceSettings(absolute_tolerance=1e-10, relative_tolerance=0)
        ),
        recon_order=8,
    )
    sol = sols[-1]
    v_exact = flow.stokes_velocity_exact(sol.points[:, 0], sol.points[:, 1])
    err_vel = np.sqrt(np.mean(np.sum((sol.point_data["vel"] - v_exact) ** 2, -1)))
    assert err_vel < 1e-3, err_vel
    # Divergence extraction should be ~0 for this solenoidal field.
    assert np.max(np.abs(sol.point_data["div"])) < 1e-6


def test_linear_advection_diffusion():
    """Reference plot_linear_adv_dif.py setup with its manufactured fields."""
    NU = -0.05

    def wind(x, y):
        return np.stack(((3 * y - x), (2 - y + 0 * x)), axis=-1)

    def u_ex(x, y):
        return 2 * np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def q_ex(x, y):
        return np.stack(
            (
                -np.pi * np.sin(np.pi / 2 * x) * np.cos(np.pi / 2 * y),
                -np.pi * np.cos(np.pi / 2 * x) * np.sin(np.pi / 2 * y),
            ),
            axis=-1,
        )

    def source(x, y):
        return (
            np.sum(wind(x, y) * q_ex(x, y), axis=-1)
            - NU * np.pi**2 * u_ex(x, y) / 2
        )

    model = transport.linear_advection_diffusion(NU, wind, u_ex, source)
    mesh = mf.examples.unit_square_mesh(4, 4, 5)
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system),
        mf.SolverSettings(
            mf.ConvergenceSettings(absolute_tolerance=1e-10, relative_tolerance=0)
        ),
        recon_order=8,
    )
    sol = sols[-1]
    err = np.sqrt(
        np.mean((sol.point_data["u"] - u_ex(sol.points[:, 0], sol.points[:, 1])) ** 2)
    )
    assert err < 5e-3, err


def test_reaction_march_scalar():
    ALPHA = 1.5

    def final_u(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    model = transport.reaction(ALPHA, final_u)
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    t_end = 1.0
    nt = 32
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system),
        mf.SolverSettings(mf.ConvergenceSettings(20, 1e-10, 0)),
        time_settings=mf.TimeSettings(
            dt=t_end / nt, nt=nt, time_march_relations=model.time_march_relations
        ),
        recon_order=6,
    )
    sol = sols[-1]
    t = float(sol.field_data["time"][0])
    exact = final_u(sol.points[:, 0], sol.points[:, 1]) * (1 - np.exp(-ALPHA * t))
    err = np.max(np.abs(sol.point_data["u"] - exact))
    assert err < 1e-3, err


def test_vector_reaction_march():
    ALPHA = 2.0

    def final_u(x, y):
        return np.stack((np.sin(y), np.cos(x)), axis=-1)

    model = transport.reaction(ALPHA, final_u, mf.UnknownFormOrder.FORM_ORDER_1)
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    nt = 32
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system),
        mf.SolverSettings(mf.ConvergenceSettings(20, 1e-10, 0)),
        time_settings=mf.TimeSettings(
            dt=1.0 / nt, nt=nt, time_march_relations=model.time_march_relations
        ),
        recon_order=6,
    )
    sol = sols[-1]
    exact = final_u(sol.points[:, 0], sol.points[:, 1]) * (1 - np.exp(-ALPHA * 1.0))
    err = np.max(np.abs(sol.point_data["u"] - exact))
    assert err < 3e-3, err


def test_heat_mixed_march():
    ALPHA, BETA = 0.02, 1.0

    def steady_u(x, y):
        return np.cos(np.pi * x / 2) * np.cos(np.pi * y / 2)

    model = transport.heat_mixed(ALPHA, BETA, steady_u)
    mesh = mf.examples.unit_square_mesh(4, 4, 3)
    nt = 16
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system),
        mf.SolverSettings(mf.ConvergenceSettings(20, 1e-10, 0)),
        time_settings=mf.TimeSettings(
            dt=1.0 / nt, nt=nt, time_march_relations=model.time_march_relations
        ),
        recon_order=6,
    )
    sol = sols[-1]
    exact = steady_u(sol.points[:, 0], sol.points[:, 1]) * (1 - np.exp(-BETA))
    err = np.sqrt(np.mean((sol.point_data["u"] - exact) ** 2))
    assert err < 5e-3, err


def test_model_poisson_library():
    model = poisson.mixed_poisson()
    mesh = mf.examples.unit_square_mesh(4, 4, 4)
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system),
        mf.SolverSettings(mf.ConvergenceSettings(100, 1e-10, 0)),
        recon_order=8,
    )
    sol = sols[-1]
    err = np.sqrt(
        np.mean(
            (
                sol.point_data["u"]
                - poisson.u_exact(sol.points[:, 0], sol.points[:, 1])
            )
            ** 2
        )
    )
    assert err < 1e-3

"""Checkpoint/resume: mesh serialization and split time marches."""

import numpy as np

import mfv2d_tpu as mf
from mfv2d_tpu.checkpoint import (
    load_march_state,
    load_mesh,
    mesh_from_arrays,
    mesh_to_arrays,
    save_mesh,
)
from mfv2d_tpu.models import transport


def test_mesh_roundtrip(tmp_path):
    mesh = mf.examples.unit_square_mesh(3, 2, 2)
    mesh.split_element(1, (1, 1), (2, 1), (1, 2), (2, 2))
    path = tmp_path / "mesh.npz"
    save_mesh(path, mesh)
    back = load_mesh(path)

    assert back.element_count == mesh.element_count
    assert back.leaf_count == mesh.leaf_count
    assert np.array_equal(back.boundary_indices, mesh.boundary_indices)
    assert np.all(back.get_leaf_indices() == mesh.get_leaf_indices())
    for idx in mesh.get_leaf_indices():
        idx = int(idx)
        assert np.array_equal(back.get_leaf_corners(idx), mesh.get_leaf_corners(idx))
        assert back.get_leaf_orders(idx) == mesh.get_leaf_orders(idx)
        assert back.get_element_parent(idx) == mesh.get_element_parent(idx)
    # dual topology reconstructed identically
    for i in range(1, mesh.dual.n_lines + 1):
        assert back.dual.get_line(i) == mesh.dual.get_line(i)


def test_mesh_roundtrip_is_solvable(tmp_path):
    """A reloaded mesh must drive a solve to the same answer."""
    from mfv2d_tpu.models import poisson

    model = poisson.mixed_poisson()
    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    back = mesh_from_arrays(mesh_to_arrays(mesh))
    kw = dict(recon_order=4)
    sols_a, _, _ = mf.solve_system_2d(mesh, mf.SystemSettings(model.system), **kw)
    sols_b, _, _ = mf.solve_system_2d(back, mf.SystemSettings(model.system), **kw)
    assert np.allclose(
        sols_a[-1].point_data["u"], sols_b[-1].point_data["u"], atol=1e-12
    )


def test_march_checkpoint_resume(tmp_path):
    """nt=4 march + resume to nt=8 bit-matches a single nt=8 march."""
    ALPHA = 1.5

    def final_u(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    model = transport.reaction(ALPHA, final_u)
    nt, t_end = 8, 0.5
    dt = t_end / nt
    settings = lambda n: mf.TimeSettings(  # noqa: E731
        dt=dt, nt=n, time_march_relations=model.time_march_relations
    )
    solver = mf.SolverSettings(mf.ConvergenceSettings(20, 1e-10, 0))
    ckpt = tmp_path / "march.npz"

    # Reference: one uninterrupted nt=8 march.
    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    sols_full, _, _ = mf.solve_system_2d(
        mesh, mf.SystemSettings(model.system), solver,
        time_settings=settings(nt), recon_order=4,
    )

    # First half: nt=4 with a checkpoint at the end.
    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    mf.solve_system_2d(
        mesh, mf.SystemSettings(model.system), solver,
        time_settings=settings(nt // 2), recon_order=4,
        checkpoint_settings=mf.CheckpointSettings(str(ckpt), every=4),
    )
    state = load_march_state(ckpt)
    assert state["time_index"] == nt // 2
    assert state["dt"] == dt

    # Second half: resume to nt=8.
    mesh2 = state["mesh"]
    sols_res, _, _ = mf.solve_system_2d(
        mesh2, mf.SystemSettings(model.system), solver,
        time_settings=settings(nt), recon_order=4,
        checkpoint_settings=mf.CheckpointSettings(
            str(ckpt), every=4, resume_from=str(ckpt)
        ),
    )
    assert float(sols_res[-1].field_data["time"][0]) == t_end
    assert np.allclose(
        sols_res[-1].point_data["u"], sols_full[-1].point_data["u"], atol=1e-13
    ), np.abs(sols_res[-1].point_data["u"] - sols_full[-1].point_data["u"]).max()

    # The resumed run's FIRST grid must show the restored state at its
    # checkpointed time, not a fresh zero/IC state at t=0.
    assert float(sols_res[0].field_data["time"][0]) == nt // 2 * dt
    mid_full = next(
        g for g in sols_full if float(g.field_data["time"][0]) == nt // 2 * dt
    )
    assert np.allclose(
        sols_res[0].point_data["u"], mid_full.point_data["u"], atol=1e-13
    )


def test_resume_rejects_wrong_mesh(tmp_path):
    import pytest

    ALPHA = 1.0
    model = transport.reaction(ALPHA, lambda x, y: x * 0 + 1.0)
    settings = mf.TimeSettings(
        dt=0.1, nt=2, time_march_relations=model.time_march_relations
    )
    ckpt = tmp_path / "m.npz"
    mesh = mf.examples.unit_square_mesh(2, 2, 2)
    mf.solve_system_2d(
        mesh, mf.SystemSettings(model.system), time_settings=settings,
        checkpoint_settings=mf.CheckpointSettings(str(ckpt), every=2),
    )
    bigger = mf.examples.unit_square_mesh(3, 3, 2)
    with pytest.raises(ValueError, match="DoF count"):
        mf.solve_system_2d(
            bigger, mf.SystemSettings(model.system), time_settings=settings,
            checkpoint_settings=mf.CheckpointSettings(
                str(ckpt), resume_from=str(ckpt)
            ),
        )


def test_steady_checkpoint_resume_vms(tmp_path):
    """An interrupted steady VMS Picard solve resumes to the same answer.

    Run A: full solve.  Run B: capped at 4 Picard iterations with
    per-iteration checkpointing, then resumed from the checkpoint with the
    full budget.  The resumed iterate sequence replays the uninterrupted
    one, so the final solutions must agree to solver tolerance.
    """
    from mfv2d_tpu.checkpoint import CheckpointSettings, load_steady_state

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

    nu = -1.0

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

    def run(max_iters, ckpt):
        mesh = mf.examples.unit_square_mesh(3, 3, 3)
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system, over_integration_order=3),
            mf.SolverSettings(
                mf.ConvergenceSettings(max_iters, 1e-9, 0),
                linear_solver="schur_direct",
            ),
            vms_settings=mf.VMSSettings(
                symmetric_system=symmetric,
                nonsymmetric_system=model.system,
                order_increase=2,
                fine_scale_convergence=mf.ConvergenceSettings(10, 1e-10, 1e-8),
                matrix_free=True,
            ),
            recon_order=4,
            checkpoint_settings=ckpt,
        )
        grid = sols[-1]
        return (
            np.asarray(grid.point_data["u"]),
            np.asarray(grid.point_data["vms-u"]),
            int(stats.iter_history[0]),
        )

    u_full, vms_full, iters_full = run(40, None)
    assert iters_full > 4  # the interruption below really cuts it short

    path = str(tmp_path / "steady.npz")
    ckpt = CheckpointSettings(path, every=1, resume_from=path)
    run(4, ckpt)  # "crash" after 4 iterations
    st = load_steady_state(path)
    assert st["iteration"] == 4 and st["fine_scales"] is not None

    u_res, vms_res, iters_res = run(40, ckpt)  # resume to convergence
    assert iters_res < iters_full  # picked up mid-way, not from scratch
    assert np.allclose(u_res, u_full, atol=1e-9)
    assert np.allclose(vms_res, vms_full, atol=1e-10)
    # Cumulative bookkeeping spans both attempts.
    st = load_steady_state(path)
    assert st["iteration"] == 4 + iters_res

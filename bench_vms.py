"""BASELINE config 5: nonlinear steady flow with VMS at p=8 (64x64 target).

Runs the Burgers-type nonlinear flow (models.transport.nonlinear_flow,
the scalar analogue of the Navier-Stokes momentum nonlinearity) with
matrix-free VMS fine-scale estimation (order_increase=2) through the
production solve path, on whatever backend JAX selects (the TPU in the
bench sandbox — the round-2 scaling points ran host-only).

    python bench_vms.py            # 64x64 p=8 (+2 fine): BASELINE config 5
    MFV2D_TPU_VMS_NH=32 python bench_vms.py   # smaller scaling point

Prints one JSON line: wall time, solution error, |vms| fine-scale
magnitude, backend, and the mesh/order config.

Reference anchor: tests/test_vms.py:25-54 scaled per BASELINE.json
(config "High-order nonlinear steady flow with VMS stabilization at p=8
on 64x64 mesh").
"""

import json
import os
import time

import numpy as np

import jax  # noqa: E402  (sandbox sitecustomize preloads the TPU platform)
import mfv2d_tpu as mf
from mfv2d_tpu.models import transport

NU = -1.0


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
    return np.sum(q_exact(x, y) ** 2, axis=-1) - NU * np.pi**2 * u_exact(x, y) / 2


def main() -> None:
    nh = int(os.environ.get("MFV2D_TPU_VMS_NH", "64"))
    p = int(os.environ.get("MFV2D_TPU_VMS_P", "8"))
    dk = 2
    model = transport.nonlinear_flow(NU, u_exact, source_exact)
    u, q = model.u, model.q
    v, pw = u.weight, q.weight
    symmetric = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        NU * (v @ q.derivative) == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(nh, nh, p)
    # Per-iteration Picard checkpointing: a relay crash hours into the
    # config-5 run resumes from the last completed iteration instead of
    # restarting (MFV2D_TPU_VMS_CKPT=/path.npz; retry harnesses pass the
    # same path every attempt — a missing file just starts fresh).
    ckpt_path = os.environ.get("MFV2D_TPU_VMS_CKPT")
    ckpt = None
    resumed_iters = 0
    if ckpt_path:
        from mfv2d_tpu.checkpoint import CheckpointSettings, load_steady_state

        ckpt = CheckpointSettings(ckpt_path, every=1, resume_from=ckpt_path)
        if os.path.exists(ckpt_path):
            resumed_iters = load_steady_state(ckpt_path)["iteration"]
    t0 = time.time()
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system, over_integration_order=3),
        mf.SolverSettings(
            mf.ConvergenceSettings(40, 1e-9, 0),
            linear_solver="schur_direct",
            # Anderson window (0 = plain Picard).  Default 3: the direct
            # config-5 A/B measured 13 Picard iterations / rms 5.44e-13
            # with m=3 vs 17 / 8.61e-13 plain — Anderson recovers the
            # fast early-transient branch deterministically (the window
            # restarts on residual growth, so the worst case is plain
            # Picard), and the historical 13-iteration runs reproduce
            # digit-for-digit.
            anderson_m=int(os.environ.get("MFV2D_TPU_VMS_ANDERSON", "3")),
        ),
        vms_settings=mf.VMSSettings(
            symmetric_system=symmetric,
            nonsymmetric_system=model.system,
            order_increase=dk,
            fine_scale_convergence=mf.ConvergenceSettings(10, 1e-10, 1e-8),
            matrix_free=True,
            # A/B knob for the adaptive unresolved-scale tolerance
            # schedule (default on; 0 = fixed tolerance every iteration).
            inexact_forcing=os.environ.get("MFV2D_TPU_VMS_INEXACT", "1") != "0",
        ),
        recon_order=8,
        print_residual=True,  # per-Picard progress (stall detection)
        checkpoint_settings=ckpt,
    )
    wall = time.time() - t0
    grid = sols[-1]
    x, y = grid.points[:, 0], grid.points[:, 1]
    err = float(np.sqrt(np.mean((grid.point_data["u"] - u_exact(x, y)) ** 2)))
    vms_mag = float(np.abs(grid.point_data["vms-u"]).max())
    print(
        json.dumps(
            {
                "metric": "vms_nonlinear_flow_seconds",
                "config": f"{nh}x{nh}_p{p}_plus{dk}",
                "value": round(wall, 1),
                "unit": "s",
                "solution_rms_err": err,
                "vms_magnitude": vms_mag,
                "backend": jax.default_backend(),
                "n_elements": nh * nh,
                "fine_dofs": nh * nh * (
                    (p + dk) * (p + dk + 1) * 2 + (p + dk) ** 2
                ),
                "picard_iters": int(stats.iter_history[0]),
                "resumed_from_iteration": resumed_iters,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Unsteady 1-form (vector) reaction march (ref: plot_vector_reaction.py)."""

import sys
from pathlib import Path

_here = Path(__file__).resolve()
sys.path.insert(0, str(_here.parents[1]))  # examples/ for common
sys.path.insert(0, str(_here.parents[2]))  # repo root for mfv2d_tpu
import numpy as np
from common import report, save_convergence_figure, save_field_figure

import mfv2d_tpu as mf
from mfv2d_tpu.models import transport

ALPHA = 2.0


def final_u(x, y):
    return np.stack((np.sin(y), np.cos(x)), axis=-1)


def main():
    model = transport.reaction(ALPHA, final_u, mf.UnknownFormOrder.FORM_ORDER_1)
    dts, errs = [], []
    for nt in (16, 64):
        mesh = mf.examples.unit_square_mesh(6, 6, 3)
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
        exact = final_u(sol.points[:, 0], sol.points[:, 1]) * (1 - np.exp(-ALPHA))
        err = float(np.max(np.abs(sol.point_data["u"] - exact)))
        report(f"vector_reaction nt={nt}", err=err)
        dts.append(1.0 / nt)
        errs.append(err)
    save_convergence_figure(dts, errs, __file__, xlabel="dt", logx=True,
                            title="Vector reaction: dt-convergence")
    save_field_figure(sol, "u", __file__, title="Vector reaction: |u(T)|")


if __name__ == "__main__":
    main()

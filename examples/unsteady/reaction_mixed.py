"""Unsteady 2-form reaction march with flux (ref: plot_reaction_mixed.py)."""

import sys
from pathlib import Path

_here = Path(__file__).resolve()
sys.path.insert(0, str(_here.parents[1]))  # examples/ for common
sys.path.insert(0, str(_here.parents[2]))  # repo root for mfv2d_tpu
import numpy as np
from common import report, save_convergence_figure, save_field_figure

import mfv2d_tpu as mf
from mfv2d_tpu.models import transport

ALPHA = 1.5


def final_u(x, y):
    return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)


def main():
    model = transport.reaction_mixed(ALPHA, final_u)
    dts, errs = [], []
    for nt in (8, 32):
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
        err = float(np.sqrt(np.mean((sol.point_data["u"] - exact) ** 2)))
        report(f"reaction_mixed nt={nt}", err=err)
        dts.append(1.0 / nt)
        errs.append(err)
    save_convergence_figure(dts, errs, __file__, xlabel="dt", logx=True,
                            title="Reaction (mixed): dt-convergence")
    save_field_figure(sol, "u", __file__, title="Reaction (mixed): u(T)")


if __name__ == "__main__":
    main()

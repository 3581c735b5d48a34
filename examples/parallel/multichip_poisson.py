"""Multi-chip steady solve through the main entry point.

Shards the element batch of a mixed Poisson solve over a
``jax.sharding.Mesh`` via ``SolverSettings(device_mesh=...)``: assembly,
the Picard residual, and the trace-Schur Krylov all run element-sharded,
with one trace ``psum`` per matvec riding the ICI (see docs/parallel.md).
Uses every device the runtime exposes (one on the single-chip bench; the
test suite validates the same path on an 8-device virtual CPU mesh).
"""

import sys
from pathlib import Path

_here = Path(__file__).resolve()
sys.path.insert(0, str(_here.parents[1]))  # examples/ for common
sys.path.insert(0, str(_here.parents[2]))  # repo root for mfv2d_tpu
import numpy as np
from common import curved_square_deformation, l2_point_error, report, save_field_figure

import jax
from jax.sharding import Mesh

import mfv2d_tpu as mf
from mfv2d_tpu.models import poisson


def main():
    devices = np.array(jax.devices())
    device_mesh = Mesh(devices, axis_names=("e",))
    model = poisson.mixed_poisson()
    for p in (3, 4):
        mesh = mf.examples.unit_square_mesh(
            6, 6, p, deformation=curved_square_deformation
        )
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system),
            mf.SolverSettings(
                mf.ConvergenceSettings(
                    absolute_tolerance=1e-10, relative_tolerance=0
                ),
                device_mesh=device_mesh,
            ),
            recon_order=10,
        )
        grid = sols[-1]
        report(
            f"multichip_poisson p={p} devices={devices.size}",
            l2_u=l2_point_error(grid, "u", poisson.u_exact),
            h1_q=l2_point_error(grid, "q", poisson.grad_u_exact),
        )
    save_field_figure(grid, "u", __file__, title="Multi-chip Poisson: u")


if __name__ == "__main__":
    main()

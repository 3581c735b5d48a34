"""Shared helpers for the example gallery (headless-friendly).

The reference gallery renders with pyvista/matplotlib; these examples print
error measures instead (and plot only when the libraries are available), so
the whole gallery runs in CI containers and doubles as a regression suite.
"""

from __future__ import annotations

import os

import jax
import numpy as np

# The gallery problems are small host-bound solves; default to the CPU
# backend (native f64) unless the user explicitly requests otherwise with
# MFV2D_EXAMPLES_PLATFORM=tpu.  NOTE: common must be imported before
# mfv2d_tpu in each example for this to take effect early.
if os.environ.get("MFV2D_EXAMPLES_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def l2_point_error(grid, name: str, exact) -> float:
    """RMS error of a reconstructed form against an exact function."""
    vals = grid.point_data[name]
    x, y = grid.points[:, 0], grid.points[:, 1]
    ref = np.asarray(exact(x, y))
    if vals.ndim == 2:
        return float(np.sqrt(np.mean(np.sum((vals - ref) ** 2, axis=-1))))
    return float(np.sqrt(np.mean((vals - ref) ** 2)))


def curved_square_deformation(x, y):
    """A smooth deformation standing in for the reference's rmsh B-spline mesh."""
    return (
        x + 0.08 * np.sin(np.pi * x) * np.sin(np.pi * y),
        y - 0.08 * np.sin(np.pi * x) * np.sin(np.pi * y),
    )


def report(title: str, **values) -> None:
    print(f"[{title}] " + "  ".join(f"{k}={v:.4e}" for k, v in values.items()))

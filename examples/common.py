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


# -- gallery figures ---------------------------------------------------------
#
# The reference examples are sphinx-gallery scripts producing field and
# convergence PLOTS (e.g. plot_navier_stokes.py); these helpers render the
# equivalent artifacts headlessly.  Figure style follows the house rules:
# sequential = one hue light->dark for magnitude fields, diverging = two
# hues + neutral midpoint for signed fields, single-series line plots carry
# no legend (the title names them), recessive grid, labeled axes.

FIGURES_DIR = os.path.join(os.path.dirname(__file__), "_figures")


def _figures_enabled() -> bool:
    return os.environ.get("MFV2D_EXAMPLES_FIGURES", "1") != "0"


def figure_path(script_file: str, label: str) -> str:
    """examples/_figures/<script-stem>_<label>.png"""
    stem = os.path.splitext(os.path.basename(script_file))[0]
    os.makedirs(FIGURES_DIR, exist_ok=True)
    return os.path.join(FIGURES_DIR, f"{stem}_{label}.png")


def save_field_figure(
    grid, name: str, script_file: str, *, label: str | None = None,
    title: str | None = None, diverging: bool | None = None,
) -> str | None:
    """Render one reconstructed field as a filled-triangulation figure.

    Vector fields plot their magnitude.  ``diverging=None`` picks the
    colormap from the data: signed fields get the two-hue diverging map
    centred on zero, non-negative ones a single-hue sequential map.
    """
    if not _figures_enabled():
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.tri as mtri

    vals = np.asarray(grid.point_data[name])
    if vals.ndim == 2:
        vals = np.linalg.norm(vals, axis=-1)
    x, y = grid.points[:, 0], grid.points[:, 1]
    tri = mtri.Triangulation(x, y)
    if diverging is None:
        vmax = float(np.abs(vals).max()) or 1.0
        diverging = float(vals.min()) < -0.05 * vmax
    fig, ax = plt.subplots(figsize=(5.2, 4.4), dpi=110)
    if diverging:
        bound = float(np.abs(vals).max()) or 1.0
        m = ax.tripcolor(tri, vals, cmap="RdBu_r", vmin=-bound, vmax=bound,
                         shading="gouraud", rasterized=True)
    else:
        m = ax.tripcolor(tri, vals, cmap="Blues", shading="gouraud",
                         rasterized=True)
    ax.set_aspect("equal")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_title(title or name)
    fig.colorbar(m, ax=ax, shrink=0.9)
    for spine in ax.spines.values():
        spine.set_alpha(0.3)
    out = figure_path(script_file, label or name)
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


def save_convergence_figure(
    xs, errors, script_file: str, *, label: str = "convergence",
    xlabel: str = "polynomial order p", ylabel: str = "L2 error",
    title: str | None = None, logx: bool = False,
) -> str | None:
    """Single-series convergence plot (semilog-y; log-log with ``logx``)."""
    if not _figures_enabled():
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(4.8, 3.6), dpi=110)
    plot = ax.loglog if logx else ax.semilogy
    plot(xs, errors, "-o", linewidth=2, markersize=6, color="#2a6fb0")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title or "Convergence")
    ax.grid(True, which="both", alpha=0.25, linewidth=0.6)
    for spine in ax.spines.values():
        spine.set_alpha(0.3)
    out = figure_path(script_file, label)
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


def save_history_figure(
    ts, values, script_file: str, *, label: str = "history",
    xlabel: str = "t", ylabel: str = "value", title: str | None = None,
    logy: bool = False,
) -> str | None:
    """Single-series time-history plot (for the unsteady examples)."""
    if not _figures_enabled():
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(4.8, 3.6), dpi=110)
    plot = ax.semilogy if logy else ax.plot
    plot(ts, values, "-", linewidth=2, color="#2a6fb0")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title or label)
    ax.grid(True, alpha=0.25, linewidth=0.6)
    for spine in ax.spines.values():
        spine.set_alpha(0.3)
    out = figure_path(script_file, label)
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


_STRATEGY_COLORS = ("#2a6fb0", "#e1812c", "#3a923a")  # fixed categorical order


def save_strategies_figure(
    histories, script_file: str, *, label: str = "strategies",
    xlabel: str = "total DoFs", ylabel: str = "L2 error",
    title: str | None = None,
) -> str | None:
    """Multi-strategy error-vs-DoFs figure (log-log; legend + fixed hues).

    ``histories`` maps strategy name -> sequence of (dofs, error) rounds;
    hues are assigned in insertion order and never cycled.
    """
    if not _figures_enabled():
        return None
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5.0, 3.8), dpi=110)
    for (name, hist), color in zip(histories.items(), _STRATEGY_COLORS):
        dofs = [d for d, _ in hist]
        errs = [e for _, e in hist]
        ax.loglog(dofs, errs, "-o", linewidth=2, markersize=6,
                  color=color, label=name)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title or "Refinement strategies")
    ax.grid(True, which="both", alpha=0.25, linewidth=0.6)
    ax.legend(frameon=False)
    for spine in ax.spines.values():
        spine.set_alpha(0.3)
    out = figure_path(script_file, label)
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out

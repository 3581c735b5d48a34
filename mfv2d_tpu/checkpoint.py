"""Checkpoint/resume for meshes and time-march state.

The reference has no checkpointing (SURVEY section 5); long TPU time marches
need it.  State is a single ``.npz``: the full mesh (topology + quadtree +
orders), the solution/multiplier vectors, and the trapezoidal carry state,
so a march can resume exactly where it stopped.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from mfv2d_tpu.mesh.manifold import GeoID, Line, Manifold2D, Surface
from mfv2d_tpu.mesh.quadtree import Mesh, _Element


@dataclass(frozen=True)
class CheckpointSettings:
    """Periodic checkpointing of an unsteady solve.

    Pass to :func:`mfv2d_tpu.solve_system_2d` with ``time_settings``; every
    ``every`` completed steps (and at the end) the full march state is
    written to ``path``.  Set ``resume_from`` to a previous checkpoint to
    continue that march: the solve skips already-completed steps and the
    returned grids cover only the resumed portion.
    """

    path: str
    every: int = 10
    resume_from: str | None = None


def manifold_to_arrays(m: Manifold2D) -> dict:
    """Serialize a manifold to flat integer arrays (1-based signed ids)."""
    lines = np.array(
        [(ln.begin.unpack(), ln.end.unpack()) for ln in m._lines], np.int64
    ).reshape(-1, 2)
    surf_flat: list[int] = []
    surf_offsets = [0]
    for s in m._surfaces:
        surf_flat.extend(g.unpack() for g in s.lines)
        surf_offsets.append(len(surf_flat))
    return {
        "n_points": np.int64(m.n_points),
        "lines": lines,
        "surf_flat": np.asarray(surf_flat, np.int64),
        "surf_offsets": np.asarray(surf_offsets, np.int64),
    }


def manifold_from_arrays(d: dict, prefix: str = "") -> Manifold2D:
    lines = [
        Line(GeoID.pack(int(b)), GeoID.pack(int(e)))
        for b, e in d[prefix + "lines"]
    ]
    offsets = d[prefix + "surf_offsets"]
    flat = d[prefix + "surf_flat"]
    surfaces = [
        Surface(*(int(v) for v in flat[a:b]))
        for a, b in zip(offsets[:-1], offsets[1:])
    ]
    return Manifold2D(int(d[prefix + "n_points"]), lines, surfaces)


def mesh_to_arrays(mesh: Mesh) -> dict:
    """Serialize the mesh: topology plus the full element quadtree."""
    out = {}
    for k, v in manifold_to_arrays(mesh.primal).items():
        out["primal_" + k] = v
    for k, v in manifold_to_arrays(mesh.dual).items():
        out["dual_" + k] = v
    out["boundary"] = np.asarray(mesh.boundary_indices, np.int64)
    n = mesh.element_count
    parents = np.full(n, -1, np.int64)
    orders = np.full((n, 2), -1, np.int64)
    children = np.full((n, 4), -1, np.int64)
    corners = np.zeros((n, 4, 2))
    for i, e in enumerate(mesh._elements):
        if e.parent is not None:
            parents[i] = e.parent
        if e.orders is not None:
            orders[i] = e.orders
        if e.children is not None:
            children[i] = e.children
        corners[i] = e.corners
    out["parents"] = parents
    out["orders"] = orders
    out["children"] = children
    out["corners"] = corners
    return out


def mesh_from_arrays(d: dict) -> Mesh:
    primal = manifold_from_arrays(d, "primal_")
    dual = manifold_from_arrays(d, "dual_")
    mesh = Mesh.__new__(Mesh)
    mesh.primal = primal
    mesh.dual = dual
    mesh.boundary_indices = np.asarray(d["boundary"], np.uint32)
    elements = []
    parents = d["parents"]
    orders = d["orders"]
    children = d["children"]
    corners = d["corners"]
    for i in range(parents.shape[0]):
        elements.append(
            _Element(
                parent=None if parents[i] < 0 else int(parents[i]),
                corners=np.array(corners[i]),
                orders=None
                if orders[i, 0] < 0
                else (int(orders[i, 0]), int(orders[i, 1])),
                children=None
                if children[i, 0] < 0
                else tuple(int(c) for c in children[i]),
            )
        )
    mesh._elements = elements
    return mesh


def save_mesh(path, mesh: Mesh) -> None:
    """Save a mesh alone."""
    np.savez(path, **mesh_to_arrays(mesh))


def load_mesh(path) -> Mesh:
    with np.load(path) as d:
        return mesh_from_arrays(dict(d))


def save_march_state(
    path,
    mesh: Mesh,
    solution: np.ndarray,
    lagrange: np.ndarray,
    old_carry: np.ndarray,
    carry_term: np.ndarray,
    time_index: int,
    dt: float,
) -> None:
    """Checkpoint a time march mid-run."""
    arrays = mesh_to_arrays(mesh)
    arrays.update(
        solution=np.asarray(solution),
        lagrange=np.asarray(lagrange),
        old_carry=np.asarray(old_carry),
        carry_term=np.asarray(carry_term),
        time_index=np.int64(time_index),
        dt=np.float64(dt),
    )
    np.savez(path, **arrays)


def load_march_state(path) -> dict:
    """Load a march checkpoint: mesh plus the state vectors."""
    with np.load(path) as d:
        d = dict(d)
    return {
        "mesh": mesh_from_arrays(d),
        "solution": d["solution"],
        "lagrange": d["lagrange"],
        "old_carry": d["old_carry"],
        "carry_term": d["carry_term"],
        "time_index": int(d["time_index"]),
        "dt": float(d["dt"]),
    }


def save_steady_state(
    path,
    solution: np.ndarray,
    lagrange: np.ndarray,
    fine_scales: np.ndarray | None,
    iteration: int,
    elapsed: float,
) -> None:
    """Checkpoint a steady Picard solve mid-iteration.

    ``fine_scales`` carries the VMS unresolved-scale iterate (the other
    cross-iteration carry besides the solution); ``elapsed`` accumulates
    wall-clock across resumed attempts so interrupted long runs report an
    honest cumulative time-to-solution.
    """
    tmp = str(path) + ".tmp.npz"
    np.savez(
        tmp,
        steady=np.int64(1),
        solution=np.asarray(solution),
        lagrange=np.asarray(lagrange),
        fine_scales=(
            np.zeros(0) if fine_scales is None else np.asarray(fine_scales)
        ),
        has_fine=np.int64(fine_scales is not None),
        iteration=np.int64(iteration),
        elapsed=np.float64(elapsed),
    )
    # np.savez appends .npz; atomic replace so a crash mid-write never
    # corrupts the previous good checkpoint.
    import os

    os.replace(tmp, str(path))


def load_steady_state(path) -> dict:
    """Load a steady-solve checkpoint written by :func:`save_steady_state`."""
    with np.load(path) as d:
        d = dict(d)
    if "steady" not in d:
        raise ValueError(f"{path} is not a steady-solve checkpoint.")
    return {
        "solution": d["solution"],
        "lagrange": d["lagrange"],
        "fine_scales": d["fine_scales"] if int(d["has_fine"]) else None,
        "iteration": int(d["iteration"]),
        "elapsed": float(d["elapsed"]),
    }

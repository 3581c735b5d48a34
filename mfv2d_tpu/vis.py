"""Solution output grids (VTK Lagrange-quadrilateral layout).

The reference emits PyVista ``UnstructuredGrid`` objects; this environment
has no pyvista, so :class:`ReconstructedGrid` carries the same data (points,
VTK Lagrange cell connectivity, per-point form values, per-cell orders) and
can convert to pyvista when available.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import numpy.typing as npt

VTK_LAGRANGE_QUADRILATERAL = 70


@dataclass
class ReconstructedGrid:
    """Unstructured grid of VTK Lagrange quadrilateral cells."""

    points: npt.NDArray[np.float64]  # (n_points, 3)
    cells: npt.NDArray[np.int64]  # VTK cell array: [n, i0...in-1, n, ...]
    cell_types: npt.NDArray[np.uint8]
    point_data: dict[str, npt.NDArray[np.float64]] = field(default_factory=dict)
    cell_data: dict[str, npt.NDArray] = field(default_factory=dict)
    field_data: dict[str, npt.NDArray] = field(default_factory=dict)

    @property
    def n_cells(self) -> int:
        return len(self.cell_types)

    def to_pyvista(self):
        """Convert to a pyvista.UnstructuredGrid (requires pyvista)."""
        import pyvista as pv

        grid = pv.UnstructuredGrid(self.cells, self.cell_types, self.points)
        for k, v in self.point_data.items():
            grid.point_data[k] = v
        for k, v in self.cell_data.items():
            grid.cell_data[k] = v
        for k, v in self.field_data.items():
            grid.field_data[k] = v
        return grid

"""Mesh topology tests (mirrors the reference test_mesh.py scenarios)."""

import numpy as np

from mfv2d_tpu.examples import unit_square_mesh
from mfv2d_tpu.mimetic import mesh_create

POINTS = (
    (-2, -1),
    (-1, -2),
    (+1, -1),
    (0, 0),
    (+1, +2),
    (0, +1),
    (-2, 0),
)
LINES = (
    (1, 2),
    (2, 3),
    (3, 4),
    (4, 1),
    (3, 5),
    (5, 6),
    (4, 6),
    (1, 7),
    (6, 7),
)
SURFACES = ((1, 2, 3, 4), (-3, 5, 6, -7), (-4, 7, 9, -8))
ORDERS = ((2, 4), (3, 5), (5, 1))


def _make():
    return mesh_create(ORDERS, POINTS, LINES, SURFACES)


def test_manual_mesh():
    mesh = _make()
    assert set(mesh.boundary_indices) == {0, 1, 4, 5, 7, 8}
    assert mesh.element_count == 3
    real_corners = (
        (POINTS[0], POINTS[1], POINTS[2], POINTS[3]),
        (POINTS[3], POINTS[2], POINTS[4], POINTS[5]),
        (POINTS[0], POINTS[3], POINTS[5], POINTS[6]),
    )
    for i in range(3):
        assert np.all(mesh.get_leaf_corners(i) == real_corners[i])
        o1, o2 = mesh.get_leaf_orders(i)
        assert (o1, o2) == ORDERS[i]
        assert mesh.get_element_children(i) is None
        assert mesh.get_element_parent(i) is None


def test_subdivision():
    mesh = _make()
    split_orders = ((1, 1), (2, 1), (1, 2), (2, 2))
    mesh.split_element(1, *split_orders)
    assert mesh.element_count == 7
    assert np.all(mesh.get_leaf_indices() == (0, 2, 3, 4, 5, 6))
    children = mesh.get_element_children(1)
    assert children is not None

    new_corners = (
        ((0, 0), (0.5, -0.5), (0.5, 0.5), (0, 0.5)),
        ((0.5, -0.5), (+1, -1), (+1, 0.5), (0.5, 0.5)),
        ((0.5, 0.5), (+1, 0.5), (+1, +2), (0.5, 1.5)),
        ((0, 0.5), (0.5, 0.5), (0.5, 1.5), (0, 1)),
    )
    for j, i in enumerate((3, 4, 5, 6)):
        assert mesh.get_element_parent(i) == 1
        assert children[j] == i
        assert np.allclose(mesh.get_leaf_corners(i), new_corners[j])
        assert mesh.get_leaf_orders(i) == split_orders[j]
        assert mesh.get_element_depth(i) == 1

    # leaf index round trip
    for rank, idx in enumerate(mesh.get_leaf_indices()):
        assert mesh.get_leaf_index(int(idx)) == rank
        assert mesh.find_leaf_by_index(rank) == int(idx)


def test_dual_structure():
    mesh = _make()
    dual = mesh.dual
    assert dual.n_points == 3  # one per surface
    assert dual.n_surfaces == 7  # one per point
    # Line 2 (index 2, id 3) is shared by surfaces 0 (+) and 1 (-):
    ln = dual.get_line(3)
    assert ln.end.index == 0  # positive orientation in surface 0
    assert ln.begin.index == 1  # negative orientation in surface 1
    # Boundary line 0 belongs only to surface 0 positively.
    ln0 = dual.get_line(1)
    assert ln0.end.index == 0 and not ln0.begin


def test_unit_square_mesh():
    mesh = unit_square_mesh(3, 2, 2)
    assert mesh.element_count == 6
    assert mesh.leaf_count == 6
    # 2 * 3 * 2 + 3 + 2 boundary lines? Total boundary = perimeter lines
    assert len(mesh.boundary_indices) == 2 * (3 + 2)
    for i in range(6):
        c = mesh.get_leaf_corners(i)
        # counter-clockwise orientation -> positive area
        area = 0.5 * np.abs(
            np.dot(c[:, 0], np.roll(c[:, 1], -1)) - np.dot(c[:, 1], np.roll(c[:, 0], -1))
        )
        assert np.isclose(area, (2 / 3) * (2 / 2))


def test_integrate_over_elements():
    from mfv2d_tpu.mimetic import integrate_over_elements

    mesh = unit_square_mesh(2, 2, 3)

    def f(x, y):
        return x * 0 + 1.0

    vals = integrate_over_elements(mesh, f)
    assert np.allclose(vals, 1.0)  # each element has area 1
    assert np.isclose(np.sum(vals), 4.0)

    def g(x, y):
        return x * y + x**2

    vals = integrate_over_elements(mesh, g, orders=6)
    # integral over [-1,1]^2 of xy + x^2 = 0 + 4/3
    assert np.isclose(np.sum(vals), 4.0 / 3.0, atol=1e-12)


def test_split_predicates():
    mesh = unit_square_mesh(2, 2, 2)

    def pred(m, idx):
        if m.get_element_depth(idx) == 0 and idx == 0:
            return ((1, 1),) * 4
        return None

    out = mesh.split_depth_first(2, pred)
    assert out.element_count == 8
    assert mesh.element_count == 4  # original untouched
    out2 = mesh.split_breath_first(2, pred)
    assert out2.element_count == 8


def test_vtu_writer(tmp_path):
    """Grids save as well-formed .vtu XML with all data arrays."""
    import xml.etree.ElementTree as ET

    import mfv2d_tpu as mf
    from mfv2d_tpu.models import poisson

    model = poisson.mixed_poisson()
    mesh = unit_square_mesh(2, 2, 2)
    sols, _, _ = mf.solve_system_2d(
        mesh, mf.SystemSettings(model.system), recon_order=3
    )
    path = tmp_path / "out.vtu"
    sols[-1].save_vtu(path)
    root = ET.parse(path).getroot()
    piece = root.find(".//Piece")
    assert int(piece.attrib["NumberOfCells"]) == 4
    names = {d.attrib.get("Name") for d in root.iter("DataArray")}
    assert {"connectivity", "offsets", "types", "u", "q", "orders"} <= names


def test_vtu_writer_vector_data(tmp_path):
    """Vector point data round-trips through the .vtu writer."""
    import xml.etree.ElementTree as ET

    import mfv2d_tpu as mf
    from mfv2d_tpu.models import flow

    model = flow.stokes_flow()
    mesh = unit_square_mesh(2, 2, 2)
    bc = mf.BoundaryCondition2DSteady(
        model.velocity, mesh.boundary_indices, flow.stokes_velocity_exact
    )
    sols, _, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system, [bc], [(0.0, model.pressure)]),
        recon_order=3,
    )
    path = tmp_path / "stokes.vtu"
    sols[-1].save_vtu(path)
    root = ET.parse(path).getroot()
    arrays = {d.attrib.get("Name"): d for d in root.iter("DataArray")}
    assert arrays["vel"].attrib["NumberOfComponents"] == "2"
    vals = np.fromstring(arrays["vel"].text.replace("\n", " "), sep=" ")
    assert vals.size == 2 * int(root.find(".//Piece").attrib["NumberOfPoints"])
    assert np.all(np.isfinite(vals))


def test_bulk_constraints_match_general_path():
    """The vectorized constraint fast path emits exactly the general rows."""
    import scipy.sparse as sp

    import mfv2d_tpu as mf
    import mfv2d_tpu.continuity as cont
    from mfv2d_tpu.continuity import add_system_constraints
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.solver.discretization import discretize_mesh

    vor = mf.KFormUnknown("vor", mf.UnknownFormOrder.FORM_ORDER_0)
    w0 = vor.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    w1 = q.weight
    system = mf.KFormSystem(
        w0.derivative @ q - w0 @ vor == 0,
        w1 @ vor.derivative + w1 @ q == 0,
    )

    def build(disable):
        mesh = unit_square_mesh(4, 3, 3)
        mesh.split_element(5, (2, 2), (2, 2), (2, 2), (2, 2))  # hanging nodes
        mesh.set_leaf_orders(10, 4, 2)  # anisotropic + mixed side orders
        disc = discretize_mesh(mesh, system.unknown_forms, FemCache(2))
        old = cont._DISABLE_BULK
        cont._DISABLE_BULK = disable
        try:
            mat, vec = add_system_constraints(
                system, mesh, disc.basis_cache, [], [],
                disc.leaf_indices, disc.element_offsets, None,
            )
        finally:
            cont._DISABLE_BULK = old
        return mat, vec

    fast_mat, fast_vec = build(False)
    slow_mat, slow_vec = build(True)
    assert fast_mat.shape == slow_mat.shape
    assert fast_vec.size == slow_vec.size

    def canonical(mat):
        rows = []
        csr = sp.csr_array(mat)
        for r in range(csr.shape[0]):
            a, b = csr.indptr[r], csr.indptr[r + 1]
            order = np.argsort(csr.indices[a:b])
            cols = csr.indices[a:b][order]
            vals = csr.data[a:b][order]
            # Normalize row sign by the first entry.
            s = np.sign(vals[0]) if vals.size else 1.0
            rows.append((tuple(cols), tuple(np.round(s * vals, 12))))
        return sorted(rows)

    assert canonical(fast_mat) == canonical(slow_mat)

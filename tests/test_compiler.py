"""DSL lowering and batched evaluation semantics."""

import numpy as np
import pytest

from mfv2d_tpu.compiler import (
    CompiledSystem,
    Identity,
    Incidence,
    InterProd,
    MassMat,
    Push,
    Scale,
    Sum,
    collect_fields,
    simplify_expression,
    system_as_string,
    translate_implicit_ksum,
)
from mfv2d_tpu.evaluation import (
    ElementBatch,
    compute_element_matrices,
    compute_element_vectors,
    evaluate_static_fields,
)
from mfv2d_tpu.kform import KFormUnknown, UnknownFormOrder
from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.ops.incidence import incidence_21
from mfv2d_tpu.system import ElementFormSpecification, KFormSystem

DEFORMED = np.array([(-1.0, -1.1), (1.1, -0.9), (0.95, 1.2), (-0.9, 0.95)])


def _mixed_poisson():
    u = KFormUnknown("u", UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = KFormUnknown("q", UnknownFormOrder.FORM_ORDER_1)
    p = q.weight

    def u_exact(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def source(x, y):
        return -(np.pi**2) / 2 * np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    system = KFormSystem(
        p.derivative @ u - p @ q == p ^ u_exact,
        v @ q.derivative == -(v @ source),
    )
    return system, u, q


def test_simplify_identity_removal():
    ops = [Identity(), MassMat(UnknownFormOrder.FORM_ORDER_1, False)]
    out = simplify_expression(*ops)
    assert out == [MassMat(UnknownFormOrder.FORM_ORDER_1, False)]


def test_simplify_mass_cancellation():
    ops = [
        MassMat(UnknownFormOrder.FORM_ORDER_0, False),
        MassMat(UnknownFormOrder.FORM_ORDER_0, True),
        Scale(2.0),
    ]
    out = simplify_expression(*ops)
    assert out == [Scale(2.0)]


def test_simplify_scale_merge():
    out = simplify_expression(Scale(2.0), Scale(3.0))
    assert out == [Scale(6.0)]


def test_simplify_push_sum_fold():
    ops = [Push(), Scale(2.0), Push(), Scale(3.0), Sum(2)]
    out = simplify_expression(*ops)
    # The two scale-only branches fold into one Scale(5.0).
    assert out == [Push(), Scale(5.0), Sum(1)]


def test_translate_mixed_poisson_blocks():
    system, u, q = _mixed_poisson()
    comp = CompiledSystem(system)
    # Row 0 (weight p, 1-form): d(p) against u -> E21^T M2 on u column;
    # -<p, q> -> -M1 on q column.
    assert comp.rhs_blocks is None
    assert comp.nonlin_blocks is None
    rows = comp.lhs_blocks
    assert len(rows) == 2 and len(rows[0]) == 2
    # system orders unknowns by weight appearance: [q (eq of p), u (eq of v)]
    names = system.unknown_forms.names
    iq = names.index("q")
    iu = names.index("u")
    blk_pu = rows[0][iu]
    assert blk_pu is not None
    assert any(type(op) is Incidence for op in blk_pu)
    blk_pq = rows[0][iq]
    assert blk_pq == (MassMat(UnknownFormOrder.FORM_ORDER_1, False), Scale(-1.0))
    # Row 1 (weight v): <v, dq> = M2 E21 on q column.
    blk_vq = rows[1][iq]
    assert blk_vq == (
        Incidence(UnknownFormOrder.FORM_ORDER_1, False),
        MassMat(UnknownFormOrder.FORM_ORDER_2, False),
    )
    assert rows[1][iu] is None


def test_system_as_string_runs():
    system, _, _ = _mixed_poisson()
    s = system_as_string(system)
    assert "M(" in s and "E(" in s


def test_element_matrix_blocks_mixed_poisson():
    """Batched element matrix equals hand-built blocks from mass/incidence."""
    system, u, q = _mixed_poisson()
    comp = CompiledSystem(system)
    p = 3
    cache = FemCache(2)
    basis = cache.get_basis2d(p, p)
    batch = ElementBatch(basis, DEFORMED[None])
    mat = np.asarray(
        compute_element_matrices(system.unknown_forms, comp.lhs_blocks, batch)
    )[0]

    m1 = np.asarray(batch.mass(UnknownFormOrder.FORM_ORDER_1, False))[0]
    m2 = np.asarray(batch.mass(UnknownFormOrder.FORM_ORDER_2, False))[0]
    e21 = incidence_21(p, p)

    names = system.unknown_forms.names
    iq, iu = names.index("q"), names.index("u")
    n1 = m1.shape[0]
    n2 = m2.shape[0]
    # DoF order follows unknown_forms order.
    sizes = [n1 if n == "q" else n2 for n in names]
    offs = np.concatenate([[0], np.cumsum(sizes)])

    # <dp, u> block: E21^T @ M2
    expected_pu = e21.T @ m2
    # -<p, q> block: -M1
    # <v, dq> block: M2 @ E21
    got_pu = mat[offs[0] : offs[1], offs[iu] : offs[iu + 1]]
    got_pq = mat[offs[0] : offs[1], offs[iq] : offs[iq + 1]]
    got_vq = mat[offs[1] : offs[2], offs[iq] : offs[iq + 1]]
    got_vu = mat[offs[1] : offs[2], offs[iu] : offs[iu + 1]]
    assert np.allclose(got_pu, expected_pu, atol=1e-12)
    assert np.allclose(got_pq, -m1, atol=1e-12)
    assert np.allclose(got_vq, m2 @ e21, atol=1e-12)
    assert np.allclose(got_vu, 0.0)


def test_matrix_vector_consistency():
    """compute_element_vectors(codes, u) == compute_element_matrices @ u.

    The reference checks the same identity in test_explicit.py.
    """
    system, _, _ = _mixed_poisson()
    comp = CompiledSystem(system)
    cache = FemCache(2)
    basis = cache.get_basis2d(3, 3)
    corners = np.stack([DEFORMED, DEFORMED * 0.7 - 0.1])
    batch = ElementBatch(basis, corners)
    n = system.unknown_forms.total_size(3, 3)
    rng = np.random.default_rng(3)
    dofs = rng.normal(size=(2, n))
    mats = np.asarray(
        compute_element_matrices(system.unknown_forms, comp.lhs_blocks, batch)
    )
    vecs = np.asarray(
        compute_element_vectors(system.unknown_forms, comp.lhs_blocks, batch, dofs)
    )
    for e in range(2):
        assert np.allclose(vecs[e], mats[e] @ dofs[e], atol=1e-11)


def test_interior_product_advection_system():
    """Linear advection with a static vector field: matrix/vector identity."""

    def wind(x, y):
        return np.stack([np.ones_like(x), 0.5 * np.ones_like(y)], axis=-1)

    w = KFormUnknown("omega", UnknownFormOrder.FORM_ORDER_2)
    v = w.weight
    q = KFormUnknown("q", UnknownFormOrder.FORM_ORDER_1)
    p = q.weight

    system = KFormSystem(
        p @ (wind * w) + p @ q == 0,
        v @ w == 0,
    )
    comp = CompiledSystem(system)
    assert len(comp.fields) == 1 and comp.fields[0] is wind

    cache = FemCache(2)
    basis = cache.get_basis2d(4, 4)
    batch = ElementBatch(basis, DEFORMED[None])
    static = evaluate_static_fields(batch, comp.fields)
    n = system.unknown_forms.total_size(4, 4)
    rng = np.random.default_rng(12)
    dofs = rng.normal(size=(1, n))
    mats = np.asarray(
        compute_element_matrices(
            system.unknown_forms, comp.lhs_blocks, batch, static_fields=static
        )
    )
    vecs = np.asarray(
        compute_element_vectors(
            system.unknown_forms, comp.lhs_blocks, batch, dofs, static_fields=static
        )
    )
    assert np.allclose(vecs[0], mats[0] @ dofs[0], atol=1e-11)


def test_nonlinear_field_collection():
    """Lowered interior product registers the unknown's label as a field."""
    vel = KFormUnknown("vel", UnknownFormOrder.FORM_ORDER_1)
    vor = KFormUnknown("vor", UnknownFormOrder.FORM_ORDER_0)
    w_vel = vel.weight
    w_vor = vor.weight

    system = KFormSystem(
        (w_vel @ vor.derivative) + (vel * w_vel) @ vor == 0,
        w_vor @ vor == 0,
    )
    comp = CompiledSystem(system)
    assert "vel" in comp.fields
    assert comp.nonlin_blocks is not None


def test_form_spec_offsets():
    spec = ElementFormSpecification(
        ("a", UnknownFormOrder.FORM_ORDER_0),
        ("b", UnknownFormOrder.FORM_ORDER_1),
        ("c", UnknownFormOrder.FORM_ORDER_2),
    )
    assert spec.form_sizes(2, 3) == (12, 17, 6)
    assert spec.form_offsets(2, 3) == (0, 12, 29, 35)
    assert spec.total_size(2, 3) == 35
    assert spec.index(("b", UnknownFormOrder.FORM_ORDER_1)) == 1


def test_chunked_matrix_dispatch_matches_one_piece():
    """The element-capped matrix dispatch equals the single dispatch.

    At VMS scale ([4096, 320, 320]) matrix assemblies chunk to bound HBM;
    force a tiny cap here so the chunked path (uniform chunks + tail
    padding + concatenation) is exercised at test size.
    """
    import numpy as np

    import mfv2d_tpu as mf
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.evaluation import ElementBatch, _cached_element_fn
    from mfv2d_tpu.ops.basis import FemCache

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    system = mf.KFormSystem(
        q.weight.derivative @ u - q.weight @ q == 0,
        u.weight @ q.derivative == 0,
    )
    compiled = CompiledSystem(system)
    spec = system.unknown_forms
    basis = FemCache(2).get_basis2d(3, 3)
    rng = np.random.default_rng(0)
    base = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
    corners = np.tile(base, (11, 1, 1)) + 0.05 * rng.normal(size=(11, 4, 2))
    batch = ElementBatch(basis, corners)

    key = (
        batch.orders,
        batch.basis.integration_orders,
        compiled.lhs_blocks,
        tuple((n, int(o)) for n, o in spec),
        (),
        "matrix",
        True,
    )
    one = _cached_element_fn(*key)(batch.corners, None, ())
    chunked = _cached_element_fn(*key, chunk_cap=4)(batch.corners, None, ())
    assert np.abs(np.asarray(chunked) - np.asarray(one)).max() < 1e-13

    # Vector dispatches chunk too (they build the same per-block [E, n, n]
    # operands internally: the unchunked 64x64 p=8 residual evaluation
    # OOMed on the TPU with the VMS operators resident).
    vkey = key[:5] + ("vector",) + key[6:]
    dofs = rng.normal(size=(11, spec.total_size(*batch.orders)))
    v_one = _cached_element_fn(*vkey)(batch.corners, dofs, ())
    v_chunked = _cached_element_fn(*vkey, chunk_cap=4)(
        batch.corners, dofs, ()
    )
    assert v_chunked.shape == (11, spec.total_size(*batch.orders))
    assert np.abs(np.asarray(v_chunked) - np.asarray(v_one)).max() < 1e-13


def test_element_dispatch_as_chunks_matches_concat():
    """as_chunks=True returns the same values as the concatenated path.

    The pipelined VMS init consumes the chunk list directly (streaming
    each chunk host-side while later chunks compute); the chunks must
    tile the element axis exactly, in order."""
    import mfv2d_tpu as mf
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.evaluation import ElementBatch, _cached_element_fn
    from mfv2d_tpu.ops.basis import FemCache

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    system = mf.KFormSystem(
        q.weight.derivative @ u - q.weight @ q == 0,
        u.weight @ q.derivative == 0,
    )
    compiled = CompiledSystem(system)
    spec = system.unknown_forms
    basis = FemCache(2).get_basis2d(3, 3)
    rng = np.random.default_rng(3)
    base = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
    corners = np.tile(base, (11, 1, 1)) + 0.05 * rng.normal(size=(11, 4, 2))
    batch = ElementBatch(basis, corners)
    key = (
        batch.orders,
        batch.basis.integration_orders,
        compiled.lhs_blocks,
        tuple((n, int(o)) for n, o in spec),
        (),
        "matrix",
        True,
    )
    fn = _cached_element_fn(*key, chunk_cap=4)
    one = np.asarray(fn(batch.corners, None, ()))
    chunks = fn(batch.corners, None, (), as_chunks=True)
    assert [c.shape[0] for c in chunks] == [4, 4, 3]
    glued = np.concatenate([np.asarray(c) for c in chunks], axis=0)
    assert np.array_equal(glued, one)
    # Single-dispatch batches come back as a one-chunk list.
    small = fn(batch.corners[:3], None, (), as_chunks=True)
    assert len(small) == 1 and small[0].shape[0] == 3

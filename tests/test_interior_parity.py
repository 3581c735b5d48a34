"""Interior-product operator identities (mirrors reference test_interior.py).

Each test checks the algebraic identity
``block_matrix @ primal(form) == dual(exact pointwise product)`` on a set of
deformed quads, which pins down the sign and metric conventions of the
interior-product matrices exactly.
"""

import numpy as np
import pytest

from mfv2d_tpu.compiler import CompiledSystem
from mfv2d_tpu.evaluation import (
    ElementBatch,
    compute_element_matrices,
    evaluate_static_fields,
)
from mfv2d_tpu.kform import KFormUnknown, UnknownFormOrder
from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.projection import element_dual_dofs, element_primal_dofs
from mfv2d_tpu.system import KFormSystem

_CORNER_TEST_VALUES = (
    ((-1, -1), (+1, -1), (+1, +1), (-1, +1)),
    ((-2, -2), (+2, -2), (+2, +2), (-2, +2)),
    ((-0.1, -2), (+0.1, -2), (+0.1, +2), (-0.1, +2)),
    ((-2, -0.1), (+2, -0.1), (+2, +0.1), (-2, +0.1)),
    ((-1, -2), (+2, +0), (+1.75, +0.75), (+1.0, +1.0)),
)

N = 6
N_INT = 10


def _space(corner_vals):
    basis = FemCache(0).get_basis2d(N, N, N_INT, N_INT)
    return ElementBatch(basis, np.array(corner_vals, np.float64)[None])


def u_field(x, y):
    x = np.asarray(x)
    y = np.asarray(y)
    return np.stack((x**2 * y, -x * y**3), axis=-1, dtype=np.float64)


def omega_1(x, y):
    x = np.asarray(x)
    y = np.asarray(y)
    return np.stack((x * y**3, -(x**2) * y), axis=-1, dtype=np.float64)


def omega_2(x, y):
    x = np.asarray(x)
    y = np.asarray(y)
    return x * y + x**2 - 0.5 * y**2


@pytest.mark.parametrize("corner_vals", _CORNER_TEST_VALUES)
def test_interior_product_1form(corner_vals):
    """i_u(omega) for a primal 1-form: the scalar cross product u x omega.

    Mirrors reference test_advect_10: block @ primal(omega) equals the dual
    DoFs of (omega_y u_x - omega_x u_y) as a 0-form.
    """
    omega = KFormUnknown("omega", UnknownFormOrder.FORM_ORDER_1)
    v = omega.weight
    g = KFormUnknown("g", UnknownFormOrder.FORM_ORDER_0)
    w = g.weight
    system = KFormSystem(
        (w @ (u_field * omega)) == 0,
        (v @ g.derivative) == 0,
        sorting=lambda f: f.order,
    )
    batch = _space(corner_vals)
    comp = CompiledSystem(system)
    statics = evaluate_static_fields(batch, comp.fields)
    emat = np.asarray(
        compute_element_matrices(
            system.unknown_forms, comp.lhs_blocks, batch, static_fields=statics
        )
    )[0]
    n0 = (N + 1) * (N + 1)
    block = emat[:n0, n0:]

    def exact(x, y):
        uf = u_field(x, y)
        of = omega_1(x, y)
        return of[..., 1] * uf[..., 0] - of[..., 0] * uf[..., 1]

    omega_proj = np.asarray(
        element_primal_dofs(UnknownFormOrder.FORM_ORDER_1, batch, omega_1)
    )[0]
    lhs = block @ omega_proj
    rhs = np.asarray(
        element_dual_dofs(UnknownFormOrder.FORM_ORDER_0, batch, exact)
    )[0]
    assert lhs == pytest.approx(rhs)


@pytest.mark.parametrize("corner_vals", _CORNER_TEST_VALUES)
def test_interior_product_2form(corner_vals):
    """i_u(omega) for a primal 2-form: the vector field u * omega.

    block @ primal(omega2) equals the dual DoFs of (u_x omega, u_y omega) as
    a 1-form (the evaluator's -1 coefficient composes with the edge_surf
    metric terms to give the positive product).
    """
    omega = KFormUnknown("omega", UnknownFormOrder.FORM_ORDER_2)
    w2 = omega.weight
    q = KFormUnknown("q", UnknownFormOrder.FORM_ORDER_1)
    v = q.weight
    system = KFormSystem(
        (v @ (u_field * omega)) + v @ q == 0,
        (w2 @ q.derivative) == 0,
    )
    batch = _space(corner_vals)
    comp = CompiledSystem(system)
    statics = evaluate_static_fields(batch, comp.fields)
    emat = np.asarray(
        compute_element_matrices(
            system.unknown_forms, comp.lhs_blocks, batch, static_fields=statics
        )
    )[0]
    names = system.unknown_forms.names
    sizes = system.unknown_forms.form_sizes(N, N)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    iq = names.index("q")
    io = names.index("omega")
    block = emat[offs[iq] : offs[iq + 1], offs[io] : offs[io + 1]]

    def exact(x, y):
        uf = u_field(x, y)
        of = omega_2(x, y)
        return np.stack((uf[..., 0] * of, uf[..., 1] * of), axis=-1)

    omega_proj = np.asarray(
        element_primal_dofs(UnknownFormOrder.FORM_ORDER_2, batch, omega_2)
    )[0]
    lhs = block @ omega_proj
    rhs = np.asarray(
        element_dual_dofs(UnknownFormOrder.FORM_ORDER_1, batch, exact)
    )[0]
    assert np.allclose(lhs, rhs, atol=1e-8 * max(1, np.abs(rhs).max())), (
        np.abs(lhs - rhs).max()
    )


@pytest.mark.parametrize("corner_vals", _CORNER_TEST_VALUES[:3])
def test_nonlinear_interior_matches_static(corner_vals):
    """Lowered (solution-dependent) interior product == static-field variant.

    When the unknown 1-form's DoFs reproduce the same vector field, the
    nonlinear path (field reconstructed from DoFs in-trace) must produce the
    same block as the static callable path, up to projection error.
    """
    omega = KFormUnknown("omega", UnknownFormOrder.FORM_ORDER_1)
    v = omega.weight
    g = KFormUnknown("g", UnknownFormOrder.FORM_ORDER_0)
    w = g.weight

    batch = _space(corner_vals)

    static_system = KFormSystem(
        (w @ (u_field * omega)) == 0,
        (v @ g.derivative) == 0,
        sorting=lambda f: f.order,
    )
    comp_s = CompiledSystem(static_system)
    statics = evaluate_static_fields(batch, comp_s.fields)
    mat_static = np.asarray(
        compute_element_matrices(
            static_system.unknown_forms, comp_s.lhs_blocks, batch,
            static_fields=statics,
        )
    )[0]

    # Nonlinear: field = the omega unknown itself, with DoFs set to u_field.
    nl_system = KFormSystem(
        (w @ (omega * omega)) == 0,
        (v @ g.derivative) == 0,
        sorting=lambda f: f.order,
    )
    comp_n = CompiledSystem(nl_system)
    assert comp_n.nonlin_blocks is not None

    u_proj = np.asarray(
        element_primal_dofs(UnknownFormOrder.FORM_ORDER_1, batch, u_field)
    )
    n0 = (N + 1) * (N + 1)
    n1 = UnknownFormOrder.FORM_ORDER_1.full_unknown_count(N, N)
    dofs = np.zeros((1, n0 + n1))
    # omega comes first in this sorted system? locate it.
    names = nl_system.unknown_forms.names
    sizes = nl_system.unknown_forms.form_sizes(N, N)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    io = names.index("omega")
    dofs[:, offs[io] : offs[io + 1]] = u_proj
    mat_nl = np.asarray(
        compute_element_matrices(
            nl_system.unknown_forms, comp_n.lhs_blocks, batch,
            dofs=np.asarray(dofs),
        )
    )[0]
    # The interior-product block row (g equation, omega column):
    ig = names.index("g")
    blk_s = mat_static[offs[ig] : offs[ig + 1], offs[io] : offs[io + 1]]
    blk_n = mat_nl[offs[ig] : offs[ig + 1], offs[io] : offs[io + 1]]
    # u_field is degree <= 4 per direction < N = 6, so its projection is
    # exact and the two paths agree to quadrature accuracy.
    assert np.allclose(blk_s, blk_n, atol=1e-9 * max(1, np.abs(blk_s).max()))

"""Golden parity vs the reference implementation (VERDICT round-1 item 6).

Fixtures in ``tests/golden/reference_fixtures.npz`` were produced by RUNNING
the reference's own NumPy quadrature/projection/reconstruction loops
(python/mfv2d/mimetic2d.py) — see ``tests/golden/make_reference_fixtures.py``
for the generator.  Everything here must match to 1e-10 relative error
(BASELINE.md numerical-parity target).
"""

from pathlib import Path

import numpy as np
import pytest

from mfv2d_tpu.evaluation import ElementBatch
from mfv2d_tpu.kform import UnknownFormOrder
from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.ops.geometry import jacobian
from mfv2d_tpu.ops.incidence import (
    apply_e10,
    apply_e10_t,
    apply_e21,
    apply_e21_t,
    incidence_10,
    incidence_21,
)
from mfv2d_tpu.projection import element_dual_dofs, element_primal_dofs, reconstruct

FIX = np.load(Path(__file__).parent / "golden" / "reference_fixtures.npz")
QUADS = FIX["quads"]


def _rel_ok(mine, ref, tol=1e-10):
    mine = np.asarray(mine)
    ref = np.asarray(ref)
    scale = max(float(np.abs(ref).max()), 1e-30)
    err = float(np.abs(mine - ref).max()) / scale
    assert err < tol, err


@pytest.mark.parametrize("p", [2, 3, 4, 5])
def test_incidence_matrices_match_reference(p):
    _rel_ok(incidence_10(p, p), FIX[f"e10_p{p}"])
    _rel_ok(incidence_21(p, p), FIX[f"e21_p{p}"])


@pytest.mark.parametrize("p", [2, 3, 4, 5])
def test_incidence_applications_match_reference(p):
    from mfv2d_tpu.ops.incidence import apply_e10_r, apply_e21_rt

    _rel_ok(apply_e10(p, p, FIX[f"in0_p{p}"]), FIX[f"apply_e10_p{p}"])
    _rel_ok(apply_e21(p, p, FIX[f"in1_p{p}"]), FIX[f"apply_e21_p{p}"])
    _rel_ok(apply_e10_t(p, p, FIX[f"in1_p{p}"]), FIX[f"apply_e10_t_p{p}"])
    _rel_ok(apply_e21_t(p, p, FIX[f"in2_p{p}"]), FIX[f"apply_e21_t_p{p}"])
    _rel_ok(apply_e10_r(p, p, FIX[f"in1_p{p}"].T), FIX[f"apply_e10_r_p{p}"])
    _rel_ok(apply_e21_rt(p, p, FIX[f"in1_p{p}"].T), FIX[f"apply_e21_rt_p{p}"])


@pytest.mark.parametrize("qi", range(4))
def test_jacobian_matches_reference(qi):
    xi = FIX["jac_xi"]
    eta = FIX["jac_eta"]
    jac = jacobian(QUADS[qi], xi, eta)
    ref = FIX[f"jac_q{qi}"]
    for k, mine in enumerate((jac.j00, jac.j01, jac.j10, jac.j11)):
        _rel_ok(np.broadcast_to(np.asarray(mine), ref[k].shape), ref[k])


def scalar_f(x, y):
    return np.sin(x) * np.exp(0.5 * y) + 2.0


def vector_f(x, y):
    return np.stack((np.cos(x * y), x**2 - y), axis=-1)


_FORMS = {
    0: (UnknownFormOrder.FORM_ORDER_0, scalar_f),
    1: (UnknownFormOrder.FORM_ORDER_1, vector_f),
    2: (UnknownFormOrder.FORM_ORDER_2, scalar_f),
}


@pytest.mark.parametrize("qi", range(3))
@pytest.mark.parametrize("orders", [(3, 3), (5, 5), (3, 5)])
@pytest.mark.parametrize("k", [0, 1, 2])
def test_projection_reconstruction_matches_reference(qi, orders, k):
    p1, p2 = orders
    order, fn = _FORMS[k]
    basis = FemCache(2).get_basis2d(p1, p2)
    batch = ElementBatch(basis, QUADS[qi][None])
    tag = f"q{qi}_p{p1}{p2}"

    dual = np.asarray(element_dual_dofs(order, batch, fn))[0]
    _rel_ok(dual, FIX[f"dual_{tag}_k{k}"])

    primal = np.asarray(element_primal_dofs(order, batch, fn))[0]
    _rel_ok(primal, FIX[f"primal_{tag}_k{k}"])

    recon = reconstruct(
        QUADS[qi], basis, order, FIX[f"primal_{tag}_k{k}"],
        FIX["recon_xi"], FIX["recon_eta"],
    )
    _rel_ok(recon, FIX[f"recon_{tag}_k{k}"])


def test_compiler_output_matches_reference():
    """The lowered + simplified systems print byte-identically.

    Fixture from tests/golden/make_compiler_fixtures.py, which runs the
    REFERENCE kform/system/eval compiler; this pins the DSL operator
    semantics, the lowering rules, and the peephole simplifier.
    """
    import mfv2d_tpu.compiler as my_compiler
    import mfv2d_tpu.kform as my_kform
    import mfv2d_tpu.system as my_system

    import sys

    sys.path.insert(0, str(Path(__file__).parent / "golden"))
    try:
        from make_compiler_fixtures import render
    finally:
        sys.path.pop(0)

    golden = (
        Path(__file__).parent / "golden" / "reference_compiler_strings.txt"
    ).read_text()
    mine = render(my_kform, my_system, my_compiler.system_as_string)
    assert mine == golden


@pytest.mark.parametrize("qi", [0, 1, 2])
@pytest.mark.parametrize("orders", [(3, 3), (3, 5)])
@pytest.mark.parametrize("k", [0, 1, 2])
def test_mass_matrices_match_independent_quadrature(qi, orders, k):
    """Batched device masses vs INDEPENDENT numpy.polynomial + leggauss
    quadrature (round-2 VERDICT circularity fix: no mfv2d_tpu kernel is
    involved in producing the fixture values)."""
    p1, p2 = orders
    cache = FemCache(2)
    batch = ElementBatch(cache.get_basis2d(p1, p2), QUADS[qi][None])
    order = UnknownFormOrder(k + 1)
    mine = np.asarray(batch.mass(order, False))[0]
    _rel_ok(mine, FIX[f"imass{k}_q{qi}_p{p1}{p2}"], tol=1e-11)


def test_full_solution_matches_independent_assembly():
    """4x4 p=3 mixed Poisson: the production pipeline's DoF vector equals
    the fixture solution assembled from independent masses, the
    reference's NumPy incidence, and a SciPy saddle solve (the round-2
    VERDICT full-solution-fixture ask).

    The manufactured solution vanishes on the boundary, so the weak
    boundary term is identically zero on both sides.
    """
    import mfv2d_tpu as mf
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.solver.discretization import discretize_mesh
    from mfv2d_tpu.solver.solve import (
        FrozenSaddleSolver,
        SystemEvaluator,
        compute_linear_system,
        non_linear_solve_run,
    )

    def u_exact(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def source_exact(x, y):
        return -(np.pi**2) / 2 * np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(4, 4, 3)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(2))
    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(disc.form_spec, compiled, disc)
    forcing, matrices, lagrange_mat, lagrange_vec = compute_linear_system(
        disc, system, evaluator, [], [], None
    )
    solver = FrozenSaddleSolver(
        evaluator.matrices_per_leaf(matrices), lagrange_mat
    )
    explicit_vec = np.concatenate((forcing, lagrange_vec))
    solution, _, _, _, _ = non_linear_solve_run(
        20, 1.0, 1e-12, 0.0, False, evaluator, explicit_vec, None, None,
        np.zeros(disc.n_dofs), np.zeros(lagrange_mat.shape[0]),
        float(np.abs(explicit_vec).max()), solver, lagrange_mat,
    )
    _rel_ok(solution, FIX["solution_mixed_poisson_4x4_p3"], tol=1e-10)

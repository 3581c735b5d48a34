"""Fused pair-table assembly vs the stack-machine evaluator.

The fused path (ops/fused_assembly.py) must reproduce the fallback path to
floating-point roundoff for every linearizable block type; systems with mass
inverses in the chain must transparently fall back.
"""

import numpy as np
import pytest

import mfv2d_tpu as mf
from mfv2d_tpu.compiler import CompiledSystem
from mfv2d_tpu.config import config
from mfv2d_tpu.evaluation import (
    ElementBatch,
    compute_element_matrices,
    compute_fields,
    evaluate_block,
    evaluate_static_fields,
)
from mfv2d_tpu.kform import KFormUnknown, UnknownFormOrder
from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.ops.fused_assembly import NotLinear, try_plan


def _corners(n_elem, seed=3):
    rng = np.random.default_rng(seed)
    base = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
    return np.tile(base, (n_elem, 1, 1)) + 0.08 * rng.normal(size=(n_elem, 4, 2))


def vec_field(x, y):
    x = np.asarray(x)
    y = np.asarray(y)
    return np.stack((np.sin(x) + 0.5, np.cos(y) - 0.2), axis=-1)


def _mixed_poisson():
    u = KFormUnknown("u", UnknownFormOrder.FORM_ORDER_2)
    q = KFormUnknown("q", UnknownFormOrder.FORM_ORDER_1)
    return mf.KFormSystem(
        q.weight.derivative @ u - q.weight @ q == 0,
        u.weight @ q.derivative == 0,
    )


def _direct_poisson():
    # E10^T M1 E10 chain plus a 0-form reaction term.
    u = KFormUnknown("u", UnknownFormOrder.FORM_ORDER_0)
    return mf.KFormSystem(
        u.weight.derivative @ u.derivative + 0.25 * (u.weight @ u) == 0,
    )


def _advection_static():
    # Linear advection with a static vector field: InterProd blocks.
    u = KFormUnknown("u", UnknownFormOrder.FORM_ORDER_2)
    q = KFormUnknown("q", UnknownFormOrder.FORM_ORDER_1)
    return mf.KFormSystem(
        q.weight @ (u * vec_field)
        + 0.1 * (q.weight @ q)
        == 0,
        u.weight @ q.derivative + 2.0 * (u.weight @ u) == 0,
    )


def _advection_nonlinear():
    # Advection by an unknown 1-form (the nonlinear coupling).
    w = KFormUnknown("vort", UnknownFormOrder.FORM_ORDER_2)
    q = KFormUnknown("mom", UnknownFormOrder.FORM_ORDER_1)
    return mf.KFormSystem(
        q.weight @ (q * w) + q.weight @ q == 0,
        w.weight @ q.derivative + w.weight @ w == 0,
    )


def _advection_on_weight():
    # Interior product applied to the WEIGHT (transposed IP chain): this is
    # the advdif example's stabilization term and exercises the NotLinear
    # fallback path (IP^T composed with a mass).
    u = KFormUnknown("u", UnknownFormOrder.FORM_ORDER_2)
    q = KFormUnknown("q", UnknownFormOrder.FORM_ORDER_1)
    v = u.weight
    p = q.weight
    return mf.KFormSystem(
        p @ q + p.derivative @ u == 0,
        v @ q.derivative - ((vec_field * v) @ q) == 0,
    )


def _stokes():
    from mfv2d_tpu.models import flow

    return flow.stokes_flow().system


def _heat_marched():
    from mfv2d_tpu.models import transport
    from mfv2d_tpu.solve_system_2d import update_system_for_time_march
    from mfv2d_tpu.solver.solve import TimeSettings

    model = transport.heat_mixed(0.7, 1.3, lambda x, y: 0 * x + 1.0)
    return update_system_for_time_march(
        TimeSettings(dt=0.02, nt=1, time_march_relations=model.time_march_relations),
        model.system,
    )


SYSTEMS = {
    "mixed_poisson": _mixed_poisson,
    "direct_poisson": _direct_poisson,
    "advection_static": _advection_static,
    "advection_nonlinear": _advection_nonlinear,
    "advection_on_weight": _advection_on_weight,
    "stokes": _stokes,
    "heat_marched": _heat_marched,
}


@pytest.mark.parametrize("name", sorted(SYSTEMS))
@pytest.mark.parametrize("orders", [(4, 4), (3, 5)])
def test_fused_matches_fallback(name, orders, monkeypatch):
    system = SYSTEMS[name]()
    compiled = CompiledSystem(system)
    p1, p2 = orders
    basis = FemCache(2).get_basis2d(p1, p2)
    batch = ElementBatch(basis, _corners(7))
    spec = system.unknown_forms
    n = spec.total_size(p1, p2)
    rng = np.random.default_rng(11)
    dofs = rng.normal(size=(7, n))
    statics = evaluate_static_fields(batch, compiled.fields)

    monkeypatch.setattr(config, "fused_assembly", True)
    fused = np.asarray(
        compute_element_matrices(
            spec, compiled.lhs_blocks, batch, dofs=dofs, static_fields=statics
        )
    )
    monkeypatch.setattr(config, "fused_assembly", False)
    ref = np.asarray(
        compute_element_matrices(
            spec, compiled.lhs_blocks, batch, dofs=dofs, static_fields=statics
        )
    )
    scale = np.abs(ref).max()
    assert np.abs(fused - ref).max() < 1e-12 * max(scale, 1.0)


@pytest.mark.parametrize("name", ["mixed_poisson", "advection_static", "stokes"])
def test_ozaki_assembly_route_is_f64_grade(name, monkeypatch):
    """The exact-sum Ozaki assembly route (default on TPU) must match the
    native-f64 GEMM assembly to f64-GEMM roundoff — it replaces the
    ~3 GFLOP/s emulated products without an accuracy trade (the old
    ~1e-12-relative opt-in bound no longer applies)."""
    import jax

    from mfv2d_tpu.ops import fused_assembly as fa

    monkeypatch.setattr(fa, "_OZAKI_ASSEMBLY_MIN_FLOPS", 0.0)
    system = SYSTEMS[name]()
    compiled = CompiledSystem(system)
    basis = FemCache(2).get_basis2d(4, 4)
    batch = ElementBatch(basis, _corners(5))
    spec = system.unknown_forms
    rng = np.random.default_rng(13)
    dofs = rng.normal(size=(5, spec.total_size(4, 4)))
    statics = evaluate_static_fields(batch, compiled.fields)

    monkeypatch.setattr(config, "fused_assembly", True)
    monkeypatch.setattr(config, "ozaki_assembly", "0")
    ref = np.asarray(
        compute_element_matrices(
            spec, compiled.lhs_blocks, batch, dofs=dofs, static_fields=statics
        )
    )
    monkeypatch.setattr(config, "ozaki_assembly", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    oz = np.asarray(
        compute_element_matrices(
            spec, compiled.lhs_blocks, batch, dofs=dofs, static_fields=statics
        )
    )
    monkeypatch.undo()
    scale = np.abs(ref).max()
    assert np.abs(oz - ref).max() < 5e-14 * max(scale, 1.0)


def test_fused_plans_cover_linear_blocks():
    """Every block of the linear test systems gets a fused plan."""
    system = _mixed_poisson()
    compiled = CompiledSystem(system)
    basis = FemCache(2).get_basis2d(4, 4)
    batch = ElementBatch(basis, _corners(2))
    planned = 0
    for row in compiled.lhs_blocks:
        for block in row:
            if block is None:
                continue
            assert try_plan(block, batch) is not None
            planned += 1
    assert planned == 3


def test_mass_inverse_falls_back():
    """A chain with a surviving mass inverse must be rejected, not wrong."""
    from mfv2d_tpu.compiler import MassMat
    from mfv2d_tpu.ops.fused_assembly import linearize_block
    from mfv2d_tpu.ops.mass import tensor_basis

    basis = FemCache(2).get_basis2d(3, 3)
    tb = tensor_basis(basis)
    with pytest.raises(NotLinear):
        linearize_block(
            (MassMat(UnknownFormOrder.FORM_ORDER_0, True),), tb, 3, 3
        )


def test_scaled_sum_time_march_block():
    """The unsteady LHS pattern M + (2/dt) M lowers to one merged table."""
    u = KFormUnknown("u", UnknownFormOrder.FORM_ORDER_2)
    q = KFormUnknown("q", UnknownFormOrder.FORM_ORDER_1)
    system = mf.KFormSystem(
        q.weight.derivative @ u - q.weight @ q == 0,
        u.weight @ q.derivative + 20.0 * (u.weight @ u) == 0,
    )
    compiled = CompiledSystem(system)
    basis = FemCache(2).get_basis2d(4, 4)
    batch = ElementBatch(basis, _corners(5))
    spec = system.unknown_forms
    fused = np.asarray(
        compute_element_matrices(spec, compiled.lhs_blocks, batch)
    )
    from mfv2d_tpu.config import config as cfg

    old = cfg.fused_assembly
    try:
        cfg.fused_assembly = False
        ref = np.asarray(
            compute_element_matrices(spec, compiled.lhs_blocks, batch)
        )
    finally:
        cfg.fused_assembly = old
    assert np.abs(fused - ref).max() < 1e-12 * np.abs(ref).max()

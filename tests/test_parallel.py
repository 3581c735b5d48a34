"""Multi-device element-parallel solve on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import mfv2d_tpu as mf
from mfv2d_tpu.compiler import CompiledSystem
from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.parallel.sharding import ShardedBlockSystem, sharded_schur_solve
from mfv2d_tpu.solver.discretization import discretize_mesh
from mfv2d_tpu.solver.iterative import BlockSaddleSystem, solve_schur_iterative
from mfv2d_tpu.solver.solve import (
    ConvergenceSettings,
    SystemEvaluator,
    compute_linear_system,
)


def u_exact(x, y):
    return 2 * np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y) + 5


def source_exact(x, y):
    return -(np.pi**2) * np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)


def _setup(n=4, p=3):
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(n, n, p)
    cache = FemCache(3)
    disc = discretize_mesh(mesh, system.unknown_forms, cache)
    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
    forcing, matrices, lagrange_mat, lagrange_vec = compute_linear_system(
        disc, system, evaluator, [], [], None
    )
    return disc, forcing, matrices, lagrange_mat, lagrange_vec


@pytest.fixture(scope="module")
def device_mesh():
    devices = np.array(jax.devices())
    assert devices.size >= 8, "conftest should provide 8 virtual CPU devices"
    return Mesh(devices[:8], axis_names=("e",))


def test_sharded_operators_match_single_device(device_mesh):
    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup()
    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)

    rng = np.random.default_rng(0)
    lam = rng.normal(size=lagrange_mat.shape[0])
    x = rng.normal(size=disc.n_dofs)

    # Schur matvec parity
    schur_sharded = np.asarray(sharded.make_schur_matvec()(jnp.asarray(lam)))
    schur_single = np.asarray(single.apply_schur(jnp.asarray(lam)))
    assert np.allclose(schur_sharded, schur_single, atol=1e-10)

    # Full saddle application parity
    apply_saddle = sharded.make_residual_step()
    au, gu = apply_saddle(sharded.shard_dofs(x), jnp.asarray(lam))
    au_single = single.apply_diagonal(jnp.asarray(x)) + single.apply_trace_transpose(
        jnp.asarray(lam)
    )
    gu_single = single.apply_trace(jnp.asarray(x))
    assert np.allclose(sharded.unshard_dofs(au), np.asarray(au_single), atol=1e-10)
    assert np.allclose(np.asarray(gu), np.asarray(gu_single), atol=1e-10)


def test_sharded_schur_solve_matches(device_mesh):
    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(3, 3)
    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    conv = ConvergenceSettings(3000, 1e-11, 0.0)
    u_ref, lam_ref, _, _ = solve_schur_iterative(
        single, jnp.asarray(forcing), jnp.asarray(lagrange_vec), conv
    )

    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)
    u_sh, lam_sh, res, iters = sharded_schur_solve(
        sharded, forcing, lagrange_vec, 3000, 1e-11
    )
    assert np.allclose(u_sh, np.asarray(u_ref), atol=1e-7), np.abs(
        u_sh - np.asarray(u_ref)
    ).max()


def test_uneven_element_count_padding(device_mesh):
    """9 elements over 8 devices: the padded path must still be exact."""
    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(3, 2)
    assert disc.n_leaves == 9
    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)
    rng = np.random.default_rng(5)
    lam = rng.normal(size=lagrange_mat.shape[0])
    assert np.allclose(
        np.asarray(sharded.make_schur_matvec()(jnp.asarray(lam))),
        np.asarray(single.apply_schur(jnp.asarray(lam))),
        atol=1e-10,
    )


def test_multibucket_sharded_solve(device_mesh):
    """hp mesh (two order buckets) sharded solve matches single-device."""
    from mfv2d_tpu.parallel.sharding import MultiBucketShardedSystem

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    orders = np.array(
        [[2, 2], [3, 3], [2, 2], [3, 3], [2, 2], [3, 3], [2, 2], [3, 3], [2, 2]]
    )
    mesh = mf.examples.unit_square_mesh(3, 3, orders)
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.solver.discretization import discretize_mesh
    from mfv2d_tpu.solver.solve import SystemEvaluator, compute_linear_system

    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(3))
    assert len(disc.buckets) == 2
    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
    forcing, matrices, lagrange_mat, lagrange_vec = compute_linear_system(
        disc, system, evaluator, [], [], None
    )

    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    conv = ConvergenceSettings(3000, 1e-11, 0.0)
    u_ref, lam_ref, _, _ = solve_schur_iterative(
        single, jnp.asarray(forcing), jnp.asarray(lagrange_vec), conv
    )

    sharded = MultiBucketShardedSystem(disc, matrices, lagrange_mat, device_mesh)
    # matvec parity first
    rng = np.random.default_rng(2)
    lam = jnp.asarray(rng.normal(size=lagrange_mat.shape[0]))
    assert np.allclose(
        np.asarray(sharded.make_schur_matvec()(lam)),
        np.asarray(single.apply_schur(lam)),
        atol=1e-10,
    )
    u_sh, lam_sh, res, iters = sharded.solve_schur(
        forcing, lagrange_vec, 3000, 1e-11
    )
    assert np.allclose(u_sh, np.asarray(u_ref), atol=1e-7), np.abs(
        u_sh - np.asarray(u_ref)
    ).max()


def test_sharded_mixed_precision_branch(device_mesh, monkeypatch):
    """The TPU refined-f32 LU branch must match the f64 path (forced on CPU)."""
    import mfv2d_tpu.parallel.sharding as sh

    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(3, 3)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)
    monkeypatch.undo()
    assert sharded._refine

    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    conv = ConvergenceSettings(3000, 1e-11, 0.0)
    u_ref, _, _, _ = solve_schur_iterative(
        single, jnp.asarray(forcing), jnp.asarray(lagrange_vec), conv
    )
    u_sh, _, _, _ = sh.sharded_schur_solve(
        sharded, forcing, lagrange_vec, 3000, 1e-11
    )
    assert np.allclose(u_sh, np.asarray(u_ref), atol=1e-9), np.abs(
        u_sh - np.asarray(u_ref)
    ).max()


def test_sharded_assembly_matches_host(device_mesh):
    """from_assembly (per-device fused assembly) equals host assembly."""
    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(3, 3)
    from mfv2d_tpu.compiler import CompiledSystem

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    compiled = CompiledSystem(system)
    sharded = ShardedBlockSystem.from_assembly(
        disc, compiled.lhs_blocks, lagrange_mat, device_mesh
    )
    e = matrices[0].shape[0]
    assert np.allclose(
        np.asarray(sharded.blocks)[:e], matrices[0], atol=1e-12
    )
    # Padding rows (if any) must be identity.
    n = matrices[0].shape[1]
    for i in range(e, sharded.e_padded):
        assert np.allclose(np.asarray(sharded.blocks)[i], np.eye(n))


def test_schur_matvec_uses_one_psum(device_mesh):
    """The sharded Schur matvec communicates exactly once per application."""
    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(3, 3)
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)
    lam = jnp.zeros(lagrange_mat.shape[0])
    schur = sharded._schur_shardmap()
    jaxpr = str(jax.make_jaxpr(lambda l: schur(l, *sharded._tables))(lam))
    assert jaxpr.count("psum") == 1, jaxpr.count("psum")


def test_condensed_trace_kernel_parity_and_one_psum(device_mesh):
    """The condensed [E,c,c] inner operator matches S to f32 representation
    accuracy and still communicates exactly once per application."""
    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(3, 3)
    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)
    assert sharded._use_condensed()
    rng = np.random.default_rng(11)
    lam = rng.normal(size=lagrange_mat.shape[0])
    y64 = np.asarray(single.apply_schur(jnp.asarray(lam)))
    kern = sharded._schur_c32_shardmap()
    tabs = sharded._tables_c32
    lam32 = jnp.asarray(lam, jnp.float32)
    y32 = np.asarray(jax.jit(lambda l: kern(l, *tabs))(lam32))
    rel = np.linalg.norm(y32 - y64) / np.linalg.norm(y64)
    assert rel < 2e-6, rel
    # The condensed block batch is strictly smaller than the full inverse.
    assert tabs[0].shape[1] < sharded.blocks.shape[1]
    jaxpr = str(jax.make_jaxpr(lambda l: kern(l, *tabs))(lam32))
    assert jaxpr.count("psum") == 1, jaxpr.count("psum")


def test_condensed_mixed_solve_matches_legacy_inner(device_mesh, monkeypatch):
    """The mixed trace solve reaches the same solution with the condensed
    inner operator (default) and with the legacy full-block f32 inner."""
    monkeypatch.setenv("MFV2D_TPU_SHARDED_MIXED", "1")
    from mfv2d_tpu.config import config
    from mfv2d_tpu.parallel.sharding import _trace_krylov

    monkeypatch.setattr(config, "sharded_mixed", "1")
    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(3, 3)
    rng = np.random.default_rng(12)
    rhs = jnp.asarray(rng.normal(size=lagrange_mat.shape[0]))
    tol = 1e-10 * float(jnp.linalg.norm(rhs))

    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)
    lam_c, rr_c, _ = _trace_krylov(sharded, "cg", 3000)(rhs, tol)
    assert float(rr_c) <= tol * tol * 1.01

    monkeypatch.setattr(config, "condensed_trace", False)
    fresh = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)
    lam_l, rr_l, _ = _trace_krylov(fresh, "cg", 3000)(rhs, tol)
    assert np.allclose(np.asarray(lam_c), np.asarray(lam_l), atol=1e-8)


def test_condensed_f32x2_route_when_seed_gate_fails(device_mesh, monkeypatch):
    """Systems failing the f32 seed gate route to the condensed hi/lo
    kernel and still solve; the hi/lo pair represents the blocks to
    ~eps_f32^2."""
    from mfv2d_tpu.config import config
    from mfv2d_tpu.parallel.sharding import _trace_krylov

    monkeypatch.setattr(config, "sharded_mixed", "1")
    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(3, 3)
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)
    sharded._inner32_ok = False  # force the accurate gate
    kern, tabs, n32 = sharded._inner32_kernel(True)
    assert n32 == 5  # condensed hi/lo tables
    rng = np.random.default_rng(13)
    rhs = jnp.asarray(rng.normal(size=lagrange_mat.shape[0]))
    tol = 1e-10 * float(jnp.linalg.norm(rhs))
    lam, rr, _ = _trace_krylov(sharded, "cg", 3000)(rhs, tol)
    assert float(rr) <= tol * tol * 1.01
    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    r_true = np.asarray(rhs) - np.asarray(
        single.apply_schur(jnp.asarray(np.asarray(lam)))
    )
    assert np.linalg.norm(r_true) <= 10 * tol


def test_picard_residual_one_psum_and_parity(device_mesh):
    """The sharded residual needs one psum and matches the host residual."""
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.solver.solve import SystemEvaluator

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(4, 4, 3)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(3))
    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
    forcing, matrices, lagrange_mat, lagrange_vec = compute_linear_system(
        disc, system, evaluator, [], [], None
    )
    sharded = ShardedBlockSystem.from_assembly(
        disc, compiled.linear_blocks, lagrange_mat, device_mesh
    )
    residual_fn = sharded.make_picard_residual(
        system.unknown_forms, compiled.lhs_blocks, compiled.rhs_blocks
    )
    rng = np.random.default_rng(8)
    x = rng.normal(size=disc.n_dofs)
    lam = rng.normal(size=lagrange_mat.shape[0])
    b = sharded.shard_dofs(forcing)
    r_elem, g_u = residual_fn(sharded.shard_dofs(x), jnp.asarray(lam), b)

    jaxpr = str(
        jax.make_jaxpr(residual_fn)(sharded.shard_dofs(x), jnp.asarray(lam), b)
    )
    assert jaxpr.count("psum") == 1, jaxpr.count("psum")

    # Host reference residual.
    lhs_val = evaluator.residual_value(x)
    r_host = forcing - lhs_val - lagrange_mat.T @ lam
    g_host = lagrange_mat @ x
    assert np.allclose(sharded.unshard_dofs(r_elem), r_host, atol=1e-10)
    assert np.allclose(np.asarray(g_u), g_host, atol=1e-10)


def test_fused_cg_matches_host_loop(device_mesh):
    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(3, 3)
    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    conv = ConvergenceSettings(3000, 1e-11, 0.0)
    u_ref, lam_ref, _, _ = solve_schur_iterative(
        single, jnp.asarray(forcing), jnp.asarray(lagrange_vec), conv
    )
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)
    u_sh, lam_sh, res, iters = sharded_schur_solve(
        sharded, forcing, lagrange_vec, 3000, 1e-11
    )
    assert iters > 1
    assert res <= 1e-11
    assert np.allclose(u_sh, np.asarray(u_ref), atol=1e-7)


def test_sharded_steady_solve_matches_solve_system_2d(device_mesh):
    """Full sharded pipeline (assembly -> Picard -> Schur) vs the host solve."""
    from mfv2d_tpu.parallel.sharding import sharded_steady_solve

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(4, 4, 3)
    cache = FemCache(3)
    disc = discretize_mesh(mesh, system.unknown_forms, cache)

    u_sh, lam_sh, residuals = sharded_steady_solve(
        system, disc, device_mesh, absolute_tolerance=1e-10
    )
    assert residuals[-1] <= 1e-10

    # Host reference through the standard path.
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.solver.iterative import solve_schur_iterative as ssi
    from mfv2d_tpu.solver.solve import SystemEvaluator

    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
    forcing, matrices, lagrange_mat, lagrange_vec = compute_linear_system(
        disc, system, evaluator, [], [], None
    )
    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    conv = ConvergenceSettings(5000, 1e-12, 0.0)
    u_ref, _, _, _ = ssi(
        single, jnp.asarray(forcing), jnp.asarray(lagrange_vec), conv
    )
    assert np.allclose(u_sh, np.asarray(u_ref), atol=1e-7), np.abs(
        u_sh - np.asarray(u_ref)
    ).max()


def test_sharded_time_march_matches_host(device_mesh):
    """The fully sharded linear march bit-matches the host march."""
    from mfv2d_tpu.parallel.sharding import sharded_time_march

    def final_u(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    from mfv2d_tpu.models import transport

    # Mixed form: the trace Schur complement is definite, which the
    # sharded CG (like the reference's trace CG) requires.
    model = transport.reaction_mixed(1.5, final_u)
    nt, dt = 6, 0.05
    settings = mf.TimeSettings(
        dt=dt, nt=nt, time_march_relations=model.time_march_relations,
        sample_rate=2,
    )
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    sols_host, _, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system),
        mf.SolverSettings(mf.ConvergenceSettings(20, 1e-12, 0)),
        time_settings=settings,
        recon_order=3,
    )

    mesh2 = mf.examples.unit_square_mesh(3, 3, 3)
    disc = discretize_mesh(
        mesh2, model.system.unknown_forms, FemCache(3)
    )
    us, sample_steps, lam = sharded_time_march(
        model.system, disc, device_mesh, settings, cg_tolerance=1e-13
    )
    assert list(sample_steps) == [0, 2, 4, 5]

    # Compare the final state's reconstruction against the host grids.
    from mfv2d_tpu.solver.solve import reconstruct_mesh_from_solution

    grid = reconstruct_mesh_from_solution(disc, 3, us[-1])
    host_final = sols_host[-1]
    assert np.allclose(
        grid.point_data[model.u.label],
        host_final.point_data[model.u.label],
        atol=1e-8,
    ), np.abs(
        grid.point_data[model.u.label] - host_final.point_data[model.u.label]
    ).max()


def test_sharded_gmres_solves_nonsymmetric(device_mesh):
    """Advection makes the trace Schur nonsymmetric: GMRES still converges."""
    from mfv2d_tpu.parallel.sharding import sharded_steady_solve

    def a_field(x, y):
        return np.stack((1.5 + 0 * x, -0.8 + 0 * y), axis=-1)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative - ((a_field * v) @ q) == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(3))
    u_sh, lam_sh, residuals = sharded_steady_solve(
        system,
        disc,
        device_mesh,
        absolute_tolerance=1e-9,
        krylov_method="gmres",
    )
    assert residuals[-1] <= 1e-9

    # Host reference through the frozen direct solver.
    sols, _, _ = mf.solve_system_2d(
        mf.examples.unit_square_mesh(3, 3, 3),
        mf.SystemSettings(system),
        mf.SolverSettings(mf.ConvergenceSettings(20, 1e-11, 0)),
        recon_order=3,
    )
    from mfv2d_tpu.solver.solve import reconstruct_mesh_from_solution

    grid = reconstruct_mesh_from_solution(disc, 3, u_sh)
    assert np.allclose(
        grid.point_data["u"], sols[-1].point_data["u"], atol=1e-7
    ), np.abs(grid.point_data["u"] - sols[-1].point_data["u"]).max()


def test_sharded_rejects_singular_element_blocks(device_mesh):
    """Direct-form (singular per-element A) raises a clear error."""
    import pytest

    from mfv2d_tpu.parallel.sharding import sharded_steady_solve

    def ua(x, y):
        return x + 2 * y

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    p = q.weight
    system = mf.KFormSystem(
        v.derivative @ u.derivative == 0 * (v @ ua),
        p @ u.derivative - p @ q == 0,
        sorting=lambda f: f.order,
    )
    mesh = mf.examples.unit_square_mesh(3, 3, 2)
    bc = mf.BoundaryCondition2DSteady(u, mesh.boundary_indices, ua)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(3))
    with pytest.raises(ValueError, match="singular"):
        sharded_steady_solve(
            system,
            disc,
            device_mesh,
            boundary_conditions=[bc],
            krylov_method="gmres",
        )


def test_sharded_nonlinear_time_march_matches_host(device_mesh):
    """The sharded Picard march matches the host march on unsteady NS."""
    from mfv2d_tpu.models import flow
    from mfv2d_tpu.parallel.sharding import sharded_nonlinear_time_march

    def lid_velocity(x, y):
        on_lid = np.isclose(y, 1.0)
        return np.stack(
            (np.where(on_lid, 1.0, 0.0), np.zeros_like(y)), axis=-1
        )

    model = flow.cavity_flow(20.0, lid_velocity)
    nt, dt = 4, 0.25
    settings = mf.TimeSettings(
        dt=dt, nt=nt, time_march_relations=model.time_march_relations,
        sample_rate=2,
    )
    mesh = mf.examples.unit_square_mesh(3, 3, 2)
    bc = mf.BoundaryCondition2DSteady(
        model.velocity, mesh.boundary_indices, lid_velocity
    )
    sols_host, _, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system, [bc], [(0.0, model.pressure)]),
        mf.SolverSettings(ConvergenceSettings(40, 1e-11, 0)),
        time_settings=settings,
        recon_order=2,
    )

    mesh2 = mf.examples.unit_square_mesh(3, 3, 2)
    bc2 = mf.BoundaryCondition2DSteady(
        model.velocity, mesh2.boundary_indices, lid_velocity
    )
    disc = discretize_mesh(mesh2, model.system.unknown_forms, FemCache(3))
    us, sample_steps, lam, iters, residuals = sharded_nonlinear_time_march(
        model.system,
        disc,
        device_mesh,
        settings,
        boundary_conditions=[bc2],
        constrained_forms=[(0.0, model.pressure)],
        max_iterations=40,
        absolute_tolerance=1e-11,
        cg_tolerance=1e-13,
        krylov_method="gmres",
    )
    assert list(sample_steps) == [0, 2, 3]
    assert np.all(np.asarray(iters) >= 1)
    assert np.all(np.isfinite(us))

    from mfv2d_tpu.solver.solve import reconstruct_mesh_from_solution

    grid = reconstruct_mesh_from_solution(disc, 2, us[-1])
    host_final = sols_host[-1]
    err = np.abs(
        grid.point_data["vel"] - host_final.point_data["vel"]
    ).max()
    assert err < 1e-7, err


@pytest.mark.slow
def test_solve_system_2d_device_mesh(device_mesh):
    """solve_system_2d routes through the sharded paths via SolverSettings."""
    import pytest

    from mfv2d_tpu.models import transport

    def final_u(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    # Steady: mixed Poisson through the entry point, sharded vs host.
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(4, 4, 3)
    sols_host, stats_host, _ = mf.solve_system_2d(
        mesh, mf.SystemSettings(system)
    )
    mesh2 = mf.examples.unit_square_mesh(4, 4, 3)
    sols_sh, stats_sh, _ = mf.solve_system_2d(
        mesh2,
        mf.SystemSettings(system),
        mf.SolverSettings(
            mf.ConvergenceSettings(20, 1e-10, 0), device_mesh=device_mesh
        ),
    )
    assert stats_sh.n_leaf_dofs == stats_host.n_leaf_dofs
    assert np.allclose(
        sols_sh[-1].point_data["u"], sols_host[-1].point_data["u"], atol=1e-8
    )

    # Unsteady linear march through the entry point.
    model = transport.reaction_mixed(1.5, final_u)
    ts = mf.TimeSettings(
        dt=0.05, nt=4, time_march_relations=model.time_march_relations,
        sample_rate=2,
    )
    mesh3 = mf.examples.unit_square_mesh(3, 3, 3)
    sols_h2, _, _ = mf.solve_system_2d(
        mesh3,
        mf.SystemSettings(model.system),
        mf.SolverSettings(mf.ConvergenceSettings(20, 1e-12, 0)),
        time_settings=ts,
        recon_order=3,
    )
    mesh4 = mf.examples.unit_square_mesh(3, 3, 3)
    sols_s2, _, _ = mf.solve_system_2d(
        mesh4,
        mf.SystemSettings(model.system),
        mf.SolverSettings(
            mf.ConvergenceSettings(20, 1e-12, 0), device_mesh=device_mesh
        ),
        time_settings=ts,
        recon_order=3,
    )
    assert len(sols_s2) == len(sols_h2)
    assert float(sols_s2[-1].field_data["time"][0]) == float(
        sols_h2[-1].field_data["time"][0]
    )
    assert np.allclose(
        sols_s2[-1].point_data[model.u.label],
        sols_h2[-1].point_data[model.u.label],
        atol=1e-8,
    )

    # Round 5 removed the march-mode guards: device_mesh + method="newton"
    # + time_settings now runs through the host-driven sharded step loop
    # (parity pinned by test_sharded_newton_march_matches_host).  The one
    # remaining sharded-only guard is TimeDependent OPERATOR fields.
    from mfv2d_tpu.kform import TimeDependent

    def td_wind(x, y, t):
        return np.stack((np.cos(t) + 0 * x, 0 * y), axis=-1)

    u2 = mf.KFormUnknown("u2", mf.UnknownFormOrder.FORM_ORDER_2)
    v2 = u2.weight
    q2 = mf.KFormUnknown("q2", mf.UnknownFormOrder.FORM_ORDER_1)
    p2 = q2.weight
    td_system = mf.KFormSystem(
        p2.derivative @ u2 - p2 @ q2 == p2 ^ (lambda x, y: 0.0 * x),
        0.7 * (v2 @ q2.derivative) - (TimeDependent(td_wind) * v2 @ q2)
        == -(v2 @ (lambda x, y: 0.0 * x)),
    )
    with pytest.raises(NotImplementedError, match="single-device"):
        mf.solve_system_2d(
            mf.examples.unit_square_mesh(2, 2, 2),
            mf.SystemSettings(td_system),
            mf.SolverSettings(
                device_mesh=device_mesh, linear_solver="gmres"
            ),
            time_settings=mf.TimeSettings(
                dt=0.1, nt=2, time_march_relations={v2: u2}
            ),
        )


@pytest.mark.slow
def test_sharded_hp_march_matches_host(device_mesh):
    """The sharded march on an hp (2-bucket) mesh matches the host march."""
    from mfv2d_tpu.parallel.sharding import sharded_time_march

    def final_u(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    from mfv2d_tpu.models import transport

    model = transport.reaction_mixed(1.5, final_u)
    nt, dt = 4, 0.05
    settings = mf.TimeSettings(
        dt=dt, nt=nt, time_march_relations=model.time_march_relations,
    )
    orders = np.array(
        [[3 + ((i + j) % 2)] * 2 for j in range(3) for i in range(3)]
    )
    mesh = mf.examples.unit_square_mesh(3, 3, orders)
    sols_host, _, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system),
        mf.SolverSettings(mf.ConvergenceSettings(20, 1e-12, 0)),
        time_settings=settings,
        recon_order=3,
    )

    mesh2 = mf.examples.unit_square_mesh(3, 3, orders)
    disc = discretize_mesh(mesh2, model.system.unknown_forms, FemCache(3))
    assert len(disc.buckets) == 2
    us, sample_steps, lam = sharded_time_march(
        model.system, disc, device_mesh, settings, cg_tolerance=1e-13
    )

    from mfv2d_tpu.solver.solve import reconstruct_mesh_from_solution

    grid = reconstruct_mesh_from_solution(disc, 3, us[-1])
    host_final = sols_host[-1]
    err = np.abs(
        grid.point_data[model.u.label] - host_final.point_data[model.u.label]
    ).max()
    assert err < 1e-8, err


def test_mixed_trace_krylov_matches_f64(device_mesh):
    """f32-inner/f64-defect-correction Krylov equals the f64 fused loops.

    The mixed path is what runs on TPU backends (where f64 GEMVs are
    emulated); here it is exercised directly on the virtual CPU mesh.
    """
    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(3, 3)
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)

    rng = np.random.default_rng(5)
    rhs = rng.normal(size=lagrange_mat.shape[0])
    lam64, rs64, _ = sharded.make_fused_cg(3000)(rhs, 1e-12)
    lam_cg, rs_cg, it_cg = sharded.make_fused_cg_mixed(3000)(rhs, 1e-12)
    assert float(np.sqrt(float(rs_cg))) <= 1e-11
    assert int(it_cg) >= 1
    assert np.allclose(np.asarray(lam_cg), np.asarray(lam64), atol=1e-9)

    lam_gm, rs_gm, _ = sharded.make_fused_gmres_mixed(3000)(rhs, 1e-12)
    assert float(np.sqrt(float(rs_gm))) <= 1e-11
    assert np.allclose(np.asarray(lam_gm), np.asarray(lam64), atol=1e-9)


def test_mixed_trace_krylov_multibucket(device_mesh, monkeypatch):
    """hp (two-bucket) sharded solve through the forced mixed path."""
    from mfv2d_tpu.config import config
    from mfv2d_tpu.parallel.sharding import MultiBucketShardedSystem

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    orders = np.array([[2, 2], [3, 3]] * 4 + [[2, 2]])
    mesh = mf.examples.unit_square_mesh(3, 3, orders)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(3))
    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
    forcing, matrices, lagrange_mat, lagrange_vec = compute_linear_system(
        disc, system, evaluator, [], [], None
    )
    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    conv = ConvergenceSettings(3000, 1e-11, 0.0)
    u_ref, _, _, _ = solve_schur_iterative(
        single, jnp.asarray(forcing), jnp.asarray(lagrange_vec), conv
    )

    sharded = MultiBucketShardedSystem(disc, matrices, lagrange_mat, device_mesh)
    monkeypatch.setattr(config, "sharded_mixed", "1")
    u_sh, _, res, iters = sharded.solve_schur(forcing, lagrange_vec, 3000, 1e-11)
    assert iters >= 1
    assert res <= 1e-10
    assert np.allclose(u_sh, np.asarray(u_ref), atol=1e-8), np.abs(
        u_sh - np.asarray(u_ref)
    ).max()


def test_chunked_cg_matches_traced_loop(device_mesh):
    """Host-chunked CG dispatches continue the recurrence exactly.

    The same solve through the traced single-while_loop variant (what the
    fused marches inline) and the host-driven chunked variant must agree:
    the chunk boundary carries (x, r, p, rs) so the Krylov sequence is
    identical.
    """
    import jax

    from mfv2d_tpu.parallel.sharding import (
        _cg_loop,
        _fused_cg_factory,
        _sum_matvec,
    )

    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(4, 3)
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)

    rng = np.random.default_rng(9)
    rhs = rng.normal(size=lagrange_mat.shape[0])
    # Chunked host path, with a chunk small enough that the solve MUST
    # cross several dispatch boundaries.
    chunked = _fused_cg_factory(
        [sharded._schur_shardmap()], sharded._tables, 3000, chunk=32
    )
    lam_c, rs_c, it_c = chunked(rhs, 1e-12)
    assert it_c > 32  # crossed at least one chunk boundary
    # Traced path (as the marches see it).
    schur = sharded._schur_shardmap()

    @jax.jit
    def traced(rhs_dev, *tables):
        return _cg_loop(
            _sum_matvec([schur], tables, 8), rhs_dev, 1e-12, 3000
        )

    lam_t, rs_t, it_t = traced(jnp.asarray(rhs), *sharded._tables)
    assert int(it_t) == it_c
    assert np.allclose(np.asarray(lam_c), np.asarray(lam_t), atol=1e-13)


def test_fused_cg_edge_cases(device_mesh):
    """Degenerate inputs: zero RHS and a cap smaller than the first chunk."""
    disc, forcing, matrices, lagrange_mat, lagrange_vec = _setup(3, 3)
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)

    # Zero RHS: converged at iteration zero, returns zeros.
    lam, rs, it = sharded.make_fused_cg(100)(
        np.zeros(lagrange_mat.shape[0]), 1e-12
    )
    assert float(rs) == 0.0
    assert np.allclose(np.asarray(lam), 0.0)

    # Iteration cap below the first chunk size still respects the cap.
    lam, rs, it = sharded.make_fused_cg(7)(
        np.ones(lagrange_mat.shape[0]), 0.0
    )
    assert it == 7


def test_sharded_unsteady_bcs_and_ics_match_host(device_mesh):
    """Unsteady strong Dirichlet + initial conditions through device_mesh=.

    Heat equation u_t = lap(u) with u = e^t cosh(x): all dynamics enter
    through the time-dependent boundary values (c_steps scan-input path)
    and the cosh(x) initial state (consistent trapezoidal carry seed).
    Mirrors tests/test_solve_unsteady.py::test_unsteady_boundary_conditions
    on the sharded path (reference carry scheme,
    python/mfv2d/solve_system_2d.py:325-397).
    """

    def exact(x, y, t):
        return np.exp(t) * np.cosh(x)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
    v = u.weight
    system = mf.KFormSystem(v.derivative @ u.derivative == 0 * (v @ u))
    nt, dt = 6, 0.05
    ts = mf.TimeSettings(dt=dt, nt=nt, time_march_relations={v: u})

    def run(device=None):
        mesh = mf.examples.unit_square_mesh(3, 3, 3)
        sols, _, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(
                system,
                boundary_conditions=[
                    mf.BoundaryCondition2DUnsteady(
                        u, mesh.boundary_indices, exact
                    )
                ],
                initial_conditions={u: lambda x, y: np.cosh(x)},
            ),
            mf.SolverSettings(
                ConvergenceSettings(20, 1e-11, 0),
                linear_solver="gmres" if device is not None else "direct",
                device_mesh=device,
            ),
            time_settings=ts,
            recon_order=4,
        )
        return sols[-1]

    host, sh = run(), run(device_mesh)
    assert np.isclose(float(sh.field_data["time"][0]), nt * dt)
    assert np.allclose(
        sh.point_data["u"], host.point_data["u"], atol=1e-8
    )
    # And both actually track the exact solution.
    err = np.abs(
        sh.point_data["u"] - exact(sh.points[:, 0], sh.points[:, 1], nt * dt)
    ).max()
    assert err < 5e-4, err


def test_sharded_td_forcing_march_matches_host(device_mesh):
    """TimeDependent forcing through device_mesh= (b_steps scan inputs)."""
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight

    def source(x, y, t):
        return np.sin(t) * np.cos(np.pi / 2 * x)

    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == 0,
        v @ q.derivative == v @ mf.TimeDependent(source),
    )
    nt, dt = 5, 0.1
    ts = mf.TimeSettings(dt=dt, nt=nt, time_march_relations={v: u})

    def run(device=None):
        mesh = mf.examples.unit_square_mesh(3, 3, 3)
        sols, _, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(system),
            mf.SolverSettings(
                ConvergenceSettings(20, 1e-11, 0),
                linear_solver="direct" if device is None else "cg",
                device_mesh=device,
            ),
            time_settings=ts,
            recon_order=3,
        )
        return sols[-1]

    host, sh = run(), run(device_mesh)
    assert np.allclose(
        sh.point_data["u"], host.point_data["u"], atol=1e-8
    )
    # The forcing is nonzero only through TimeDependent evaluation, so a
    # frozen-forcing regression would produce a measurably different field.
    assert np.abs(np.asarray(host.point_data["u"])).max() > 1e-4


def test_sharded_steady_initial_conditions_seed(device_mesh):
    """Steady device_mesh= solves accept initial_conditions as Picard seed."""
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    sols_h, _, _ = mf.solve_system_2d(
        mf.examples.unit_square_mesh(3, 3, 3),
        mf.SystemSettings(system),
    )
    sols_s, stats, _ = mf.solve_system_2d(
        mf.examples.unit_square_mesh(3, 3, 3),
        mf.SystemSettings(system, initial_conditions={u: u_exact}),
        mf.SolverSettings(
            ConvergenceSettings(20, 1e-10, 0), device_mesh=device_mesh
        ),
    )
    assert np.allclose(
        sols_s[-1].point_data["u"], sols_h[-1].point_data["u"], atol=1e-8
    )


def test_sharded_nonlinear_march_with_ics_matches_host(device_mesh):
    """Nonlinear sharded march with an initial state matches the host."""
    from mfv2d_tpu.models import flow

    def lid_velocity(x, y):
        on_lid = np.isclose(y, 1.0)
        return np.stack(
            (np.where(on_lid, 1.0, 0.0), np.zeros_like(y)), axis=-1
        )

    model = flow.cavity_flow(20.0, lid_velocity)
    ts = mf.TimeSettings(
        dt=0.25, nt=3, time_march_relations=model.time_march_relations
    )
    ics = {model.velocity: lambda x, y: np.stack(
        (0.1 * np.sin(np.pi * y), 0.0 * x), axis=-1
    )}

    def run(device=None):
        mesh = mf.examples.unit_square_mesh(3, 3, 2)
        bc = mf.BoundaryCondition2DSteady(
            model.velocity, mesh.boundary_indices, lid_velocity
        )
        sols, _, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(
                model.system,
                [bc],
                [(0.0, model.pressure)],
                initial_conditions=ics,
            ),
            mf.SolverSettings(
                ConvergenceSettings(40, 1e-11, 0),
                linear_solver="gmres" if device is not None else "direct",
                device_mesh=device,
            ),
            time_settings=ts,
            recon_order=2,
        )
        return sols[-1]

    host, sh = run(), run(device_mesh)
    err = np.abs(sh.point_data["vel"] - host.point_data["vel"]).max()
    assert err < 1e-7, err


@pytest.mark.slow
def test_sharded_newton_steady_matches_host(device_mesh):
    """Sharded exact-Newton steady solve matches the host Newton path."""
    from mfv2d_tpu.models import flow

    def lid_velocity(x, y):
        on_lid = np.isclose(y, 1.0)
        return np.stack(
            (np.where(on_lid, 1.0, 0.0), np.zeros_like(y)), axis=-1
        )

    model = flow.cavity_flow(20.0, lid_velocity)

    def run(device=None):
        mesh = mf.examples.unit_square_mesh(3, 3, 2)
        bc = mf.BoundaryCondition2DSteady(
            model.velocity, mesh.boundary_indices, lid_velocity
        )
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system, [bc], [(0.0, model.pressure)]),
            mf.SolverSettings(
                ConvergenceSettings(20, 1e-11, 0),
                method="newton",
                linear_solver="gmres" if device is not None else "direct",
                device_mesh=device,
            ),
            recon_order=2,
        )
        return sols[-1], stats

    host, stats_h = run()
    sh, stats_s = run(device_mesh)
    err = np.abs(sh.point_data["vel"] - host.point_data["vel"]).max()
    assert err < 1e-8, err
    # Newton quadratic convergence: the sharded path should take the same
    # few iterations as the host Newton, far fewer than Picard at Re=20.
    assert int(stats_s.iter_history[0]) <= int(stats_h.iter_history[0]) + 1


def test_sharded_refinement_matches_host(device_mesh):
    """refinement_settings through device_mesh= refines like the host path."""
    from mfv2d_tpu.refinement import (
        ErrorEstimateL2OrderReduction,
        RefinementLimitElementCount,
        RefinementSettings,
    )

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    rs = RefinementSettings(
        error_estimate=ErrorEstimateL2OrderReduction(u, 1),
        h_refinement_ratio=0.0,  # pure p-refinement: deterministic orders
        refinement_limit=RefinementLimitElementCount(0.5, 4),
    )

    def run(device=None):
        mesh = mf.examples.unit_square_mesh(3, 3, 3)
        sols, _, out_mesh = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(system),
            mf.SolverSettings(
                ConvergenceSettings(20, 1e-10, 0), device_mesh=device
            ),
            refinement_settings=rs,
        )
        orders = [
            tuple(int(o) for o in out_mesh.get_leaf_orders(int(i)))
            for i in out_mesh.get_leaf_indices()
        ]
        return sols[-1], orders

    host_grid, host_orders = run()
    sh_grid, sh_orders = run(device_mesh)
    # The symmetric mesh has exact ties in element error; the sort can
    # break them differently between the two (1e-10-apart) solutions, so
    # compare the multiset of refined orders, not per-leaf positions.
    assert sorted(sh_orders) == sorted(host_orders)
    assert np.allclose(
        sh_grid.cell_data["error_estimate"],
        host_grid.cell_data["error_estimate"],
        rtol=1e-6,
    )


def test_sharded_steady_checkpoint_resume(device_mesh, tmp_path):
    """Steady sharded solves checkpoint per iteration and resume cleanly."""
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    from mfv2d_tpu.checkpoint import CheckpointSettings, load_steady_state

    path = str(tmp_path / "steady.npz")

    def run(resume):
        mesh = mf.examples.unit_square_mesh(3, 3, 3)
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(system),
            mf.SolverSettings(
                ConvergenceSettings(20, 1e-10, 0), device_mesh=device_mesh
            ),
            checkpoint_settings=CheckpointSettings(
                path, every=1, resume_from=path if resume else None
            ),
        )
        return sols[-1], stats

    grid1, stats1 = run(resume=False)
    state = load_steady_state(path)
    assert state["iteration"] >= 1
    # Resuming from the converged checkpoint finishes immediately with the
    # same answer.
    grid2, stats2 = run(resume=True)
    assert int(stats2.iter_history[0]) <= 1
    assert np.allclose(
        grid2.point_data["u"], grid1.point_data["u"], atol=1e-10
    )


@pytest.mark.slow
def test_sharded_newton_hp_matches_host(device_mesh):
    """Sharded Newton on an hp (2-bucket) mesh matches the host Newton."""
    from mfv2d_tpu.models import flow

    def lid_velocity(x, y):
        on_lid = np.isclose(y, 1.0)
        return np.stack(
            (np.where(on_lid, 1.0, 0.0), np.zeros_like(y)), axis=-1
        )

    model = flow.cavity_flow(15.0, lid_velocity)
    orders = np.array([[2 + ((i + j) % 2)] * 2 for j in range(2) for i in range(2)])

    def run(device=None):
        mesh = mf.examples.unit_square_mesh(2, 2, orders)
        bc = mf.BoundaryCondition2DSteady(
            model.velocity, mesh.boundary_indices, lid_velocity
        )
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system, [bc], [(0.0, model.pressure)]),
            mf.SolverSettings(
                ConvergenceSettings(20, 1e-11, 0),
                method="newton",
                linear_solver="gmres" if device is not None else "direct",
                device_mesh=device,
            ),
            recon_order=2,
        )
        return sols[-1]

    host, sh = run(), run(device_mesh)
    err = np.abs(sh.point_data["vel"] - host.point_data["vel"]).max()
    assert err < 1e-8, err


@pytest.mark.slow
def test_sharded_newton_march_matches_host(device_mesh):
    """device_mesh + method="newton" marches match the host Newton march."""
    from mfv2d_tpu.models import flow

    def lid_velocity(x, y):
        on_lid = np.isclose(y, 1.0)
        return np.stack(
            (np.where(on_lid, 1.0, 0.0), np.zeros_like(y)), axis=-1
        )

    model = flow.cavity_flow(20.0, lid_velocity)
    settings = mf.TimeSettings(
        dt=0.25, nt=2, time_march_relations=model.time_march_relations
    )

    def run(dm=None):
        mesh = mf.examples.unit_square_mesh(2, 2, 2)
        bc = mf.BoundaryCondition2DSteady(
            model.velocity, mesh.boundary_indices, lid_velocity
        )
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system, [bc], [(0.0, model.pressure)]),
            mf.SolverSettings(
                ConvergenceSettings(20, 1e-11, 0),
                method="newton",
                device_mesh=dm,
                **({"linear_solver": "gmres"} if dm is not None else {}),
            ),
            time_settings=settings,
            recon_order=2,
        )
        return sols[-1], stats

    host, host_stats = run()
    sh, sh_stats = run(device_mesh)
    err = np.abs(sh.point_data["vel"] - host.point_data["vel"]).max()
    assert err < 1e-7, err
    # Newton converges in a handful of iterations per step on both paths.
    assert np.all(np.asarray(sh_stats.iter_history) <= 6)


@pytest.mark.slow
def test_sharded_march_checkpoint_resume(device_mesh, tmp_path):
    """Sharded nt=2 march + resume to nt=4 matches an uninterrupted march."""
    from mfv2d_tpu.checkpoint import load_march_state
    from mfv2d_tpu.models import transport

    ALPHA = 1.5

    def final_u(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    model = transport.reaction(ALPHA, final_u)
    nt, t_end = 4, 0.5
    dt = t_end / nt
    settings = lambda n: mf.TimeSettings(  # noqa: E731
        dt=dt, nt=n, time_march_relations=model.time_march_relations
    )
    ckpt = tmp_path / "march.npz"

    def solver(dm=None):
        return mf.SolverSettings(
            ConvergenceSettings(20, 1e-11, 0),
            device_mesh=dm,
            **({"linear_solver": "gmres"} if dm is not None else {}),
        )

    # Ground truth: uninterrupted single-device march.
    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    sols_full, _, _ = mf.solve_system_2d(
        mesh, mf.SystemSettings(model.system), solver(),
        time_settings=settings(nt), recon_order=4,
    )

    # Sharded first half with a checkpoint, then sharded resume.
    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    mf.solve_system_2d(
        mesh, mf.SystemSettings(model.system), solver(device_mesh),
        time_settings=settings(nt // 2), recon_order=4,
        checkpoint_settings=mf.CheckpointSettings(str(ckpt), every=2),
    )
    state = load_march_state(ckpt)
    assert state["time_index"] == nt // 2

    mesh2 = state["mesh"]
    sols_res, _, _ = mf.solve_system_2d(
        mesh2, mf.SystemSettings(model.system), solver(device_mesh),
        time_settings=settings(nt), recon_order=4,
        checkpoint_settings=mf.CheckpointSettings(
            str(ckpt), every=2, resume_from=str(ckpt)
        ),
    )
    assert float(sols_res[0].field_data["time"][0]) == nt // 2 * dt
    assert float(sols_res[-1].field_data["time"][0]) == t_end
    assert np.allclose(
        sols_res[-1].point_data["u"],
        sols_full[-1].point_data["u"],
        atol=1e-8,
    ), np.abs(
        sols_res[-1].point_data["u"] - sols_full[-1].point_data["u"]
    ).max()


def test_sharded_march_checkpoint_interchanges_with_host(
    device_mesh, tmp_path
):
    """A sharded march checkpoint resumes on the single-device path."""
    from mfv2d_tpu.checkpoint import load_march_state
    from mfv2d_tpu.models import transport

    def final_u(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    model = transport.reaction(1.5, final_u)
    nt, dt = 4, 0.125
    settings = lambda n: mf.TimeSettings(  # noqa: E731
        dt=dt, nt=n, time_march_relations=model.time_march_relations
    )
    ckpt = tmp_path / "march.npz"

    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    sols_full, _, _ = mf.solve_system_2d(
        mesh, mf.SystemSettings(model.system),
        mf.SolverSettings(ConvergenceSettings(20, 1e-11, 0)),
        time_settings=settings(nt), recon_order=4,
    )

    # Sharded first half writes the checkpoint...
    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    mf.solve_system_2d(
        mesh, mf.SystemSettings(model.system),
        mf.SolverSettings(
            ConvergenceSettings(20, 1e-11, 0),
            device_mesh=device_mesh, linear_solver="gmres",
        ),
        time_settings=settings(nt // 2), recon_order=4,
        checkpoint_settings=mf.CheckpointSettings(str(ckpt), every=2),
    )
    # ...and the SINGLE-DEVICE path resumes from it (flat-carry layouts
    # match by construction, sharding.py _carry_flat_positions).
    state = load_march_state(ckpt)
    sols_res, _, _ = mf.solve_system_2d(
        state["mesh"], mf.SystemSettings(model.system),
        mf.SolverSettings(ConvergenceSettings(20, 1e-11, 0)),
        time_settings=settings(nt), recon_order=4,
        checkpoint_settings=mf.CheckpointSettings(
            str(ckpt), every=4, resume_from=str(ckpt)
        ),
    )
    assert np.allclose(
        sols_res[-1].point_data["u"],
        sols_full[-1].point_data["u"],
        atol=1e-8,
    ), np.abs(
        sols_res[-1].point_data["u"] - sols_full[-1].point_data["u"]
    ).max()


def test_sharded_newton_steady_checkpoint_resume(device_mesh, tmp_path):
    """device_mesh + method="newton" + checkpoint_settings resumes cleanly."""
    from mfv2d_tpu.checkpoint import load_steady_state
    from mfv2d_tpu.models import flow

    def lid_velocity(x, y):
        on_lid = np.isclose(y, 1.0)
        return np.stack(
            (np.where(on_lid, 1.0, 0.0), np.zeros_like(y)), axis=-1
        )

    model = flow.cavity_flow(10.0, lid_velocity)
    path = str(tmp_path / "newton.npz")

    def run(resume):
        mesh = mf.examples.unit_square_mesh(2, 2, 2)
        bc = mf.BoundaryCondition2DSteady(
            model.velocity, mesh.boundary_indices, lid_velocity
        )
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system, [bc], [(0.0, model.pressure)]),
            mf.SolverSettings(
                ConvergenceSettings(20, 1e-10, 0),
                method="newton",
                linear_solver="gmres",
                device_mesh=device_mesh,
            ),
            checkpoint_settings=mf.CheckpointSettings(
                path, every=1, resume_from=path if resume else None
            ),
        )
        return sols[-1], stats

    grid1, _ = run(resume=False)
    assert load_steady_state(path)["iteration"] >= 1
    grid2, stats2 = run(resume=True)
    assert int(stats2.iter_history[0]) <= 1
    assert np.allclose(
        grid2.point_data["vel"], grid1.point_data["vel"], atol=1e-9
    )

"""Krylov kernel tests: large-restart GMRES, curvature probe, auto-routing.

Round-3 solver work: indefinite trace Schur systems (Stokes-type saddle
formulations) were taking 18k+ semiconvergent inner CG iterations; the fix
is an effectively un-truncated (memory-bounded) GMRES space selected by a
negative-curvature probe.  These tests pin the kernels against sequential
references and the routing against real Stokes/Poisson trace systems.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mfv2d_tpu as mf
from mfv2d_tpu.compiler import CompiledSystem
from mfv2d_tpu.continuity import add_system_constraints
from mfv2d_tpu.models import flow
from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.solver import krylov
from mfv2d_tpu.solver.discretization import discretize_mesh
from mfv2d_tpu.solver.iterative import BlockSaddleSystem
from mfv2d_tpu.solver.solve import SystemEvaluator, compute_forcing_vector


def test_rotation_scan_matches_sequential_sweep():
    """The associative-scan Givens sweep equals the sequential reference."""
    rng = np.random.default_rng(0)
    for m, j in [(8, 0), (8, 1), (8, 5), (8, 8), (33, 17), (64, 63)]:
        cs = rng.normal(size=m)
        sn = rng.normal(size=m)
        th = np.hypot(cs, sn)
        cs /= th
        sn /= th
        h = rng.normal(size=m + 1)
        ref = h.copy()
        for i in range(j):
            t = cs[i] * ref[i] + sn[i] * ref[i + 1]
            ref[i + 1] = -sn[i] * ref[i] + cs[i] * ref[i + 1]
            ref[i] = t
        got = np.asarray(
            krylov._apply_rotations(
                jnp.asarray(cs), jnp.asarray(sn), jnp.asarray(h), j
            )
        )
        assert np.allclose(got, ref, atol=1e-13), (m, j)


@pytest.mark.parametrize("kind", ["nonsymmetric", "indefinite"])
def test_gmres_loop_converges(kind):
    """CGS2 + scan-Givens GMRES solves general systems to tight tolerance."""
    rng = np.random.default_rng(3)
    n = 150
    a = rng.normal(size=(n, n)) + 6 * np.eye(n)
    if kind == "indefinite":
        a = 0.5 * (a + a.T)
        a[: n // 3] *= -1.0
        a = 0.5 * (a + a.T)
    b = rng.normal(size=n)
    a_j = jnp.asarray(a)
    x, rr, it = krylov.gmres_loop(
        lambda v: a_j @ v,
        jnp.asarray(b),
        1e-11 * np.linalg.norm(b),
        600,
        n + 10,
    )
    res = np.linalg.norm(b - a @ np.asarray(x)) / np.linalg.norm(b)
    assert res < 1e-10, (kind, res)
    assert int(it) <= n + 10


def test_spd_probe_signs():
    """Positive curvature on SPD operators, non-positive on indefinite."""
    rng = np.random.default_rng(1)
    n = 80
    q = rng.normal(size=(n, n))
    spd = q @ q.T + n * np.eye(n)
    rhs = jnp.asarray(rng.normal(size=n))
    assert float(krylov.spd_probe(lambda v: jnp.asarray(spd) @ v, rhs)) > 0
    ind = spd.copy()
    ind[:4, :4] *= -1.0
    ind = 0.5 * (ind + ind.T)
    assert float(krylov.spd_probe(lambda v: jnp.asarray(ind) @ v, rhs)) <= -1e-4


def test_auto_restart_bounds():
    assert krylov.auto_restart(100, 10_000) == 100  # never beyond n
    assert krylov.auto_restart(100_000, 50) == 50  # never beyond the cap
    assert krylov.auto_restart(5_000, 10_000) == 4096  # hard cap
    # Memory bound: m + 1 aligns to the _CGS_CHUNK basis-allocation
    # granularity, so the PADDED [m_pad, n] basis is what meets the
    # budget (the old -1-row bound allocated up to a full chunk more).
    m = krylov.auto_restart(100_000, 10_000)
    assert (m + 1) % krylov._CGS_CHUNK == 0
    assert (m + 1) * 100_000 * 4 <= 384 * 2**20
    # Rows so long that even one chunk busts the budget: the storage
    # floor is one chunk; auto_restart returns it rather than pretending
    # a smaller m would allocate less.
    assert krylov.auto_restart(4_000_000, 10_000) == krylov._CGS_CHUNK - 1


def _build_system(system, nh, p):
    mesh = mf.examples.unit_square_mesh(nh, nh, p)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(2))
    compiled = CompiledSystem(system)
    forcing = compute_forcing_vector(disc, system)
    linear_vectors = [
        forcing[disc.element_offsets[i] : disc.element_offsets[i + 1]]
        for i in range(disc.n_leaves)
    ]
    lagrange_mat, _ = add_system_constraints(
        system, disc.mesh, disc.basis_cache, [], [],
        disc.leaf_indices, disc.element_offsets, linear_vectors,
    )
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
    mats = evaluator.element_matrices(compiled.linear_blocks)
    return disc, [np.asarray(m) for m in mats], lagrange_mat


@pytest.fixture(scope="module")
def stokes_system():
    return _build_system(flow.stokes_flow().system, 4, 3)


def test_trace_probe_routes_stokes_to_gmres(stokes_system, monkeypatch):
    """The curvature probe flags the Stokes trace system indefinite and the
    Poisson one definite (single-chip and sharded)."""
    disc, mats, lagrange_mat = stokes_system
    single = BlockSaddleSystem(disc, mats, lagrange_mat)
    assert single.trace_indefinite()

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    poisson = mf.KFormSystem(
        pw.derivative @ u - pw @ q == 0,
        v @ q.derivative == 0,
    )
    disc_p, mats_p, lag_p = _build_system(poisson, 3, 3)
    single_p = BlockSaddleSystem(disc_p, mats_p, lag_p)
    assert not single_p.trace_indefinite()


def test_sharded_trace_krylov_upgrades_indefinite_to_gmres(stokes_system):
    """_trace_krylov("cg") on the Stokes trace system must converge via the
    GMRES upgrade — the mixed CG recurrence alone stalls or needs 10-30x
    the iterations on this indefinite operator."""
    from jax.sharding import Mesh

    from mfv2d_tpu.config import config
    from mfv2d_tpu.parallel.sharding import ShardedBlockSystem, _trace_krylov

    disc, mats, lagrange_mat = stokes_system
    device_mesh = Mesh(np.array(jax.devices("cpu")[:2]), axis_names=("e",))
    sharded = ShardedBlockSystem(
        disc, np.asarray(mats[0]), lagrange_mat, device_mesh
    )
    assert sharded.trace_indefinite()

    rng = np.random.default_rng(5)
    rhs = rng.normal(size=lagrange_mat.shape[0])
    old = config.sharded_mixed
    config.sharded_mixed = "1"  # force the mixed path on CPU
    try:
        solve = _trace_krylov(sharded, "cg", 4000)
        lam, rs, iters = solve(jnp.asarray(rhs), 1e-10)
    finally:
        config.sharded_mixed = old
    # True residual through the f64 matvec.
    matvec = sharded.make_schur_matvec()
    res = float(
        jnp.linalg.norm(jnp.asarray(rhs) - matvec(jnp.asarray(lam)))
    ) / float(np.linalg.norm(rhs))
    assert res < 1e-9, res
    # The un-truncated GMRES space converges in a fraction of the CG count.
    assert int(iters) < 2000, int(iters)


def test_single_chip_mixed_gmres_on_stokes(stokes_system, monkeypatch):
    """The forced-TPU single-chip mixed path solves the indefinite Stokes
    trace system to tolerance via the inner GMRES route."""
    from mfv2d_tpu.solver.iterative import solve_schur_iterative
    from mfv2d_tpu.solver.solve import ConvergenceSettings

    disc, mats, lagrange_mat = stokes_system
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    system = BlockSaddleSystem(disc, mats, lagrange_mat)
    monkeypatch.undo()
    assert system._refine_inverse

    rng = np.random.default_rng(9)
    rhs = rng.normal(size=system.n_dofs)
    cons = np.zeros(system.n_lagrange)
    conv = ConvergenceSettings(4000, 1e-10, 0.0)
    u, lam, res, iters = solve_schur_iterative(
        system, jnp.asarray(rhs), jnp.asarray(cons), conv
    )
    # Verify the saddle equations directly.
    ru = system.apply_diagonal(u) + system.apply_trace_transpose(lam) - rhs
    rl = system.apply_trace(u) - cons
    scale = float(np.linalg.norm(rhs))
    assert float(jnp.linalg.norm(ru)) / scale < 1e-8
    assert float(jnp.linalg.norm(rl)) / scale < 1e-8


def test_sharded_f32x2_inner_path(stokes_system):
    """Forcing the accurate (f32x2) inner operator on a healthy system must
    still converge to the same answer — the hi/lo split is a superset in
    accuracy of the plain f32 tables."""
    from jax.sharding import Mesh

    from mfv2d_tpu.config import config
    from mfv2d_tpu.parallel.sharding import ShardedBlockSystem, _trace_krylov

    disc, mats, lagrange_mat = stokes_system
    device_mesh = Mesh(np.array(jax.devices("cpu")[:2]), axis_names=("e",))
    sharded = ShardedBlockSystem(
        disc, np.asarray(mats[0]), lagrange_mat, device_mesh
    )
    sharded._inner32_ok = False  # force the f32x2 gate

    rng = np.random.default_rng(5)
    rhs = rng.normal(size=lagrange_mat.shape[0])
    old = config.sharded_mixed
    config.sharded_mixed = "1"
    try:
        solve = _trace_krylov(sharded, "cg", 4000)
        lam, rs, iters = solve(jnp.asarray(rhs), 1e-10)
    finally:
        config.sharded_mixed = old
    matvec = sharded.make_schur_matvec()
    res = float(
        jnp.linalg.norm(jnp.asarray(rhs) - matvec(jnp.asarray(lam)))
    ) / float(np.linalg.norm(rhs))
    assert res < 1e-9, res


def test_single_chip_f32x2_on_ill_conditioned_blocks(stokes_system, monkeypatch):
    """Blocks conditioned past the f32 seed gate route to the f32x2 inner
    tables and still solve to tolerance.

    A symmetric congruence ``C A C`` with cond(C) ~ 1e3 (random orthogonal
    directions, so row equilibration cannot undo it) pushes the element
    blocks past cond*eps_f32 ~ 5%, which is exactly the Navier-Stokes p=8
    failure mode the f32x2 split exists for.
    """
    disc, mats, lagrange_mat = stokes_system
    rng = np.random.default_rng(12)
    scaled = []
    for m_ in mats:
        n = m_.shape[1]
        q, _ = np.linalg.qr(rng.normal(size=(n, n)))
        c = (q * 10.0 ** rng.uniform(-1.5, 1.5, size=n)) @ q.T
        scaled.append(np.einsum("ij,ejk,kl->eil", c, np.asarray(m_), c))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    system = BlockSaddleSystem(disc, scaled, lagrange_mat)
    monkeypatch.undo()
    assert system._refine_inverse
    assert not system._inner32_ok, system._seed_err32

    from mfv2d_tpu.solver.iterative import solve_schur_iterative
    from mfv2d_tpu.solver.solve import ConvergenceSettings

    rng2 = np.random.default_rng(9)
    rhs = rng2.normal(size=system.n_dofs)
    cons = np.zeros(system.n_lagrange)
    conv = ConvergenceSettings(4000, 1e-10, 0.0)
    u, lam, res, iters = solve_schur_iterative(
        system, jnp.asarray(rhs), jnp.asarray(cons), conv
    )
    ru = system.apply_diagonal(u) + system.apply_trace_transpose(lam) - rhs
    rl = system.apply_trace(u) - cons
    scale = float(np.linalg.norm(rhs))
    assert float(jnp.linalg.norm(ru)) / scale < 1e-7
    assert float(jnp.linalg.norm(rl)) / scale < 1e-7


def test_sharded_steady_stokes_picard_with_mixed_gmres(stokes_system):
    """Full sharded Picard steady solve of the (indefinite-trace) Stokes
    system through the forced mixed path: the curvature probe must route
    every trace correction to the GMRES inner and the Picard loop must
    still converge to the direct-solver answer."""
    from jax.sharding import Mesh

    from mfv2d_tpu.config import config
    from mfv2d_tpu.models import flow
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.parallel.sharding import sharded_steady_solve
    from mfv2d_tpu.solver.discretization import discretize_mesh

    model = flow.stokes_flow()
    mesh = mf.examples.unit_square_mesh(4, 4, 3)
    disc = discretize_mesh(mesh, model.system.unknown_forms, FemCache(2))
    device_mesh = Mesh(np.array(jax.devices("cpu")[:2]), axis_names=("e",))

    old = config.sharded_mixed
    config.sharded_mixed = "1"
    try:
        sol, lam, residuals = sharded_steady_solve(
            model.system, disc, device_mesh,
            maximum_iterations=10,
            absolute_tolerance=1e-9,
            cg_maximum_iterations=4000,
            cg_tolerance=1e-11,
        )
    finally:
        config.sharded_mixed = old
    assert residuals[-1] < 1e-9, residuals

    # Host reference: same discretization through the direct solver.
    sols_ref, _, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system),
        mf.SolverSettings(mf.ConvergenceSettings(10, 1e-9, 0.0)),
        recon_order=4,
    )
    from mfv2d_tpu.solver.solve import reconstruct_mesh_from_solution

    grid = reconstruct_mesh_from_solution(disc, 4, sol)
    ref = sols_ref[-1]
    err = np.abs(grid.point_data["vel"] - ref.point_data["vel"]).max()
    assert err < 1e-7, err


def test_traced_outer_mixed_gmres(stokes_system):
    """The mixed defect-correction loop must also work as a TRACED
    while_loop (what fused marches inline): jit the whole solve and check
    the true residual."""
    from jax.sharding import Mesh

    from mfv2d_tpu.parallel.sharding import ShardedBlockSystem

    disc, mats, lagrange_mat = stokes_system
    device_mesh = Mesh(np.array(jax.devices("cpu")[:2]), axis_names=("e",))
    sharded = ShardedBlockSystem(
        disc, np.asarray(mats[0]), lagrange_mat, device_mesh
    )
    solve = sharded.make_fused_gmres_mixed(4000)

    @jax.jit
    def traced(rhs):
        lam, rs, iters = solve(rhs, 1e-10)
        return lam, rs, iters

    rng = np.random.default_rng(5)
    rhs = jnp.asarray(rng.normal(size=lagrange_mat.shape[0]))
    lam, rs, iters = traced(rhs)
    matvec = sharded.make_schur_matvec()
    res = float(jnp.linalg.norm(rhs - matvec(lam))) / float(
        jnp.linalg.norm(rhs)
    )
    assert res < 1e-8, res
    assert int(iters) >= 1


def test_gmres_recycle_projection():
    """Cross-sweep recycling: the stored cycle state warm-starts a solve
    with a nearby RHS in ~2 iterations instead of a full Krylov build, and
    the zero state degrades to an exact no-op (cold path unchanged)."""
    rng = np.random.default_rng(3)
    n = 300
    a = rng.normal(size=(n, n)) + 6 * np.eye(n)
    a = 0.5 * (a + a.T)
    a[: n // 3] *= -1.0
    a = 0.5 * (a + a.T)  # indefinite, like a saddle trace Schur system
    aj = jnp.asarray(a, jnp.float32)
    mv = lambda v: aj @ v  # noqa: E731
    b1 = jnp.asarray(rng.normal(size=n), jnp.float32)
    tol = 1e-5 * float(jnp.linalg.norm(b1))
    x1, _, it1, st = krylov.gmres_loop_recycled(mv, b1, tol, 600, n + 10)
    res1 = float(jnp.linalg.norm(b1 - aj @ x1)) / float(jnp.linalg.norm(b1))
    assert res1 < 5e-5

    # Defect-correction shape: a second solve against a nearby residual.
    b2 = b1 + 1e-3 * jnp.asarray(rng.normal(size=n), jnp.float32)
    dx = krylov.krylov_project(st, b2)
    proj_res = float(jnp.linalg.norm(b2 - aj @ dx))
    assert proj_res < 1e-2 * float(jnp.linalg.norm(b2)), proj_res
    tol2 = 1e-5 * float(jnp.linalg.norm(b2))
    x2, _, it2, _ = krylov.gmres_loop_recycled(
        mv, b2, tol2, 600, n + 10, x0=dx, state=st
    )
    res2 = float(jnp.linalg.norm(b2 - aj @ x2)) / float(jnp.linalg.norm(b2))
    assert res2 < 5e-5
    assert int(it2) <= int(it1) // 10, (int(it1), int(it2))

    # Zero state: projection is exactly zero, wrapper path is unchanged.
    st0 = krylov.empty_recycle_state(n, n + 10)
    assert float(jnp.linalg.norm(krylov.krylov_project(st0, b2))) == 0.0
    x3, _, it3 = krylov.gmres_loop(mv, b1, tol, 600, n + 10)
    assert np.allclose(np.asarray(x3), np.asarray(x1))
    assert int(it3) == int(it1)


def test_gmres_edge_cases():
    """Zero RHS exits immediately; tol=0 runs the cycle to completion."""
    rng = np.random.default_rng(2)
    n = 40
    a = jnp.asarray(rng.normal(size=(n, n)) + n * np.eye(n))
    zero = jnp.zeros(n)
    x, rr, it = krylov.gmres_loop(lambda v: a @ v, zero, 0.0, 100, 50)
    assert float(jnp.linalg.norm(x)) == 0.0
    b = jnp.asarray(rng.normal(size=n))
    x, rr, it = krylov.gmres_loop(lambda v: a @ v, b, 0.0, n + 5, n + 5)
    res = np.linalg.norm(np.asarray(b - a @ x)) / np.linalg.norm(b)
    assert res < 1e-12, res


def test_single_chip_mixed_warm_start(stokes_system, monkeypatch):
    """initial_lagrange warm-starts the mixed solve (fewer inner iterations
    when started at the solution)."""
    from mfv2d_tpu.solver.iterative import solve_schur_iterative
    from mfv2d_tpu.solver.solve import ConvergenceSettings

    disc, mats, lagrange_mat = stokes_system
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    system = BlockSaddleSystem(disc, mats, lagrange_mat)
    monkeypatch.undo()

    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.normal(size=system.n_dofs))
    cons = jnp.zeros(system.n_lagrange)
    conv = ConvergenceSettings(4000, 1e-9, 0.0)
    _, lam1, _, iters_cold = solve_schur_iterative(system, rhs, cons, conv)
    _, _, _, iters_warm = solve_schur_iterative(
        system, rhs, cons, conv, initial_lagrange=lam1
    )
    assert iters_warm <= max(iters_cold // 2, 2), (iters_cold, iters_warm)


def test_mixed_outer_drive_contract():
    """The shared outer driver (single-chip + sharded mixed solvers both
    call it) converges, counts every sweep's inner iterations, exits on
    stagnation with the best iterate, and hands off fast -> exact."""
    from mfv2d_tpu.solver.krylov import mixed_outer_drive

    # 1. Convergent chain: each sweep halves the error against x* = 7.
    calls = []

    def sweep_conv(lam, state, fast):
        calls.append(fast)
        new = lam + 0.5 * (7.0 - lam)
        rr = float((7.0 - lam) ** 2)
        return new, jnp.asarray(rr), 3, state

    lam, rr, total = mixed_outer_drive(sweep_conv, jnp.asarray(0.0), (), 1e-6)
    assert rr <= 1e-12
    assert total == 3 * len(calls)  # every sweep's matvecs counted
    assert not any(calls)  # start_fast=False => never fast

    # 2. Stagnation: constant non-improving residual exits after 3 extra
    # sweeps and returns the best (first) iterate.
    seq = iter([4.0, 9.0, 9.0, 9.0, 9.0])

    def sweep_stall(lam, state, fast):
        return lam + 1.0, jnp.asarray(next(seq)), 1, state

    lam, rr, total = mixed_outer_drive(
        sweep_stall, jnp.asarray(0.0), (), 1e-9
    )
    assert rr == 4.0  # best residual kept
    assert float(lam) == 0.0  # iterate paired with it, not the last one
    assert total == 4

    # 3. Fast handoff: the cheap chain reports convergence, then the exact
    # chain must verify and finish.
    modes = []

    def sweep_fast(lam, state, fast):
        modes.append(fast)
        new = lam + 0.5 * (7.0 - lam)
        # The fast chain flatters the residual by 1e6.
        rr = float((7.0 - lam) ** 2) * (1e-6 if fast else 1.0)
        return new, jnp.asarray(rr), 2, state

    lam, rr, total = mixed_outer_drive(
        sweep_fast, jnp.asarray(0.0), (), 1e-6, start_fast=True
    )
    assert modes[0] is True and modes[-1] is False  # handoff happened
    assert rr <= 1e-12  # exact chain's residual, not the flattered one
    assert float(lam) == pytest.approx(7.0, abs=1e-5)
    assert total == 2 * len(modes)

"""Matrix-free iterative saddle solvers vs the direct factorization.

Mirrors the strategy of the reference test_solving.py: build a full mixed
Poisson system, then check the Schur/PCG/GMRES paths reproduce the direct
solution.
"""

import numpy as np
import pytest

import mfv2d_tpu as mf
from mfv2d_tpu.compiler import CompiledSystem
from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.solver.discretization import discretize_mesh
from mfv2d_tpu.solver.iterative import (
    BlockSaddleSystem,
    IterativeSaddleSolver,
    cg_general,
    gmres_general,
    solve_schur_iterative,
)
from mfv2d_tpu.solver.solve import (
    ConvergenceSettings,
    FrozenSaddleSolver,
    SystemEvaluator,
    compute_linear_system,
)

import jax.numpy as jnp


def u_exact(x, y):
    return 2 * np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y) + 5


def source_exact(x, y):
    return -(np.pi**2) * np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)


def _setup(n=3, p=3):
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
    return disc, evaluator, forcing, matrices, lagrange_mat, lagrange_vec


def test_block_operators_match_sparse():
    """Batched matvecs agree with the assembled scipy operators."""
    import scipy.sparse as sp

    disc, evaluator, forcing, matrices, lagrange_mat, lagrange_vec = _setup()
    system = BlockSaddleSystem(disc, matrices, lagrange_mat)
    a_sparse = sp.block_diag(evaluator.matrices_per_leaf(matrices), format="csr")
    rng = np.random.default_rng(3)
    x = rng.normal(size=disc.n_dofs)
    lam = rng.normal(size=lagrange_mat.shape[0])

    assert np.allclose(np.asarray(system.apply_diagonal(jnp.asarray(x))), a_sparse @ x)
    assert np.allclose(np.asarray(system.apply_trace(jnp.asarray(x))), lagrange_mat @ x)
    assert np.allclose(
        np.asarray(system.apply_trace_transpose(jnp.asarray(lam))),
        lagrange_mat.T @ lam,
    )
    # A^{-1} A x == x
    ax = system.apply_diagonal(jnp.asarray(x))
    assert np.allclose(np.asarray(system.apply_diagonal_inverse(ax)), x, atol=1e-8)


def test_schur_matches_direct():
    disc, evaluator, forcing, matrices, lagrange_mat, lagrange_vec = _setup()
    direct = FrozenSaddleSolver(evaluator.matrices_per_leaf(matrices), lagrange_mat)
    rhs = np.concatenate([forcing, lagrange_vec])
    x_direct = direct.solve(rhs)

    system = BlockSaddleSystem(disc, matrices, lagrange_mat)
    conv = ConvergenceSettings(2000, 1e-12, 0.0)
    u, lam, res, iters = solve_schur_iterative(
        system, jnp.asarray(forcing), jnp.asarray(lagrange_vec), conv
    )
    assert np.allclose(np.asarray(u), x_direct[: disc.n_dofs], atol=1e-7)
    assert iters < 2000


@pytest.mark.parametrize("method", ["schur", "gmres", "pcg"])
def test_iterative_solver_interface(method):
    disc, evaluator, forcing, matrices, lagrange_mat, lagrange_vec = _setup(2, 2)
    direct = FrozenSaddleSolver(evaluator.matrices_per_leaf(matrices), lagrange_mat)
    rhs = np.concatenate([forcing, lagrange_vec])
    x_direct = direct.solve(rhs)

    solver = IterativeSaddleSolver(
        disc,
        matrices,
        lagrange_mat,
        ConvergenceSettings(5000, 1e-11, 0.0),
        method=method,
    )
    x_iter = solver.solve(rhs)
    assert np.allclose(x_iter[: disc.n_dofs], x_direct[: disc.n_dofs], atol=1e-6), (
        np.abs(x_iter[: disc.n_dofs] - x_direct[: disc.n_dofs]).max()
    )


def test_generic_krylov_small_system():
    rng = np.random.default_rng(0)
    n = 40
    m = rng.normal(size=(n, n))
    a = m @ m.T + n * np.eye(n)  # SPD
    b = rng.normal(size=n)
    x_ref = np.linalg.solve(a, b)
    conv = ConvergenceSettings(200, 1e-12, 0.0)

    x_cg, _, _ = cg_general(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), jnp.zeros(n), conv)
    assert np.allclose(np.asarray(x_cg), x_ref, atol=1e-8)

    ns = m + n * np.eye(n)  # nonsymmetric but well conditioned
    x_ref2 = np.linalg.solve(ns, b)
    x_gm, res, it = gmres_general(
        lambda v: jnp.asarray(ns) @ v, jnp.asarray(b), jnp.zeros(n), conv
    )
    assert np.allclose(np.asarray(x_gm), x_ref2, atol=1e-7), res


def test_end_to_end_with_iterative_solver():
    """solve_system_2d with the on-device Schur path matches direct."""
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    results = {}
    for method in ("direct", "schur"):
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(system),
            mf.SolverSettings(
                mf.ConvergenceSettings(absolute_tolerance=1e-9, relative_tolerance=0),
                linear_solver=method,
            ),
            recon_order=6,
        )
        results[method] = sols[-1].point_data["u"]
    assert np.allclose(results["schur"], results["direct"], atol=1e-5)


def test_end_to_end_with_dense_solver():
    """solve_system_2d with the on-device dense LU matches direct."""
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    results = {}
    for method in ("direct", "dense"):
        sols, stats, _ = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(system),
            mf.SolverSettings(
                mf.ConvergenceSettings(absolute_tolerance=1e-10, relative_tolerance=0),
                linear_solver=method,
            ),
            recon_order=6,
        )
        results[method] = sols[-1].point_data["u"]
    assert np.allclose(results["dense"], results["direct"], atol=1e-8)


def test_schur_direct_matches_direct():
    """Static-condensation trace solve equals the full-system direct solve."""
    disc, _, forcing, matrices, lagrange_mat, lagrange_vec = _setup(4, 3)
    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    from mfv2d_tpu.solver.iterative import solve_schur_direct, solve_schur_iterative

    conv = ConvergenceSettings(4000, 1e-12, 0.0)
    u_ref, lam_ref, _, _ = solve_schur_iterative(
        single, jnp.asarray(forcing), jnp.asarray(lagrange_vec), conv
    )
    u_d, lam_d, res, iters = solve_schur_direct(
        single, jnp.asarray(forcing), jnp.asarray(lagrange_vec)
    )
    assert iters == 1
    assert np.allclose(np.asarray(u_d), np.asarray(u_ref), atol=1e-8), np.abs(
        np.asarray(u_d) - np.asarray(u_ref)
    ).max()
    # S must be symmetric (it is G A^-T... only when A is symmetric; the
    # mixed Poisson saddle A here is symmetric).
    s = single.assemble_schur_sparse()
    assert np.abs((s - s.T).toarray()).max() < 1e-10


def test_mixed_precision_inverse_accuracy():
    """Refined f32-inverse solve reaches f64 accuracy on conditioned systems."""
    from mfv2d_tpu.solver.iterative import MixedPrecisionLU

    rng = np.random.default_rng(11)
    n = 300
    a = rng.normal(size=(n, n))
    a = a @ a.T + 1e-2 * np.eye(n)
    b = rng.normal(size=n)
    x = np.asarray(MixedPrecisionLU(a).solve(b))
    x_ref = np.linalg.solve(a, b)
    assert np.max(np.abs(x - x_ref)) < 1e-10 * max(1, np.abs(x_ref).max())


def test_device_schur_factor_matches_host(monkeypatch):
    """The device-resident Schur factorization equals host SuperLU."""
    import os

    from mfv2d_tpu.solver.iterative import DeviceSchurFactor, solve_schur_direct

    disc, _evaluator, forcing, matrices, lagrange_mat, lagrange_vec = _setup(4, 3)
    system = BlockSaddleSystem(disc, matrices, lagrange_mat)

    # Host path first.
    u_host, lam_host, _, _ = solve_schur_direct(
        system, jnp.asarray(forcing), jnp.asarray(lagrange_vec)
    )
    assert not isinstance(system._schur_decomp, DeviceSchurFactor)

    # Force the device factorization and compare.
    system2 = BlockSaddleSystem(disc, matrices, lagrange_mat)
    monkeypatch.setenv("MFV2D_TPU_SCHUR_DEVICE", "1")
    u_dev, lam_dev, _, _ = solve_schur_direct(
        system2, jnp.asarray(forcing), jnp.asarray(lagrange_vec)
    )
    assert isinstance(system2._schur_decomp, DeviceSchurFactor)
    assert system2._schur_decomp.last_rel_residual < 1e-10
    assert np.allclose(np.asarray(u_dev), np.asarray(u_host), atol=1e-9), np.abs(
        np.asarray(u_dev) - np.asarray(u_host)
    ).max()


def test_block_saddle_tpu_branch_matches_f64(monkeypatch):
    """The TPU branch (f64 Newton-Schulz explicit inverses) matches LU.

    Forced on CPU via the backend monkeypatch — the same construction runs
    on the accelerator in the TPU tier.
    """
    import jax

    import mfv2d_tpu as mf
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.compiler import CompiledSystem
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

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        v @ q.derivative == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(3))
    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
    forcing, matrices, lagrange_mat, lagrange_vec = compute_linear_system(
        disc, system, evaluator, [], [], None
    )

    single = BlockSaddleSystem(disc, matrices, lagrange_mat)
    assert not single._refine_inverse
    conv = ConvergenceSettings(3000, 1e-11, 0.0)
    u_ref, _, _, _ = solve_schur_iterative(
        single, jnp.asarray(forcing), jnp.asarray(lagrange_vec), conv
    )

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    forced = BlockSaddleSystem(disc, matrices, lagrange_mat)
    monkeypatch.undo()
    assert forced._refine_inverse
    assert all(r <= 1 for r in forced._refine_rounds)
    # Diagonal-inverse parity.
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=disc.n_dofs))
    a = np.asarray(single.apply_diagonal_inverse(x))
    b = np.asarray(forced.apply_diagonal_inverse(x))
    assert np.allclose(a, b, atol=1e-10), np.abs(a - b).max()
    # Full mixed-precision Schur solve through the forced branch.
    u_f, _, _, _ = solve_schur_iterative(
        forced, jnp.asarray(forcing), jnp.asarray(lagrange_vec), conv
    )
    assert np.allclose(np.asarray(u_f), np.asarray(u_ref), atol=1e-8), np.abs(
        np.asarray(u_f) - np.asarray(u_ref)
    ).max()


def test_condensed_trace_apply_matches_schur():
    """Single-chip condensed [E,c,c] operator: f32-representation parity
    with S = G A^{-1} G^T, and the assembled sparse S agrees exactly."""
    disc, evaluator, forcing, matrices, lagrange_mat, lagrange_vec = _setup()
    system = BlockSaddleSystem(disc, matrices, lagrange_mat)
    rng = np.random.default_rng(7)
    lam = rng.normal(size=system.n_lagrange)
    y64 = np.asarray(system.apply_schur(jnp.asarray(lam)))
    y32 = np.asarray(
        system._schur_c32_apply(
            jnp.asarray(lam, jnp.float32), *system._tables_c32
        )
    )
    assert np.linalg.norm(y32 - y64) / np.linalg.norm(y64) < 2e-6
    ys = system.assemble_schur_sparse() @ lam
    assert np.allclose(ys, y64, atol=1e-12)


def test_blocked_gj_inverse_matches_lapack():
    """Blocked Gauss-Jordan inverse (MXU-GEMM path) vs LAPACK, including a
    non-multiple-of-block size and f32 inputs."""
    from mfv2d_tpu.ops.precision import blocked_gj_inverse

    from mfv2d_tpu.ops.precision import gj_unblocked_inverse

    rng = np.random.default_rng(4)
    for n, dtype, tol in ((64, np.float64, 1e-11), (289, np.float32, 5e-5)):
        a = (rng.normal(size=(5, n, n)) + n * np.eye(n)).astype(dtype)
        # All pivot strategies: getrf (0), recursive masked GJ (32), and
        # the unblocked masked GJ when block <= pivot_block.
        for pivot_block in (0, 32, 128):
            inv = np.asarray(
                blocked_gj_inverse(jnp.asarray(a), pivot_block=pivot_block)
            )
            for i in range(5):
                err = np.abs(a[i].astype(np.float64) @ inv[i] - np.eye(n)).max()
                assert err < tol, (n, pivot_block, err)
    # The masked unblocked GJ stands alone for small blocks.
    a = rng.normal(size=(3, 48, 48)) + 48 * np.eye(48)
    inv = np.asarray(gj_unblocked_inverse(jnp.asarray(a)))
    for i in range(3):
        assert np.abs(a[i] @ inv[i] - np.eye(48)).max() < 1e-12


def test_lean_blocks_provider_matches_stored(monkeypatch):
    """Lean-blocks mode (provider, no stored [E, n, n] device blocks) must
    reproduce the stored-mode operators, condensed blocks, and solves."""
    import jax

    disc, evaluator, forcing, matrices, lagrange_mat, lagrange_vec = _setup()
    stored = BlockSaddleSystem(disc, matrices, lagrange_mat)

    mats_np = [np.asarray(m) for m in matrices]

    def make_provider(i):
        def provider(lo, hi):
            return mats_np[i][lo:hi]

        return provider

    providers = [make_provider(i) for i in range(len(matrices))]

    # Force the TPU (explicit-inverse) branch so lean mode actually skips
    # storing blocks; everything runs fine on CPU.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    lean = BlockSaddleSystem(disc, None, lagrange_mat, block_provider=providers)
    monkeypatch.undo()
    assert lean.blocks is None and lean._blocks_np is None

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=disc.n_dofs))
    lam = jnp.asarray(rng.normal(size=stored.n_lagrange))

    ax_s = np.asarray(stored.apply_diagonal(x))
    ax_l = np.asarray(lean.apply_diagonal(x))
    assert np.allclose(ax_s, ax_l, atol=1e-11)

    ai_l = np.asarray(lean.apply_diagonal_inverse(x))
    r = np.asarray(lean.apply_diagonal(jnp.asarray(ai_l))) - np.asarray(x)
    assert np.abs(r).max() < 1e-8

    s_l = np.asarray(lean.apply_schur(lam))
    # Stored system runs the CPU LU path; compare through the sparse S.
    s_ref = stored.assemble_schur_sparse() @ np.asarray(lam)
    assert np.allclose(s_l, s_ref, atol=1e-8)

    # Condensed blocks agree between modes (lean rebuilds chunks).
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    stored_tpu = BlockSaddleSystem(disc, matrices, lagrange_mat)
    cb_s = stored_tpu._condensed_buckets()
    cb_l = lean._condensed_buckets()
    monkeypatch.undo()
    for (se_s, rows_s, val_s), (se_l, rows_l, val_l) in zip(cb_s, cb_l):
        assert np.allclose(se_s, se_l, atol=1e-10)
        assert np.array_equal(rows_s, rows_l)
        assert np.array_equal(val_s, val_l)

    # Jacobi diagonal and the f64 tables stay functional.
    d = np.asarray(lean.schur_jacobi_diagonal())
    assert d.shape == (stored.n_lagrange,) and np.all(d > 0)
    assert len(lean._tables64) == len(stored._tables64)


def test_lean_blocks_end_to_end_solve(monkeypatch):
    """IterativeSaddleSolver in forced lean mode solves to the same answer."""
    import jax

    from mfv2d_tpu.config import config

    disc, evaluator, forcing, matrices, lagrange_mat, lagrange_vec = _setup(2, 2)
    direct = FrozenSaddleSolver(
        evaluator.matrices_per_leaf(matrices), lagrange_mat
    )
    rhs = np.concatenate([forcing, lagrange_vec])
    x_direct = direct.solve(rhs)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(config, "lean_blocks", "1")
    solver = IterativeSaddleSolver(
        disc,
        matrices,
        lagrange_mat,
        ConvergenceSettings(5000, 1e-11, 0.0),
        method="schur",
    )
    assert solver.system.blocks is None
    x_lean = solver.solve(rhs)
    monkeypatch.undo()
    assert np.allclose(
        x_lean[: disc.n_dofs], x_direct[: disc.n_dofs], atol=1e-6
    )


def test_lean_forced_refinement_rounds_apply(monkeypatch):
    """The host-residual refinement loop (lean mode, rounds > 0) refines.

    On the TPU this branch replaces re-streaming the whole host block
    table per apply; force rounds=2 on a CPU-built lean system and check
    the refined apply still solves A y = x (and at least as well as the
    single-GEMV apply)."""
    import jax

    disc, evaluator, forcing, matrices, lagrange_mat, lagrange_vec = _setup()
    mats_np = [np.asarray(m) for m in matrices]
    providers = [lambda lo, hi, m=m: m[lo:hi] for m in mats_np]
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    lean = BlockSaddleSystem(disc, None, lagrange_mat, block_provider=providers)
    monkeypatch.undo()
    assert lean.blocks is None

    rng = np.random.default_rng(1)
    x = rng.normal(size=disc.n_dofs)
    lean._refine_rounds = [0] * len(lean._refine_rounds)
    y0 = np.asarray(lean.apply_diagonal_inverse(jnp.asarray(x)))
    lean._refine_rounds = [2] * len(lean._refine_rounds)
    y2 = np.asarray(lean.apply_diagonal_inverse(jnp.asarray(x)))

    def residual(y):
        return np.abs(np.asarray(lean.apply_diagonal(jnp.asarray(y))) - x).max()

    assert residual(y2) < 1e-9
    assert residual(y2) <= residual(y0) * 1.001


def test_ozaki_refined_solve_matches_lapack():
    """Device refined solve (Ozaki GEMV sweeps) reaches LAPACK accuracy."""
    from mfv2d_tpu.ops.precision import ozaki_refined_solve

    rng = np.random.default_rng(11)
    e, n = 8, 48
    a = rng.standard_normal((e, n, n)) / np.sqrt(n)
    a = a @ np.swapaxes(a, 1, 2) + 0.05 * np.eye(n)
    x_true = rng.standard_normal((e, n))
    b = np.matmul(a, x_true[..., None])[..., 0]
    inv = np.linalg.inv(a)
    for rounds in (0, 2):
        y = np.asarray(
            ozaki_refined_solve(
                jnp.asarray(inv), jnp.asarray(a), jnp.asarray(b),
                rounds=rounds, chunks=2,
            )
        )
        err = np.abs(y - x_true).max() / np.abs(x_true).max()
        assert err < 1e-11, (rounds, err)


def test_device_greens_lean_apply_matches_host(monkeypatch):
    """Lean-mode device (Ozaki) diagonal-inverse applies match the host
    numpy sweeps, and the probe accepts them (forced on CPU; the same
    construction runs on the accelerator in the TPU tier)."""
    import jax

    from mfv2d_tpu.config import config as cfg

    disc, evaluator, forcing, matrices, lagrange_mat, lagrange_vec = _setup()
    providers = [lambda lo, hi, m=np.asarray(m): m[lo:hi] for m in matrices]
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(cfg, "device_greens", "1")
    system = BlockSaddleSystem(
        disc, None, lagrange_mat, block_provider=providers, device_greens=True
    )
    assert system._inv_np is not None  # lean
    rng = np.random.default_rng(5)
    x = rng.normal(size=disc.n_dofs)
    y_host = system._apply_diagonal_inverse_host(x)
    assert system._dev_greens_ready()
    monkeypatch.undo()
    y_dev = system._apply_diagonal_inverse_dev(x)
    assert np.allclose(y_dev, y_host, atol=1e-11), np.abs(y_dev - y_host).max()
    # The lean dispatcher routes to the device path once probed.
    y_lean = system._apply_diagonal_inverse_lean(x)
    assert np.array_equal(y_lean, y_dev)


def test_device_greens_loose_tier_routes_by_accuracy(monkeypatch):
    """A probe inside 10x-the-gate (but not the gate) lands in the
    "on-loose" state: strict consumers stay on the host sweeps, while a
    consumer that opts into the loose tier (the VMS in-loop Green's
    applications) gets the device applies."""
    import jax

    from mfv2d_tpu.config import config as cfg

    disc, evaluator, forcing, matrices, lagrange_mat, lagrange_vec = _setup()
    providers = [lambda lo, hi, m=np.asarray(m): m[lo:hi] for m in matrices]
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(cfg, "device_greens", "1")
    # Inject a 3e-10 device-apply offset: past the strict gate (1e-10
    # absolute floor here — the host error is at machine level) but
    # inside the 10x loose tier.
    from mfv2d_tpu.ops import precision as prec

    real_solve = prec.ozaki_refined_solve
    monkeypatch.setattr(
        prec,
        "ozaki_refined_solve",
        lambda *a, **k: real_solve(*a, **k) + 3e-10,
    )
    system = BlockSaddleSystem(
        disc, None, lagrange_mat, block_provider=providers, device_greens=True
    )
    assert system._dev_greens_ready()
    assert system._dev_greens_state == "on-loose"
    monkeypatch.undo()
    rng = np.random.default_rng(5)
    x = rng.normal(size=disc.n_dofs)
    y_host = system._apply_diagonal_inverse_host(x)
    # Strict (default): loose device state must NOT serve the apply.
    y_strict = system._apply_diagonal_inverse_lean(x)
    assert np.array_equal(y_strict, y_host)
    # Loose opt-in: routed to the device applies.
    system.dev_greens_accuracy = "loose"
    y_loose = system._apply_diagonal_inverse_lean(x)
    assert np.allclose(y_loose, y_host, atol=1e-9)
    assert not np.array_equal(y_loose, y_host)


def test_device_greens_headroom_gate_rejects_without_allocating(monkeypatch):
    """The HBM headroom gate is pure accounting — no device allocation.

    A failed multi-GB probe allocation poisons the relay arena (the next
    unrelated ~10 MB upload OOMs — observed killing a config-5 run), so
    the gate must reject by arithmetic on live-array bytes and never call
    device_put when headroom is short."""
    import jax

    from mfv2d_tpu.config import config as cfg

    disc, evaluator, forcing, matrices, lagrange_mat, lagrange_vec = _setup()
    providers = [lambda lo, hi, m=np.asarray(m): m[lo:hi] for m in matrices]
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(cfg, "device_greens", "1")
    monkeypatch.setattr(cfg, "hbm_capacity_gb", 0.0)  # no headroom at all
    calls = []
    monkeypatch.setattr(jax, "device_put", lambda *a, **k: calls.append(a))
    system = BlockSaddleSystem(
        disc, None, lagrange_mat, block_provider=providers, device_greens=True
    )
    assert system._inv_np is not None  # lean
    assert not system._dev_greens_ready()
    assert system._dev_greens_state == "off"
    assert not calls  # gate decided by accounting, not by allocating
    # The lean dispatcher falls back to the host sweeps.
    monkeypatch.undo()
    rng = np.random.default_rng(5)
    x = rng.normal(size=disc.n_dofs)
    y_lean = system._apply_diagonal_inverse_lean(x)
    assert np.allclose(y_lean, system._apply_diagonal_inverse_host(x))

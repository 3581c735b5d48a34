"""Opt-in TPU-backend tests (VERDICT round-1 item 10).

Run with::

    MFV2D_TPU_TESTS=1 python -m pytest tests -m tpu

Everything here executes on the real accelerator platform (the default
suite pins the CPU backend) and checks the TPU-only branches the CPU tests
can only reach via monkeypatching: f32 assembly accuracy, the refined-f32
block inverse, and an end-to-end solve.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

_ON_TPU_TIER = os.environ.get("MFV2D_TPU_TESTS") == "1"
if _ON_TPU_TIER:
    import jax

    _BACKEND_OK = jax.default_backend() not in ("cpu",)
else:
    _BACKEND_OK = False

skip_unless_tpu = pytest.mark.skipif(
    not (_ON_TPU_TIER and _BACKEND_OK),
    reason="TPU tier: set MFV2D_TPU_TESTS=1 and run on an accelerator",
)


def _corners(n_elem, dtype, seed=5):
    rng = np.random.default_rng(seed)
    base = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
    return (
        np.tile(base, (n_elem, 1, 1)) + 0.06 * rng.normal(size=(n_elem, 4, 2))
    ).astype(dtype)


@skip_unless_tpu
def test_f32_assembly_accuracy_bound():
    """f32 on-device assembly vs the f64 host reference: bf16-pass bound."""
    import jax.numpy as jnp

    import mfv2d_tpu as mf
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.evaluation import ElementBatch, compute_element_matrices
    from mfv2d_tpu.ops.basis import FemCache

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == 0,
        v @ q.derivative == 0,
    )
    compiled = CompiledSystem(system)
    basis = FemCache(2).get_basis2d(4, 4)
    corners64 = _corners(64, np.float64)

    m32 = np.asarray(
        compute_element_matrices(
            system.unknown_forms,
            compiled.lhs_blocks,
            ElementBatch(basis, jnp.asarray(corners64, jnp.float32)),
        )
    )
    # f64 reference on the host CPU device of the same process.
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        m64 = np.asarray(
            compute_element_matrices(
                system.unknown_forms,
                compiled.lhs_blocks,
                ElementBatch(basis, jnp.asarray(corners64)),
            )
        )
    scale = np.abs(m64).max()
    rel = np.abs(m32 - m64).max() / scale
    # TPU f32 GEMMs default to bf16 MXU passes: the observed error is a few
    # e-3 relative; anything past 2e-2 signals a real defect.
    assert rel < 2e-2, rel


@skip_unless_tpu
def test_mixed_precision_lu_refines_to_f64():
    from mfv2d_tpu.solver.iterative import MixedPrecisionLU

    rng = np.random.default_rng(11)
    n = 96
    a = rng.normal(size=(n, n))
    a = a @ a.T + n * np.eye(n)
    b = rng.normal(size=n)
    x = np.asarray(MixedPrecisionLU(a).solve(b))
    ref = np.linalg.solve(a, b)
    assert np.abs(x - ref).max() < 1e-11 * np.abs(ref).max()


@skip_unless_tpu
def test_end_to_end_solve_on_accelerator():
    """Mixed Poisson solved under the accelerator platform (f64 emulated)."""
    import mfv2d_tpu as mf
    from mfv2d_tpu.models import poisson

    model = poisson.mixed_poisson()
    mesh = mf.examples.unit_square_mesh(4, 4, 3)
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system),
        mf.SolverSettings(mf.ConvergenceSettings(20, 1e-9, 0)),
    )
    grid = sols[-1]
    pts = grid.points
    err = np.max(
        np.abs(grid.point_data["u"] - poisson.u_exact(pts[:, 0], pts[:, 1]))
    )
    assert err < 2e-2, err


@skip_unless_tpu
def test_sharded_schur_matvec_accuracy_on_device():
    """The TPU f64-inverse Schur matvec matches the host f64 operator.

    Guards the Newton-Schulz block-inverse build (equilibrated f32 seed +
    f64 iterations) and the probe-chosen refinement-round count: a
    regression there shows up as a loss of matvec accuracy long before a
    solve diverges.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import mfv2d_tpu as mf
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.parallel.sharding import ShardedBlockSystem
    from mfv2d_tpu.solver.discretization import discretize_mesh
    from mfv2d_tpu.solver.solve import SystemEvaluator, compute_linear_system

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == 0,
        v @ q.derivative == 0,
    )
    mesh = mf.examples.unit_square_mesh(4, 4, 4)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(3))
    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
    _, matrices, lagrange_mat, _ = compute_linear_system(
        disc, system, evaluator, [], [], None
    )
    device_mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("e",))
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)
    assert sharded._refine  # on-accelerator branch

    # Host reference: dense per-element solve in f64.
    blocks = np.asarray(sharded.blocks)
    rng = np.random.default_rng(11)
    lam = rng.normal(size=sharded.n_lagrange)

    tt_rows = np.asarray(sharded.tt_rows)
    tt_val = np.asarray(sharded.tt_val)
    gt = np.sum(tt_val * lam[tt_rows], axis=-1)
    x_ref = np.linalg.solve(blocks, gt[..., None])[..., 0]
    tr_elem = np.asarray(sharded.tr_elem)
    tr_dof = np.asarray(sharded.tr_dof)
    tr_val = np.asarray(sharded.tr_val)
    s_ref = np.sum(tr_val[0] * x_ref[tr_elem[0], tr_dof[0]], axis=-1)

    s_dev = np.asarray(sharded.make_schur_matvec()(jnp.asarray(lam)))
    scale = np.abs(s_ref).max()
    assert np.abs(s_dev - s_ref[: sharded.n_lagrange]).max() <= 1e-11 * scale


@skip_unless_tpu
def test_mixed_trace_solve_converges_on_device():
    """The production trace solve (mixed f32-inner on TPU) hits 1e-10."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import mfv2d_tpu as mf
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.parallel.sharding import ShardedBlockSystem, _trace_krylov
    from mfv2d_tpu.solver.discretization import discretize_mesh
    from mfv2d_tpu.solver.solve import SystemEvaluator, compute_linear_system

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == 0,
        v @ q.derivative == 0,
    )
    mesh = mf.examples.unit_square_mesh(6, 6, 4)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(3))
    compiled = CompiledSystem(system)
    evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
    _, matrices, lagrange_mat, _ = compute_linear_system(
        disc, system, evaluator, [], [], None
    )
    device_mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("e",))
    sharded = ShardedBlockSystem(disc, matrices[0], lagrange_mat, device_mesh)
    assert sharded._inner32_ok  # mixed Poisson blocks are well-conditioned

    rng = np.random.default_rng(7)
    rhs = jnp.asarray(rng.normal(size=sharded.n_lagrange))
    tol = 1e-10 * float(jnp.linalg.norm(rhs))
    lam, rs, iters = _trace_krylov(sharded, "cg", 3000)(rhs, tol)
    # True residual, not the solver's own estimate.
    r = rhs - sharded.make_schur_matvec()(jnp.asarray(lam))
    assert float(jnp.linalg.norm(r)) <= 5 * tol
    assert int(iters) >= 1


@skip_unless_tpu
def test_vms_solve_on_accelerator():
    """End-to-end VMS nonlinear flow on the accelerator backend.

    Exercises the dev-mode residency path where it matters: the shared
    inclusion projector, the chunked linear+nonlinear advection sum
    (re-assembled on device each Picard update), and the matrix-free
    fine/coarse Schur solves.  Accuracy must sit on the discretization
    error, not on any f32 floor.
    """
    import mfv2d_tpu as mf
    from mfv2d_tpu.models import transport

    nu = -1.0

    def u_exact(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def q_exact(x, y):
        return np.stack(
            (
                -np.pi / 2 * np.sin(np.pi / 2 * x) * np.cos(np.pi / 2 * y),
                -np.pi / 2 * np.cos(np.pi / 2 * x) * np.sin(np.pi / 2 * y),
            ),
            axis=-1,
        )

    def source_exact(x, y):
        return np.sum(q_exact(x, y) ** 2, axis=-1) - nu * np.pi**2 * u_exact(
            x, y
        ) / 2

    model = transport.nonlinear_flow(nu, u_exact, source_exact)
    u, q = model.u, model.q
    v, pw = u.weight, q.weight
    symmetric = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ u_exact,
        nu * (v @ q.derivative) == -(v @ source_exact),
    )
    mesh = mf.examples.unit_square_mesh(4, 4, 4)
    sols, stats, _ = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(model.system, over_integration_order=3),
        mf.SolverSettings(
            mf.ConvergenceSettings(40, 1e-9, 0), linear_solver="schur_direct"
        ),
        vms_settings=mf.VMSSettings(
            symmetric_system=symmetric,
            nonsymmetric_system=model.system,
            order_increase=2,
            fine_scale_convergence=mf.ConvergenceSettings(10, 1e-10, 1e-8),
            matrix_free=True,
        ),
        recon_order=4,
    )
    grid = sols[-1]
    x, y = grid.points[:, 0], grid.points[:, 1]
    err = float(np.sqrt(np.mean((grid.point_data["u"] - u_exact(x, y)) ** 2)))
    # p=4 on 4x4 sits at ~1e-4 discretization error (CPU reference value
    # 1.005e-4); a lost f32 digit anywhere in the chain would push this up.
    assert err < 5e-4
    assert np.all(np.isfinite(grid.point_data["vms-u"]))


@skip_unless_tpu
def test_device_greens_apply_on_accelerator():
    """Lean-mode Ozaki refined applies on the real chip match the host
    f64 sweeps (the path behind MFV2D_TPU_DEV_GREENS for the VMS fine
    saddle — BENCH.md 4b)."""
    import jax.numpy as jnp

    import mfv2d_tpu as mf
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.config import config as cfg
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.solver.discretization import discretize_mesh
    from mfv2d_tpu.solver.iterative import BlockSaddleSystem
    from mfv2d_tpu.solver.solve import SystemEvaluator, compute_linear_system

    def ue(x, y):
        return np.cos(np.pi / 2 * x) * np.cos(np.pi / 2 * y)

    def se(x, y):
        return -(np.pi**2) / 2 * ue(x, y)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == pw ^ ue,
        v @ q.derivative == -(v @ se),
    )
    mesh = mf.examples.unit_square_mesh(4, 4, 4)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(3))
    evaluator = SystemEvaluator(
        system.unknown_forms, CompiledSystem(system), disc
    )
    _, matrices, lagrange_mat, _ = compute_linear_system(
        disc, system, evaluator, [], [], None
    )
    providers = [lambda lo, hi, m=np.asarray(m): m[lo:hi] for m in matrices]
    old = cfg.device_greens
    cfg.device_greens = "1"
    try:
        sysb = BlockSaddleSystem(
            disc, None, lagrange_mat,
            block_provider=providers, device_greens=True,
        )
        rng = np.random.default_rng(9)
        x = rng.normal(size=disc.n_dofs)
        y_host = sysb._apply_diagonal_inverse_host(x)
        assert sysb._dev_greens_ready()
        y_dev = sysb._apply_diagonal_inverse_dev(x)
    finally:
        cfg.device_greens = old
    err = np.abs(y_dev - y_host).max() / np.abs(y_host).max()
    assert err < 1e-11, err

"""Ozaki-scheme f64 GEMM tests (ops/ozaki.py).

The slice products must reproduce native-f64 matmuls to ~1e-12 relative
error measured against the |a| @ |b| magnitude envelope — including wide
per-row/per-column dynamic range (the equilibrated saddle blocks the
Newton-Schulz build feeds it) — and the Newton-Schulz inverse built
through the Ozaki path must match the einsum-f64 build.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfv2d_tpu.ops.ozaki import matmul64


def _rel_err(got, a, b):
    envelope = np.abs(a) @ np.abs(b)
    return (np.abs(np.asarray(got) - a @ b) / np.maximum(envelope, 1e-300)).max()


@pytest.mark.parametrize(
    "shape", [(4, 37, 37, 37), (2, 64, 289, 5), (1, 128, 128, 128)]
)
def test_matmul64_accuracy(shape):
    e, n, k, m = shape
    rng = np.random.default_rng(0)
    a = rng.normal(size=(e, n, k)) * 10.0 ** rng.uniform(-6, 6, size=(e, n, 1))
    b = rng.normal(size=(e, k, m)) * 10.0 ** rng.uniform(-6, 6, size=(e, 1, m))
    assert _rel_err(matmul64(a, b), a, b) < 5e-12


def test_matmul64_ill_conditioned():
    """Hilbert-like product (cond ~ 1e18 before regularization): the
    near-cancelling H @ H^-1 product must still come out ~identity to the
    envelope-relative bound."""
    n = 200
    h = 1.0 / (np.arange(n)[:, None] + np.arange(n)[None, :] + 1.0)
    x = np.linalg.inv(h + np.eye(n))
    got = matmul64((h + np.eye(n))[None], x[None])
    assert _rel_err(got, h + np.eye(n), x[None][0]) < 5e-12
    assert np.abs(np.asarray(got)[0] - np.eye(n)).max() < 1e-11


def test_matmul64_unbatched_and_zero_rows():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(40, 60))
    a[7] = 0.0  # zero row: scale guard must not divide by zero
    b = rng.normal(size=(60, 9))
    b[:, 3] = 0.0
    got = np.asarray(matmul64(a, b))
    assert _rel_err(got, a, b) < 5e-12
    assert np.all(got[7] == 0.0)
    assert np.all(got[:, 3] == 0.0)


def test_matmul64_contraction_too_long():
    a = np.zeros((2, 3, 5000))
    b = np.zeros((2, 5000, 3))
    with pytest.raises(ValueError, match="too long"):
        matmul64(a, b, t=7)


def test_condensed_build_ozaki_path_matches(monkeypatch):
    """The condensed trace blocks built through the Ozaki GEMMs (forced
    TPU path) must match the einsum-f64 build to f64 roundoff."""
    import mfv2d_tpu as mf
    from mfv2d_tpu.models import flow
    from mfv2d_tpu.solver.iterative import BlockSaddleSystem

    import sys
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_krylov import _build_system

    disc, mats, lagrange_mat = _build_system(flow.stokes_flow().system, 2, 3)
    # Forced TPU path: explicit-inverse + Ozaki GEMM condensed build.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        system = BlockSaddleSystem(disc, mats, lagrange_mat)
        assert system._refine_inverse
        oz_buckets = system._condensed_buckets()
    finally:
        monkeypatch.undo()
    # Plain CPU path: independent host np.linalg.solve reference.
    system2 = BlockSaddleSystem(disc, mats, lagrange_mat)
    assert not system2._refine_inverse
    ref_buckets = system2._condensed_buckets()
    for (se_o, rows_o, val_o), (se_r, rows_r, val_r) in zip(
        oz_buckets, ref_buckets
    ):
        scale = np.abs(se_r).max() or 1.0
        assert np.abs(se_o - se_r).max() / scale < 1e-11
        assert np.array_equal(rows_o, rows_r)
        assert np.array_equal(val_o, val_r)


def test_newton_schulz_ozaki_path_matches(monkeypatch):
    """Forcing the TPU (Ozaki) sweep path on CPU must build the same f64
    inverse as the native-einsum path."""
    from mfv2d_tpu.ops import precision

    rng = np.random.default_rng(5)
    n = 48
    blocks = rng.normal(size=(6, n, n)) + 4 * np.eye(n)
    inv_ref, seed_ref = precision.newton_schulz_inverse(blocks)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    inv_oz, seed_oz = precision.newton_schulz_inverse(blocks)
    monkeypatch.undo()

    assert np.isclose(seed_ref, seed_oz, rtol=1e-3)
    err = np.abs(
        np.einsum("eij,ejk->eik", np.asarray(inv_oz), blocks)
        - np.eye(n)
    ).max()
    assert err < 1e-11, err
    assert np.abs(np.asarray(inv_oz) - np.asarray(inv_ref)).max() < 1e-9 * np.abs(
        np.asarray(inv_ref)
    ).max()


def test_newton_schulz_chunked_build_matches(monkeypatch):
    """Batches past the HBM budget build in element chunks (the VMS-scale
    OOM guard) and must agree with the unchunked build exactly per chunk."""
    from mfv2d_tpu.ops import precision

    rng = np.random.default_rng(6)
    n = 32
    blocks = rng.normal(size=(10, n, n)) + 4 * np.eye(n)
    inv_ref, seed_ref = precision.newton_schulz_inverse(blocks)

    # Shrink the budget so the 10-element batch splits into chunks of 4.
    monkeypatch.setattr(
        precision, "_BUILD_CHUNK_BYTES", 10 * n * n * 8 * 5 / 2.0
    )
    inv_ch, seed_ch = precision.newton_schulz_inverse(blocks)
    monkeypatch.undo()

    err = np.abs(
        np.einsum("eij,ejk->eik", np.asarray(inv_ch), blocks) - np.eye(n)
    ).max()
    assert err < 1e-11, err
    assert np.isclose(seed_ch, seed_ref, rtol=1e-2)


def test_ozaki_refined_solve_ill_conditioned_matches_host_floor():
    """The device refined-apply floor must pass the dev-greens gate
    (err_dev <= max(1e-10, 3 x host f64 floor)) at config-5-like
    conditioning (cond ~ 1e7).

    Regression: the in-level f32 accumulation of slice-pair GEMV products
    rounded the level-1 sum at ~2^-(t+24) relative (5e-10 at t=7), a
    5x-worse-than-f64 refined floor measured on the real config-5 fine
    saddle — GEMV-shaped outputs now accumulate every pair in f64."""
    from mfv2d_tpu.ops.precision import ozaki_refined_solve

    rng = np.random.default_rng(9)
    n, e = 64, 4
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.logspace(0, -7, n)
    a = np.broadcast_to(q * d @ q.T, (e, n, n)).copy()
    a += 1e-9 * rng.standard_normal(a.shape)
    inv = np.linalg.inv(a)
    rounds = 2
    applied = np.matmul(a, np.ones((e, n, 1)))[..., 0]

    y_h = np.matmul(inv, applied[..., None])[..., 0]
    for _ in range(rounds):
        r = applied - np.matmul(a, y_h[..., None])[..., 0]
        y_h = y_h + np.matmul(inv, r[..., None])[..., 0]
    err_host = np.abs(y_h - 1.0).max()

    y_d = np.asarray(
        ozaki_refined_solve(
            jnp.asarray(inv), jnp.asarray(a), jnp.asarray(applied),
            rounds=rounds, chunks=2,
        )
    )
    err_dev = np.abs(y_d - 1.0).max()
    assert err_dev <= max(1e-10, 3.0 * err_host), (err_dev, err_host)

    # Cutoff escalation (the dev-greens probe's 8 -> 10 retry): more
    # slice pairs must never be less accurate — at cutoff 10 the dropped
    # pairs sit at 2^-70, below f64 eps, so the refined floor must be at
    # or below the cutoff-8 one (up to roundoff jitter).
    y_10 = np.asarray(
        ozaki_refined_solve(
            jnp.asarray(inv), jnp.asarray(a), jnp.asarray(applied),
            rounds=rounds, chunks=2, cutoff=10,
        )
    )
    err_10 = np.abs(y_10 - 1.0).max()
    assert err_10 <= 2.0 * max(err_dev, err_host), (err_10, err_dev)


def test_pick_bits_rejects_invalid_widths():
    """Out-of-range slice widths must fail loudly, not round silently."""
    import pytest

    from mfv2d_tpu.ops.ozaki import _pick_bits

    assert _pick_bits(64, None) == 8
    with pytest.raises(ValueError):
        _pick_bits(64, 10)  # wider than bf16's significand
    with pytest.raises(ValueError):
        _pick_bits(64, 0)
    with pytest.raises(ValueError):
        _pick_bits(1 << 23, None)  # no exact accumulation possible


def test_newton_schulz_multi_axis_batch():
    """Multi-axis batches invert correctly (the sweep chunking flattens
    the batch axes; slicing only axis 0 once over-sized every chunk)."""
    import numpy as np

    from mfv2d_tpu.ops.precision import newton_schulz_inverse

    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 4, 8, 8)) + 8.0 * np.eye(8)
    inv, seed_err = newton_schulz_inverse(a)
    assert inv.shape == a.shape
    eye = np.einsum("...ij,...jk->...ik", np.asarray(inv), a)
    assert np.abs(eye - np.eye(8)).max() < 1e-9


def test_host_explicit_inverse_contract():
    """host_explicit_inverse matches the (inverse, seed_err, rounds) contract.

    Lean-mode saddle builds (BlockSaddleSystem._lean_inverse_build) consume
    this in place of the device Newton-Schulz build; the returned rounds
    must make `rounds` refinement steps solve A x = b to the 1e-10 target.
    """
    from mfv2d_tpu.ops.precision import host_explicit_inverse

    rng = np.random.default_rng(3)

    def refined_solve_err(a, inv, rounds, b):
        x = np.matmul(inv, b[..., None])[..., 0]
        for _ in range(rounds):
            r = b - np.matmul(a, x[..., None])[..., 0]
            x = x + np.matmul(inv, r[..., None])[..., 0]
        ref = np.linalg.solve(a, b[..., None])[..., 0]
        return float(
            np.abs(x - ref).max() / max(np.abs(ref).max(), 1e-300)
        )

    # Well-conditioned: exact single-apply inverse, usable f32 seed.
    a = rng.standard_normal((6, 24, 24)) + 24 * np.eye(24)
    inv, seed_err, rounds = host_explicit_inverse(a)
    assert rounds == 0
    assert seed_err < 1e-4
    assert np.abs(inv @ a - np.eye(24)).max() < 1e-12

    # Ill-conditioned (cond ~ 1e7, the measured config-5 regime): the f32
    # seed gate must trip (seed_err ~ cond * eps_f32 > 0.05) and the chosen
    # rounds must deliver the target through refinement.
    q, _ = np.linalg.qr(rng.standard_normal((24, 24)))
    d = np.logspace(0, -7, 24)
    a_ill = np.broadcast_to(q * d @ q.T, (4, 24, 24)).copy()
    a_ill += 1e-9 * rng.standard_normal(a_ill.shape)
    inv, seed_err, rounds = host_explicit_inverse(a_ill)
    assert seed_err > 0.05
    b = rng.standard_normal((4, 24))
    assert refined_solve_err(a_ill, inv, rounds, b) < 1e-8


def test_host_explicit_inverse_ladder():
    """return_ladder exposes the probe-error-by-rounds list consistently.

    The ladder backs BlockSaddleSystem.relax_refine_rounds: errs[rounds]
    must be the error the chosen round count actually achieves, and the
    chosen rounds must be the argmin of the explored ladder.
    """
    from mfv2d_tpu.ops.precision import host_explicit_inverse

    rng = np.random.default_rng(5)
    q, _ = np.linalg.qr(rng.standard_normal((24, 24)))
    d = np.logspace(0, -7, 24)
    a = np.broadcast_to(q * d @ q.T, (4, 24, 24)).copy()
    a += 1e-9 * rng.standard_normal(a.shape)
    inv, seed_err, rounds, errs = host_explicit_inverse(a, return_ladder=True)
    inv2, seed_err2, rounds2 = host_explicit_inverse(a)
    assert rounds == rounds2 and seed_err == seed_err2
    assert np.array_equal(inv, inv2)
    assert len(errs) >= rounds + 1
    assert rounds == int(np.argmin(errs))


def test_saddle_refine_round_rebalance():
    """relax_refine_rounds drops rounds that polish below the consumer floor.

    The VMS Green's function G' = A_f^{-1} - P A_c^{-1} P^T observes the
    MAX of its fine/coarse apply errors, so the coarse system's extra
    rounds (plateauing at 1.7e-10 under a 4.1e-10 fine floor on the real
    config-5 blocks) must be traded away — and never the other way.
    """
    from mfv2d_tpu.solver.iterative import BlockSaddleSystem

    sys_f = object.__new__(BlockSaddleSystem)
    sys_f._refine_ladders = [[5.4e-9, 4.1e-10, 5.7e-10]]  # fine: argmin=1
    sys_f._refine_rounds = [1]
    sys_c = object.__new__(BlockSaddleSystem)
    # coarse: argmin=3, marginal gains past round 1
    sys_c._refine_ladders = [[9.3e-10, 4.2e-10, 1.9e-10, 1.7e-10]]
    sys_c._refine_rounds = [3]

    assert sys_f.refine_floor() == 4.1e-10
    assert sys_c.refine_floor() == 1.7e-10
    tol = max(sys_f.refine_floor(), sys_c.refine_floor())
    sys_f.relax_refine_rounds(tol)
    sys_c.relax_refine_rounds(tol)
    assert sys_f._refine_rounds == [1]  # its own floor: unchanged
    # coarse round 1 (4.2e-10) is within the 1.5x slack of the fine floor
    # (the balanced point on the real config-5 blocks sits 2.5% above it)
    assert sys_c._refine_rounds == [1]
    # without slack the strict comparison would stop one round later
    sys_c._refine_rounds = [3]
    sys_c.relax_refine_rounds(tol, slack=1.0)
    assert sys_c._refine_rounds == [2]

    # A stored-mode sibling (no ladders) must never loosen the other side.
    sys_s = object.__new__(BlockSaddleSystem)
    sys_s._refine_ladders = [None]
    sys_s._refine_rounds = [0]
    assert sys_s.refine_floor() == 0.0
    sys_s.relax_refine_rounds(1e-9)  # no-op, no ladders
    assert sys_s._refine_rounds == [0]

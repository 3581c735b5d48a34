"""Solver-level benchmarks: Krylov iterations/sec, matmul-peak fraction,
and gallery time-to-solution (the BASELINE.md metric families that bench.py
does not cover).

Modes (run on the bench TPU; CPU works too, slower):

    python bench_solve.py krylov    # trace-Schur CG iterations/sec, 5 configs
    python bench_solve.py peak      # assembly rate as a fraction of the
                                    # measured wide-N GEMM envelope
    python bench_solve.py gallery   # per-example wall time vs the reference
                                    # gallery times (docs/sg_execution_times.rst)

Each mode prints one JSON line per measurement plus a markdown table;
BENCH.md archives a full run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _mesh_1dev():
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:1]), axis_names=("e",))


def _mixed_poisson_system():
    import mfv2d_tpu as mf

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    return mf.KFormSystem(
        pw.derivative @ u - pw @ q == 0,
        v @ q.derivative == 0,
    )


def _heat_march_system(dt=1e-2):
    """Implicit (trapezoidal) heat operator: the unsteady LHS pattern."""
    import mfv2d_tpu as mf
    from mfv2d_tpu.solve_system_2d import TimeSettings, update_system_for_time_march

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == 0,
        v @ q.derivative == 0,
    )
    return update_system_for_time_march(
        TimeSettings(dt=dt, nt=1, time_march_relations={v: u}), system
    )


def _stokes_system():
    from mfv2d_tpu.models import flow

    return flow.stokes_flow().system


def _nonlinear_ns_system():
    from mfv2d_tpu.models import flow

    return flow.navier_stokes(100.0).system


def _build_trace_system(system, nh, nv, p, device_mesh):
    """Host constraint assembly + sharded frozen operator for one config."""
    import mfv2d_tpu as mf
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.continuity import add_system_constraints
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.parallel.sharding import (
        MultiBucketShardedSystem,
        ShardedBlockSystem,
    )
    from mfv2d_tpu.solver.discretization import discretize_mesh
    from mfv2d_tpu.solver.solve import compute_forcing_vector

    mesh = mf.examples.unit_square_mesh(nh, nv, p)
    disc = discretize_mesh(mesh, system.unknown_forms, FemCache(2))
    compiled = CompiledSystem(system)
    forcing = compute_forcing_vector(disc, system)
    linear_vectors = [
        forcing[disc.element_offsets[i] : disc.element_offsets[i + 1]]
        for i in range(disc.n_leaves)
    ]
    lagrange_mat, lagrange_vec = add_system_constraints(
        system, disc.mesh, disc.basis_cache, [], [],
        disc.leaf_indices, disc.element_offsets, linear_vectors,
    )
    if isinstance(p, np.ndarray) or len(disc.buckets) > 1:
        from mfv2d_tpu.solver.solve import SystemEvaluator

        evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)
        mats = evaluator.element_matrices(compiled.linear_blocks)
        sharded = MultiBucketShardedSystem(disc, mats, lagrange_mat, device_mesh)
    else:
        sharded = ShardedBlockSystem.from_assembly(
            disc, compiled.linear_blocks, lagrange_mat, device_mesh
        )
    return sharded, lagrange_mat.shape[0]


def _time_cg(sharded, n_lag, iters_a=50, iters_b=400, repeats=3):
    """Iterations/sec from the difference of two fixed-length CG runs.

    The chain length adapts upward until the measured time difference
    clears the dispatch/relay jitter floor — tiny trace systems otherwise
    produce a difference smaller than the timer noise (observed as a
    negative rate on the 72-row config).
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    rhs = jnp.asarray(rng.normal(size=n_lag))
    cg_a = sharded.make_fused_cg(iters_a)
    ka = int(cg_a(rhs, 0.0)[2])  # compile + warm; actual iterations run

    def run(cg):
        t0 = time.perf_counter()
        out = cg(rhs, 0.0)
        float(out[1])
        return time.perf_counter() - t0

    ta = min(run(cg_a) for _ in range(repeats))
    while True:
        cg_b = sharded.make_fused_cg(iters_b)
        kb = int(cg_b(rhs, 0.0)[2])
        tb = min(run(cg_b) for _ in range(repeats))
        # Use the ACTUAL iteration counts: small systems converge (rs hits
        # exact zero / degenerates) before the cap even with tol=0, so the
        # nominal lengths would overstate the work.
        if kb > ka and tb - ta > 0.02:
            # 20 ms clears the observed relay jitter (~2-5 ms).
            return (kb - ka) / (tb - ta)
        if iters_b >= 51200:
            # Converged before the cap on both lengths: per-solve wall time
            # is dispatch-bound; report iterations over the single-solve
            # time (a lower bound on the device rate).
            return kb / tb
        iters_b *= 4


def _time_mixed_solve(sharded, n_lag, repeats=3):
    """Wall time for the production trace solve to 1e-10 |r|.

    Uses whatever ``_trace_krylov`` picks for this system on this backend
    (the mixed f32-inner path on TPU, the f64 loop for systems whose
    blocks fail the cond*eps_f32 probe); reported as time-to-solution
    because per-iteration costs differ across the paths.
    """
    import jax.numpy as jnp

    from mfv2d_tpu.parallel.sharding import _trace_krylov

    rng = np.random.default_rng(3)
    rhs = jnp.asarray(rng.normal(size=n_lag))
    tol = 1e-10 * float(jnp.linalg.norm(rhs))
    # All systems run a fast inner path now: plain f32 where the seed
    # probe passes, the f32x2 hi/lo operator where it fails (NS p=8).
    cap = 3000
    solve = _trace_krylov(sharded, "cg", cap)
    out = solve(rhs, tol)  # compile + warm
    res = float(np.sqrt(float(out[1])))
    iters = int(out[2])
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = solve(rhs, tol)
        float(out[1])
        ts.append(time.perf_counter() - t0)
    return min(ts), res, iters, tol


def bench_krylov() -> list[dict]:
    device_mesh = _mesh_1dev()
    configs = [
        ("mixed_poisson_4x4_p3", _mixed_poisson_system(), 4, 4, 3),
        ("heat_march_16x16_p4", _heat_march_system(), 16, 16, 4),
        ("stokes_16x16_p4", _stokes_system(), 16, 16, 4),
        (
            "hp_mixed_poisson_8x8_p34",
            _mixed_poisson_system(),
            8,
            8,
            np.array([[3 + ((i + j) % 2), 3 + ((i + j) % 2)] for j in range(8) for i in range(8)]),
        ),
        ("navier_stokes_24x24_p8_frozen", _nonlinear_ns_system(), 24, 24, 8),
    ]
    # Optional substring filter (e.g. MFV2D_TPU_BENCH_CONFIGS=stokes,hp):
    # the heavy Navier-Stokes p=8 build can wedge a flaky relay, and a
    # partial run beats a dead one.
    import os

    only = os.environ.get("MFV2D_TPU_BENCH_CONFIGS")
    if only:
        keys = [k.strip() for k in only.split(",") if k.strip()]
        configs = [c for c in configs if any(k in c[0] for k in keys)]
    rows = []
    for name, system, nh, nv, p in configs:
        t0 = time.perf_counter()
        sharded, n_lag = _build_trace_system(system, nh, nv, p, device_mesh)
        build = time.perf_counter() - t0
        rate = _time_cg(sharded, n_lag)
        row = {
            "metric": "schur_cg_iterations_per_sec",
            "config": name,
            "value": round(rate, 1),
            "unit": "iters/s",
            "n_trace": n_lag,
            "build_s": round(build, 2),
        }
        print(json.dumps(row))
        rows.append(row)
        t_mixed, res, inner_iters, tol = _time_mixed_solve(sharded, n_lag)
        row = {
            "metric": "schur_trace_solve_seconds",
            "config": name,
            "value": round(t_mixed, 4),
            "unit": "s",
            "residual": res,
            "tolerance": tol,
            "inner_iters": inner_iters,
        }
        print(json.dumps(row))
        rows.append(row)
    return rows


def bench_peak() -> dict:
    """Assembly throughput as a fraction of the measured GEMM envelope."""
    import jax
    import jax.numpy as jnp

    # Envelope: the same shape class as the assembly GEMMs (huge-M, small-K,
    # medium-N), f32.
    e, k, n = 1 << 20, 64, 512
    a = jnp.asarray(np.random.default_rng(0).normal(size=(e, k)).astype(np.float32))
    b = jnp.asarray(np.random.default_rng(1).normal(size=(k, n)).astype(np.float32))

    from functools import partial

    @partial(jax.jit, static_argnames=("reps",))
    def chain(a, reps):
        def body(_, acc):
            return (acc @ b)[:, :k] * 1e-3 + a

        return jax.lax.fori_loop(0, reps, body, a)

    # FLOPs per rep: 2 e k n for the GEMM (the slice/add is bandwidth noise,
    # subtracted out by the two chain lengths).
    k_a, k_b = 4, 64
    chain(a, k_a).block_until_ready()
    chain(a, k_b).block_until_ready()

    def run(reps):
        t0 = time.perf_counter()
        chain(a, reps).block_until_ready()
        return time.perf_counter() - t0

    ta = min(run(k_a) for _ in range(3))
    tb = min(run(k_b) for _ in range(3))
    envelope = 2 * e * k * n * (k_b - k_a) / (tb - ta)
    # Assembly rate from bench.py's measurement protocol.
    import subprocess

    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True
    ).stdout.strip().splitlines()[-1]
    rate = json.loads(out)["value"]
    flops_per_el = 282_240  # fused mixed-Poisson p=4 (4x[49,400] + 2x[49,640])
    eff = rate * flops_per_el
    row = {
        "metric": "assembly_peak_fraction",
        "value": round(eff / envelope, 3),
        "unit": "fraction of measured wide-N f32 GEMM envelope",
        "assembly_el_per_s": rate,
        "assembly_tflops": round(eff / 1e12, 1),
        "envelope_tflops": round(envelope / 1e12, 1),
    }
    print(json.dumps(row))
    return row


def bench_factor() -> list[dict]:
    """Assembly + explicit-inverse build throughput at p=8 (VERDICT item 8).

    Measures the two-stage pipeline (fused pair-table assembly writing
    [E, n, n] to HBM, then the f32 seed inverse + Newton-Schulz/f32x2
    build) with both seed algorithms: the batched getrf path
    (jnp.linalg.inv) and the blocked Gauss-Jordan MXU path.
    """
    import jax
    import jax.numpy as jnp

    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.evaluation import ElementBatch, compute_element_matrices
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.ops.precision import blocked_gj_inverse

    p = int(os.environ.get("MFV2D_TPU_FACTOR_P", "8"))
    n_elem = int(os.environ.get("MFV2D_TPU_FACTOR_E", "1024"))
    system = _nonlinear_ns_system()
    compiled = CompiledSystem(system)
    cache = FemCache(2)
    rng = np.random.default_rng(5)
    base = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
    corners = np.tile(base, (n_elem, 1, 1)) + 0.05 * rng.normal(
        size=(n_elem, 4, 2)
    )
    batch = ElementBatch(cache.get_basis2d(p, p), corners)

    def assemble():
        m = compute_element_matrices(
            system.unknown_forms, compiled.linear_blocks, batch
        )
        m.block_until_ready()
        return m

    t0 = time.perf_counter()
    mats = assemble()  # compile + run
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    mats = assemble()
    assemble_s = time.perf_counter() - t0

    d = jnp.sqrt(jnp.maximum(jnp.abs(mats).max(axis=-1), 1e-30))
    scaled32 = (mats / d[..., :, None] / d[..., None, :]).astype(jnp.float32)

    from mfv2d_tpu.ops.pallas_factor import gj_inverse_pallas

    rows = []
    for name, fn in (
        ("getrf", jax.jit(jnp.linalg.inv)),
        ("blocked_gj_getrf_piv", lambda a: blocked_gj_inverse(a, pivot_block=0)),
        ("blocked_gj_masked_piv", lambda a: blocked_gj_inverse(a)),
        (
            "pallas_gj_resident",
            lambda a: gj_inverse_pallas(a, tile=4, interpret=False),
        ),
    ):
        out = fn(scaled32)
        out.block_until_ready()  # compile + run
        t0 = time.perf_counter()
        out = fn(scaled32)
        out.block_until_ready()
        seed_s = time.perf_counter() - t0
        err = float(
            jnp.abs(
                jnp.einsum(
                    "eij,ejk->eik", scaled32[:8].astype(jnp.float64),
                    out[:8].astype(jnp.float64),
                )
                - jnp.eye(out.shape[-1])
            ).max()
        )
        row = {
            "metric": "p8_seed_inverse_seconds",
            "config": f"{name}_E{n_elem}_p{p}",
            "value": round(seed_s, 3),
            "unit": "s",
            "assemble_s": round(assemble_s, 3),
            "assemble_compile_s": round(compile_s, 1),
            "probe_err": err,
            "n": int(out.shape[-1]),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


REFERENCE_TIMES = {
    # docs/sg_execution_times.rst rows (reference hardware: docs-build CI).
    "steady/mixed_poisson.py": 4.512,
    "steady/direct_poisson.py": 2.470,
    "steady/linear_adv_dif.py": 3.444,
    "steady/stokes_flow.py": 2.586,
    "steady/navier_stokes.py": 5.405,
    "unsteady/heat_direct.py": 16.891,
    "unsteady/heat_mixed.py": 23.969,
    "unsteady/reaction.py": 45.543,
    "unsteady/reaction_mixed.py": 43.350,
    "unsteady/cavity_flow.py": 8.169,
    "unsteady/vector_reaction.py": 6.697,
    "refinement/direct_poisson_refined.py": 37.400 + 23.810 + 56.956,
    "refinement/advdif_hp.py": 196.268,
}


def bench_gallery(warm: bool = False) -> list[dict]:
    """Example-gallery wall times.

    Cold mode (default) measures one fresh process per script — what a
    user pays typing ``python examples/...`` — and carries the ~2.5 s
    Python/JAX interpreter start the sandbox's sitecustomize forces on
    every process (the reference is a C extension with negligible import
    cost, so its sub-5 s scripts win cold starts on startup alone).

    Warm mode (``gallery warm``) runs every script's ``main()`` in ONE
    process via runpy with mfv2d_tpu already imported — the amortized cost
    of the actual solves, i.e. what any long-lived session (REPL, test
    runner, service) pays per example.
    """
    from pathlib import Path

    here = Path(__file__).resolve().parent / "examples"
    rows = []
    if warm:
        import contextlib
        import io
        import runpy

        import mfv2d_tpu  # noqa: F401  (pay the import once, outside timers)
    for script in sorted(here.glob("*/*.py")):
        rel = str(script.relative_to(here))
        if warm:
            t0 = time.perf_counter()
            ok = True
            try:
                with contextlib.redirect_stdout(io.StringIO()):
                    runpy.run_path(str(script), run_name="__main__")
            except Exception:
                ok = False
            dt = time.perf_counter() - t0
        else:
            import subprocess

            t0 = time.perf_counter()
            result = subprocess.run(
                [sys.executable, str(script)], capture_output=True
            )
            dt = time.perf_counter() - t0
            ok = result.returncode == 0
        ref = REFERENCE_TIMES.get(rel)
        row = {
            "metric": "example_wall_time_warm" if warm else "example_wall_time",
            "config": rel,
            "value": round(dt, 1),
            "unit": "s",
            "reference_s": ref,
            "ok": ok,
        }
        print(json.dumps(row))
        rows.append(row)
    total = sum(r["value"] for r in rows)
    print(json.dumps({
        "metric": "gallery_total_warm" if warm else "gallery_total",
        "value": round(total, 1), "unit": "s", "reference_s": 477.5,
    }))
    return rows


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "krylov"
    if mode == "krylov":
        bench_krylov()
    elif mode == "peak":
        bench_peak()
    elif mode == "gallery":
        bench_gallery(warm="warm" in sys.argv[2:])
    elif mode == "factor":
        bench_factor()
    else:
        raise SystemExit(f"unknown mode {mode}")

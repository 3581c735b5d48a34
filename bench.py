"""Benchmark: batched element assemblies/sec at p=4 on the TPU.

Assembles the full mixed-Poisson element system matrix (1-form mass with
metric terms, 2-form mass, incidence chains — the reference's
``compute_element_matrix`` hot path, src/evaluation/element_system.c:13) for
a batch of deformed elements in one fused XLA computation, consumed by a
matvec so every entry is live.

Timing protocol: the axon relay adds ~33 ms of host round-trip per fetch and
executes lazily, so single-call timings are meaningless.  The benchmark
chains K dependent assembly steps through a carried scalar (no step can be
elided or overlapped away) and reports (t_K - t_1) / (K - 1).

Baseline: the same assembly as single-core vectorized NumPy (einsum over the
quadrature grid) — the strongest CPU implementation of the same math
available in this container (the reference's C path needs its jmtx submodule,
which is not checked out, so it cannot be built here).

Robustness contract (the round-3 record was lost to a driver timeout):
 - every device interaction runs in a SUBPROCESS with a hard timeout, so a
   wedged relay can never hang this process;
 - the headline JSON line prints as soon as the core measurement is done,
   BEFORE any optional extras (TPU test tier);
 - the final stdout line repeats the headline (plus the tier result), so a
   parser taking either the first or the last JSON line gets a record;
 - exit code is always 0.

Reported ratios (all in one line, so none is quotable out of context):
 - ``vs_baseline``      f32 TPU rate / f64 NumPy rate (legacy, mixed dtypes)
 - ``vs_baseline_f64``  f64 TPU rate / f64 NumPy rate
 - ``vs_baseline_f32``  f32 TPU rate / f32 NumPy rate
 - ``pct_chip_peak``    assembly FLOP/s vs measured big square f32 GEMM peak
 - ``pct_shape_envelope`` same vs the assembly's own [2^20,64]x[64,512]
   shape-class GEMM envelope (the number BENCH.md sect. 3 used to report).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

P = 4
OVER_INT = 2
N_ELEM = int(os.environ.get("MFV2D_TPU_BENCH_ELEMENTS", "8192"))
CHAIN = int(os.environ.get("MFV2D_TPU_BENCH_CHAIN", "512"))
# Fused mixed-Poisson p=4 assembly FLOPs per element: 4x[49,400]x[400,400]
# pair-table GEMM halves + 2x[49,640] cross terms (see bench_solve.py peak).
FLOPS_PER_EL = 282_240

_T_START = time.perf_counter()


def _elapsed() -> float:
    return time.perf_counter() - _T_START


def _problem():
    import mfv2d_tpu as mf
    from mfv2d_tpu.compiler import CompiledSystem

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_2)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    pw = q.weight
    system = mf.KFormSystem(
        pw.derivative @ u - pw @ q == 0,
        v @ q.derivative == 0,
    )
    return system, CompiledSystem(system)


def _corners(n_elem: int, dtype) -> np.ndarray:
    rng = np.random.default_rng(1234)
    base = np.array([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
    return (
        np.tile(base, (n_elem, 1, 1)) + 0.05 * rng.normal(size=(n_elem, 4, 2))
    ).astype(dtype)


def bench_tpu(n_elem: int = N_ELEM, chain: int = CHAIN) -> float:
    """Chained batched assembly rate (elements/second) on the JAX device."""
    import jax
    import jax.numpy as jnp

    from mfv2d_tpu.evaluation import ElementBatch, compute_element_matrices
    from mfv2d_tpu.ops.basis import FemCache

    system, compiled = _problem()
    basis = FemCache(OVER_INT).get_basis2d(P, P)
    dtype = (
        np.float32
        if os.environ.get("MFV2D_TPU_ASSEMBLY_DTYPE", "float64") == "float32"
        else np.float64
    )
    corners = jnp.asarray(_corners(n_elem, dtype))
    n = system.unknown_forms.total_size(P, P)
    rng = np.random.default_rng(7)
    xvec = jnp.asarray(rng.normal(size=(n,)).astype(dtype))

    def step(c, s):
        # Assembly depends on the carried scalar so the chain is sequential;
        # the matvec consumes every matrix entry (via a full reduction that
        # feeds the next iteration) so nothing is dead code.
        cc = c * (1.0 + s * 1e-30).astype(c.dtype)
        batch = ElementBatch(basis, cc)
        m = compute_element_matrices(system.unknown_forms, compiled.lhs_blocks, batch)
        return jnp.sum(jnp.einsum("eij,j->ei", m, xvec))

    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def chain_fn(c, k):
        # The whole chain runs inside one dispatch: per-step host/relay
        # overhead (33 ms RTT, lazy execution) never enters the measurement.
        def body(_, carry):
            c_, s = carry
            return c_, step(c_, s)

        return jax.lax.fori_loop(0, k, body, (c, jnp.asarray(0.0, dtype)))[1]

    c = corners
    k0 = max(2, chain // 8)
    float(chain_fn(c, k0))  # compile + warm both lengths
    float(chain_fn(c, chain))

    def run(k: int) -> float:
        t0 = time.perf_counter()
        float(chain_fn(c, k))
        return time.perf_counter() - t0

    # Two chain lengths subtract the fixed dispatch/fetch overhead; the min
    # over repeats rejects relay-latency spikes.
    t0 = min(run(k0) for _ in range(5))
    tk = min(run(chain) for _ in range(5))
    per_assembly = (tk - t0) / (chain - k0)
    return n_elem / per_assembly


def bench_cpu_baseline(
    n_elem: int = 512, reps: int = 3, dtype=np.float64
) -> float:
    """Single-core vectorized NumPy assembly of the same element system."""
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.ops.incidence import incidence_21

    basis = FemCache(OVER_INT).get_basis2d(P, P)
    bx, be = basis.basis_xi, basis.basis_eta
    b_h = np.kron(be.node, bx.edge).astype(dtype)  # [n_h, nq]
    b_v = np.kron(be.edge, bx.node).astype(dtype)
    b_2 = np.kron(be.edge, bx.edge).astype(dtype)
    w = np.kron(be.rule.weights, bx.rule.weights).astype(dtype)
    nodes_1 = bx.rule.nodes.astype(dtype)
    nodes_2 = be.rule.nodes.astype(dtype)
    e21 = incidence_21(P, P).astype(dtype)
    corners = _corners(n_elem, dtype)

    def assemble(c):
        x0, y0 = c[:, 0, 0], c[:, 0, 1]
        x1, y1 = c[:, 1, 0], c[:, 1, 1]
        x2, y2 = c[:, 2, 0], c[:, 2, 1]
        x3, y3 = c[:, 3, 0], c[:, 3, 1]
        t0 = nodes_1[None, None, :]
        t1 = nodes_2[None, :, None]

        def b(v):
            return v[:, None, None]

        j00 = (b(x1 - x0) * (1 - t1) + b(x2 - x3) * (1 + t1)) / 4 + 0 * t0
        j01 = (b(y1 - y0) * (1 - t1) + b(y2 - y3) * (1 + t1)) / 4 + 0 * t0
        j10 = (b(x3 - x0) * (1 - t0) + b(x2 - x1) * (1 + t0)) / 4 + 0 * t1
        j11 = (b(y3 - y0) * (1 - t0) + b(y2 - y1) * (1 + t0)) / 4 + 0 * t1
        det = j00 * j11 - j10 * j01
        e = c.shape[0]
        j00, j01, j10, j11, det = (
            v.reshape(e, -1) for v in (j00, j01, j10, j11, det)
        )
        k_hh = (j10 * j10 + j11 * j11) / det * w
        k_vv = (j00 * j00 + j01 * j01) / det * w
        k_hv = (j00 * j10 + j01 * j11) / det * w
        m_hh = np.einsum("ws,es,us->ewu", b_h, k_hh, b_h)
        m_vv = np.einsum("ws,es,us->ewu", b_v, k_vv, b_v)
        m_hv = np.einsum("ws,es,us->ewu", b_h, k_hv, b_v)
        m1 = np.concatenate(
            [
                np.concatenate([m_hh, m_hv], axis=2),
                np.concatenate([np.swapaxes(m_hv, 1, 2), m_vv], axis=2),
            ],
            axis=1,
        )
        m2 = np.einsum("ws,es,us->ewu", b_2, w / det, b_2)
        n1 = m1.shape[1]
        n2 = m2.shape[1]
        out = np.zeros((e, n1 + n2, n1 + n2), dtype)
        out[:, :n1, :n1] = -m1
        out[:, :n1, n1:] = np.einsum("ji,ejk->eik", e21, m2)
        out[:, n1:, :n1] = np.einsum("eij,jk->eik", m2, e21)
        return out

    assemble(corners[:4])  # warm caches
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        assemble(corners)
        times.append(time.perf_counter() - t0)
    return n_elem / min(times)


def bench_gemm_peaks() -> dict:
    """Measured f32 GEMM rates: big square (chip peak) + assembly shape class.

    Both use the two-chain-length protocol so dispatch overhead cancels.
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    def rate(make_ab, flops_per_rep, body, k_a, k_b):
        a, b_mat = make_ab()

        # b threads through the jit boundary as an ARGUMENT: a closure
        # capture is serialized with the computation and the relay's
        # remote compiler rejects bodies past ~100 MB (HTTP 413) — the
        # 8192^2 f32 operand alone is 256 MB.
        # The chain returns a SCALAR that the host fetches: the relay
        # executes lazily and block_until_ready alone does not force the
        # computation (measured: an impossible 1.9 EFLOP/s without the
        # value fetch).
        @partial(jax.jit, static_argnames=("reps",))
        def chain(a, b, reps):
            def step(_, acc):
                return body(acc, b)

            return jnp.sum(jax.lax.fori_loop(0, reps, step, a))

        float(chain(a, b_mat, k_a))
        float(chain(a, b_mat, k_b))

        def run(reps):
            t0 = time.perf_counter()
            float(chain(a, b_mat, reps))
            return time.perf_counter() - t0

        ta = min(run(k_a) for _ in range(5))
        tb = min(run(k_b) for _ in range(5))
        if tb > ta:
            return flops_per_rep * (k_b - k_a) / (tb - ta)
        # Relay-latency noise swallowed the short chain; the long chain
        # alone still bounds the rate from below (overhead-inclusive).
        return flops_per_rep * k_b / tb

    rng = np.random.default_rng(0)
    # Chip peak: big square f32 GEMM (MXU-saturating, both dims wide).
    m = 8192
    sq = rate(
        lambda: (
            jnp.asarray(rng.normal(size=(m, m)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(m, m)).astype(np.float32)),
        ),
        2 * m * m * m,
        lambda acc, b: (acc @ b) * 1e-3 + acc * 1e-6,
        4,
        32,
    )
    # Assembly shape class: huge-M, small-K, medium-N.
    e, k, n = 1 << 20, 64, 512
    env = rate(
        lambda: (
            jnp.asarray(rng.normal(size=(e, k)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(k, n)).astype(np.float32)),
        ),
        2 * e * k * n,
        lambda acc, b: (acc @ b)[:, :k] * 1e-3 + acc,
        16,
        256,
    )
    return {"chip_peak_flops": sq, "envelope_flops": env}


def bench_roofline() -> dict:
    """Measured roofline inputs: HBM stream peak + materializing assembly.

    Three numbers close the BASELINE "fraction of matmul peak" question
    (round-5 item; full analysis in BENCH.md section 3b):

    - ``hbm_stream_gbps``: chained scale over a 1 GiB f32 buffer
      (read N + write N per rep) — the STREAM-like bandwidth peak.
    - ``materializing_el_per_s``: the assembly rate when the [E, n, n]
      matrices are FORCED to materialize (a strided sample of every
      batch feeds the chain carry), i.e. the production path that feeds
      factorization.  Its write stream n^2*4 B/el is the hard HBM floor
      no assembly kernel can avoid.
    - ``materializing_bytes_per_el``: that floor (output + corners +
      metric factors), used for the utilization ratio.
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    from mfv2d_tpu.evaluation import ElementBatch, compute_element_matrices
    from mfv2d_tpu.ops.basis import FemCache

    rng = np.random.default_rng(0)
    n_s = 1 << 28
    x = jnp.asarray(rng.normal(size=(n_s,)).astype(np.float32))

    @partial(jax.jit, static_argnames=("reps",))
    def stream(a, reps):
        def body(_, acc):
            return acc * 1.0000001 + 1e-12

        return jnp.sum(jax.lax.fori_loop(0, reps, body, a)[:8])

    float(stream(x, 2))
    float(stream(x, 16))

    def s_run(reps):
        t0 = time.perf_counter()
        float(stream(x, reps))
        return time.perf_counter() - t0

    ta = min(s_run(2) for _ in range(4))
    tb = min(s_run(16) for _ in range(4))
    bw = 2 * 4 * n_s * 14 / (tb - ta)
    del x

    system, compiled = _problem()
    basis = FemCache(OVER_INT).get_basis2d(P, P)
    # Production-scale batch: large enough that the [E, n, n] output and
    # the compose pieces cannot hide in VMEM, so the rate reflects real
    # HBM streaming (at 8192 elements the same kernel measures ~40%
    # faster because pieces stay on-chip).
    e = 32768
    corners = jnp.asarray(_corners(e, np.float32))
    n = system.unknown_forms.total_size(P, P)

    @partial(jax.jit, static_argnames=("k",))
    def mat_chain(c, k):
        def body(_, carry):
            c_, sc = carry
            cc = c_ * (1.0 + sc * 1e-30)
            batch = ElementBatch(basis, cc)
            m = compute_element_matrices(
                system.unknown_forms, compiled.lhs_blocks, batch
            )
            # A strided sample of the full buffer feeds the carry: the
            # whole [E, n, n] must exist (materialize) every step.
            s2 = m[::97, 3, 5].sum() * 1e-30 + m[7, 11, 13] * 1e-31
            return c_, s2

        return jax.lax.fori_loop(
            0, k, body, (c, jnp.asarray(0.0, jnp.float32))
        )[1]

    float(mat_chain(corners, 2))
    float(mat_chain(corners, 16))

    def m_run(k):
        t0 = time.perf_counter()
        float(mat_chain(corners, k))
        return time.perf_counter() - t0

    ta = min(m_run(2) for _ in range(5))
    tb = min(m_run(16) for _ in range(5))
    rate = e * 14 / (tb - ta)
    # Hard traffic floor: the output write + corners + metric factors.
    floor_bytes = n * n * 4 + 4 * 2 * 4 + 64 * 4
    # ACTUAL traffic from XLA's own cost model (validated physical for
    # this kernel: bytes * rate lands at the measured stream peak, unlike
    # the fused-consumer kernel whose "bytes accessed" stay in VMEM).
    xla_bytes = None
    try:

        def asm_only(c):
            batch = ElementBatch(basis, c)
            return compute_element_matrices(
                system.unknown_forms, compiled.lhs_blocks, batch
            )

        ca = jax.jit(asm_only).lower(corners).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        xla_bytes = float(ca.get("bytes accessed", 0.0)) / e or None
    except Exception:
        pass
    return {
        "hbm_stream_gbps": bw / 1e9,
        "materializing_el_per_s": rate,
        "materializing_bytes_per_el": xla_bytes or floor_bytes,
        "floor_bytes_per_el": floor_bytes,
        "n_matrix": int(n),
    }


def _await_device(attempts: int = 2, probe_timeout: int = 60) -> bool:
    """Return True once the accelerator answers a trivial dispatch.

    The axon relay's remote worker can wedge for minutes after a crashed or
    killed client (device ops then HANG rather than error).  Each probe
    runs in a subprocess so a hung dispatch can be killed.  Hard-capped at
    ~2 minutes total — the headline must print even on a dead relay
    (round 3's record was nulled by an unbounded wait here).
    """
    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((256, 256));"
        "print(float((x @ x).sum()))"
    )
    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=probe_timeout,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt + 1 < attempts:
            time.sleep(10)
    return False


def _sub_json(argv: list[str], timeout: float, env: dict | None = None):
    """Run ``bench.py <argv>`` in a subprocess; parse its last stdout line.

    Returns None on timeout/crash/unparseable output — never raises.
    """
    if timeout < 30:
        return None
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *argv],
            timeout=timeout,
            capture_output=True,
            text=True,
            env=full_env,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return None


def _tpu_tier_result(timeout: float) -> str:
    """Run the opt-in TPU-tier tests on the real chip (VERDICT r2 item 6).

    Returns "N/M" passed/total, or a short failure tag; never raises — the
    bench headline has already printed by the time this runs.
    """
    env = dict(os.environ)
    env["MFV2D_TPU_TESTS"] = "1"
    try:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-m", "tpu", "-q"],
            timeout=timeout,
            capture_output=True,
            text=True,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return "timeout"
    import re

    m = re.search(r"(\d+) passed", r.stdout)
    passed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", r.stdout)
    failed = int(m.group(1)) if m else 0
    return f"{passed}/{passed + failed}"


def main() -> None:
    # CPU baselines first: no device involved, a few seconds, can't hang.
    base_f64 = bench_cpu_baseline(dtype=np.float64)
    base_f32 = bench_cpu_baseline(dtype=np.float32)

    alive = _await_device()
    rate_f32 = rate_f64 = None
    peaks = roof = None
    if alive:
        r = _sub_json(
            ["--device-rate"],
            timeout=300,
            env={"MFV2D_TPU_ASSEMBLY_DTYPE": "float32"},
        )
        rate_f32 = r and r.get("rate")
        # GEMM peaks before the f64 rate: cheaper, and pct_chip_peak is
        # the headline-adjacent number (BASELINE "fraction of matmul
        # peak") that must not get budget-skipped.
        peaks = _sub_json(["--gemm-peaks"], timeout=min(180.0, 420.0 - _elapsed()))
        # f64 keeps the full batch (the >2e9-FLOP gate then routes it
        # through the production exact-sum Ozaki assembly — the shipped
        # f64 path on TPU; smaller batches fall to raw emulated-f64
        # einsums whose compile alone blows the budget) but a shorter
        # chain; the rate is per element so the numbers stay comparable.
        roof = _sub_json(
            ["--roofline"], timeout=min(240.0, 500.0 - _elapsed())
        )
        r = _sub_json(
            ["--device-rate", str(N_ELEM), "64"],
            timeout=min(300.0, 580.0 - _elapsed()),
            env={"MFV2D_TPU_ASSEMBLY_DTYPE": "float64"},
        )
        rate_f64 = r and r.get("rate")

    row = {
        "metric": "element_assemblies_per_sec_p4",
        "value": round(rate_f32, 1) if rate_f32 else 0.0,
        "unit": "elements/s",
        "vs_baseline": round(rate_f32 / base_f64, 2) if rate_f32 else 0.0,
        # vs_baseline mixes dtypes (legacy headline): f32 TPU over f64
        # NumPy.  The like-for-like pairs:
        "vs_baseline_f64": round(rate_f64 / base_f64, 2) if rate_f64 else None,
        "vs_baseline_f32": round(rate_f32 / base_f32, 2) if rate_f32 else None,
        "assembly_dtype": "float32",
        "baseline_dtype": "float64",
        "baseline_el_per_s_f64": round(base_f64, 1),
        "baseline_el_per_s_f32": round(base_f32, 1),
    }
    if peaks and rate_f32:
        eff = rate_f32 * FLOPS_PER_EL
        row["pct_chip_peak"] = round(100.0 * eff / peaks["chip_peak_flops"], 1)
        row["pct_shape_envelope"] = round(
            100.0 * eff / peaks["envelope_flops"], 1
        )
        row["chip_peak_tflops"] = round(peaks["chip_peak_flops"] / 1e12, 1)
        row["envelope_tflops"] = round(peaks["envelope_flops"] / 1e12, 1)
    if roof:
        # Roofline closure (BENCH.md section 3b): the headline kernel is
        # MXU-bound at the math-dictated contraction K = nq, so chip-peak
        # fractions are bounded by the shape envelope; the MATERIALIZING
        # assembly (feeding factorization) is HBM-write-bound, reported
        # here as achieved fraction of the measured stream peak.
        row["hbm_stream_gbps"] = round(roof["hbm_stream_gbps"], 1)
        row["materializing_el_per_s"] = round(
            roof["materializing_el_per_s"], 1
        )
        # Utilization counts only the GUARANTEED traffic (output write +
        # inputs): a conservative lower bound.  XLA's logical
        # bytes-accessed (the amplification numerator) over-counts what
        # fusion keeps on-chip — bytes * rate lands AT or above the
        # stream peak, which is the bandwidth-saturation evidence BENCH.md
        # section 3b walks through.
        row["hbm_utilization"] = round(
            100.0
            * roof["materializing_el_per_s"]
            * roof["floor_bytes_per_el"]
            / (roof["hbm_stream_gbps"] * 1e9),
            1,
        )
        row["traffic_amplification"] = round(
            roof["materializing_bytes_per_el"]
            / roof["floor_bytes_per_el"],
            2,
        )
    if not alive:
        row["error"] = "device unreachable (probe timed out)"

    # HEADLINE: print (and flush) before any optional extras.
    print(json.dumps(row), flush=True)

    if alive and not os.environ.get("MFV2D_TPU_BENCH_SKIP_TIER"):
        budget = 700.0 - _elapsed()
        row["tpu_tier_tests"] = (
            _tpu_tier_result(min(300.0, budget)) if budget > 60 else "skipped"
        )
        # Re-print so a last-line parser also sees the (augmented) record.
        print(json.dumps(row), flush=True)
    sys.exit(0)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--device-rate":
        n_elem = int(sys.argv[2]) if len(sys.argv) > 2 else N_ELEM
        chain = int(sys.argv[3]) if len(sys.argv) > 3 else CHAIN
        print(json.dumps({"rate": bench_tpu(n_elem, chain)}))
    elif len(sys.argv) > 1 and sys.argv[1] == "--gemm-peaks":
        print(json.dumps(bench_gemm_peaks()))
    elif len(sys.argv) > 1 and sys.argv[1] == "--roofline":
        print(json.dumps(bench_roofline()))
    else:
        main()

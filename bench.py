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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("MFV2D_TPU_ASSEMBLY_DTYPE", "float32")

P = 4
OVER_INT = 2
N_ELEM = int(os.environ.get("MFV2D_TPU_BENCH_ELEMENTS", "8192"))
CHAIN = int(os.environ.get("MFV2D_TPU_BENCH_CHAIN", "512"))


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


def bench_tpu() -> float:
    """Chained batched assembly rate (elements/second) on the JAX device."""
    import jax
    import jax.numpy as jnp

    from mfv2d_tpu.evaluation import ElementBatch, compute_element_matrices
    from mfv2d_tpu.ops.basis import FemCache

    system, compiled = _problem()
    basis = FemCache(OVER_INT).get_basis2d(P, P)
    dtype = (
        np.float32
        if os.environ["MFV2D_TPU_ASSEMBLY_DTYPE"] == "float32"
        else np.float64
    )
    corners = jnp.asarray(_corners(N_ELEM, dtype))
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
    def chain(c, k):
        # The whole chain runs inside one dispatch: per-step host/relay
        # overhead (33 ms RTT, lazy execution) never enters the measurement.
        def body(_, carry):
            c_, s = carry
            return c_, step(c_, s)

        return jax.lax.fori_loop(0, k, body, (c, jnp.asarray(0.0, dtype)))[1]

    c = corners
    k0 = max(2, CHAIN // 8)
    float(chain(c, k0))  # compile + warm both lengths
    float(chain(c, CHAIN))

    def run(k: int) -> float:
        t0 = time.perf_counter()
        float(chain(c, k))
        return time.perf_counter() - t0

    # Two chain lengths subtract the fixed dispatch/fetch overhead; the min
    # over repeats rejects relay-latency spikes.
    t0 = min(run(k0) for _ in range(5))
    tk = min(run(CHAIN) for _ in range(5))
    per_assembly = (tk - t0) / (CHAIN - k0)
    return N_ELEM / per_assembly


def bench_cpu_baseline(n_elem: int = 512, reps: int = 3) -> float:
    """Single-core vectorized NumPy assembly of the same element system."""
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.ops.incidence import incidence_21

    basis = FemCache(OVER_INT).get_basis2d(P, P)
    bx, be = basis.basis_xi, basis.basis_eta
    b_h = np.kron(be.node, bx.edge)  # [n_h, nq]
    b_v = np.kron(be.edge, bx.node)
    b_2 = np.kron(be.edge, bx.edge)
    w = np.kron(be.rule.weights, bx.rule.weights)
    nodes_1 = bx.rule.nodes
    nodes_2 = be.rule.nodes
    e21 = incidence_21(P, P)
    corners = _corners(n_elem, np.float64)

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
        out = np.zeros((e, n1 + n2, n1 + n2))
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


def _await_device(attempts: int = 8, probe_timeout: int = 120) -> None:
    """Block until the accelerator answers a trivial dispatch.

    The axon relay's remote worker can wedge for minutes after a crashed or
    killed client (device ops then HANG rather than error).  Each probe
    runs in a subprocess so a hung dispatch can be killed; the bench only
    proceeds once a probe round-trips.
    """
    import subprocess
    import sys

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
                return
        except subprocess.TimeoutExpired:
            pass
        time.sleep(60)
    # Fall through and let the real run report whatever happens.


def _tpu_tier_result(timeout: int = 600) -> str:
    """Run the opt-in TPU-tier tests on the real chip (VERDICT r2 item 6).

    Returns "N/M" passed/total, or a short failure tag; never raises — the
    bench headline must still print if the tier wedges.
    """
    import subprocess
    import sys

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
    _await_device()
    tpu_rate = bench_tpu()
    base_rate = bench_cpu_baseline()
    tier = _tpu_tier_result()
    print(
        json.dumps(
            {
                "metric": "element_assemblies_per_sec_p4",
                "value": round(tpu_rate, 1),
                "unit": "elements/s",
                "vs_baseline": round(tpu_rate / base_rate, 2),
                # The baseline runs in float64 (NumPy's native speed there);
                # the TPU rate uses the dtype below, so the ratio mixes
                # precisions — disclose it.
                "assembly_dtype": os.environ["MFV2D_TPU_ASSEMBLY_DTYPE"],
                "baseline_dtype": "float64",
                # Hardware-tier pytest run (f32 accuracy bounds asserted on
                # the actual accelerator; gate.py --tpu runs the same).
                "tpu_tier_tests": tier,
            }
        )
    )


if __name__ == "__main__":
    main()

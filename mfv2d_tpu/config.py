"""Global configuration for the TPU-native MSEM framework.

The solver path defaults to float64 (required for the 1e-10 parity targets of the
reference mfv2d examples, see BASELINE.md).  On TPU hardware float64 matmuls are
emulated and slow, so the batched assembly kernels can optionally run in float32
or bfloat16 for throughput benchmarks; correctness tests always use float64.
"""

from __future__ import annotations

import os

import jax

# Enable 64-bit mode before any arrays are created.  This is a deliberate,
# documented side effect of importing the package: a mimetic spectral solver
# without f64 cannot hit the reference tolerances.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: refinement loops and repeated solves re-trace
# the same shapes; caching compiled executables across processes removes the
# dominant wall-time cost of small runs.  Opt out with
# MFV2D_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("MFV2D_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "mfv2d_tpu_jax"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # Refinement rounds emit ~100 small programs (~33 ms each); a 0.5 s
        # threshold persisted none of them, so every process restart paid
        # the full compile bill again.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # Also cache CPU kernels unless disabled (their AOT entries log
        # noisy machine-feature warnings on load; set
        # MFV2D_TPU_XLA_CACHES=default to avoid them at some warm-start
        # cost).
        jax.config.update(
            "jax_persistent_cache_enable_xla_caches",
            os.environ.get("MFV2D_TPU_XLA_CACHES", "all"),
        )
    except Exception:  # pragma: no cover - older jax without the options
        pass


class _Config:
    """Runtime configuration knobs."""

    def __init__(self) -> None:
        # dtype used for the solve path (residuals, factorizations).
        self.solver_dtype = "float64"
        # dtype used for batched element assembly; override with
        # MFV2D_TPU_ASSEMBLY_DTYPE=float32 for TPU throughput runs.
        self.assembly_dtype = os.environ.get("MFV2D_TPU_ASSEMBLY_DTYPE", "float64")
        # Sum-factorized mass assembly (tensor-product splitting, ~5.5x
        # fewer flops at p=4): "auto" enables it off-TPU (the MXU prefers
        # the single big contraction), "always"/"never" force it.
        self.sum_factorization = os.environ.get("MFV2D_TPU_SUM_FACTOR", "auto")
        # Fused pair-table assembly: lower each linear-in-metric block to one
        # wide-N GEMM per term (ops/fused_assembly.py).  Measured 1.53x over
        # the stack-machine path on v5e at p=4; disable with
        # MFV2D_TPU_FUSED_ASSEMBLY=0 to force the fallback everywhere.
        self.fused_assembly = os.environ.get("MFV2D_TPU_FUSED_ASSEMBLY", "1") != "0"
        # Mixed-precision sharded trace Krylov (f32 inner sweeps + f64
        # defect correction): "auto" enables it on TPU backends, where f64
        # GEMVs are software-emulated; "1" forces it (CPU parity tests),
        # "0" disables it.
        self.sharded_mixed = os.environ.get("MFV2D_TPU_SHARDED_MIXED", "auto")
        # Condensed trace operator for the mixed-path inner Krylov: apply
        # S = sum_e G_e A_e^{-1} G_e^T through precomputed per-element
        # condensed blocks [E, c, c] (c = constraints touching an element)
        # instead of the full block inverses [E, n, n] — (n/c)^2 less HBM
        # traffic per inner matvec and representation-only f32 error (the
        # blocks are built through the f64 inverse, then rounded).
        # Disable with MFV2D_TPU_CONDENSED=0.
        self.condensed_trace = os.environ.get("MFV2D_TPU_CONDENSED", "1") != "0"
        # f32 seed-inverse algorithm for the explicit-inverse builds:
        # "getrf" (batched jnp.linalg.inv), "gj" (blocked Gauss-Jordan,
        # MXU GEMMs — ops/precision.blocked_gj_inverse), or "auto".
        self.seed_inverse = os.environ.get("MFV2D_TPU_SEED_INV", "auto")
        # Lean-blocks mode: keep [E, n, n] f64 element blocks host-side
        # with per-bucket slice providers once they pass ~1 GB total
        # ("auto"), always ("1"), or never ("0").  Device HBM then holds
        # only the explicit inverses + condensed tables.
        self.lean_blocks = os.environ.get("MFV2D_TPU_LEAN_BLOCKS", "auto")
        # Device-resident Green's-function applies for lean saddle systems
        # (the VMS fine saddle opts in): keep the f64 explicit inverse AND
        # the f64 blocks on-device and run each refined diagonal-inverse
        # apply as ONE dispatch of Ozaki bf16-slice GEMV sweeps
        # (ops/precision.ozaki_refined_solve).  HBM-resident applies are
        # immune to the one-core host's RAM-bandwidth collapse (BENCH.md
        # 4b: 12.3 s/apply under contention vs ~1.6 s on-device).
        # "auto" enables when the tables fit MFV2D_TPU_DEV_GREENS_GB
        # (default 9 GB); "0" disables; "1" forces (tests).
        self.device_greens = os.environ.get("MFV2D_TPU_DEV_GREENS", "auto")
        self.device_greens_gb = float(
            os.environ.get("MFV2D_TPU_DEV_GREENS_GB", "9")
        )
        # Acceptance multiplier for the dev-greens STRICT tier: the
        # device refined-apply floor must be <= floor * (host floor) for
        # the device to serve accuracy-critical applies (final
        # unresolved-scale re-solves, main-system solves).  Measured on
        # config 5: a 3x-floor strict acceptance shifts the answer ~3x
        # (rms 5.4e-13 -> 1.67e-12) because the final re-solve then also
        # runs on the device — 1.5 keeps strict acceptance essentially
        # accuracy-free, and everything between 1.5x and 10x lands in
        # the LOOSE tier (in-loop Picard applies only, self-correcting;
        # the guarded convergence re-solve restores host-floor scales).
        # TPU's emulated f64 is not correctly rounded (adds ~32 ulps),
        # pinning the device floor at ~3x the host's at config-5
        # conditioning, so the strict tier rarely wins there by design.
        self.device_greens_floor = float(
            os.environ.get("MFV2D_TPU_DEV_GREENS_FLOOR", "1.5")
        )
        # Accelerator HBM capacity used for NON-ALLOCATING headroom
        # accounting (live-array bytes vs capacity).  The relay exposes no
        # memory_stats, and probing by actually allocating is destructive:
        # a FAILED multi-GB allocation leaves the arena unable to serve
        # the next unrelated ~10 MB upload (observed twice at config-5
        # residency — both the dev-greens table upload and the
        # alloc-probe variant killed the following advection apply).
        # Default 15.5 GB = v5e HBM minus runtime reserve.
        self.hbm_capacity_gb = float(
            os.environ.get("MFV2D_TPU_HBM_GB", "15.5")
        )
        # Observed relay-tunnel transfer rate (GB/s), recorded by the big
        # streaming downloads (solver/vms.py _ChunkDownloader) and read by
        # the dev-greens gate to veto multi-GB table uploads in slow
        # tunnel windows (measured 0.002-0.05 GB/s across sessions — a
        # 2.7 GB inverse upload swings 60 s to 20+ min).  None until a
        # transfer has been timed this process.
        self.tunnel_gbps_observed: float | None = None
        # Galerkin coarse-operator route: "device" (default — the
        # exact-sum Ozaki product is consistent with the fine blocks to
        # 2^-70; the host f64 triple product's GEMM rounding appears
        # cond-amplified in |vms|, measured 40x at NH=16) or "host"
        # (explicit opt-in: zero extra tunnel bytes, overlapped with the
        # fine download — for runs that do not read the fine scales).
        self.galerkin_route = os.environ.get("MFV2D_TPU_GALERKIN", "device")
        # Route the fused-assembly f64 GEMMs through the exact-sum Ozaki
        # bf16-slice scheme on TPU (ops/ozaki.py: cutoff 10 + per-pair
        # f64 accumulation — truncation ~K * 2^-70 of the envelope, at or
        # below a native f64 GEMM's roundoff, vs the ~3 GFLOP/s XLA f64
        # emulation it replaces).  On by default since the ninth-session
        # exact_sum rework made it accuracy-neutral; "0" restores the
        # emulated-f64 products.
        self.ozaki_assembly = os.environ.get("MFV2D_TPU_OZAKI_ASSEMBLY", "1")


config = _Config()

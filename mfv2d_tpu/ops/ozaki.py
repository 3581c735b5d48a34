"""Ozaki-scheme f64 matrix products on the MXU.

TPU XLA software-emulates f64 matmuls at ~3 GFLOP/s (measured, BACKLOG.md)
— the wall behind every accurate batched GEMM in the framework (the
Newton-Schulz f64 inverse builds were ~19 s per sweep at Navier-Stokes
p=8 scale).  This module computes f64-accurate products from EXACT bf16
slice GEMMs instead:

    a = sigma_row * sum_s a_s,   |a_s| <= 2^(-t*s),  a_s a multiple of
                                 2^(-t*(s+1))  (t significand bits)

Each slice is exactly representable in bf16 (t <= 8 mantissa bits), the
MXU multiplies bf16 pairs exactly into the f32 accumulator (16-bit
products), and a k-term accumulation of slice-pair products stays exact
while ``k * 2^(2t) <= 2^24`` — so every slice-pair GEMM
``a_s @ b_s'`` is EXACT at full bf16 MXU throughput.  Summing the pairs
with ``s + s' < cutoff`` in f64 (elementwise — cheap) reproduces the f64
product to ``~k * 2^(-t*cutoff)`` relative error: t=7, cutoff=7 gives
~1e-12 with 28 batched bf16 GEMMs, ~1000x the emulated-f64 rate.

The scheme is the standard Ozaki splitting (Ozaki et al., "Error-free
transformations of matrix multiplication", Numer. Algorithms 2012), laid
out for TPU: per-row/per-column power-of-two scaling, slice extraction as
elementwise f64 ops (bandwidth-bound), all FLOPs on the MXU.

Reference counterpart: the f64 BLAS calls behind src/algebra/matrix.c —
the reference runs LAPACK in native f64; TPU hardware has no f64 unit, so
exactness has to be reconstructed from the bf16/f32 units.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pick_bits(k: int, t: int | None) -> int:
    """Largest slice width (<= 8 bits, bf16-exact) with exact k-term
    f32 accumulation: ``k * 2^(2t) <= 2^24``."""
    if t is None:
        t = min(8, (24 - max(int(np.ceil(np.log2(max(k, 2)))), 1)) // 2)
        if t < 1:
            # k > 2^22: even 1-bit slices can't accumulate exactly in f32.
            raise ValueError(
                f"contraction length {k} too long for exact bf16-slice"
                " accumulation; split the contraction first"
            )
    if not 1 <= t <= 8:
        # bf16 has an 8-bit significand: wider slices round on the cast
        # and silently break the error-free-transform contract.
        raise ValueError(f"slice width t={t} outside the bf16-exact range [1, 8]")
    if k * (1 << (2 * t)) > (1 << 24):
        raise ValueError(
            f"contraction length {k} too long for exact {t}-bit slices"
        )
    return t


def _split(a, axis: int, t: int, n_slices: int):
    """Slice ``a`` (f64) along scaling ``axis`` into bf16-exact pieces.

    Returns ``(slices, scale)`` with ``slices[s]`` f32 arrays whose values
    are multiples of ``2^(-t(s+1))`` bounded by ``~2^(-t s)``, and
    ``sigma`` the per-row (or per-column) power-of-two scale such that
    ``a ~= sigma * sum_s slices[s]`` to ``2^(-t n_slices)`` relative.
    """
    mag = jnp.max(jnp.abs(a), axis=axis, keepdims=True)
    # Power-of-two scale (exact division): 2^ceil(log2 mag); zero
    # rows/columns scale by 1 and produce all-zero slices.
    expo = jnp.ceil(jnp.log2(jnp.where(mag > 0, mag, 1.0)))
    sigma = jnp.exp2(expo)
    r = a / sigma
    slices = []
    for s in range(n_slices):
        step = jnp.exp2(float(t * (s + 1)))
        # Round-to-nearest chop to t*(s+1) fractional bits; the
        # difference from the previous chop has t significand bits.
        c = jnp.round(r * step) / step
        slices.append(c.astype(jnp.float32))
        r = r - c
    return slices, sigma


def _two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth TwoSum)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


@partial(
    jax.jit,
    static_argnames=("t", "n_slices", "cutoff", "dims", "exact_sum", "dd_out"),
)
def _matmul_sliced(
    a,
    b,
    t: int,
    n_slices: int,
    cutoff: int,
    dims,
    exact_sum: bool = False,
    dd_out: bool = False,
):
    """Core: slice both operands and sum the exact slice-pair GEMMs."""
    contract, batch = dims
    (ca,), (cb,) = contract
    slices_a, sig_a = _split(a, ca, t, n_slices)
    slices_b, sig_b = _split(b, cb, t, n_slices)

    # Group pairs by level l = s + s'.  Accumulation policy by output
    # shape: GEMV-like outputs (a vector per batch element — the refined
    # diagonal-inverse applies) are tiny next to the matrix slices, so
    # EVERY pair product converts to f64 before summing: the f32
    # level-add otherwise rounds the level-1 sum at ~2^-(t+24) relative
    # (5e-10 at t=7 — measured as a 5x-worse-than-f64 refined-apply
    # floor at config-5 conditioning, rejecting the device Green's
    # path).  Square outputs keep the in-level f32 adds (terms at one
    # level share magnitude, so those adds lose nothing below the
    # cutoff) to avoid doubling the accumulation traffic.
    by_level: dict[int, list] = {}
    for s in range(n_slices):
        for sp in range(n_slices):
            if s + sp < cutoff:
                by_level.setdefault(s + sp, []).append((s, sp))

    vector_out = exact_sum or b.shape[-1] == 1 or a.shape[-2] == 1

    if vector_out or dd_out:
        # Every pair product is EXACT (bf16 slices, bounded f32
        # accumulation), so the summation of the ~cutoff^2/2 pair terms
        # carries ALL the rounding.  TwoSum (error-free transform)
        # accumulation keeps the running sum as an (s, e) double-double:
        # plain f64 sums cost ~3-5 eps — measured as a flat
        # 5.3x-the-host-floor refined apply on the real VMS fine saddle
        # — while the dd pair exposes the GEMV to ~eps^2, which is what
        # lets refinement residuals break the cond*eps barrier
        # (``dd_out``).  Outputs are vectors, so the carry is cheap.
        total = None
        err = None
        for level in sorted(by_level, reverse=True):
            for s, sp in by_level[level]:
                g = jax.lax.dot_general(
                    slices_a[s].astype(jnp.bfloat16),
                    slices_b[sp].astype(jnp.bfloat16),
                    dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.float64)
                if total is None:
                    total, err = g, (jnp.zeros_like(g) if dd_out else None)
                elif dd_out:
                    total, e1 = _two_sum(total, g)
                    err = err + e1
                else:
                    # Smallest-first plain f64 adds (~3-5 eps envelope):
                    # the dd carry is full-output-sized traffic, only
                    # worth paying when the caller consumes it.
                    total = total + g
    else:
        level_sums = []
        for level in sorted(by_level, reverse=True):
            acc = None
            for s, sp in by_level[level]:
                g = jax.lax.dot_general(
                    slices_a[s].astype(jnp.bfloat16),
                    slices_b[sp].astype(jnp.bfloat16),
                    dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )
                acc = g if acc is None else acc + g
            level_sums.append(acc.astype(jnp.float64))
        total = level_sums[0]
        for term in level_sums[1:]:
            total = total + term

    # Undo the per-row / per-column scaling (powers of two — EXACT
    # multiplies, so the dd pair stays a faithful unevaluated sum).
    # dot_general output layout is (batch..., lhs free..., rhs free...).
    sig_a_out = jnp.squeeze(sig_a, axis=ca)[..., :, None]
    sig_b_out = jnp.squeeze(sig_b, axis=cb)[..., None, :]
    if dd_out:
        return total * sig_a_out * sig_b_out, err * sig_a_out * sig_b_out
    return total * sig_a_out * sig_b_out


def matmul64(
    a,
    b,
    t: int | None = None,
    cutoff: int | None = None,
    exact_sum: bool = False,
):
    """``a @ b`` for batched ``[..., n, k] @ [..., k, m]`` f64 operands via
    exact bf16 slice GEMMs (~1e-12 relative; see module docstring).

    ``exact_sum=True`` converts EVERY slice-pair product to f64 before
    summing (GEMV-shaped outputs always do): with cutoff >= 10 at t=7 the
    dropped-pair truncation sits at 2^-70 — the result is then at or
    below native-f64-GEMM roundoff, at the cost of f64 accumulation
    traffic over the full output per pair.  Use for square products that
    feed consistency-critical operators (e.g. the VMS Galerkin triple
    product, where an independent ~1e-12 perturbation of the coarse
    operator is NOT admissible — BACKLOG seventh session).

    On backends with native f64 GEMMs (CPU/GPU) this is strictly worse
    than ``a @ b`` — callers gate on ``jax.default_backend() == "tpu"``.
    """
    a = jnp.asarray(a, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    if a.ndim < 2 or b.ndim < 2 or a.ndim != b.ndim:
        raise ValueError(f"batched matmul ranks {a.ndim} vs {b.ndim}")
    k = a.shape[-1]
    if b.shape[-2] != k:
        raise ValueError(f"contraction mismatch {a.shape} @ {b.shape}")
    t = _pick_bits(k, t)
    if cutoff is None:
        cutoff = max(2, int(np.ceil(42 / t)) + 1)
    n_slices = cutoff
    nb = a.ndim - 2
    dims = (((a.ndim - 1,), (b.ndim - 2,)), (tuple(range(nb)), tuple(range(nb))))
    return _matmul_sliced(a, b, t, n_slices, cutoff, dims, exact_sum)


def matmul64_dd(a, b, t: int | None = None, cutoff: int | None = None):
    """``a @ b`` as an unevaluated double-double ``(hi, lo)``.

    The slice-pair products are exact, so TwoSum accumulation exposes the
    product to ~eps^2 nearly free for GEMV-shaped outputs.  The consumer
    that matters is iterative refinement: computing the residual
    ``r = (b - hi) - lo`` instead of ``b - fl(A y)`` removes the
    eps * |b| residual rounding that pins uniform-precision refinement at
    a cond * eps forward-error floor (measured 5e-11 on the NH=8 VMS fine
    saddle at cond 1.85e5, flat in cutoff AND rounds — the signature of
    the residual barrier, not of slice truncation)."""
    a = jnp.asarray(a, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    if a.ndim < 2 or b.ndim < 2 or a.ndim != b.ndim:
        raise ValueError(f"batched matmul ranks {a.ndim} vs {b.ndim}")
    k = a.shape[-1]
    if b.shape[-2] != k:
        raise ValueError(f"contraction mismatch {a.shape} @ {b.shape}")
    t = _pick_bits(k, t)
    if cutoff is None:
        cutoff = max(2, int(np.ceil(42 / t)) + 1)
    n_slices = cutoff
    nb = a.ndim - 2
    dims = (((a.ndim - 1,), (b.ndim - 2,)), (tuple(range(nb)), tuple(range(nb))))
    return _matmul_sliced(a, b, t, n_slices, cutoff, dims, False, dd_out=True)

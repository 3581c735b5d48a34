"""Device-resident Krylov kernels shared by the single-chip and sharded solvers.

These are the traceable (jit/while_loop) building blocks behind the trace
Schur solves (reference iterative layer: python/mfv2d/solving.py:178-436,
src/algebra/system_objects.c matvecs), designed for TPU execution:

- CG as a bounded ``while_loop`` with best-iterate tracking (indefinite
  trace operators make plain CG only semiconvergent).
- GMRES(m) with **large restarts**: round-2 measured the indefinite Stokes
  trace system needing 18,000 semiconvergent inner CG iterations (GMRES
  with restart 200 needs 12,611 matvecs), while GMRES with an un-truncated
  Krylov space converges in 593 — restart truncation, not missing
  preconditioning, was the bottleneck (edge- and element-patch Schwarz
  preconditioners measured *counterproductive* on these trace systems:
  986 vs 332 unpreconditioned matvecs on the 8x8 Stokes case).  Large
  ``m`` needs the per-iteration work vectorized:

  * orthogonalization is classical Gram-Schmidt with reorthogonalization
    (CGS2) — two GEMV pairs against the stored basis instead of m
    sequential masked dot/axpy steps (MGS's latency-bound inner loop
    dominates past m of a few hundred on an accelerator);
  * the Givens-rotation sweep over the new Hessenberg column is the
    first-order linear recurrence ``t_{i+1} = -sn_i t_i + cs_i h_{i+1}``
    and runs as a log-depth ``associative_scan`` instead of an O(m)
    sequential rotation loop.

The functions are pure in their ``matvec`` callable: the sharded path
passes shard_map'd kernels (one psum per matvec) and the single-chip path
plain batched GEMVs.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def cg_chunk(matvec, carry, tol, max_iter):
    """Up to ``max_iter`` traceable CG iterations from ``carry``.

    ``carry = (x, r, p, rs, x_best, rs_best)``; the best (minimum-residual)
    iterate is tracked because on indefinite operators (Stokes-type trace
    Schur complements) the CG recurrence is only semiconvergent and the
    final iterate can be far worse than the best.

    Returns ``(carry, iterations_done)``.
    """

    def cond(c):
        (_, _, _, rs, _, rs_best), k = c
        return (k < max_iter) & (rs > tol * tol)

    def body(c):
        (x, r, p, rs, x_best, rs_best), k = c
        ap = matvec(p)
        pap = jnp.vdot(p, ap)
        # Zero-curvature breakdown (the defining hazard of CG on the
        # indefinite operators this module targets): a division by ~0
        # would NaN-poison the carry and silently end the loop looking
        # converged.  Freeze the iterate instead — x_best survives and
        # the caller's true-residual check reports the stall honestly.
        broke = jnp.abs(pap) <= 1e-300
        alpha = jnp.where(broke, 0.0, rs / jnp.where(broke, 1.0, pap))
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.where(broke, -1.0, jnp.vdot(r, r))
        p = r + (jnp.abs(rs_new) / rs) * p
        better = (rs_new < rs_best) & ~broke
        x_best = jnp.where(better, x, x_best)
        rs_best = jnp.where(better, rs_new, rs_best)
        return (x, r, p, rs_new, x_best, rs_best), k + 1

    return jax.lax.while_loop(cond, body, (carry, jnp.asarray(0, jnp.int32)))


def cg_loop(matvec, b, tol, max_iter):
    """Traceable CG from a zero start; stops at ``|r| <= tol``.

    Returns ``(x_best, |r_best|^2, iterations)``.
    """
    rs0 = jnp.vdot(b, b)
    zeros = jnp.zeros_like(b)
    (_, _, _, _, x_best, rs_best), k = cg_chunk(
        matvec, (zeros, b, b, rs0, zeros, rs0), tol, max_iter
    )
    return x_best, rs_best, k


def spd_probe(matvec, rhs, iters: int = 32):
    """Signed-curvature mixing ratio of ``A`` over a short CG run.

    Tracks the extreme Rayleigh quotients ``p' A p / p' p`` of the CG
    search directions and returns ``min_c * max_c / max(min_c, max_c)^2``:
    +1-ish when all curvatures share a sign (definite operator — note the
    mixed-Poisson trace Schur complement is *negative* definite, and CG
    converges on any definite system, so sign alone is NOT the criterion),
    clearly negative when both signs appear (indefinite, e.g. Stokes /
    Navier-Stokes saddle traces, where CG is only semiconvergent and
    callers must route to large-restart GMRES).

    The run stops once the residual has contracted by 1e4 — past that, f32
    rounding makes the directions noise and their curvature meaningless
    (observed: a definite trace system probing "indefinite" from
    post-convergence noise).  Treat ``ratio <= -1e-4`` as indefinite.

    Returns the mixing ratio as a traced scalar.
    """

    def scale_of(min_c, max_c):
        return jnp.maximum(jnp.maximum(jnp.abs(min_c), jnp.abs(max_c)), 1e-30)

    def cond(c):
        (_, _, rs, rs0, min_c, max_c), k = c
        s = scale_of(min_c, max_c)
        mixed = (min_c < -1e-3 * s) & (max_c > 1e-3 * s)
        return (k < iters) & (rs > 1e-8 * rs0) & ~mixed

    def body(c):
        (r, p, rs, rs0, min_c, max_c), k = c
        ap = matvec(p)
        pap = jnp.vdot(p, ap)
        curv = pap / jnp.maximum(jnp.vdot(p, p), 1e-30)
        min_c = jnp.minimum(min_c, curv)
        max_c = jnp.maximum(max_c, curv)
        alpha = rs / jnp.where(pap != 0, pap, 1.0)
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / rs) * p
        return (r, p, rs_new, rs0, min_c, max_c), k + 1

    rs0 = jnp.vdot(rhs, rhs)
    init = (
        rhs,
        rhs,
        rs0,
        rs0,
        jnp.asarray(jnp.inf, rhs.dtype),
        jnp.asarray(-jnp.inf, rhs.dtype),
    )
    (_, _, _, _, min_c, max_c), _ = jax.lax.while_loop(
        cond, body, (init, jnp.int32(0))
    )
    s = scale_of(min_c, max_c)
    return min_c * max_c / (s * s)


def trace_indefinite_probe(apply_fn, tables, n_lagrange: int) -> bool:
    """Shared routing policy: probe an (apply_fn, tables) trace operator for
    curvature-sign mixing with a fixed seeded f32 vector.

    Single source of truth for the probe seed, length, and the -1e-4
    mixing threshold — the single-chip and sharded systems all route
    through here so CG/GMRES selection can never diverge between them.
    """
    if n_lagrange == 0:
        return False
    import numpy as np

    rhs = jnp.asarray(
        np.random.default_rng(0).normal(size=n_lagrange), jnp.float32
    )

    @jax.jit
    def probe(r, *tabs):
        return spd_probe(lambda v: apply_fn(v, *tabs), r)

    return bool(probe(rhs, *tables) <= -1e-4)


def _apply_rotations(cs, sn, hcol, j):
    """Apply stored Givens rotations ``0..j-1`` to a new Hessenberg column.

    The sequential sweep

        out_i   = cs_i t_i + sn_i h_{i+1}        (final row i, i < j)
        t_{i+1} = -sn_i t_i + cs_i h_{i+1},      t_0 = h_0

    reads each h_{i+1} un-rotated (step i writes rows i, i+1 but step i+1
    only re-reads row i+1 through the carry t), so the carry obeys a
    first-order affine recurrence — evaluated here in log depth with
    ``associative_scan`` over the affine maps ``t -> a t + b``.

    Rows of the result: ``out_i`` for i < j, the carried ``t_j`` at row j
    (the pivot the next rotation acts on), and the original entries above.
    """
    m = cs.shape[0]  # hcol has length m + 1
    idx = jnp.arange(m)
    active = idx < j
    a = jnp.where(active, -sn, jnp.ones_like(sn))
    b = jnp.where(active, cs * hcol[1:], jnp.zeros_like(cs))

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    pa, pb = jax.lax.associative_scan(combine, (a, b))
    t = jnp.concatenate([hcol[:1], pa * hcol[0] + pb])  # t_0 .. t_m
    out = cs * t[:-1] + sn * hcol[1:]  # out_0 .. out_{m-1}
    rows = jnp.arange(m + 1)
    res = jnp.where(rows < j, jnp.concatenate([out, out[-1:]]), hcol)
    return jnp.where(rows == j, t, res)


_CGS_CHUNK = 256


def gmres_cycle(matvec, b, tol, x0, m):
    """One traceable GMRES(m) cycle from ``x0`` (see :func:`_gmres_cycle_state`).

    Returns ``(x_new, |r|_estimate, iterations)``.
    """
    x, res, j, *_ = _gmres_cycle_state(matvec, b, tol, x0, m)
    return x, res, j


def _gmres_cycle_state(matvec, b, tol, x0, m):
    """One traceable GMRES(m) cycle from ``x0``: Arnoldi + Givens + update.

    Returns ``(x_new, |r|_estimate, iterations, V, R, cs, sn)`` where
    ``V [m_pad, n]`` is the orthonormal Krylov basis, ``R [m+1, m]`` the
    Givens-rotated (upper-triangular) Hessenberg, and ``cs/sn`` the stored
    rotations — together the recycle state consumed by
    :func:`krylov_project`.  The basis is stored as an ``[m_pad, n]``
    array (rows padded to a multiple of the CGS chunk); rows beyond the
    active count are zero, which makes the CGS2 projections exact without
    masking.  The projections stream only the chunks holding rows
    ``0..j`` instead of the whole allocation — at large restarts the
    basis read is the per-iteration HBM bound, and the active prefix
    averages half the allocation over a cycle.
    """
    n = b.shape[0]
    r0 = b - matvec(x0)
    beta = jnp.linalg.norm(r0)
    v0 = r0 / jnp.where(beta > 0, beta, 1.0)
    m_pad = -(-(m + 1) // _CGS_CHUNK) * _CGS_CHUNK
    big_v = jnp.zeros((m_pad, n), b.dtype).at[0].set(v0)
    big_h = jnp.zeros((m + 1, m), b.dtype)
    cs = jnp.zeros(m, b.dtype)
    sn = jnp.zeros(m, b.dtype)
    g = jnp.zeros(m + 1, b.dtype).at[0].set(beta)

    def _proj(vmat, w, nc):
        """h = V w over the first ``nc`` row chunks (rest stays zero)."""

        def cb(i, h):
            row = (i * _CGS_CHUNK).astype(jnp.int32)
            blk = jax.lax.dynamic_slice(vmat, (row, jnp.int32(0)),
                                        (_CGS_CHUNK, n))
            return jax.lax.dynamic_update_slice(h, blk @ w, (row,))

        return jax.lax.fori_loop(0, nc, cb, jnp.zeros(m_pad, w.dtype))

    def _sub(vmat, w, h, nc):
        """w - h @ V accumulated over the first ``nc`` row chunks."""

        def cb(i, w):
            row = (i * _CGS_CHUNK).astype(jnp.int32)
            blk = jax.lax.dynamic_slice(vmat, (row, jnp.int32(0)),
                                        (_CGS_CHUNK, n))
            hp = jax.lax.dynamic_slice(h, (row,), (_CGS_CHUNK,))
            return w - hp @ blk

        return jax.lax.fori_loop(0, nc, cb, w)

    def cond(c):
        j, _, _, _, _, g_ = c
        return (j < m) & (jnp.abs(g_[j]) > tol)

    def body(c):
        j, big_v, big_h, cs, sn, g_ = c
        w = matvec(big_v[j])
        # CGS2: two projection passes against the active basis prefix
        # (chunked GEMV pairs on the MXU; rows past j are zero so no
        # masking is needed within the last chunk).
        nc = j // _CGS_CHUNK + 1
        h1 = _proj(big_v, w, nc)
        w = _sub(big_v, w, h1, nc)
        h2 = _proj(big_v, w, nc)
        w = _sub(big_v, w, h2, nc)
        hcol = (h1 + h2)[: m + 1]
        h_next = jnp.linalg.norm(w)
        hcol = hcol.at[j + 1].set(h_next)
        big_v = big_v.at[j + 1].set(w / jnp.where(h_next > 0, h_next, 1.0))

        hcol = _apply_rotations(cs, sn, hcol, j)
        denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
        safe = jnp.where(denom > 0, denom, 1.0)
        c_new = jnp.where(denom > 0, hcol[j] / safe, 1.0)
        s_new = jnp.where(denom > 0, hcol[j + 1] / safe, 0.0)
        hcol = hcol.at[j].set(c_new * hcol[j] + s_new * hcol[j + 1]).at[
            j + 1
        ].set(0.0)
        g_ = g_.at[j + 1].set(-s_new * g_[j]).at[j].set(c_new * g_[j])
        big_h = big_h.at[:, j].set(hcol)
        cs = cs.at[j].set(c_new)
        sn = sn.at[j].set(s_new)
        return j + 1, big_v, big_h, cs, sn, g_

    j, big_v, big_h, cs, sn, g = jax.lax.while_loop(
        cond, body, (jnp.int32(0), big_v, big_h, cs, sn, g)
    )
    # Triangular solve on the rotated H; inactive columns get a unit
    # diagonal and zero RHS so their y entries vanish.
    idx = jnp.arange(m)
    active = idx < j
    r_mat = big_h[:m, :]
    r_mat = jnp.where(
        (idx[:, None] == idx[None, :]) & ~active[:, None], 1.0, r_mat
    )
    rhs = jnp.where(active, g[:m], 0.0)
    y = jax.scipy.linalg.solve_triangular(r_mat, rhs, lower=False)
    return x0 + y @ big_v[:m], jnp.abs(g[j]), j, big_v, big_h, cs, sn


def empty_recycle_state(n: int, m: int, dtype=jnp.float32):
    """A zero recycle state: :func:`krylov_project` returns the zero vector
    against it, so cold solves and warm restarts share one code path."""
    m_pad = -(-(m + 1) // _CGS_CHUNK) * _CGS_CHUNK
    return (
        jnp.zeros((m_pad, n), dtype),
        jnp.zeros((m + 1, m), dtype),
        jnp.zeros(m, dtype),
        jnp.zeros(m, dtype),
        jnp.int32(0),
    )


def krylov_project(state, r):
    """Least-squares correction ``argmin_y |r - A (V y)|`` from a stored
    GMRES cycle state — the cross-sweep Krylov recycling kernel.

    The Arnoldi relation ``A V_m = V_{m+1} Hbar`` turns the minimization
    into the small problem ``min |V^T r - Hbar y|``; with the stored Givens
    QR of ``Hbar`` (rotated columns in ``R``, rotations in ``cs/sn``) that
    is one basis GEMV, one log-depth rotation sweep over the coefficient
    vector (:func:`_apply_rotations` — the same affine recurrence the
    Arnoldi columns go through), and one ``[m, m]`` triangular solve.
    Mixed-precision defect-correction sweeps solve the SAME inner operator
    for a sequence of outer residuals, so the space built by one sweep
    removes most of the spectral content of the next sweep's residual at
    the cost of ~one matvec (measured: see tests/test_krylov.py).

    ``state`` rows beyond the active count ``j`` are zero / masked, so a
    partially filled (or all-zero) state degrades gracefully to a zero
    correction.
    """
    big_v, big_h, cs, sn, j = state
    m = big_h.shape[1]
    c = big_v @ r  # [m_pad]; zero rows contribute zero
    c_rot = _apply_rotations(cs, sn, c[: m + 1], j)
    idx = jnp.arange(m)
    active = idx < j
    r_mat = jnp.where(
        (idx[:, None] == idx[None, :]) & ~active[:, None], 1.0, big_h[:m, :]
    )
    rhs = jnp.where(active, c_rot[:m], 0.0)
    y = jax.scipy.linalg.solve_triangular(r_mat, rhs, lower=False)
    return y @ big_v[:m]


def gmres_loop(matvec, b, tol, max_iter, m):
    """Traceable restarted GMRES(m) from a zero start; stops at ``|r| <= tol``.

    Returns ``(x, |r|^2, iterations)`` (the residual is the rotated-
    Hessenberg estimate from the last cycle).
    """
    x, rr, total, _ = gmres_loop_recycled(matvec, b, tol, max_iter, m)
    return x, rr, total


def gmres_loop_recycled(
    matvec, b, tol, max_iter, m, x0=None, state=None, r0_norm=None
):
    """Traceable restarted GMRES(m) that also returns its last cycle's
    recycle state ``(V, R, cs, sn, j)``.

    ``x0`` warm-starts the iteration (e.g. the :func:`krylov_project`
    correction from a previous sweep's state); ``state`` seeds the
    returned state so a zero-iteration exit (already-converged sweep)
    passes the caller's basis through instead of wiping it.  Callers that
    already hold ``|b - A x0|`` (the projection-guard residual of the
    mixed-precision sweeps) pass it as ``r0_norm`` to skip the redundant
    entry matvec of the dominant-cost trace operator.

    Returns ``(x, |r|^2, iterations, state)``.
    """
    if state is None:
        state = empty_recycle_state(b.shape[0], m, b.dtype)

    def outer_cond(c):
        x, res, total = c[0]
        return (total < max_iter) & (res > tol)

    def outer_body(c):
        (x, _, total), _ = c
        x, res, j, big_v, big_h, cs, sn = _gmres_cycle_state(
            matvec, b, tol, x, m
        )
        return (x, res, total + jnp.maximum(j, 1)), (big_v, big_h, cs, sn, j)

    if x0 is None:
        x_init = jnp.zeros_like(b)
        r_init = jnp.linalg.norm(b) if r0_norm is None else r0_norm
    else:
        x_init = x0
        r_init = (
            jnp.linalg.norm(b - matvec(x0)) if r0_norm is None else r0_norm
        )
    (x, res, total), state = jax.lax.while_loop(
        outer_cond, outer_body, ((x_init, r_init, 0), state)
    )
    return x, res * res, total, state


def auto_restart(
    n: int,
    maximum_iterations: int,
    *,
    dtype_bytes: int = 4,
    budget_bytes: int = 384 * 2**20,
    cap: int = 4096,
) -> int:
    """Restart length for an (effectively) un-truncated Krylov space.

    Picks the largest m such that the ``[m+1, n]`` basis fits the byte
    budget, bounded by the iteration cap, the problem size (a Krylov space
    never needs more than n directions), and a hard cap that bounds the
    Hessenberg/triangular-solve work.  Indefinite trace systems converge
    superlinearly only once the space is large enough to capture both
    spectral branches — see the module docstring measurements.

    The basis allocates in ``_CGS_CHUNK``-row blocks (the chunked CGS2
    projections read fixed-size tiles), so the memory-derived m aligns
    ``m + 1`` to a chunk multiple — otherwise the padded allocation could
    exceed the budget by up to a full chunk of rows.  Problems so large
    that even one chunk of rows busts the budget still allocate that one
    chunk (the floor of the storage scheme).
    """
    rows_budget = budget_bytes // (dtype_bytes * max(n, 1))
    by_memory = max(_CGS_CHUNK, (rows_budget // _CGS_CHUNK) * _CGS_CHUNK) - 1
    by_memory = max(64, by_memory)
    return max(1, min(n, maximum_iterations, cap, by_memory))


def mixed_outer_drive(
    sweep,
    lam0,
    state0,
    tolerance: float,
    *,
    max_outer: int = 60,
    start_fast: bool = False,
    label: str = "",
):
    """Host-side outer loop of the mixed-precision defect correction.

    Shared by the single-chip (``solver/iterative._solve_schur_mixed_tpu``)
    and sharded (``parallel/sharding._fused_mixed_factory``) trace solvers —
    the two copies had already drifted once (iteration caps, tracer hooks,
    an iteration-undercount bug fixed twice).  The loop:

    - calls ``sweep(lam, state, fast) -> (lam_new, rr, inner_iters, state)``
      (one jitted dispatch: an accurate f64 residual ``r = b - S lam``,
      ``rr = |r|^2``, then an all-f32 inner Krylov correction);
    - tracks the best (lowest-``rr``) iterate, since the inner solve on a
      near-``cond*eps_f32`` system can stall or regress;
    - exits after three consecutive non-improving sweeps (stagnation) and
      returns the best iterate, letting the caller's convergence check
      decide;
    - when ``start_fast`` (a cheap condensed-f64 outer operator exists),
      intermediate sweeps measure the residual through it and, on
      convergence or stall, hand off to the exact refined chain whose
      first sweep both verifies and finishes the solve.

    Returns ``(best_lam, best_rr, total_inner_iterations >= 1)`` with
    ``best_rr`` the squared f64 residual as a Python float.
    """
    from mfv2d_tpu.tracing import tracer

    tol2 = float(tolerance) ** 2
    lam = lam0
    state = state0
    best_lam, best_rr = lam, float("inf")
    total = 0
    stagnant = 0
    rr = float("inf")
    fast = start_fast
    for k in range(max_outer + 1):
        t0 = time.perf_counter()
        lam_new, rr_a, it, state = sweep(lam, state, fast)
        rr = float(rr_a)
        if tracer.enabled:
            tracer.add(
                f"mixed_sweep[{label},{'c64' if fast else 'exact'}]",
                time.perf_counter() - t0,
            )
        if np.isfinite(rr) and rr < best_rr:
            best_lam, best_rr = lam, rr
            stagnant = 0
        else:
            stagnant += 1
        # Count the sweep's inner iterations BEFORE any exit: the
        # converging / stagnating / handoff sweeps did real matvecs.
        total += int(it)
        if rr <= tol2 or stagnant >= 3:
            if fast:
                # Hand off to the exact chain: re-measure and finish there
                # (its first sweep both verifies and corrects).
                fast = False
                lam = best_lam if rr > tol2 else lam
                best_lam, best_rr = lam, float("inf")
                stagnant = 0
                continue
            break
        if k == max_outer:
            break
        lam = lam_new
    if best_rr == float("inf"):
        best_rr = rr
    return best_lam, best_rr, max(total, 1)

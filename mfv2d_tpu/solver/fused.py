"""Fully device-resident solve loops (lax.scan / while_loop).

For linear systems the whole trapezoidal time march is one compiled XLA
computation: per step a pair of triangular solves against the frozen dense
LU, the block-diagonal matvec, and the carry-term update, scanned over time.
No host round trips between steps — on a TPU behind a network tunnel this is
the difference between nt x RTT and one dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from mfv2d_tpu.utils.lazy import lazy_module

sp = lazy_module("scipy.sparse")

from mfv2d_tpu.solver.discretization import Discretization


def _device_lu_solver(mat: np.ndarray, refinements: int = 12):
    """Trace-compatible dense solve: f64 LU, or refined f32 LU on TPU.

    TPU XLA implements LuDecomposition only in f32; iterative refinement
    with an f64 residual matvec recovers double accuracy (see
    solver.iterative.MixedPrecisionLU).

    Returns ``(solve, tables)``; call ``solve(b, tables)``.  The
    factorization arrays are passed as ARGUMENTS through the enclosing jit
    rather than closure-captured: captured arrays ship with the
    computation to the remote TPU compiler (measured 114.8 s vs 0.5 s
    compile for a 200 MB matrix; >~100 MB is rejected outright).
    """
    if jax.default_backend() == "tpu":
        a64 = jnp.asarray(mat, jnp.float64)
        inv = jnp.linalg.inv(jnp.asarray(mat, jnp.float32))

        def solve(b, tables):
            a64_, inv_ = tables

            def body(_, x):
                r = b - a64_ @ x
                return x + (inv_ @ r.astype(jnp.float32)).astype(jnp.float64)

            x = (inv_ @ b.astype(jnp.float32)).astype(jnp.float64)
            return jax.lax.fori_loop(0, refinements, body, x)

        return solve, (a64, inv)

    lu, piv = jax.scipy.linalg.lu_factor(jnp.asarray(mat))

    def solve(b, tables):
        return jax.scipy.linalg.lu_solve((tables[0], tables[1]), b)

    return solve, (lu, piv)




def _inverse_permutation(disc: Discretization) -> jnp.ndarray:
    """global DoF -> position in the bucket-concatenated flat vector.

    Bucket gathers partition the DoF range, so per-bucket results assemble
    with one gather instead of scatter-sets (TPU scatters are ~10x slower).
    """
    inv = np.empty(disc.n_dofs, np.int32)
    off = 0
    for b in disc.buckets:
        g = np.asarray(b.gather).reshape(-1)
        inv[g] = off + np.arange(g.size, dtype=np.int32)
        off += g.size
    return jnp.asarray(inv)


def _assemble_parts(parts, inv_perm):
    flat = (
        parts[0].reshape(-1)
        if len(parts) == 1
        else jnp.concatenate([p.reshape(-1) for p in parts])
    )
    return flat[inv_perm]


def _dense_saddle(disc: Discretization, element_matrices, lagrange_mat):
    from mfv2d_tpu.solver.iterative import assemble_dense_saddle

    return assemble_dense_saddle(disc, element_matrices, lagrange_mat)


def _sample_slots(nt: int, sample_rate: int):
    """Step-index -> sample-slot map: steps {0, s, 2s, ...} u {nt-1}.

    Matches the host march's grid-sampling rule; the fused scans carry a
    [n_samples, n] buffer updated in place instead of materializing every
    step ([nt, n_dofs] was an HBM/host-transfer wall at large nt).
    """
    steps = sorted({i for i in range(nt) if i % sample_rate == 0} | {nt - 1})
    slots = np.full(nt, -1, np.int64)
    for s_i, step_i in enumerate(steps):
        slots[step_i] = s_i
    return np.asarray(steps, np.int64), slots


def fused_linear_time_march(
    disc: Discretization,
    element_matrices: list[np.ndarray],
    lagrange_mat: sp.csr_array | None,
    explicit_vec: np.ndarray,
    carry_indices: np.ndarray,
    initial_solution: np.ndarray,
    initial_carry: np.ndarray,
    initial_carry_term: np.ndarray,
    dt: float,
    nt: int,
    sample_rate: int = 1,
):
    """Run the whole linear trapezoidal march as one jitted scan.

    Returns (sampled solutions [n_samples, n_dofs], sampled step indices,
    final lagrange multipliers).  The march semantics match the host loop
    exactly (one linear solve per step, carry update
    2/dt (dual_new - dual_old) - carry); only steps at the sample rate (and
    the final step) are materialized.
    """
    mat, n_lag = _dense_saddle(disc, element_matrices, lagrange_mat)
    n = disc.n_dofs
    lu_solve_fn, lu_tables = _device_lu_solver(mat)

    gathers = [jnp.asarray(b.gather) for b in disc.buckets]
    blocks = [jnp.asarray(m) for m in element_matrices]
    # Per-bucket dual (mass) application arrays for the carry projection.
    mass_blocks = []
    for bucket in disc.buckets:
        p1, p2 = bucket.orders
        offsets = disc.form_spec.form_offsets(p1, p2)
        n_e = disc.form_spec.total_size(p1, p2)
        e = bucket.batch.n_elements
        big = np.zeros((e, n_e, n_e))
        for i in range(len(disc.form_spec)):
            m = np.asarray(bucket.batch.mass(disc.form_spec[i][1], False))
            big[:, offsets[i] : offsets[i + 1], offsets[i] : offsets[i + 1]] = m
        mass_blocks.append(jnp.asarray(big))

    if lagrange_mat is not None:
        coo = lagrange_mat.tocoo()
        g_rows = jnp.asarray(coo.row, jnp.int32)
        g_cols = jnp.asarray(coo.col, jnp.int32)
        g_vals = jnp.asarray(coo.data)
    else:
        g_rows = jnp.zeros(0, jnp.int32)
        g_cols = jnp.zeros(0, jnp.int32)
        g_vals = jnp.zeros(0)

    carry_idx = jnp.asarray(carry_indices, jnp.int32)
    explicit = jnp.asarray(explicit_vec)
    two_over_dt = 2.0 / dt

    inv_perm = _inverse_permutation(disc)

    sample_steps, slots = _sample_slots(nt, sample_rate)
    slots_dev = jnp.asarray(slots)

    # All large arrays ride a pytree ARGUMENT through the jit boundary
    # (closure captures are serialized to the remote TPU compiler).
    tables = dict(
        blocks=blocks,
        mass_blocks=mass_blocks,
        explicit=explicit,
        lu=lu_tables,
        g_vals=g_vals,
    )

    @jax.jit
    def march(u0, lam0, carry0, carry_term0, tabs):
        blocks_, mass_blocks_ = tabs["blocks"], tabs["mass_blocks"]
        explicit_, g_vals_ = tabs["explicit"], tabs["g_vals"]

        def block_apply_(x):
            return _assemble_parts(
                [
                    jnp.einsum("eij,ej->ei", b, x[g])
                    for b, g in zip(blocks_, gathers)
                ],
                inv_perm,
            )

        def dual_apply_(x):
            return _assemble_parts(
                [
                    jnp.einsum("eij,ej->ei", m, x[g])
                    for m, g in zip(mass_blocks_, gathers)
                ],
                inv_perm,
            )

        def trace_apply_(x):
            contrib = g_vals_ * x[g_cols]
            return jax.ops.segment_sum(
                contrib, g_rows, num_segments=max(n_lag, 1)
            )[:n_lag]

        def trace_t_apply_(lam):
            out = jnp.zeros(n)
            if n_lag == 0:
                return out
            return out.at[g_cols].add(g_vals_ * lam[g_rows])

        def step(state, slot):
            u, lam, old_carry, carry_term, buf = state
            current_carry = two_over_dt * old_carry + carry_term
            base = explicit_.at[carry_idx].add(current_carry)
            value = block_apply_(u) + trace_t_apply_(lam)
            value_full = jnp.concatenate([value, trace_apply_(u)])
            residual = base - value_full
            d = lu_solve_fn(residual, tabs["lu"])
            u_new = u + d[:n]
            lam_new = lam + d[n:]
            dual = dual_apply_(u_new)
            new_carry = dual[carry_idx]
            new_carry_term = two_over_dt * (new_carry - old_carry) - carry_term
            idx = jnp.maximum(slot, 0)
            buf = buf.at[idx].set(jnp.where(slot >= 0, u_new, buf[idx]))
            return (u_new, lam_new, new_carry, new_carry_term, buf), None

        buf0 = jnp.zeros((len(sample_steps), n))
        (_, lam_f, _, _, buf), _ = jax.lax.scan(
            step, (u0, lam0, carry0, carry_term0, buf0), slots_dev
        )
        return buf, lam_f

    us, lam_f = march(
        jnp.asarray(initial_solution),
        jnp.zeros(n_lag),
        jnp.asarray(initial_carry),
        jnp.asarray(initial_carry_term),
        tables,
    )
    return np.asarray(us), sample_steps, np.asarray(lam_f)


def _anderson_init(m: int, n_tot: int):
    """Carry buffers for the in-trace Anderson window (empty when m=0)."""
    if m <= 0:
        return jnp.zeros(0)
    return (
        jnp.zeros((m + 1, n_tot)),
        jnp.zeros((m + 1, n_tot)),
        jnp.int32(0),
    )


def _anderson_step(x_k, f_k, bufs, m: int, grew):
    """One guarded type-II Anderson step inside a traced loop.

    Mirrors the host loop's policy (solver.solve non_linear_solve_run):
    window restart when the residual grew, gamma-magnitude cap of 25, and
    the plain damped step until two pairs exist.  The small least-squares
    problem solves ridge-regularized normal equations (m x m) in-trace.
    """
    xs, fs, count = bufs
    count = jnp.where(grew, jnp.int32(0), count)
    xs = jnp.roll(xs, -1, axis=0).at[-1].set(x_k)
    fs = jnp.roll(fs, -1, axis=0).at[-1].set(f_k)
    count = jnp.minimum(count + 1, m + 1)
    dx = xs[1:] - xs[:-1]
    df = fs[1:] - fs[:-1]
    valid = jnp.arange(m) >= (m + 1 - count)
    dxv = jnp.where(valid[:, None], dx, 0.0)
    dfv = jnp.where(valid[:, None], df, 0.0)
    gram = dfv @ dfv.T
    # Ridge scaled to the Gram diagonal: masked (zero) rows then solve to
    # exactly zero gamma, and near-collinear differences stay bounded.
    ridge = 1e-12 * jnp.maximum(jnp.max(jnp.diag(gram)), 1e-300)
    # f32 solve: TPU XLA has no f64 LuDecomposition, and the extrapolation
    # weights only need a few digits (the guard bounds their effect).
    gamma = jnp.linalg.solve(
        (gram + ridge * jnp.eye(m)).astype(jnp.float32),
        (dfv @ f_k).astype(jnp.float32),
    ).astype(x_k.dtype)
    gamma = jnp.where(valid, gamma, 0.0)
    ok = jnp.logical_and(count >= 2, jnp.max(jnp.abs(gamma)) <= 25.0)
    x_aa = x_k + f_k - (dxv + dfv).T @ gamma
    x_new = jnp.where(ok, x_aa, x_k + f_k)
    return x_new, (xs, fs, count)


def fused_picard_solve(
    disc: Discretization,
    evaluator,
    element_matrices: list[np.ndarray],
    lagrange_mat: sp.csr_array | None,
    explicit_vec: np.ndarray,
    solution0: np.ndarray,
    lagrange0: np.ndarray,
    max_iterations: int,
    relax: float,
    atol: float,
    rtol: float,
    max_mag: float,
    anderson_m: int = 0,
):
    """The steady Picard loop as one on-device lax.while_loop.

    Residual evaluation (including in-trace nonlinear field reconstruction),
    the dense-LU solve, and the convergence test all run inside a single
    compiled computation; only the final state returns to the host.
    Semantics match solver.solve.non_linear_solve_run, including the
    guarded type-II Anderson extrapolation when ``anderson_m > 0`` (the
    small least-squares solve runs in-trace via ridge-regularized normal
    equations over the carried difference buffers).
    """
    from mfv2d_tpu.evaluation import compute_element_vectors

    mat, n_lag = _dense_saddle(disc, element_matrices, lagrange_mat)
    n = disc.n_dofs
    lu_solve_fn, lu_tables = _device_lu_solver(mat)

    if lagrange_mat is not None:
        coo = lagrange_mat.tocoo()
        g_rows = jnp.asarray(coo.row, jnp.int32)
        g_cols = jnp.asarray(coo.col, jnp.int32)
        g_vals = jnp.asarray(coo.data)
    else:
        g_rows = jnp.zeros(0, jnp.int32)
        g_cols = jnp.zeros(0, jnp.int32)
        g_vals = jnp.zeros(0)

    gathers = [jnp.asarray(b.gather) for b in disc.buckets]
    statics = evaluator._static_fields
    compiled = evaluator.compiled
    form_spec = evaluator.form_spec
    base = jnp.asarray(explicit_vec)

    inv_perm = _inverse_permutation(disc)

    def residual_value(u):
        parts = []
        for i, bucket in enumerate(disc.buckets):
            dofs = u[gathers[i]]
            val = compute_element_vectors(
                form_spec, compiled.lhs_blocks, bucket.batch, dofs,
                static_fields=statics[i],
            )
            if compiled.rhs_blocks is not None:
                val = val - compute_element_vectors(
                    form_spec, compiled.rhs_blocks, bucket.batch, dofs,
                    static_fields=statics[i],
                )
            parts.append(val)
        return _assemble_parts(parts, inv_perm)

    def trace_apply(x):
        contrib = g_vals * x[g_cols]
        return jax.ops.segment_sum(contrib, g_rows, num_segments=max(n_lag, 1))[
            :n_lag
        ]

    def trace_t_apply(lam):
        out = jnp.zeros(n)
        if n_lag == 0:
            return out
        return out.at[g_cols].add(g_vals * lam[g_rows])

    m_aa = int(anderson_m)
    n_tot = n + n_lag

    @jax.jit
    def solve(u0, lam0, base_, lu_tabs):
        def cond(state):
            it, converged = state[2], state[4]
            return jnp.logical_and(it < max_iterations, jnp.logical_not(converged))

        def body(state):
            u, lam, it, residuals, _, prev_mres, aa_bufs = state
            value = residual_value(u) + trace_t_apply(lam)
            full = jnp.concatenate([value, trace_apply(u)])
            res_vec = base_ - full
            mres = jnp.max(jnp.abs(res_vec))
            residuals = residuals.at[it].set(mres)
            conv = jnp.logical_not(
                jnp.logical_and(mres > atol, mres > max_mag * rtol)
            )
            d = lu_solve_fn(res_vec, lu_tabs)
            if m_aa > 0:
                x_k = jnp.concatenate([u, lam])
                x_new, aa_bufs = _anderson_step(
                    x_k, relax * d, aa_bufs, m_aa, mres > prev_mres
                )
                u_new = jnp.where(conv, u, x_new[:n])
                lam_new = jnp.where(conv, lam, x_new[n:])
            else:
                u_new = jnp.where(conv, u, u + relax * d[:n])
                lam_new = jnp.where(conv, lam, lam + relax * d[n:])
            it_new = jnp.where(conv, it, it + 1)
            return (u_new, lam_new, it_new, residuals, conv, mres, aa_bufs)

        state = (
            u0,
            lam0,
            jnp.int32(0),
            jnp.zeros(max_iterations),
            jnp.bool_(False),
            jnp.inf,
            _anderson_init(m_aa, n_tot),
        )
        u, lam, it, residuals, _, mres, _ = jax.lax.while_loop(cond, body, state)
        return u, lam, it, residuals, mres

    u, lam, it, residuals, mres = solve(
        jnp.asarray(solution0), jnp.asarray(lagrange0), base, lu_tables
    )
    return (
        np.asarray(u),
        np.asarray(lam),
        int(it),
        np.asarray(residuals),
        float(mres),
    )


def fused_nonlinear_time_march(
    disc: Discretization,
    evaluator,
    element_matrices: list[np.ndarray],
    lagrange_mat: sp.csr_array | None,
    explicit_vec: np.ndarray,
    carry_indices: np.ndarray,
    initial_solution: np.ndarray,
    initial_carry: np.ndarray,
    initial_carry_term: np.ndarray,
    dt: float,
    nt: int,
    max_iterations: int,
    relax: float,
    atol: float,
    rtol: float,
    max_mag: float,
    sample_rate: int = 1,
    anderson_m: int = 0,
):
    """Nonlinear trapezoidal march fully on device.

    Outer lax.scan over time steps; inner lax.while_loop Picard iteration
    per step with the frozen dense LU (semantics match the host loop:
    non_linear_solve_run per step, then the carry update).  Returns
    (solutions [nt, n], final multipliers, iters [nt], residuals [nt]).
    """
    from mfv2d_tpu.evaluation import compute_element_vectors

    mat, n_lag = _dense_saddle(disc, element_matrices, lagrange_mat)
    n = disc.n_dofs
    lu_solve_fn, lu_tables = _device_lu_solver(mat)

    gathers = [jnp.asarray(b.gather) for b in disc.buckets]
    statics = evaluator._static_fields
    compiled = evaluator.compiled
    form_spec = evaluator.form_spec

    # Per-bucket dual (mass) application for the carry projection.
    mass_blocks = []
    for bucket in disc.buckets:
        p1, p2 = bucket.orders
        offsets = disc.form_spec.form_offsets(p1, p2)
        n_e = disc.form_spec.total_size(p1, p2)
        e = bucket.batch.n_elements
        big = np.zeros((e, n_e, n_e))
        for i in range(len(disc.form_spec)):
            m = np.asarray(bucket.batch.mass(disc.form_spec[i][1], False))
            big[:, offsets[i] : offsets[i + 1], offsets[i] : offsets[i + 1]] = m
        mass_blocks.append(jnp.asarray(big))

    if lagrange_mat is not None:
        coo = lagrange_mat.tocoo()
        g_rows = jnp.asarray(coo.row, jnp.int32)
        g_cols = jnp.asarray(coo.col, jnp.int32)
        g_vals = jnp.asarray(coo.data)
    else:
        g_rows = jnp.zeros(0, jnp.int32)
        g_cols = jnp.zeros(0, jnp.int32)
        g_vals = jnp.zeros(0)

    carry_idx = jnp.asarray(carry_indices, jnp.int32)
    explicit = jnp.asarray(explicit_vec)
    two_over_dt = 2.0 / dt

    inv_perm = _inverse_permutation(disc)

    def residual_value(u):
        parts = []
        for i, bucket in enumerate(disc.buckets):
            dofs = u[gathers[i]]
            val = compute_element_vectors(
                form_spec, compiled.lhs_blocks, bucket.batch, dofs,
                static_fields=statics[i],
            )
            if compiled.rhs_blocks is not None:
                val = val - compute_element_vectors(
                    form_spec, compiled.rhs_blocks, bucket.batch, dofs,
                    static_fields=statics[i],
                )
            parts.append(val)
        return _assemble_parts(parts, inv_perm)

    inv_perm_dual = _inverse_permutation(disc)

    def trace_apply(x):
        contrib = g_vals * x[g_cols]
        return jax.ops.segment_sum(contrib, g_rows, num_segments=max(n_lag, 1))[
            :n_lag
        ]

    def trace_t_apply(lam):
        out = jnp.zeros(n)
        if n_lag == 0:
            return out
        return out.at[g_cols].add(g_vals * lam[g_rows])

    sample_steps, slots = _sample_slots(nt, sample_rate)
    slots_dev = jnp.asarray(slots)

    # Large arrays ride the jit boundary as ARGUMENTS (see
    # _device_lu_solver).
    tables = dict(mass_blocks=mass_blocks, explicit=explicit, lu=lu_tables)

    @jax.jit
    def march(u0, lam0, carry0, carry_term0, tabs):
        mass_blocks_, explicit_ = tabs["mass_blocks"], tabs["explicit"]

        def dual_apply_(x):
            return _assemble_parts(
                [
                    jnp.einsum("eij,ej->ei", m, x[g])
                    for m, g in zip(mass_blocks_, gathers)
                ],
                inv_perm_dual,
            )

        def step(state, slot):
            u, lam, old_carry, carry_term, buf = state
            current_carry = two_over_dt * old_carry + carry_term
            base = explicit_.at[carry_idx].add(current_carry)

            def cond(s):
                it, converged = s[2], s[3]
                return jnp.logical_and(
                    it < max_iterations, jnp.logical_not(converged)
                )

            def body(s):
                ui, lami, it, _, prev_mres, aa_bufs = s
                value = residual_value(ui) + trace_t_apply(lami)
                full = jnp.concatenate([value, trace_apply(ui)])
                res_vec = base - full
                mres = jnp.max(jnp.abs(res_vec))
                conv = jnp.logical_not(
                    jnp.logical_and(mres > atol, mres > max_mag * rtol)
                )
                d = lu_solve_fn(res_vec, tabs["lu"])
                if anderson_m > 0:
                    x_new, aa_bufs = _anderson_step(
                        jnp.concatenate([ui, lami]), relax * d, aa_bufs,
                        anderson_m, mres > prev_mres,
                    )
                    u_new = jnp.where(conv, ui, x_new[:n])
                    lam_new = jnp.where(conv, lami, x_new[n:])
                else:
                    u_new = jnp.where(conv, ui, ui + relax * d[:n])
                    lam_new = jnp.where(conv, lami, lami + relax * d[n:])
                it_new = jnp.where(conv, it, it + 1)
                return (u_new, lam_new, it_new, conv, mres, aa_bufs)

            u_new, lam_new, iters, _, mres, _ = jax.lax.while_loop(
                cond, body,
                (u, lam, jnp.int32(0), jnp.bool_(False), jnp.inf,
                 _anderson_init(anderson_m, n + n_lag)),
            )
            dual = dual_apply_(u_new)
            new_carry = dual[carry_idx]
            new_carry_term = two_over_dt * (new_carry - old_carry) - carry_term
            idx = jnp.maximum(slot, 0)
            buf = buf.at[idx].set(jnp.where(slot >= 0, u_new, buf[idx]))
            return (u_new, lam_new, new_carry, new_carry_term, buf), (
                iters,
                mres,
            )

        buf0 = jnp.zeros((len(sample_steps), n))
        (_, lam_f, _, _, buf), (iters, residuals) = jax.lax.scan(
            step, (u0, lam0, carry0, carry_term0, buf0), slots_dev
        )
        return buf, lam_f, iters, residuals

    us, lam_f, iters, residuals = march(
        jnp.asarray(initial_solution),
        jnp.zeros(n_lag),
        jnp.asarray(initial_carry),
        jnp.asarray(initial_carry_term),
        tables,
    )
    return (
        np.asarray(us),
        sample_steps,
        np.asarray(lam_f),
        np.asarray(iters, np.uint32),
        np.asarray(residuals),
    )


def _newton_machinery(
    disc: Discretization,
    evaluator,
    element_matrices: list[np.ndarray],
    lagrange_mat: sp.csr_array | None,
):
    """Shared trace-compatible pieces for the fused Newton loops.

    Returns a dict with the residual evaluator, the in-trace exact-Jacobian
    saddle assembly, the frozen operator mat0, trace operators, and a dense
    solve (refined-f32 LU on TPU).
    """
    import jax.numpy as _jnp

    from mfv2d_tpu.evaluation import (
        ElementBatch,
        compute_element_vectors,
    )
    from mfv2d_tpu.ops.geometry import JacobianTerms

    n = disc.n_dofs
    n_lag = 0 if lagrange_mat is None else lagrange_mat.shape[0]
    total = n + n_lag
    mat0, _ = _dense_saddle(disc, element_matrices, lagrange_mat)

    # Constant frame: zeros on the block-diagonal, G/G^T in place.
    frame = np.zeros((total, total))
    if lagrange_mat is not None:
        g = lagrange_mat.toarray()
        frame[:n, n:] = g.T
        frame[n:, :n] = g
        coo = lagrange_mat.tocoo()
        g_rows = jnp.asarray(coo.row, jnp.int32)
        g_cols = jnp.asarray(coo.col, jnp.int32)
        g_vals = jnp.asarray(coo.data)
    else:
        g_rows = jnp.zeros(0, jnp.int32)
        g_cols = jnp.zeros(0, jnp.int32)
        g_vals = jnp.zeros(0)
    frame = jnp.asarray(frame)
    mat0 = jnp.asarray(mat0)

    gathers = [jnp.asarray(b.gather) for b in disc.buckets]
    statics = evaluator._static_fields
    compiled = evaluator.compiled
    form_spec = evaluator.form_spec
    on_tpu = jax.default_backend() == "tpu"

    inv_perm = _inverse_permutation(disc)

    def residual_value(u):
        parts = []
        for i, bucket in enumerate(disc.buckets):
            dofs = u[gathers[i]]
            val = compute_element_vectors(
                form_spec, compiled.lhs_blocks, bucket.batch, dofs,
                static_fields=statics[i],
            )
            if compiled.rhs_blocks is not None:
                val = val - compute_element_vectors(
                    form_spec, compiled.rhs_blocks, bucket.batch, dofs,
                    static_fields=statics[i],
                )
            parts.append(val)
        return _assemble_parts(parts, inv_perm)

    # Per-bucket exact-Jacobian functions (vmapped jacfwd, trace-compatible).
    jac_fns = []
    for i, bucket in enumerate(disc.buckets):
        basis = bucket.batch.basis
        tb = bucket.batch.tb
        static_keys = list(statics[i].keys())
        static_vals = tuple(statics[i][k] for k in static_keys)
        jac_terms = tuple(t for t in bucket.batch.jac)

        def single(dofs_n, jac_terms_n, static_vals_n, basis=basis, tb=tb,
                   static_keys=static_keys):
            jac1 = JacobianTerms(*(t[None] for t in jac_terms_n))
            b1 = ElementBatch.from_parts(basis, tb, jac1, 1)
            st = {k: v[None] for k, v in zip(static_keys, static_vals_n)}
            vec = compute_element_vectors(
                form_spec, compiled.lhs_blocks, b1, dofs_n[None],
                static_fields=st,
            )
            if compiled.rhs_blocks is not None:
                vec = vec - compute_element_vectors(
                    form_spec, compiled.rhs_blocks, b1, dofs_n[None],
                    static_fields=st,
                )
            return vec[0]

        vmapped = jax.vmap(
            jax.jacfwd(single, argnums=0),
            in_axes=(0, tuple([0] * 5), tuple([0] * len(static_keys))),
        )
        jac_fns.append(
            (vmapped, jac_terms, static_vals)
        )

    def assemble_jacobian(u):
        mat = frame
        for i, gather in enumerate(gathers):
            fn, jac_terms, static_vals = jac_fns[i]
            blocks = fn(u[gather], jac_terms, static_vals)
            mat = mat.at[gather[:, :, None], gather[:, None, :]].set(blocks)
        return mat

    def trace_apply(x):
        contrib = g_vals * x[g_cols]
        return jax.ops.segment_sum(contrib, g_rows, num_segments=max(n_lag, 1))[
            :n_lag
        ]

    def trace_t_apply(lam):
        out = jnp.zeros(n)
        if n_lag == 0:
            return out
        return out.at[g_cols].add(g_vals * lam[g_rows])

    def dense_solve(mat, b):
        if not on_tpu:
            lu, piv = jax.scipy.linalg.lu_factor(mat)
            return jax.scipy.linalg.lu_solve((lu, piv), b)
        inv = _jnp.linalg.inv(mat.astype(_jnp.float32))
        x = (inv @ b.astype(_jnp.float32)).astype(b.dtype)

        def body(_, x):
            r = b - mat @ x
            return x + (inv @ r.astype(_jnp.float32)).astype(b.dtype)

        return jax.lax.fori_loop(0, 12, body, x)

    return dict(
        n=n,
        n_lag=n_lag,
        mat0=mat0,
        residual_value=residual_value,
        assemble_jacobian=assemble_jacobian,
        trace_apply=trace_apply,
        trace_t_apply=trace_t_apply,
        dense_solve=dense_solve,
    )


def fused_newton_solve(
    disc: Discretization,
    evaluator,
    element_matrices: list[np.ndarray],
    lagrange_mat: sp.csr_array | None,
    explicit_vec: np.ndarray,
    solution0: np.ndarray,
    lagrange0: np.ndarray,
    max_iterations: int,
    relax: float,
    atol: float,
    rtol: float,
    max_mag: float,
):
    """Steady exact-Newton loop as one on-device lax.while_loop.

    Semantics match solver.solve.non_linear_solve_run(newton=True): the
    first iteration uses the assembled (frozen) operator, subsequent ones
    refactor the exact per-element jacfwd Jacobian at the current iterate.
    The dense saddle matrix is (re)assembled and LU-factored in-trace every
    iteration.
    """
    m = _newton_machinery(disc, evaluator, element_matrices, lagrange_mat)
    n = m["n"]
    base = jnp.asarray(explicit_vec)

    @jax.jit
    def solve(u0, lam0, base_, mat0_):
        def cond(state):
            _, _, it, _, converged, _ = state
            return jnp.logical_and(it < max_iterations, jnp.logical_not(converged))

        def body(state):
            u, lam, it, residuals, _, _ = state
            value = m["residual_value"](u) + m["trace_t_apply"](lam)
            full = jnp.concatenate([value, m["trace_apply"](u)])
            res_vec = base_ - full
            mres = jnp.max(jnp.abs(res_vec))
            residuals = residuals.at[it].set(mres)
            conv = jnp.logical_not(
                jnp.logical_and(mres > atol, mres > max_mag * rtol)
            )
            mat = jax.lax.cond(
                it == 0, lambda u_: mat0_, m["assemble_jacobian"], u
            )
            d = m["dense_solve"](mat, res_vec)
            u_new = jnp.where(conv, u, u + relax * d[:n])
            lam_new = jnp.where(conv, lam, lam + relax * d[n:])
            it_new = jnp.where(conv, it, it + 1)
            return (u_new, lam_new, it_new, residuals, conv, mres)

        state = (
            u0, lam0, jnp.int32(0), jnp.zeros(max_iterations),
            jnp.bool_(False), jnp.inf,
        )
        u, lam, it, residuals, _, mres = jax.lax.while_loop(cond, body, state)
        return u, lam, it, residuals, mres

    u, lam, it, residuals, mres = solve(
        jnp.asarray(solution0), jnp.asarray(lagrange0), base, m["mat0"]
    )
    return (
        np.asarray(u),
        np.asarray(lam),
        int(it),
        np.asarray(residuals),
        float(mres),
    )


def fused_newton_time_march(
    disc: Discretization,
    evaluator,
    element_matrices: list[np.ndarray],
    lagrange_mat: sp.csr_array | None,
    explicit_vec: np.ndarray,
    carry_indices: np.ndarray,
    initial_solution: np.ndarray,
    initial_carry: np.ndarray,
    initial_carry_term: np.ndarray,
    dt: float,
    nt: int,
    max_iterations: int,
    relax: float,
    atol: float,
    rtol: float,
    max_mag: float,
    sample_rate: int = 1,
):
    """Exact-Newton trapezoidal march fully on device.

    Outer lax.scan over steps; inner while_loop Newton with in-trace
    Jacobian refactorization (first iteration of each step uses the frozen
    assembled operator, matching the host loop).
    """
    m = _newton_machinery(disc, evaluator, element_matrices, lagrange_mat)
    n = m["n"]
    n_lag = m["n_lag"]

    # Per-bucket dual (mass) application for the carry projection.
    gathers = [jnp.asarray(b.gather) for b in disc.buckets]
    mass_blocks = []
    for bucket in disc.buckets:
        p1, p2 = bucket.orders
        offsets = disc.form_spec.form_offsets(p1, p2)
        n_e = disc.form_spec.total_size(p1, p2)
        e = bucket.batch.n_elements
        big = np.zeros((e, n_e, n_e))
        for i in range(len(disc.form_spec)):
            mm = np.asarray(bucket.batch.mass(disc.form_spec[i][1], False))
            big[:, offsets[i] : offsets[i + 1], offsets[i] : offsets[i + 1]] = mm
        mass_blocks.append(jnp.asarray(big))

    inv_perm_dual = _inverse_permutation(disc)

    carry_idx = jnp.asarray(carry_indices, jnp.int32)
    explicit = jnp.asarray(explicit_vec)
    two_over_dt = 2.0 / dt

    sample_steps, slots = _sample_slots(nt, sample_rate)
    slots_dev = jnp.asarray(slots)

    # Large arrays ride the jit boundary as ARGUMENTS (see
    # _device_lu_solver).
    tables = dict(mass_blocks=mass_blocks, explicit=explicit, mat0=m["mat0"])

    @jax.jit
    def march(u0, lam0, carry0, carry_term0, tabs):
        mass_blocks_, explicit_ = tabs["mass_blocks"], tabs["explicit"]

        def dual_apply_(x):
            return _assemble_parts(
                [
                    jnp.einsum("eij,ej->ei", mb, x[g])
                    for mb, g in zip(mass_blocks_, gathers)
                ],
                inv_perm_dual,
            )

        def step(state, slot):
            u, lam, old_carry, carry_term, buf = state
            current_carry = two_over_dt * old_carry + carry_term
            base = explicit_.at[carry_idx].add(current_carry)

            def cond(s):
                it, converged = s[2], s[3]
                return jnp.logical_and(
                    it < max_iterations, jnp.logical_not(converged)
                )

            def body(s):
                ui, lami, it, _, _ = s
                value = m["residual_value"](ui) + m["trace_t_apply"](lami)
                full = jnp.concatenate([value, m["trace_apply"](ui)])
                res_vec = base - full
                mres = jnp.max(jnp.abs(res_vec))
                conv = jnp.logical_not(
                    jnp.logical_and(mres > atol, mres > max_mag * rtol)
                )
                mat = jax.lax.cond(
                    it == 0, lambda u_: tabs["mat0"], m["assemble_jacobian"], ui
                )
                d = m["dense_solve"](mat, res_vec)
                u_new = jnp.where(conv, ui, ui + relax * d[:n])
                lam_new = jnp.where(conv, lami, lami + relax * d[n:])
                it_new = jnp.where(conv, it, it + 1)
                return (u_new, lam_new, it_new, conv, mres)

            u_new, lam_new, iters, _, mres = jax.lax.while_loop(
                cond, body, (u, lam, jnp.int32(0), jnp.bool_(False), jnp.inf)
            )
            dual = dual_apply_(u_new)
            new_carry = dual[carry_idx]
            new_carry_term = two_over_dt * (new_carry - old_carry) - carry_term
            idx = jnp.maximum(slot, 0)
            buf = buf.at[idx].set(jnp.where(slot >= 0, u_new, buf[idx]))
            return (u_new, lam_new, new_carry, new_carry_term, buf), (
                iters,
                mres,
            )

        buf0 = jnp.zeros((len(sample_steps), n))
        (_, lam_f, _, _, buf), (iters, residuals) = jax.lax.scan(
            step, (u0, lam0, carry0, carry_term0, buf0), slots_dev
        )
        return buf, lam_f, iters, residuals

    us, lam_f, iters, residuals = march(
        jnp.asarray(initial_solution),
        jnp.zeros(n_lag),
        jnp.asarray(initial_carry),
        jnp.asarray(initial_carry_term),
        tables,
    )
    return (
        np.asarray(us),
        sample_steps,
        np.asarray(lam_f),
        np.asarray(iters, np.uint32),
        np.asarray(residuals),
    )

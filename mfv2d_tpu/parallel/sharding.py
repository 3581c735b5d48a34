"""Multi-chip element-parallel solve over a JAX device mesh.

The hybridized structure is exactly the distributed seam the reference was
designed around (docs/modules/solving.rst:10-13): element blocks are
embarrassingly parallel, and the only communication is the trace (constraint)
exchange.  Here element batches are sharded along a 1D mesh axis ``"e"`` with
``shard_map``; each Krylov matvec does

    1. local batched block GEMV / LU-solve on the device's elements,
    2. local partial ``G x`` via a per-device segment-sum,
    3. one ``psum`` over the mesh axis to reduce the trace vector,
    4. local ``G^T lambda`` scatter from the (replicated) trace vector.

So one all-reduce of size ``n_lagrange`` per matvec rides the ICI; no other
communication exists.  The same layout scales the Picard residual evaluation
(element-local) and the assembly (fully local).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from mfv2d_tpu.utils.lazy import lazy_module

sp = lazy_module("scipy.sparse")
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfv2d_tpu.solver.discretization import Discretization
from mfv2d_tpu.tracing import tracer
from mfv2d_tpu.solver.krylov import (
    auto_restart,
    cg_chunk as _cg_chunk,
    cg_loop as _cg_loop,
    gmres_cycle as _gmres_cycle,
    gmres_loop as _gmres_loop,
    trace_indefinite_probe,
)


def _pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths)


def _padded_table(keys: np.ndarray, key_max: int):
    """Vectorized fill: per-key slot indices for a padded gather table.

    Returns ``(order, sorted_keys, slot, k)`` where ``order`` sorts entries
    by key, ``slot`` is each sorted entry's position within its key group,
    and ``k`` the maximum group size (pad width).
    """
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    counts = np.bincount(sorted_keys, minlength=key_max)
    k = max(1, int(counts.max()) if counts.size else 1)
    starts = np.concatenate(([0], np.cumsum(counts)))
    slot = np.arange(sorted_keys.size) - starts[sorted_keys]
    return order, sorted_keys, slot, k



def _sum_matvec(schurs, tables, n_tab):
    """Summed per-bucket Schur matvec over a flat table concatenation."""

    def matvec(x):
        out = None
        for i, schur in enumerate(schurs):
            v = schur(x, *tables[n_tab * i : n_tab * (i + 1)])
            out = v if out is None else out + v
        return out

    return matvec


def _initial_chunk(block_bytes: int) -> int:
    """First-dispatch iteration budget from the block-data footprint.

    The watchdog risk scales with per-iteration GEMV cost (~ block bytes);
    small systems start with a big chunk (often one dispatch total), while
    emulated-f64 heavyweights probe with a small one and let the measured
    rate adapt upward.
    """
    if block_bytes <= 16 * 2**20:
        return 4096
    if block_bytes <= 128 * 2**20:
        return 512
    return 32


def _fused_cg_factory(
    schurs, all_tables, maximum_iterations: int, chunk: int = 32
):
    """Device CG over summed per-bucket Schur matvecs, in chunked dispatches.

    ``all_tables`` is the flat concatenation of each bucket's 8 operator
    tables; each matvec issues the bucket kernels back-to-back (one psum
    per bucket) and sums the replicated results.  The iteration runs as a
    host loop over jitted bounded-iteration segments, starting from a small
    probe chunk and adapting toward ~5 s of device work per dispatch.
    Emulated-f64 heavyweights can spend ~0.4 s per iteration, so even a
    512-iteration first chunk is a multi-minute dispatch — past the TPU
    runtime's single-program watchdog (observed: it kills the worker).
    Fast systems converge within the first few dispatches, and the chunk
    ladder caps the relay round-trip overhead at a few percent.
    """

    @partial(jax.jit, static_argnames=("max_iter",))
    def cg_chunk(carry, tol, max_iter, *tables):
        return _cg_chunk(_sum_matvec(schurs, tables, 8), carry, tol, max_iter)

    def run(trace_rhs, tolerance: float):
        if isinstance(trace_rhs, jax.core.Tracer):
            # Inside an enclosing trace (fused time marches call the solver
            # from a scanned step): run the whole iteration as one traced
            # while_loop — host chunking is impossible there.
            return _cg_loop(
                _sum_matvec(schurs, all_tables, 8),
                trace_rhs,
                jnp.asarray(tolerance, trace_rhs.dtype),
                maximum_iterations,
            )
        b = jnp.asarray(trace_rhs)
        tol = jnp.asarray(tolerance, b.dtype)
        rs0 = jnp.vdot(b, b)
        zeros = jnp.zeros_like(b)
        carry = (zeros, b, b, rs0, zeros, rs0)
        total = 0
        tol2 = float(tolerance) ** 2
        step = chunk
        while total < maximum_iterations:
            step = min(step, maximum_iterations - total)
            t0 = time.perf_counter()
            carry, did = cg_chunk(carry, tol, step, *all_tables)
            done = int(did)
            dt = time.perf_counter() - t0
            total += done
            if done < step or float(carry[3]) <= tol2:
                break
            # Adapt the chunk toward ~5 s of device work per dispatch: on
            # emulated-f64 heavyweights a fixed chunk either trips the TPU
            # watchdog or, on fast systems, wastes a relay round trip every
            # few milliseconds.  Chunk sizes are quantized to a short
            # ladder because each distinct size is a separate compile.
            # (First-dispatch compile time inflates dt once; the next
            # adaptation corrects it.)
            per_iter = dt / max(done, 1)
            desired = 5.0 / max(per_iter, 1e-7)
            step = 128
            for candidate in (512, 2048, 8192, 16384):
                if candidate <= desired:
                    step = candidate
        return carry[4], carry[5], total

    return run


def _fused_gmres_factory(
    schurs, all_tables, maximum_iterations: int, restart: int | None = None
):
    """Device restarted GMRES over summed per-bucket Schur matvecs.

    One jitted dispatch per restart cycle, restarts driven from the host —
    the same bounded-dispatch rationale as ``_fused_cg_factory``.
    ``restart=None`` sizes the Krylov space with :func:`auto_restart`
    (effectively un-truncated, memory-bounded): indefinite trace systems
    converge superlinearly only once the space spans both spectral
    branches (Stokes 16x16 p=4: 593 matvecs un-truncated vs 12,611 at
    restart 200 — see solver/krylov.py).
    """
    n_first = all_tables[3].shape[1]  # tr_elem: [nd, n_lag, k]
    m = (
        auto_restart(n_first, maximum_iterations, dtype_bytes=8)
        if restart is None
        else min(restart, maximum_iterations)
    )

    @partial(jax.jit, static_argnames=("m_",))
    def gmres_cycle(x, b, tol, m_, *tables):
        return _gmres_cycle(_sum_matvec(schurs, tables, 8), b, tol, x, m_)

    def run(trace_rhs, tolerance: float):
        if isinstance(trace_rhs, jax.core.Tracer):
            return _gmres_loop(
                _sum_matvec(schurs, all_tables, 8),
                trace_rhs,
                jnp.asarray(tolerance, trace_rhs.dtype),
                maximum_iterations,
                m,
            )
        b = jnp.asarray(trace_rhs)
        tol = jnp.asarray(tolerance, b.dtype)
        x = jnp.zeros_like(b)
        total = 0
        res = float(jnp.linalg.norm(b))
        tol_f = float(tolerance)
        while total < maximum_iterations and res > tol_f:
            x, res_a, j = gmres_cycle(x, b, tol, m, *all_tables)
            res = float(res_a)
            total += max(int(j), 1)
        return x, jnp.asarray(res * res), total

    return run


def _fused_mixed_factory(
    schurs,
    schurs32,
    tables64,
    tables32,
    maximum_iterations: int,
    method: str = "cg",
    restart: int | None = None,
    inner_tolerance: float = 1e-6,
    max_outer: int = 60,
    n32: int = 6,
    schurs_c64=None,
    tables_c64=(),
):
    """f64 defect correction around an all-f32 inner Krylov trace solve.

    On TPU, f64 matmuls are software-emulated: the accurate Schur matvec
    (refined f32-inverse block solve, 3 f64 residual GEMVs) costs roughly
    50 f32-GEMV-equivalents per iteration, so a plain f64 Krylov loop runs
    at CPU speeds.  Here each outer sweep computes ONE accurate f64
    residual ``r = b - S lam`` and corrects with a fast all-f32 inner
    CG/GMRES solve on the f32 Schur operator (one f32 GEMV per iteration,
    one psum per bucket per matvec); the inner returns its best-residual
    iterate, which keeps the correction safe on semiconvergent (indefinite)
    systems.  ``cond(S) * eps_f32 < 1`` gives geometric convergence to
    full f64 accuracy in a handful of sweeps — the same scheme as the
    single-chip ``_solve_schur_mixed_tpu`` (solver/iterative.py), lifted to
    the sharded operator.

    The outer sweeps are driven from the host (one jitted dispatch each, so
    a sweep never exceeds the TPU runtime's single-program watchdog), with
    best-λ tracking and a stagnation exit: if three consecutive sweeps fail
    to improve the best residual, the best iterate is returned — the mixed
    path can stall when ``cond * eps_f32`` approaches 1, and a safe partial
    result lets the caller's convergence check decide.

    Returns a ``run(trace_rhs, tolerance)`` with the same
    ``(lam, |r|^2, iterations)`` contract as the f64 factories, where
    ``iterations`` counts inner Krylov iterations.
    """
    n64 = 8
    n_lag = tables64[3].shape[1]  # tr_elem: [n_devices, n_lag, k]
    if restart is None:
        # Effectively un-truncated f32 Krylov space (memory-bounded):
        # restart truncation is what made indefinite trace systems take
        # 18k+ inner iterations (see solver/krylov.py).
        m = auto_restart(n_lag, maximum_iterations, dtype_bytes=4)
    else:
        m = min(restart, maximum_iterations)
    # Bound one sweep's device work: a GMRES inner pass gets at most two
    # cycles per dispatch (the outer host loop re-enters), which keeps a
    # dispatch under the TPU runtime watchdog even at large m.
    inner_cap = (
        min(maximum_iterations, 2 * m)
        if method == "gmres"
        else maximum_iterations
    )

    k64 = n64 * len(schurs)
    k32 = n32 * len(schurs32)

    @partial(jax.jit, static_argnames=("max_iter", "m_", "fast"))
    def sweep(lam, trace_rhs, tol, state, max_iter, m_, fast, *tabs):
        """One defect-correction sweep.  ``fast`` computes the outer
        residual through the condensed f64 operator ((c/n)^2 the cost of
        the refined full-block chain; error ~cond*eps_f64 — see
        ``_schur_c64_shardmap``); the exact chain runs the final sweeps.

        The inner tolerance floors at the OUTER target (converged
        verification sweeps exit at zero inner iterations), and GMRES
        sweeps recycle the previous sweep's Krylov basis via a
        least-squares projection — same scheme as the single-chip
        ``_mixed_sweep_factory`` (solver/iterative.py)."""
        if fast:
            matvec64 = _sum_matvec(schurs_c64, tabs[k64 + k32 :], 4)
        else:
            matvec64 = _sum_matvec(schurs, tabs[:k64], n64)
        matvec32 = _sum_matvec(schurs32, tabs[k64 : k64 + k32], n32)
        r = trace_rhs - matvec64(lam)
        rr = jnp.vdot(r, r)
        r32 = r.astype(jnp.float32)
        nr32 = jnp.linalg.norm(r32)
        tol32 = jnp.asarray(tol, jnp.float32)
        t32 = jnp.asarray(inner_tolerance, jnp.float32) * nr32
        t32 = jnp.maximum(t32, 0.3 * tol32)
        t32 = jnp.where(nr32 <= tol32, 2.0 * nr32, t32)
        if method == "gmres":
            from mfv2d_tpu.solver.krylov import (
                gmres_loop_recycled,
                krylov_project,
            )

            dx = krylov_project(state, r32)
            rp = r32 - matvec32(dx)
            nrp = jnp.linalg.norm(rp)
            use = nrp < nr32
            dx = jnp.where(use, dx, jnp.zeros_like(dx))
            d32, _, it, state = gmres_loop_recycled(
                matvec32, r32, t32, max_iter, m_, x0=dx, state=state,
                # |r - A dx| is the guard residual just computed — skip
                # the redundant entry matvec (one psum collective each).
                r0_norm=jnp.where(use, nrp, nr32),
            )
        else:
            d32, _, it = _cg_loop(matvec32, r32, t32, max_iter)
        return lam + d32.astype(lam.dtype), rr, it, state

    def _traced_outer(trace_rhs, tol):
        """Whole defect-correction loop as one traced while_loop (for
        callers tracing the solve into a larger program, e.g. marches)."""
        k64 = n64 * len(schurs)
        tabs = tuple(tables64) + tuple(tables32)
        matvec64 = _sum_matvec(schurs, tabs[:k64], n64)
        matvec32 = _sum_matvec(schurs32, tabs[k64:], n32)

        def inner_tol_of(nr32):
            t32 = jnp.asarray(inner_tolerance, jnp.float32) * nr32
            t32 = jnp.maximum(t32, 0.3 * jnp.asarray(tol, jnp.float32))
            return jnp.where(
                nr32 <= jnp.asarray(tol, jnp.float32), 2.0 * nr32, t32
            )

        def cond(st):
            _, rr, _, k = st[0]
            return (k < max_outer) & (rr > tol * tol)

        def body(st):
            (lam, _, tot, k), state = st
            r = trace_rhs - matvec64(lam)
            rr = jnp.vdot(r, r)
            fix = rr > tol * tol
            r32 = r.astype(jnp.float32)
            t32 = inner_tol_of(jnp.linalg.norm(r32))
            if method == "gmres":
                from mfv2d_tpu.solver.krylov import (
                    gmres_loop_recycled,
                    krylov_project,
                )

                dx = krylov_project(state, r32)
                rp = r32 - matvec32(dx)
                nrp = jnp.linalg.norm(rp)
                nr32 = jnp.linalg.norm(r32)
                use = nrp < nr32
                dx = jnp.where(use, dx, jnp.zeros_like(dx))
                d32, _, it, state = gmres_loop_recycled(
                    matvec32, r32, t32, inner_cap, m, x0=dx, state=state,
                    # The guard residual IS the warm-start entry residual;
                    # skip the redundant trace matvec (one psum each).
                    r0_norm=jnp.where(use, nrp, nr32),
                )
            else:
                d32, _, it = _cg_loop(matvec32, r32, t32, inner_cap)
            lam = jnp.where(fix, lam + d32.astype(lam.dtype), lam)
            tot = tot + jnp.where(fix, it, 0)
            return (lam, rr, tot, k + 1), state

        from mfv2d_tpu.solver.krylov import empty_recycle_state

        state0 = (
            empty_recycle_state(n_lag, m) if method == "gmres" else ()
        )
        (lam, _, tot, _), _ = jax.lax.while_loop(
            cond,
            body,
            (
                (
                    jnp.zeros_like(trace_rhs),
                    jnp.asarray(jnp.inf, trace_rhs.dtype),
                    jnp.asarray(0, jnp.int32),
                    jnp.asarray(0, jnp.int32),
                ),
                state0,
            ),
        )
        r = trace_rhs - matvec64(lam)
        return lam, jnp.vdot(r, r), jnp.maximum(tot, 1)

    def run(trace_rhs, tolerance: float):
        if isinstance(trace_rhs, jax.core.Tracer):
            return _traced_outer(
                trace_rhs, jnp.asarray(tolerance, trace_rhs.dtype)
            )
        from mfv2d_tpu.solver.krylov import (
            empty_recycle_state,
            mixed_outer_drive,
        )

        trace_rhs = jnp.asarray(trace_rhs)
        tol_j = jnp.asarray(float(tolerance))
        state0 = (
            empty_recycle_state(n_lag, m) if method == "gmres" else ()
        )
        all_tabs = tuple(tables64) + tuple(tables32) + tuple(tables_c64)

        def do_sweep(lam_k, state_k, fast):
            return sweep(
                lam_k, trace_rhs, tol_j, state_k, inner_cap, m, fast,
                *all_tabs,
            )

        # Intermediate sweeps measure the residual through the cheap
        # condensed f64 operator (when built); once it reports convergence
        # — or stalls — the driver hands off to the exact refined chain,
        # which both verifies and finishes the solve.
        best_lam, best_rr, total = mixed_outer_drive(
            do_sweep, jnp.zeros_like(trace_rhs), state0, float(tolerance),
            max_outer=max_outer, start_fast=bool(schurs_c64),
            label=f"{method},m={m}",
        )
        return best_lam, jnp.asarray(best_rr), total

    return run


def _mixed_trace_enabled() -> bool:
    """Whether sharded trace Krylov solves run the f32-inner mixed path.

    ``MFV2D_TPU_SHARDED_MIXED=auto`` (default) enables it exactly where it
    pays: on TPU backends, where f64 GEMVs are emulated.  ``1`` forces it
    everywhere (used by the CPU parity tests), ``0`` disables it.
    """
    from mfv2d_tpu.config import config

    mode = config.sharded_mixed
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return mode not in ("0", "never", "off")


def _trace_krylov(system, method: str, maximum_iterations: int):
    """The fused trace-Schur Krylov for ``system``; mixed-precision where it pays.

    Systems whose element blocks are too ill-conditioned for the plain
    f32 inner operator (``_inner32_ok`` False, a cond(A)*eps_f32 probe at
    build time) get the f32x2 hi/lo inner operator instead; the pure-f64
    loops run only when the mixed path is disabled outright
    (``MFV2D_TPU_SHARDED_MIXED=0``).  If an inner operator fails to
    contract anyway, the outer loop's stagnation exit returns the best
    iterate and the caller's convergence check decides.  ``method="cg"``
    is upgraded to large-restart
    GMRES when the curvature probe finds the trace operator indefinite
    (saddle formulations): the CG recurrence is only semiconvergent there
    — Stokes 16x16 p=4 measured 18,000 inner CG iterations vs ~600 for the
    un-truncated GMRES space (solver/krylov.py).
    """
    if (
        method == "cg"
        and getattr(system, "n_lagrange", 0)
        and system.trace_indefinite()
    ):
        method = "gmres"
    if _mixed_trace_enabled():
        # Three-way inner gate: plain f32 where the equilibrated-f32 seed
        # represents the block inverses (cheapest), the f32x2 hi/lo split
        # where it cannot (unbiased operator at ~2x the GEMV cost — e.g.
        # Navier-Stokes p=8 elements), f64 only as the last resort.
        accurate = not getattr(system, "_inner32_ok", True)
        if method == "gmres":
            return system.make_fused_gmres_mixed(
                maximum_iterations, accurate=accurate
            )
        return system.make_fused_cg_mixed(maximum_iterations, accurate=accurate)
    if method == "gmres":
        return system.make_fused_gmres(maximum_iterations)
    return system.make_fused_cg(maximum_iterations)


class ShardedBlockSystem:
    """Element-sharded saddle system over a 1D device mesh.

    Supports a single order bucket directly; for hp meshes use
    :class:`MultiBucketShardedSystem`, which wraps one of these per bucket.

    Parameters
    ----------
    disc : Discretization
        Single-bucket discretization.
    element_matrices : [E, n, n] array
        Element matrix batch (bucket 0).
    lagrange_mat : scipy CSR or None
        Constraint matrix over the global DoF vector.
    mesh : jax.sharding.Mesh
        1D device mesh with axis name "e".
    """

    def __init__(
        self,
        disc: Discretization,
        element_matrices,
        lagrange_mat: sp.csr_array | None,
        mesh: Mesh,
        *,
        _prepadded_device: bool = False,
    ) -> None:
        if len(disc.buckets) != 1:
            raise NotImplementedError(
                "ShardedBlockSystem expects a uniform-order mesh; use"
                " MultiBucketShardedSystem for hp meshes."
            )
        self.mesh = mesh
        self.n_devices = mesh.devices.size
        bucket = disc.buckets[0]
        e_real = bucket.batch.n_elements
        self.n_dofs_per_element = element_matrices.shape[1]
        n = self.n_dofs_per_element

        if _prepadded_device:
            # Blocks were assembled on-device, already sharded and padded
            # (padding rows hold identity blocks).
            blocks = element_matrices
        else:
            blocks = _pad_to_multiple(np.asarray(element_matrices), self.n_devices)
            # Padding elements get identity blocks so the batched LU stays
            # valid.
            for i in range(e_real, blocks.shape[0]):
                blocks[i] = np.eye(n)
        self.e_padded = blocks.shape[0]
        self.e_real = e_real

        if lagrange_mat is not None:
            coo = lagrange_mat.tocoo()
            self.n_lagrange = lagrange_mat.shape[0]
            rows = np.asarray(coo.row, np.int64)
            cols = np.asarray(coo.col, np.int64)
            vals = np.asarray(coo.data)
        else:
            self.n_lagrange = 0
            rows = np.zeros(0, np.int64)
            cols = np.zeros(0, np.int64)
            vals = np.zeros(0)

        # Raw constraint triplets are kept host-side for the condensed-trace
        # build (lazy, see ``_tables_c32``); tiny relative to the blocks.
        self._lag_coo = (rows, cols, vals)

        # Map flat DoF columns to (element, local dof) and partition entries
        # by the owning device (elements are block-distributed).  Both trace
        # products use padded GATHER layouts: TPU scatters/segment-sums are
        # ~10x slower than dense gathers (zero-valued padding is a no-op).
        elem_of_entry = cols // n
        local_dof = cols % n
        per_dev = self.e_padded // self.n_devices
        owner = elem_of_entry // per_dev
        nd = self.n_devices
        n_lag = max(self.n_lagrange, 1)

        # Row-major per device: G x = psum of per-device partial row sums.
        key1 = (owner * n_lag + rows).astype(np.int64)
        o1, sk1, slot1, k1 = _padded_table(key1, nd * n_lag)
        tr_elem = np.zeros((nd, n_lag, k1), np.int32)
        tr_dof = np.zeros((nd, n_lag, k1), np.int32)
        tr_val = np.zeros((nd, n_lag, k1))
        d1 = sk1 // n_lag
        r1 = sk1 % n_lag
        tr_elem[d1, r1, slot1] = (elem_of_entry[o1] - d1 * per_dev).astype(np.int32)
        tr_dof[d1, r1, slot1] = local_dof[o1].astype(np.int32)
        tr_val[d1, r1, slot1] = vals[o1]

        # Column-major per device: G^T lam gathered per local (element, dof).
        key2 = (elem_of_entry * n + local_dof).astype(np.int64)
        o2, sk2, slot2, k2 = _padded_table(key2, self.e_padded * n)
        tt_rows = np.zeros((self.e_padded, n, k2), np.int32)
        tt_val = np.zeros((self.e_padded, n, k2))
        e2 = sk2 // n
        dd2 = sk2 % n
        tt_rows[e2, dd2, slot2] = rows[o2].astype(np.int32)
        tt_val[e2, dd2, slot2] = vals[o2]

        shard_e = NamedSharding(mesh, P("e"))
        shard_blocks = NamedSharding(mesh, P("e", None, None))
        self.blocks = (
            blocks if _prepadded_device else jax.device_put(blocks, shard_blocks)
        )
        # TPU XLA only implements LuDecomposition in f32 and runs batched
        # triangular solves ~23x slower than a GEMV, so on TPU "lu" holds an
        # explicit f64 block inverse, built once on device: a Jacobi-
        # equilibrated f32 inversion seeds Newton-Schulz iterations in f64
        # (quadratic convergence; each iteration is two batched MXU GEMMs).
        # Every subsequent Krylov matvec then costs ONE f64 GEMV instead of
        # the 4 f32 + 3 emulated-f64 GEMVs of a refined-f32 scheme.
        # Elsewhere "lu" is the f64 LU factorization.  Both are batched over
        # the sharded element axis, so the factorization runs element-parallel.
        self._refine = jax.default_backend() == "tpu"
        self._refine_rounds = 0
        self._inner32_ok = True
        if self._refine:
            self.lu, seed_err = self._build_f64_inverse(shard_blocks, n)
            # The all-f32 inner Krylov operates on the raw f32 inverse; its
            # achievable contraction per outer sweep degrades with
            # cond(A) * eps_f32 (~ the seed probe error).  Past ~5% the f32
            # sweeps gain nothing and the mixed path falls back to f64.
            self._seed_err32 = seed_err
            self._inner32_ok = seed_err <= 0.05
            self.piv = jax.device_put(
                jnp.zeros((self.e_padded, n), jnp.int32),
                NamedSharding(mesh, P("e", None)),
            )
        else:
            lu, piv = jax.scipy.linalg.lu_factor(self.blocks)
            self.lu = jax.device_put(lu, shard_blocks)
            self.piv = jax.device_put(piv, NamedSharding(mesh, P("e", None)))
        # The trace/Schur formulation requires invertible element blocks
        # (the hybridized A must be eliminable).  Direct-form systems with
        # pure-stiffness diagonal blocks are singular per element — probe
        # cheaply and fail loudly instead of diverging.  The probe also
        # picks the refinement-round count for `_block_solve` (normally 0:
        # the f64 inverse applies to ~cond(A) * eps_f64 already).
        probe = jnp.ones((self.e_padded, n))
        applied = jnp.einsum("eij,ej->ei", self.blocks, probe)
        while True:
            back = self._block_solve(self.lu, self.piv, self.blocks, applied)
            probe_err = float(jnp.abs(back - 1.0).max())
            if np.isfinite(probe_err) and probe_err <= 1e-10:
                break
            if not self._refine or self._refine_rounds >= 6:
                if not np.isfinite(probe_err) or probe_err > 1e-6:
                    raise ValueError(
                        "Element blocks are numerically singular (solve probe"
                        f" error {probe_err:.2e}); the sharded trace/Schur"
                        " path needs invertible element operators — use a"
                        " mixed formulation or the full saddle solvers in"
                        " mfv2d_tpu.solver."
                    )
                break
            self._refine_rounds += 1

        self.tr_elem = jax.device_put(tr_elem, shard_e)
        self.tr_dof = jax.device_put(tr_dof, shard_e)
        self.tr_val = jax.device_put(tr_val, shard_e)
        shard_e3 = NamedSharding(mesh, P("e", None, None))
        self.tt_rows = jax.device_put(tt_rows, shard_e3)
        self.tt_val = jax.device_put(tt_val, shard_e3)
        self.dof_sharding = NamedSharding(mesh, P("e", None))

    def _build_f64_inverse(self, shard_blocks, n):
        """Device-resident f64 explicit block inverse (TPU path).

        See :func:`mfv2d_tpu.ops.precision.newton_schulz_inverse` for the
        scheme (equilibrated f32 seed + Newton-Schulz f64 iterations).
        Returns ``(X, seed_err)``.
        """
        from mfv2d_tpu.ops.precision import newton_schulz_inverse

        x, seed_err = newton_schulz_inverse(self.blocks)
        return jax.device_put(x, shard_blocks), seed_err

    @classmethod
    def from_assembly(
        cls,
        disc: Discretization,
        blocks_ir,
        lagrange_mat: sp.csr_array | None,
        mesh: Mesh,
        dofs: np.ndarray | None = None,
    ) -> "ShardedBlockSystem":
        """Build the system with *sharded* element assembly.

        Corners are sharded over the device mesh and every device assembles
        its own elements' matrices (fused pair-table path) — element data is
        never gathered, matching the reference's distributed-design seam
        (docs/modules/solving.rst:10-13).  Padding elements use reference-
        square corners and are overwritten with identity blocks.
        """
        from mfv2d_tpu.compiler import collect_fields
        from mfv2d_tpu.evaluation import (
            ElementBatch,
            compute_element_matrices,
            evaluate_static_fields,
        )

        if len(disc.buckets) != 1:
            raise NotImplementedError("from_assembly expects a single bucket.")
        bucket = disc.buckets[0]
        basis = bucket.batch.basis
        form_spec = disc.form_spec
        corners = np.asarray(bucket.batch.corners)
        e_real = corners.shape[0]
        nd = mesh.devices.size
        corners_p = _pad_to_multiple(corners, nd)
        if corners_p.shape[0] > e_real:
            corners_p[e_real:] = np.array(
                [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
            )
        shard_c = NamedSharding(mesh, P("e", None, None))
        corners_dev = jax.device_put(corners_p, shard_c)

        field_keys = collect_fields(blocks_ir)
        static_fields = evaluate_static_fields(
            ElementBatch(basis, corners_p), field_keys
        )
        static_keys = tuple(static_fields.keys())
        static_vals = tuple(
            jax.device_put(np.asarray(static_fields[k]), shard_c)
            for k in static_keys
        )
        if any(isinstance(k, str) for k in field_keys) and dofs is None:
            raise ValueError(
                "Assembly blocks reference unknown-form fields; pass dofs."
            )

        dofs_p = None
        if dofs is not None:
            d = np.asarray(dofs).reshape(e_real, -1)
            dofs_p = jax.device_put(
                _pad_to_multiple(d, nd), NamedSharding(mesh, P("e", None))
            )

        n_dofs_args = 1 if dofs_p is not None else 0
        in_specs = (
            (P("e", None, None),)
            + (P("e", None),) * n_dofs_args
            + (P("e", None, None),) * len(static_vals)
        )

        @partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                 out_specs=P("e", None, None))
        def assemble(corners_local, *rest):
            if n_dofs_args:
                local_dofs, *sv = rest
            else:
                local_dofs, sv = None, list(rest)
            batch = ElementBatch(basis, corners_local)
            return compute_element_matrices(
                form_spec,
                blocks_ir,
                batch,
                dofs=local_dofs,
                static_fields=dict(zip(static_keys, sv)),
            )

        args = (corners_dev,) + ((dofs_p,) if dofs_p is not None else ()) + static_vals
        blocks_dev = jax.jit(assemble)(*args)
        n = blocks_dev.shape[1]
        if blocks_dev.shape[0] > e_real:
            eye = jnp.eye(n, dtype=blocks_dev.dtype)
            blocks_dev = blocks_dev.at[e_real:].set(eye)
        obj = cls(disc, blocks_dev, lagrange_mat, mesh, _prepadded_device=True)
        obj.corners_padded = corners_dev
        obj.basis = basis
        obj._static_keys = static_keys
        obj._static_vals = static_vals
        return obj

    def make_picard_residual(self, form_spec, lhs_blocks, rhs_blocks=None):
        """Sharded defect-correction residual of the current iterate.

        Returns a jitted ``(dofs, lam, b) -> (r_elem, g_u)`` where
        ``r_elem = b - (LHS(u) - RHS(u)) - G^T lam`` stays element-sharded
        and ``g_u = G u`` is the replicated trace value (one psum).  The
        element vectors are evaluated per device — nonlinear unknown-form
        fields reconstruct locally from the device's own DoFs.
        """
        from mfv2d_tpu.evaluation import ElementBatch, compute_element_vectors

        basis = self.basis
        static_keys = self._static_keys
        corners = self.corners_padded
        static_vals = self._static_vals

        in_specs = (
            P("e", None, None),  # corners
            P("e", None),  # dofs
            P(None),  # lam
            P("e", None),  # b
            P("e", None, None),  # tr_elem
            P("e", None, None),  # tr_dof
            P("e", None, None),  # tr_val
            P("e", None, None),  # tt_rows
            P("e", None, None),  # tt_val
        ) + (P("e", None, None),) * len(static_vals)

        @partial(jax.shard_map, mesh=self.mesh, in_specs=in_specs,
                 out_specs=(P("e", None), P(None)))
        def residual(c, dofs, lam, b, te, td, tv, ttr, ttv, *sv):
            batch = ElementBatch(basis, c)
            statics = dict(zip(static_keys, sv))
            val = compute_element_vectors(
                form_spec, lhs_blocks, batch, dofs, static_fields=statics
            )
            if rhs_blocks is not None:
                val = val - compute_element_vectors(
                    form_spec, rhs_blocks, batch, dofs, static_fields=statics
                )
            r_elem = b - val - self._trace_t_local(lam, ttr, ttv)
            g_u = self._trace_local(dofs, te, td, tv)
            return r_elem, g_u

        @jax.jit
        def run(dofs, lam, b):
            return residual(
                corners,
                dofs,
                lam,
                b,
                self.tr_elem,
                self.tr_dof,
                self.tr_val,
                self.tt_rows,
                self.tt_val,
                *static_vals,
            )

        return run

    def make_newton_jacobian(self, form_spec, lhs_blocks, rhs_blocks=None):
        """Sharded exact per-element Jacobian of the residual value.

        Returns a jitted ``dofs -> [E_pad, n, n]`` computing
        ``d(LHS(u) - RHS(u))/du`` element-locally via ``jax.jacfwd``
        (vmapped over the device's own elements, zero communication) —
        the sharded analogue of the single-device Newton's in-trace
        Jacobian (solver/fused.py fused_newton_solve).  Padding elements
        get identity blocks so the per-iteration factorization stays
        valid; their DoFs and forcing stay zero regardless.
        """
        from mfv2d_tpu.evaluation import ElementBatch, compute_element_vectors

        basis = self.basis
        static_keys = self._static_keys
        corners = self.corners_padded
        static_vals = self._static_vals
        n = self.n_dofs_per_element
        e_real = self.e_real

        in_specs = (P("e", None, None), P("e", None)) + tuple(
            P("e", *([None] * (np.asarray(v).ndim - 1))) for v in static_vals
        )

        @partial(jax.shard_map, mesh=self.mesh, in_specs=in_specs,
                 out_specs=P("e", None, None))
        def jac(c, dofs, *sv):
            def value_of(c_e, d_e, sv_e):
                batch = ElementBatch(basis, c_e[None])
                st = dict(zip(static_keys, (s[None] for s in sv_e)))
                val = compute_element_vectors(
                    form_spec, lhs_blocks, batch, d_e[None], static_fields=st
                )[0]
                if rhs_blocks is not None:
                    val = val - compute_element_vectors(
                        form_spec, rhs_blocks, batch, d_e[None],
                        static_fields=st,
                    )[0]
                return val

            def one(c_e, d_e, *sv_e):
                return jax.jacfwd(lambda d: value_of(c_e, d, sv_e))(d_e)

            return jax.vmap(one)(c, dofs, *sv)

        @jax.jit
        def run(dofs):
            blocks = jac(corners, dofs, *static_vals)
            return blocks.at[e_real:].set(jnp.eye(n, dtype=blocks.dtype))

        return run

    # -- shard_map kernels ---------------------------------------------

    def _block_solve(self, lu, piv, blocks, rhs):
        """Batched A^{-1} rhs; one f64 inverse-GEMV on TPU (plus probe-chosen
        refinement rounds, normally zero), f64 LU elsewhere (piv is a dummy
        on TPU)."""
        if not self._refine:
            return jax.scipy.linalg.lu_solve((lu, piv), rhs[..., None])[..., 0]
        x = jnp.einsum("eij,ej->ei", lu, rhs)
        for _ in range(getattr(self, "_refine_rounds", 0)):
            r = rhs - jnp.einsum("eij,ej->ei", blocks, x)
            x = x + jnp.einsum("eij,ej->ei", lu, r)
        return x

    def _trace_local(self, dofs_local, tr_elem, tr_dof, tr_val):
        """Per-device partial G x (padded gather) + psum over the mesh axis."""
        partial_sum = jnp.sum(
            tr_val[0] * dofs_local[tr_elem[0], tr_dof[0]], axis=-1
        )
        return jax.lax.psum(partial_sum, "e")[: self.n_lagrange]

    def _trace_t_local(self, lam, tt_rows, tt_val):
        """Local G^T lambda as a padded gather (lambda replicated)."""
        return jnp.sum(tt_val * lam[tt_rows], axis=-1)

    @property
    def _tables(self):
        return (
            self.lu,
            self.piv,
            self.blocks,
            self.tr_elem,
            self.tr_dof,
            self.tr_val,
            self.tt_rows,
            self.tt_val,
        )

    @property
    def _tables32(self):
        """f32 operator tables for the mixed-precision inner Krylov.

        ``inv32`` is the explicit f32 block inverse: on TPU it is exactly
        ``self.lu`` (already stored as the f32 inverse); elsewhere it is
        computed once and cached.  Values follow the same element-axis
        shardings as their f64 counterparts (``astype`` preserves
        sharding).
        """
        cached = getattr(self, "_tables32_cache", None)
        if cached is None:
            inv32 = (
                self.lu.astype(jnp.float32)
                if self._refine
                else jnp.linalg.inv(self.blocks.astype(jnp.float32))
            )
            cached = (
                inv32,
                self.tr_elem,
                self.tr_dof,
                self.tr_val.astype(jnp.float32),
                self.tt_rows,
                self.tt_val.astype(jnp.float32),
            )
            self._tables32_cache = cached
        return cached

    @property
    def _tables32x2(self):
        """Double-f32 ("f32x2") operator tables for the accurate inner path.

        The f64 explicit block inverse splits into a hi/lo f32 pair
        (``lo = f32(inv - f64(hi))``), representing the OPERATOR to
        ~eps_f32^2 relative instead of the plain f32 tables' cond*eps_f32.
        Blocks whose f32 seed cannot even approximate the inverse
        (``_inner32_ok`` False, e.g. Navier-Stokes p=8 elements) get an
        unbiased operator this way; the remaining per-matvec error is
        ~sqrt(n)*eps_f32 random GEMV rounding, which inexact-Krylov inner
        iterations tolerate down to ~1e-5 relative residuals.
        """
        cached = getattr(self, "_tables32x2_cache", None)
        if cached is None:
            inv64 = (
                self.lu
                if self._refine
                else jnp.linalg.inv(self.blocks)
            )
            hi = inv64.astype(jnp.float32)
            lo = (inv64 - hi.astype(jnp.float64)).astype(jnp.float32)
            cached = (
                hi,
                lo,
                self.tr_elem,
                self.tr_dof,
                self.tr_val.astype(jnp.float32),
                self.tt_rows,
                self.tt_val.astype(jnp.float32),
            )
            self._tables32x2_cache = cached
        return cached

    def _use_condensed(self) -> bool:
        """Whether the inner Krylov applies the condensed trace operator.

        Statically condensing ``S_e = G_e A_e^{-1} G_e^T`` to per-element
        ``[E, c, c]`` blocks over the c constraints touching each element
        (c is O(p) per edge; the full blocks are O(p^2) per form) shrinks
        the HBM bytes each inner matvec streams by ``(n/c)^2`` — measured
        6x (Stokes p=4, n=81, c~32) to 19x (Navier-Stokes p=8, n=289,
        c~70).  The condensed blocks are built through the f64 block
        inverse and *then* rounded, so the f32 operator error is plain
        representation eps_f32|S| instead of the block-inverse path's
        cond(A)*eps_f32 — systems that failed the f32 seed gate (NS p=8)
        run the cheap f32 inner this way instead of the 2x-cost f32x2.
        Disable with ``MFV2D_TPU_CONDENSED=0``.
        """
        from mfv2d_tpu.config import config

        return config.condensed_trace and self.n_lagrange > 0

    def _condensed_structure(self):
        """Host-side per-element constraint structure (cached).

        Returns ``(ge, ce_rows, valid, co_idx, co_val)``:

        - ``ge [e_padded, c_max, n]`` — dense per-element constraint rows
          ``G_e`` (f64),
        - ``ce_rows [e_padded, c_max]`` — the global constraint index of
          each slot (0-padded; padding is killed by zeroed D rows/cols),
        - ``valid [e_padded, c_max]`` — slot validity mask,
        - ``co_idx [nd, n_lag, k3]`` / ``co_val`` — per-device padded
          gather assembling the flat per-element contributions into the
          trace vector (the scatter-free output layout, same idea as the
          ``tr_*`` tables).
        """
        cached = getattr(self, "_condensed_struct_cache", None)
        if cached is not None:
            return cached
        rows, cols, vals = self._lag_coo
        n = self.n_dofs_per_element
        nd = self.n_devices
        per_dev = self.e_padded // nd
        n_lag = max(self.n_lagrange, 1)
        elem = cols // n
        dof = cols % n

        # Unique (element, constraint-row) pairs -> padded slot table.
        pair_key = elem * n_lag + rows
        uniq, pair_inv = np.unique(pair_key, return_inverse=True)
        ue = uniq // n_lag
        ur = uniq % n_lag
        counts = np.bincount(ue, minlength=self.e_padded)
        c_max = max(1, int(counts.max()) if counts.size else 1)
        starts = np.concatenate(([0], np.cumsum(counts)))
        slot_of_pair = np.arange(uniq.size) - starts[ue]

        ge = np.zeros((self.e_padded, c_max, n))
        np.add.at(ge, (elem, slot_of_pair[pair_inv], dof), vals)
        ce_rows = np.zeros((self.e_padded, c_max), np.int32)
        ce_rows[ue, slot_of_pair] = ur.astype(np.int32)
        valid = np.zeros((self.e_padded, c_max), bool)
        valid[ue, slot_of_pair] = True

        # Output gather: for each (device, constraint) the flat positions
        # (local element * c_max + slot) contributing to it.
        owner_pair = ue // per_dev
        key = (owner_pair * n_lag + ur).astype(np.int64)
        o3, sk3, slot3, k3 = _padded_table(key, nd * n_lag)
        co_idx = np.zeros((nd, n_lag, k3), np.int32)
        co_val = np.zeros((nd, n_lag, k3), np.float32)
        d3 = sk3 // n_lag
        r3 = sk3 % n_lag
        flat_pos = (ue[o3] - d3 * per_dev) * c_max + slot_of_pair[o3]
        co_idx[d3, r3, slot3] = flat_pos.astype(np.int32)
        co_val[d3, r3, slot3] = 1.0
        cached = (ge, ce_rows, valid, co_idx, co_val)
        self._condensed_struct_cache = cached
        return cached

    @property
    def _tables_c32(self):
        """f32 condensed-trace operator tables (lazy; one device build).

        ``d32 [e_padded, c_max, c_max]`` holds ``G_e A_e^{-1} G_e^T``
        computed through the refined f64 block inverse on device (two
        batched GEMM chains), then rounded — so the stored operator's only
        error is f32 representation.  Padding slots carry zero rows/cols.
        """
        cached = getattr(self, "_tables_c32_cache", None)
        if cached is not None:
            return cached
        ge, ce_rows, valid, co_idx, co_val = self._condensed_structure()
        shard3 = NamedSharding(self.mesh, P("e", None, None))
        ge_dev = jax.device_put(ge, shard3)
        mask = jax.device_put(
            (valid[:, :, None] & valid[:, None, :]).astype(np.float64), shard3
        )
        refine = self._refine
        rounds = getattr(self, "_refine_rounds", 0)

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P("e", None, None),
                P("e", None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
            ),
            out_specs=P("e", None, None),
        )
        def build_d(lu, piv, blocks, ge_l, mask_l):
            if refine:
                y = jnp.einsum("eij,ekj->eki", lu, ge_l)
                for _ in range(rounds):
                    r = ge_l - jnp.einsum("eij,ekj->eki", blocks, y)
                    y = y + jnp.einsum("eij,ekj->eki", lu, r)
            else:
                y = jnp.swapaxes(
                    jax.scipy.linalg.lu_solve(
                        (lu, piv), jnp.swapaxes(ge_l, 1, 2)
                    ),
                    1,
                    2,
                )
            # D[e, k, l] = g_k . (A^{-1} g_l)
            return jnp.einsum("ekn,eln->ekl", ge_l, y) * mask_l

        d64 = jax.jit(build_d)(self.lu, self.piv, self.blocks, ge_dev, mask)
        d_hi = d64.astype(jnp.float32)
        rows_dev = jax.device_put(
            ce_rows, NamedSharding(self.mesh, P("e", None))
        )
        idx_dev = jax.device_put(co_idx, shard3)
        val_dev = jax.device_put(co_val, shard3)
        cached = (d_hi, rows_dev, idx_dev, val_dev)
        self._tables_c32_cache = cached
        # f64 condensed tables: the cheap intermediate-sweep outer residual
        # (the exact refined-inverse chain stays the final verification).
        self._tables_c64_cache = (
            d64,
            rows_dev,
            idx_dev,
            jax.device_put(co_val.astype(np.float64), shard3),
        )
        # The hi/lo pair shares the build: lo captures what f32 rounding
        # dropped, for systems whose trace conditioning makes the plain
        # f32 representation unable to contract (same ``accurate`` gate as
        # the legacy f32x2 path).
        self._tables_c32x2_cache = (
            d_hi,
            (d64 - d_hi.astype(jnp.float64)).astype(jnp.float32),
            rows_dev,
            idx_dev,
            val_dev,
        )
        return cached

    @property
    def _tables_c32x2(self):
        """f32x2 (hi/lo) condensed-trace tables — see :attr:`_tables_c32`."""
        cached = getattr(self, "_tables_c32x2_cache", None)
        if cached is None:
            _ = self._tables_c32
            cached = self._tables_c32x2_cache
        return cached

    @property
    def _tables_c64(self):
        """f64 condensed-trace tables — see :attr:`_tables_c32`."""
        cached = getattr(self, "_tables_c64_cache", None)
        if cached is None:
            _ = self._tables_c32
            cached = self._tables_c64_cache
        return cached

    def _schur_c64_shardmap(self):
        """Condensed f64 S kernel for intermediate outer residuals.

        The emulated-f64 GEMV over [E, c, c] costs ~(c/n)^2 of the
        refined full-block chain (measured ~0.4 s/apply at NS p=8); its
        error (~cond(A) eps_f64 from the inverse used in the build) is far
        below the 1e-10 targets, and the exact chain still issues the
        final convergence verification."""

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(None),
                P("e", None, None),
                P("e", None),
                P("e", None, None),
                P("e", None, None),
            ),
            out_specs=P(None),
        )
        def schur_c64(lam, d64, ce_rows, co_idx, co_val):
            lam_e = lam[ce_rows]
            y = jnp.einsum("ekl,el->ek", d64, lam_e)
            flat = y.reshape(-1)
            part = jnp.sum(co_val[0] * flat[co_idx[0]], axis=-1)
            return jax.lax.psum(part, "e")[: self.n_lagrange]

        return schur_c64

    def _schur_c32_shardmap(self):
        """Condensed all-f32 S kernel: one tiny [E,c,c] GEMV + one psum.

        Streams ``(c/n)^2`` of the bytes of the full-block f32 kernel per
        iteration and represents S to plain eps_f32 (see
        :meth:`_use_condensed`)."""

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(None),
                P("e", None, None),
                P("e", None),
                P("e", None, None),
                P("e", None, None),
            ),
            out_specs=P(None),
        )
        def schur_c32(lam32, d32, ce_rows, co_idx, co_val):
            lam_e = lam32[ce_rows]
            y = jnp.einsum("ekl,el->ek", d32, lam_e)
            flat = y.reshape(-1)
            part = jnp.sum(co_val[0] * flat[co_idx[0]], axis=-1)
            return jax.lax.psum(part, "e")[: self.n_lagrange]

        return schur_c32

    def _schur_c32x2_shardmap(self):
        """Condensed f32x2 S kernel: hi/lo [E,c,c] GEMV pair + one psum —
        for systems whose trace conditioning defeats the plain f32
        representation (the legacy ``accurate`` gate)."""

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(None),
                P("e", None, None),
                P("e", None, None),
                P("e", None),
                P("e", None, None),
                P("e", None, None),
            ),
            out_specs=P(None),
        )
        def schur_c32x2(lam32, d_hi, d_lo, ce_rows, co_idx, co_val):
            lam_e = lam32[ce_rows]
            y = jnp.einsum("ekl,el->ek", d_hi, lam_e) + jnp.einsum(
                "ekl,el->ek", d_lo, lam_e
            )
            flat = y.reshape(-1)
            part = jnp.sum(co_val[0] * flat[co_idx[0]], axis=-1)
            return jax.lax.psum(part, "e")[: self.n_lagrange]

        return schur_c32x2

    def _schur32_shardmap(self):
        """All-f32 S~ = G A~^{-1} G^T kernel (one f32 GEMV + one psum).

        ``A~^{-1}`` is the unrefined f32 explicit inverse — accurate to
        ~1e-7 relative, which is all the mixed-precision inner iteration
        needs (the outer f64 defect correction restores full accuracy).
        """

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
            ),
            out_specs=P(None),
        )
        def schur32(lam32, inv32, tr_elem, tr_dof, tr_val32, tt_rows, tt_val32):
            gt = self._trace_t_local(lam32, tt_rows, tt_val32)
            x = jnp.einsum("eij,ej->ei", inv32, gt)
            return self._trace_local(x, tr_elem, tr_dof, tr_val32)

        return schur32

    def _schur32x2_shardmap(self):
        """f32x2 S~ kernel: hi/lo inverse GEMV pair (two f32 GEMVs, one
        psum).  The hi product's systematic cond*eps_f32 bias cancels
        against the lo product, leaving only random GEMV rounding — the
        operator the inner Krylov sees is unbiased to ~eps_f32^2."""

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
            ),
            out_specs=P(None),
        )
        def schur32x2(
            lam32, hi, lo, tr_elem, tr_dof, tr_val32, tt_rows, tt_val32
        ):
            gt = self._trace_t_local(lam32, tt_rows, tt_val32)
            x = jnp.einsum("eij,ej->ei", hi, gt) + jnp.einsum(
                "eij,ej->ei", lo, gt
            )
            return self._trace_local(x, tr_elem, tr_dof, tr_val32)

        return schur32x2

    def trace_indefinite(self) -> bool:
        """Whether the trace Schur complement shows negative curvature.

        A short f32 CG probe on the inner operator (one jitted dispatch,
        ~32 matvecs); cached.  Indefinite systems (saddle formulations such
        as Stokes) are routed to large-restart GMRES — the CG recurrence is
        only semiconvergent on them (measured 18k+ inner iterations where
        the un-truncated GMRES space needs ~600; see solver/krylov.py).
        """
        cached = getattr(self, "_trace_indef", None)
        if cached is None:
            # Probe through the f32x2 operator when the plain f32 inverse
            # fails the cond*eps_f32 gate — its sign structure is
            # meaningless there.
            kern, tabs, _ = self._inner32_kernel(
                not getattr(self, "_inner32_ok", True)
            )
            cached = trace_indefinite_probe(kern, tabs, self.n_lagrange)
            self._trace_indef = cached
        return cached

    def _inner32_kernel(self, accurate: bool):
        """(kernel, tables, n_tables) for the inner f32 trace operator.

        The condensed kernel (default) supersedes both the plain-f32 and
        the f32x2 paths: it is cheaper than either AND more accurate than
        the f32x2 split (representation-only error), so ``accurate`` is
        moot when it is enabled.
        """
        if self._use_condensed():
            if accurate:
                return self._schur_c32x2_shardmap(), self._tables_c32x2, 5
            return self._schur_c32_shardmap(), self._tables_c32, 4
        if accurate:
            return self._schur32x2_shardmap(), self._tables32x2, 7
        return self._schur32_shardmap(), self._tables32, 6

    def make_fused_cg_mixed(
        self, maximum_iterations: int, accurate: bool = False
    ):
        """Mixed-precision device CG: f32 inner sweeps, f64 defect correction.

        ``accurate=True`` runs the inner sweeps on the f32x2 (hi/lo split)
        operator — for systems whose plain f32 inverse fails the
        cond*eps_f32 probe.
        """
        kern, tabs, n32 = self._inner32_kernel(accurate)
        cond = self._use_condensed()
        return _fused_mixed_factory(
            [self._schur_shardmap()],
            [kern],
            self._tables,
            tabs,
            maximum_iterations,
            method="cg",
            n32=n32,
            schurs_c64=[self._schur_c64_shardmap()] if cond else None,
            tables_c64=self._tables_c64 if cond else (),
        )

    def make_fused_gmres_mixed(
        self,
        maximum_iterations: int,
        restart: int | None = None,
        accurate: bool = False,
    ):
        """Mixed-precision device GMRES: f32 inner cycles, f64 defect correction.

        ``restart=None`` sizes the f32 Krylov space with ``auto_restart``
        (effectively un-truncated, memory-bounded); ``accurate=True`` uses
        the f32x2 inner operator (see ``make_fused_cg_mixed``).
        """
        kern, tabs, n32 = self._inner32_kernel(accurate)
        cond = self._use_condensed()
        return _fused_mixed_factory(
            [self._schur_shardmap()],
            [kern],
            self._tables,
            tabs,
            maximum_iterations,
            method="gmres",
            restart=restart,
            n32=n32,
            schurs_c64=[self._schur_c64_shardmap()] if cond else None,
            tables_c64=self._tables_c64 if cond else (),
        )

    def _schur_shardmap(self):
        """The shard_map'd S = G A^{-1} G^T kernel (one psum inside)."""

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(None),
                P("e", None, None),
                P("e", None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
            ),
            out_specs=P(None),
        )
        def schur(lam, lu, piv, blocks, tr_elem, tr_dof, tr_val, tt_rows, tt_val):
            gt = self._trace_t_local(lam, tt_rows, tt_val)
            ainv = self._block_solve(lu, piv, blocks, gt)
            return self._trace_local(ainv, tr_elem, tr_dof, tr_val)

        return schur

    def make_schur_matvec(self):
        """Jitted sharded S = G A^{-1} G^T matvec.

        Operator tables are jit ARGUMENTS, not closure captures — captured
        arrays are serialized with the computation, which the remote TPU
        compiler rejects for large systems.
        """
        schur = self._schur_shardmap()
        jitted = jax.jit(lambda lam, *tables: schur(lam, *tables))

        def matvec(lam):
            return jitted(lam, *self._tables)

        return matvec

    def make_fused_cg(self, maximum_iterations: int):
        """Device-resident CG on the Schur complement, chunked dispatches.

        Each dispatch runs a bounded while_loop segment on device (one
        psum per matvec riding the ICI; see ``_fused_cg_factory`` for the
        chunk adaptation); inside an enclosing trace the whole iteration
        becomes a single while_loop.  Returns ``(lambda, |r|^2,
        iterations)``.
        """
        return _fused_cg_factory(
            [self._schur_shardmap()],
            self._tables,
            maximum_iterations,
            chunk=_initial_chunk(self.blocks.nbytes),
        )

    def make_fused_gmres(
        self, maximum_iterations: int, restart: int | None = None
    ):
        """Device-resident restarted GMRES on the Schur complement.

        The trace Schur complement ``S = G A^{-1} G^T`` inherits A's
        symmetry: direct-form systems (0-form primal unknowns with one-way
        coupling blocks) make it *nonsymmetric*, where CG breaks down.
        GMRES(m) handles any nonsingular S with the same communication
        pattern (one psum per matvec); the Arnoldi loop, Givens rotations,
        and restarts all run inside one jitted computation.
        """
        return _fused_gmres_factory(
            [self._schur_shardmap()], self._tables, maximum_iterations, restart
        )

    def block_solve_sharded(self, rhs_sharded):
        """Sharded batched ``A^{-1} rhs`` ([E_pad, n] in, [E_pad, n] out)."""

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P("e", None, None),
                P("e", None),
                P("e", None, None),
                P("e", None),
            ),
            out_specs=P("e", None),
        )
        def solve(lu, piv, blocks, rhs):
            return self._block_solve(lu, piv, blocks, rhs)

        return solve(self.lu, self.piv, self.blocks, rhs_sharded)

    def trace_of(self, dofs_sharded):
        """Sharded ``G x`` -> replicated trace vector (one psum)."""

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P("e", None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
            ),
            out_specs=P(None),
        )
        def fn(dofs, tr_elem, tr_dof, tr_val):
            return self._trace_local(dofs, tr_elem, tr_dof, tr_val)

        return fn(dofs_sharded, self.tr_elem, self.tr_dof, self.tr_val)

    def trace_t_of(self, lam):
        """Replicated lambda -> sharded ``G^T lambda`` (no communication)."""

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(None), P("e", None, None), P("e", None, None)),
            out_specs=P("e", None),
        )
        def fn(lam_, tt_rows, tt_val):
            return self._trace_t_local(lam_, tt_rows, tt_val)

        return fn(lam, self.tt_rows, self.tt_val)

    def make_residual_step(self):
        """Jitted sharded saddle application: (u, lam) -> (A u + G^T lam, G u).

        This is the communication pattern of one full solve iteration: the
        element part is local, the trace part needs one psum.
        """
        per_dev = self.e_padded // self.n_devices
        n = self.n_dofs_per_element

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P("e", None),
                P(None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
                P("e", None, None),
            ),
            out_specs=(P("e", None), P(None)),
        )
        def step(dofs, lam, blocks, tr_elem, tr_dof, tr_val, tt_rows, tt_val):
            au = jnp.einsum("eij,ej->ei", blocks, dofs)
            gt = self._trace_t_local(lam, tt_rows, tt_val)
            trace = self._trace_local(dofs, tr_elem, tr_dof, tr_val)
            return au + gt, trace

        jitted = jax.jit(step)

        def apply_saddle(dofs, lam):
            # Tables as jit arguments (see make_schur_matvec).
            return jitted(
                dofs,
                lam,
                self.blocks,
                self.tr_elem,
                self.tr_dof,
                self.tr_val,
                self.tt_rows,
                self.tt_val,
            )

        return apply_saddle

    # -- data movement --------------------------------------------------

    def shard_dofs(self, flat: np.ndarray) -> jnp.ndarray:
        """Global flat DoF vector -> sharded [E_padded, n] batch."""
        arr = np.asarray(flat).reshape(self.e_real, self.n_dofs_per_element)
        arr = _pad_to_multiple(arr, self.n_devices)
        return jax.device_put(arr, self.dof_sharding)

    def unshard_dofs(self, dofs: jnp.ndarray) -> np.ndarray:
        """Sharded batch -> global flat DoF vector."""
        return np.asarray(dofs)[: self.e_real].reshape(-1)


def _sharded_saddle_solve(
    system: ShardedBlockSystem,
    b_sharded,
    constraints,
    maximum_iterations: int,
    tolerance: float,
    method: str = "cg",
):
    """Sharded saddle solve: returns (u_sharded, lam, |r|, iters).

    Schur RHS, the fused device Krylov loop, and the back substitution —
    all element work stays sharded; the only host sync is the final result
    fetch.  ``method="cg"`` requires a definite trace Schur complement
    (mixed forms); ``"gmres"`` handles the general (nonsymmetric /
    indefinite) case such as direct-form systems.
    """
    ainv_b = system.block_solve_sharded(b_sharded)
    trace_rhs = system.trace_of(ainv_b) - jnp.asarray(constraints)
    krylov = _trace_krylov(system, method, maximum_iterations)
    lam, rs, iters = krylov(trace_rhs, tolerance)
    u = system.block_solve_sharded(b_sharded - system.trace_t_of(lam))
    return u, lam, float(np.sqrt(float(rs))), int(iters)


def sharded_schur_solve(
    system: ShardedBlockSystem,
    rhs_flat: np.ndarray,
    constraints: np.ndarray,
    maximum_iterations: int,
    tolerance: float,
    method: str = "cg",
):
    """Krylov solve on the sharded Schur complement; element work sharded.

    The iteration runs on device in bounded chunks (one psum per matvec,
    no host round-trip per iteration); on TPU backends the mixed
    f32-inner path is used where the blocks' conditioning allows.  Use
    ``method="gmres"`` for direct-form systems (nonsymmetric trace Schur
    complement).
    """
    b = system.shard_dofs(rhs_flat)
    u, lam, res, iters = _sharded_saddle_solve(
        system, b, constraints, maximum_iterations, tolerance, method
    )
    return system.unshard_dofs(u), np.asarray(lam), res, iters


def _flat_from_sharded(disc, subs, us_now):
    """Gather per-bucket sharded DoFs into the flat global layout."""
    out = np.zeros(disc.n_dofs)
    for (bucket, sub), u in zip(subs, us_now):
        out[bucket.gather.reshape(-1)] = sub.unshard_dofs(u)
    return out


def _sharded_nonlinear_iterate(
    disc,
    msys,
    residual_fns,
    bases,
    c_t,
    us,
    lam,
    krylov,
    *,
    maximum_iterations: int,
    relax: float,
    absolute_tolerance: float,
    relative_tolerance: float,
    max_mag: float,
    cg_tolerance: float,
    anderson_m: int = 0,
    newton_ctx: dict | None = None,
    sg=None,
    unresolved=None,
    checkpoint_cb=None,
):
    """One nonlinear solve over the sharded saddle system, host-driven.

    The shared inner loop of every sharded nonlinear entry point — steady
    Picard, exact-Newton, VMS-stabilized, and the per-step solves of the
    host-driven time march.  Mirrors the single-device
    ``non_linear_solve_run`` semantics (reference
    python/mfv2d/solve_system.py:354): residual of the current iterate
    (minus the VMS fine-scale forcing when ``sg`` is given), correction by
    the frozen Schur factorization (or, for ``newton_ctx``, a per-iteration
    rebuilt exact ``jacfwd`` Jacobian from the second step on), optional
    guarded type-II Anderson extrapolation.

    ``newton_ctx`` carries ``jac_fns, lagrange_mat, device_mesh,
    krylov_method, cg_max`` for the Jacobian rebuilds.  ``checkpoint_cb``
    is called per accepted iterate as ``cb(it, flat_solution, lam,
    unresolved)``.

    Returns ``(us, lam, residuals, unresolved)``.
    """
    subs = msys.subsystems
    newton = newton_ctx is not None
    residuals: list[float] = []
    aa_x: list[np.ndarray] = []
    aa_f: list[np.ndarray] = []

    for it in range(maximum_iterations):
        if sg is not None:
            u_global = _flat_from_sharded(disc, subs, us)
            with tracer.stage("svms-advection-update"):
                sg.update_nonlinear_advection(u_global)
            with tracer.stage("svms-unresolved"):
                unresolved = sg.compute_unresolved_contributions(
                    u_global, unresolved
                )
            vms_coarse = sg._project_to_coarse(unresolved)
        r_elems = []
        r_trace = c_t
        max_res = 0.0
        for (bucket, sub), fn, u, b in zip(subs, residual_fns, us, bases):
            r_elem, g_u = fn(u, lam, b)
            if sg is not None:
                r_elem = r_elem - sub.shard_dofs(
                    vms_coarse[bucket.gather.reshape(-1)]
                )
            r_elems.append(r_elem)
            r_trace = r_trace - g_u
            max_res = max(max_res, float(jnp.abs(r_elem[: sub.e_real]).max()))
        if msys.n_lagrange:
            max_res = max(max_res, float(jnp.abs(r_trace).max()))
        residuals.append(max_res)
        if max_res <= absolute_tolerance or max_res <= max_mag * relative_tolerance:
            break

        if newton and it > 0:
            # Exact-Newton: rebuild + refactorize the per-element jacfwd
            # Jacobian at the current iterate (trace tables are
            # geometry/constraint-only and identical every iteration).
            jac_blocks = [
                fn(u) for fn, u in zip(newton_ctx["jac_fns"], us)
            ]
            sys_it = MultiBucketShardedSystem(
                disc,
                jac_blocks,
                newton_ctx["lagrange_mat"],
                newton_ctx["device_mesh"],
                _prepadded_device=True,
            )
            krylov_it = _trace_krylov(
                sys_it, newton_ctx["krylov_method"], newton_ctx["cg_max"]
            )
            it_subs = sys_it.subsystems
        else:
            it_subs, krylov_it = subs, krylov

        trace_rhs = -r_trace
        for (_, sub), r in zip(it_subs, r_elems):
            trace_rhs = trace_rhs + sub.trace_of(sub.block_solve_sharded(r))
        dlam, _, _ = krylov_it(trace_rhs, cg_tolerance)
        dus = [
            sub.block_solve_sharded(r - sub.trace_t_of(dlam))
            for (_, sub), r in zip(it_subs, r_elems)
        ]
        if anderson_m > 0 and not newton:
            # Guarded type-II extrapolation over (u_1..u_B, lam) — same
            # scheme as the single-chip non_linear_solve_run.
            x_k = np.concatenate(
                [np.asarray(u).reshape(-1) for u in us] + [np.asarray(lam)]
            )
            f_k = relax * np.concatenate(
                [np.asarray(du).reshape(-1) for du in dus]
                + [np.asarray(dlam)]
            )
            if len(residuals) >= 2 and residuals[-1] > residuals[-2]:
                aa_x.clear()
                aa_f.clear()
            aa_x.append(x_k)
            aa_f.append(f_k)
            if len(aa_x) > anderson_m + 1:
                aa_x.pop(0)
                aa_f.pop(0)
            x_new = x_k + f_k
            if len(aa_f) > 1:
                df = np.stack(
                    [aa_f[i + 1] - aa_f[i] for i in range(len(aa_f) - 1)],
                    axis=1,
                )
                dx = np.stack(
                    [aa_x[i + 1] - aa_x[i] for i in range(len(aa_x) - 1)],
                    axis=1,
                )
                gamma, *_ = np.linalg.lstsq(df, f_k, rcond=1e-10)
                if np.abs(gamma).max() <= 25.0:
                    x_new = x_k + f_k - (dx + df) @ gamma
            lo = 0
            new_us = []
            for (bucket, sub), u in zip(subs, us):
                n_u = np.asarray(u).size
                new_us.append(
                    jax.device_put(
                        x_new[lo : lo + n_u].reshape(np.asarray(u).shape),
                        sub.dof_sharding,
                    )
                )
                lo += n_u
            us = new_us
            lam = jnp.asarray(x_new[lo:])
        else:
            us = [u + relax * du for u, du in zip(us, dus)]
            lam = lam + relax * dlam
        if checkpoint_cb is not None:
            checkpoint_cb(
                it + 1,
                _flat_from_sharded(disc, subs, us),
                np.asarray(lam),
                unresolved,
            )
    return us, lam, residuals, unresolved


def sharded_steady_solve(
    system,
    disc: Discretization,
    device_mesh: Mesh,
    *,
    boundary_conditions=(),
    constrained_forms=(),
    maximum_iterations: int = 20,
    relax: float = 1.0,
    absolute_tolerance: float = 1e-10,
    relative_tolerance: float = 0.0,
    cg_maximum_iterations: int = 2000,
    cg_tolerance: float = 1e-13,
    krylov_method: str = "cg",
    initial_solution=None,
    initial_lagrange=None,
    checkpoint_cb=None,
):
    """Fully sharded steady solve: assembly -> Picard -> Schur Krylov.

    Every element-sized object (corners, matrices, factorizations, DoFs,
    residuals) lives sharded over the device mesh for the whole solve; the
    only replicated data is the trace (lambda) vector, reduced by one psum
    per matvec / residual.  hp meshes run one sharded subsystem per order
    bucket (one psum per bucket per matvec).  Host work is limited to
    constraint generation and the per-Picard-iteration convergence check.

    Returns ``(solution_flat, lam, residual_history)``.
    """
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.continuity import add_system_constraints
    from mfv2d_tpu.solver.solve import compute_forcing_vector

    compiled = CompiledSystem(system)
    form_spec = system.unknown_forms

    # Host: forcing projections + constraint rows (weak BCs add in place).
    forcing = compute_forcing_vector(disc, system)
    linear_vectors = [
        forcing[disc.element_offsets[i] : disc.element_offsets[i + 1]]
        for i in range(disc.n_leaves)
    ]
    lagrange_mat, lagrange_vec = add_system_constraints(
        system,
        disc.mesh,
        disc.basis_cache,
        list(constrained_forms),
        list(boundary_conditions),
        disc.leaf_indices,
        disc.element_offsets,
        linear_vectors,
    )

    # Device: sharded assembly of the frozen (linear) operator per bucket.
    msys = MultiBucketShardedSystem.from_assembly(
        disc, compiled.linear_blocks, lagrange_mat, device_mesh
    )
    subs = msys.subsystems
    residual_fns = [
        sub.make_picard_residual(
            form_spec, compiled.lhs_blocks, compiled.rhs_blocks
        )
        for _, sub in subs
    ]
    krylov = _trace_krylov(msys, krylov_method, cg_maximum_iterations)

    bs = [
        sub.shard_dofs(np.asarray(forcing)[bucket.gather].reshape(-1))
        for bucket, sub in subs
    ]
    if initial_solution is None:
        us = [jnp.zeros_like(b) for b in bs]
    else:
        sol = np.asarray(initial_solution)
        us = [
            sub.shard_dofs(sol[bucket.gather].reshape(-1))
            for bucket, sub in subs
        ]
    lam = (
        jnp.zeros(msys.n_lagrange)
        if initial_lagrange is None
        else jnp.asarray(initial_lagrange)
    )
    c_vec = jnp.asarray(lagrange_vec)

    def _flat(us_now):
        out = np.zeros(disc.n_dofs)
        for (bucket, sub), u in zip(subs, us_now):
            out[bucket.gather.reshape(-1)] = sub.unshard_dofs(u)
        return out

    # Hoisted: the forcing (and constraint data) never change, so the
    # relative-tolerance scale is a constant — recomputing it inside the
    # loop cost one device reduction + host sync per bucket per iteration.
    max_mag = max(
        (float(jnp.abs(b).max()) for b in bs),
        default=0.0,
    )
    if msys.n_lagrange:
        max_mag = max(max_mag, float(jnp.abs(c_vec).max()))
    us, lam, residuals, _ = _sharded_nonlinear_iterate(
        disc,
        msys,
        residual_fns,
        bs,
        c_vec,
        us,
        lam,
        krylov,
        maximum_iterations=maximum_iterations,
        relax=relax,
        absolute_tolerance=absolute_tolerance,
        relative_tolerance=relative_tolerance,
        max_mag=max_mag,
        cg_tolerance=cg_tolerance,
        checkpoint_cb=checkpoint_cb,
    )
    return _flat(us), np.asarray(lam), np.asarray(residuals)


def sharded_newton_steady_solve(
    system,
    disc: Discretization,
    device_mesh: Mesh,
    *,
    boundary_conditions=(),
    constrained_forms=(),
    maximum_iterations: int = 20,
    relax: float = 1.0,
    absolute_tolerance: float = 1e-10,
    relative_tolerance: float = 0.0,
    cg_maximum_iterations: int = 2000,
    cg_tolerance: float = 1e-13,
    krylov_method: str = "cg",
    initial_solution=None,
    initial_lagrange=None,
    checkpoint_cb=None,
):
    """Fully sharded exact-Newton steady solve.

    Semantics match the single-device ``non_linear_solve_run(newton=True)``
    / ``fused_newton_solve``: the first correction uses the assembled
    (frozen) operator, subsequent ones refactor the exact per-element
    ``jacfwd`` Jacobian at the current iterate.  Each Newton step rebuilds
    the per-bucket sharded systems from the new Jacobian blocks (the trace
    tables are geometry/constraint-only and identical every iteration;
    only the factorizations change) — the sharded analogue of the
    single-device dense refactorization, paid once per Newton step.  Note
    the rebuilt trace-Krylov runner re-traces its fused loop per
    iteration; Newton's per-step factorization dominates that cost at the
    element counts where Newton is preferred over Picard.

    Returns ``(solution_flat, lam, residual_history)``.
    """
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.continuity import add_system_constraints
    from mfv2d_tpu.solver.solve import compute_forcing_vector

    compiled = CompiledSystem(system)
    form_spec = system.unknown_forms

    forcing = compute_forcing_vector(disc, system)
    linear_vectors = [
        forcing[disc.element_offsets[i] : disc.element_offsets[i + 1]]
        for i in range(disc.n_leaves)
    ]
    lagrange_mat, lagrange_vec = add_system_constraints(
        system,
        disc.mesh,
        disc.basis_cache,
        list(constrained_forms),
        list(boundary_conditions),
        disc.leaf_indices,
        disc.element_offsets,
        linear_vectors,
    )

    msys = MultiBucketShardedSystem.from_assembly(
        disc, compiled.linear_blocks, lagrange_mat, device_mesh
    )
    subs = msys.subsystems
    residual_fns = [
        sub.make_picard_residual(
            form_spec, compiled.lhs_blocks, compiled.rhs_blocks
        )
        for _, sub in subs
    ]
    jac_fns = [
        sub.make_newton_jacobian(
            form_spec, compiled.lhs_blocks, compiled.rhs_blocks
        )
        for _, sub in subs
    ]
    krylov0 = _trace_krylov(msys, krylov_method, cg_maximum_iterations)

    bs = [
        sub.shard_dofs(np.asarray(forcing)[bucket.gather].reshape(-1))
        for bucket, sub in subs
    ]
    if initial_solution is None:
        us = [jnp.zeros_like(b) for b in bs]
    else:
        sol = np.asarray(initial_solution)
        us = [
            sub.shard_dofs(sol[bucket.gather].reshape(-1))
            for bucket, sub in subs
        ]
    lam = (
        jnp.zeros(msys.n_lagrange)
        if initial_lagrange is None
        else jnp.asarray(initial_lagrange)
    )
    c_vec = jnp.asarray(lagrange_vec)

    max_mag = max((float(jnp.abs(b).max()) for b in bs), default=0.0)
    if msys.n_lagrange:
        max_mag = max(max_mag, float(jnp.abs(c_vec).max()))
    us, lam, residuals, _ = _sharded_nonlinear_iterate(
        disc,
        msys,
        residual_fns,
        bs,
        c_vec,
        us,
        lam,
        krylov0,
        maximum_iterations=maximum_iterations,
        relax=relax,
        absolute_tolerance=absolute_tolerance,
        relative_tolerance=relative_tolerance,
        max_mag=max_mag,
        cg_tolerance=cg_tolerance,
        newton_ctx={
            "jac_fns": jac_fns,
            "lagrange_mat": lagrange_mat,
            "device_mesh": device_mesh,
            "krylov_method": krylov_method,
            "cg_max": cg_maximum_iterations,
        },
        checkpoint_cb=checkpoint_cb,
    )
    return (
        _flat_from_sharded(disc, subs, us),
        np.asarray(lam),
        np.asarray(residuals),
    )


class MultiBucketShardedSystem:
    """hp-mesh sharding: one element-sharded block system per order bucket.

    Each bucket's elements are distributed over the same device mesh; the
    Schur matvec sums the per-bucket ``G A^{-1} G^T`` contributions, each of
    which ends in a psum, so lambda stays replicated.  Bucket matvecs are
    issued back-to-back and overlap across the mesh.
    """

    @staticmethod
    def _bucket_view(disc, bucket, lagrange_mat, n_lag):
        """Single-bucket Discretization view + bucket-local constraint block.

        Column indices are relative to the bucket's own flat DoF vector
        (elements packed contiguously); constraint rows keep their GLOBAL
        numbering so per-bucket trace products sum into one lambda.
        """
        from mfv2d_tpu.solver.discretization import Discretization as _D

        e, n = bucket.gather.shape
        sub_disc = _D(
            mesh=disc.mesh,
            form_spec=disc.form_spec,
            basis_cache=disc.basis_cache,
            leaf_indices=tuple(
                disc.leaf_indices[int(r)] for r in bucket.leaf_ranks
            ),
            element_orders=disc.element_orders[bucket.leaf_ranks],
            element_sizes=np.full(e, n, np.int64),
            element_offsets=np.arange(e + 1, dtype=np.int64) * n,
            buckets=[bucket],
        )
        if lagrange_mat is not None:
            coo = lagrange_mat.tocoo()
            col_map = np.full(disc.n_dofs, -1, np.int64)
            flat = bucket.gather.reshape(-1)
            col_map[flat] = np.arange(flat.size)
            sel = col_map[coo.col] >= 0
            sub_g = sp.csr_array(
                (
                    coo.data[sel],
                    (coo.row[sel], col_map[coo.col[sel]]),
                ),
                shape=(n_lag, e * n),
            )
        else:
            sub_g = None
        # The sub-bucket's gather map is the identity layout.
        local_bucket = type(bucket)(
            orders=bucket.orders,
            leaf_ranks=np.arange(e),
            batch=bucket.batch,
            gather=np.arange(e * n, dtype=np.int64).reshape(e, n),
        )
        sub_disc.buckets = [local_bucket]
        return sub_disc, sub_g

    def __init__(
        self,
        disc: Discretization,
        element_matrices: list[np.ndarray],
        lagrange_mat: sp.csr_array | None,
        mesh: Mesh,
        _prepadded_device: bool = False,
    ) -> None:
        self.n_lagrange = 0 if lagrange_mat is None else lagrange_mat.shape[0]
        self.subsystems = []
        for bucket, mats in zip(disc.buckets, element_matrices):
            sub_disc, sub_g = self._bucket_view(
                disc, bucket, lagrange_mat, self.n_lagrange
            )
            self.subsystems.append(
                (
                    bucket,
                    ShardedBlockSystem(
                        sub_disc,
                        mats,
                        sub_g,
                        mesh,
                        _prepadded_device=_prepadded_device,
                    ),
                )
            )
        self.disc = disc

    @classmethod
    def from_assembly(
        cls,
        disc: Discretization,
        blocks_ir,
        lagrange_mat: sp.csr_array | None,
        mesh: Mesh,
    ) -> "MultiBucketShardedSystem":
        """Per-device element assembly for every bucket (hp meshes).

        Each bucket's elements shard over the same device mesh and assemble
        locally (the fused pair-table path), exactly like the single-bucket
        :meth:`ShardedBlockSystem.from_assembly`.
        """
        obj = cls.__new__(cls)
        obj.n_lagrange = 0 if lagrange_mat is None else lagrange_mat.shape[0]
        obj.subsystems = []
        for bucket in disc.buckets:
            sub_disc, sub_g = cls._bucket_view(
                disc, bucket, lagrange_mat, obj.n_lagrange
            )
            obj.subsystems.append(
                (
                    bucket,
                    ShardedBlockSystem.from_assembly(
                        sub_disc, blocks_ir, sub_g, mesh
                    ),
                )
            )
        obj.disc = disc
        return obj

    def make_schur_matvec(self):
        fns = [sub.make_schur_matvec() for _, sub in self.subsystems]

        def matvec(lam):
            out = None
            for fn in fns:
                v = fn(lam)
                out = v if out is None else out + v
            return out

        return matvec

    def make_fused_cg(self, maximum_iterations: int):
        """Chunked device CG over all buckets (one psum per bucket
        per matvec)."""
        return _fused_cg_factory(
            [sub._schur_shardmap() for _, sub in self.subsystems],
            tuple(t for _, sub in self.subsystems for t in sub._tables),
            maximum_iterations,
            chunk=_initial_chunk(
                sum(sub.blocks.nbytes for _, sub in self.subsystems)
            ),
        )

    def make_fused_gmres(
        self, maximum_iterations: int, restart: int | None = None
    ):
        """One jitted restarted GMRES over all buckets (nonsymmetric S)."""
        return _fused_gmres_factory(
            [sub._schur_shardmap() for _, sub in self.subsystems],
            tuple(t for _, sub in self.subsystems for t in sub._tables),
            maximum_iterations,
            restart,
        )

    @property
    def _inner32_ok(self):
        return all(getattr(sub, "_inner32_ok", True) for _, sub in self.subsystems)

    def trace_indefinite(self) -> bool:
        """Negative-curvature probe over the summed multi-bucket operator.

        Same contract as :meth:`ShardedBlockSystem.trace_indefinite`.
        """
        cached = getattr(self, "_trace_indef", None)
        if cached is None:
            kerns, tabs, n32 = self._inner32_parts(not self._inner32_ok)
            cached = trace_indefinite_probe(
                lambda v, *t: _sum_matvec(kerns, t, n32)(v),
                tabs,
                self.n_lagrange,
            )
            self._trace_indef = cached
        return cached

    def _inner32_parts(self, accurate: bool):
        subs = [sub for _, sub in self.subsystems]
        if all(sub._use_condensed() for sub in subs):
            if accurate:
                return (
                    [sub._schur_c32x2_shardmap() for sub in subs],
                    tuple(t for sub in subs for t in sub._tables_c32x2),
                    5,
                )
            return (
                [sub._schur_c32_shardmap() for sub in subs],
                tuple(t for sub in subs for t in sub._tables_c32),
                4,
            )
        if accurate:
            return (
                [sub._schur32x2_shardmap() for sub in subs],
                tuple(t for sub in subs for t in sub._tables32x2),
                7,
            )
        return (
            [sub._schur32_shardmap() for sub in subs],
            tuple(t for sub in subs for t in sub._tables32),
            6,
        )

    def _c64_parts(self):
        """(kernels, tables) for the condensed f64 intermediate residual,
        or (None, ()) when any bucket has condensation disabled."""
        subs = [sub for _, sub in self.subsystems]
        if not all(sub._use_condensed() for sub in subs):
            return None, ()
        return (
            [sub._schur_c64_shardmap() for sub in subs],
            tuple(t for sub in subs for t in sub._tables_c64),
        )

    def make_fused_cg_mixed(
        self, maximum_iterations: int, accurate: bool = False
    ):
        """Mixed-precision multi-bucket CG (f32 inner, f64 defect correction)."""
        kerns, tabs, n32 = self._inner32_parts(accurate)
        c64_kerns, c64_tabs = self._c64_parts()
        return _fused_mixed_factory(
            [sub._schur_shardmap() for _, sub in self.subsystems],
            kerns,
            tuple(t for _, sub in self.subsystems for t in sub._tables),
            tabs,
            maximum_iterations,
            method="cg",
            n32=n32,
            schurs_c64=c64_kerns,
            tables_c64=c64_tabs,
        )

    def make_fused_gmres_mixed(
        self,
        maximum_iterations: int,
        restart: int | None = None,
        accurate: bool = False,
    ):
        """Mixed-precision multi-bucket GMRES (f32 inner, f64 defect correction)."""
        kerns, tabs, n32 = self._inner32_parts(accurate)
        c64_kerns, c64_tabs = self._c64_parts()
        return _fused_mixed_factory(
            [sub._schur_shardmap() for _, sub in self.subsystems],
            kerns,
            tuple(t for _, sub in self.subsystems for t in sub._tables),
            tabs,
            maximum_iterations,
            method="gmres",
            restart=restart,
            n32=n32,
            schurs_c64=c64_kerns,
            tables_c64=c64_tabs,
        )

    def schur_rhs(self, rhs_flat: np.ndarray, constraints: np.ndarray):
        """G A^{-1} b - c across buckets."""
        total = -jnp.asarray(constraints)
        self._ainv_b = []
        for bucket, sub in self.subsystems:
            b = np.asarray(rhs_flat)[bucket.gather].reshape(-1)
            b_sh = sub.shard_dofs(b)
            ainv = sub._block_solve(sub.lu, sub.piv, sub.blocks, b_sh)
            self._ainv_b.append(ainv)
            from jax.sharding import PartitionSpec as P

            @partial(
                jax.shard_map,
                mesh=sub.mesh,
                in_specs=(
                    P("e", None),
                    P("e", None, None),
                    P("e", None, None),
                    P("e", None, None),
                ),
                out_specs=P(None),
            )
            def trace_of(dofs, te, td, tv):
                return sub._trace_local(dofs, te, td, tv)

            total = total + trace_of(ainv, sub.tr_elem, sub.tr_dof, sub.tr_val)
        return total

    def solve_schur(
        self, rhs_flat, constraints, maximum_iterations, tolerance,
        krylov=None,
    ):
        """CG on the multi-bucket Schur complement (fused device loop).

        Pass a cached ``_trace_krylov(self, ...)`` runner via ``krylov``
        when calling repeatedly (the sharded VMS Green's applies) —
        building the runner per call would retrace the fused loop every
        time.
        """
        trace_rhs = self.schur_rhs(rhs_flat, constraints)
        if krylov is None:
            krylov = _trace_krylov(self, "cg", maximum_iterations)
        lam, rs, iters = krylov(trace_rhs, tolerance)
        mag2 = float(rs)
        iters = int(iters)

        # Back substitution per bucket.
        out = np.zeros(self.disc.n_dofs)
        for (bucket, sub), ainv_b in zip(self.subsystems, self._ainv_b):
            from jax.sharding import PartitionSpec as P

            per_dev = sub.e_padded // sub.n_devices
            n = sub.n_dofs_per_element

            @partial(
                jax.shard_map,
                mesh=sub.mesh,
                in_specs=(
                    P(None),
                    P("e", None, None),
                    P("e", None),
                    P("e", None, None),
                    P("e", None),
                    P("e", None, None),
                    P("e", None, None),
                ),
                out_specs=P("e", None),
            )
            def backsub(lam_, lu, piv, blocks, ainv, ttr, ttv):
                gt_local = sub._trace_t_local(lam_, ttr, ttv)
                corr = sub._block_solve(lu, piv, blocks, gt_local)
                return ainv - corr

            u_local = backsub(
                lam,
                sub.lu,
                sub.piv,
                sub.blocks,
                ainv_b,
                sub.tt_rows,
                sub.tt_val,
            )
            out[bucket.gather.reshape(-1)] = sub.unshard_dofs(u_local)
        return out, np.asarray(lam), float(np.sqrt(mag2)), iters


def _dual_mass_blocks(sharded: ShardedBlockSystem, form_spec):
    """Sharded block-diagonal per-element mass matrices (dual application).

    Assembled per device from the sharded corners; padding elements hold
    identity blocks so batched GEMVs stay no-ops there.
    """
    from mfv2d_tpu.evaluation import ElementBatch

    basis = sharded.basis
    n = sharded.n_dofs_per_element
    bucket_orders = (basis.basis_xi.order, basis.basis_eta.order)
    offsets = form_spec.form_offsets(*bucket_orders)

    @partial(jax.shard_map, mesh=sharded.mesh,
             in_specs=(P("e", None, None),), out_specs=P("e", None, None))
    def build_mass(corners_local):
        batch = ElementBatch(basis, corners_local)
        e = batch.n_elements
        big = jnp.zeros((e, n, n), batch.jac.det.dtype)
        for i in range(len(form_spec)):
            m = batch.mass(form_spec[i][1], False)
            big = big.at[
                :, offsets[i] : offsets[i + 1], offsets[i] : offsets[i + 1]
            ].set(m)
        return big

    mass_blocks = build_mass(sharded.corners_padded)
    if sharded.e_padded > sharded.e_real:
        mass_blocks = mass_blocks.at[sharded.e_real :].set(
            jnp.eye(n, dtype=mass_blocks.dtype)
        )
    return mass_blocks


def _elementwise_gemv(device_mesh: Mesh):
    """Sharded ``[E, n, n] @ [E, n] -> [E, n]`` kernel."""

    @partial(jax.shard_map, mesh=device_mesh,
             in_specs=(P("e", None, None), P("e", None)),
             out_specs=P("e", None))
    def block_gemv(blocks, x):
        return jnp.einsum("eij,ej->ei", blocks, x)

    return block_gemv


def _march_prologue(
    system, disc, device_mesh, time_settings, boundary_conditions,
    constrained_forms, unsteady_bcs=None, has_td_rhs=False,
):
    """Shared march setup: compile, constraints, sharded assembly, carry maps.

    Returns ``(compiled, msys, b_elems, c_vec, carry_cols, mass_blocks,
    block_gemv, sample_steps, slots, c_steps, b_steps)`` with one entry per
    order bucket in the per-bucket lists.

    ``unsteady_bcs`` (the ORIGINAL boundary-condition list containing
    ``BoundaryCondition2DUnsteady`` entries) and ``has_td_rhs``
    (``TimeDependent`` forcing present) switch on per-step data: the
    constraint ROWS are time-independent, so only the constraint values
    (``c_steps [nt, n_lag]``) and — when weak BCs or forcing vary — the
    per-bucket forcing (``b_steps``, each ``[nt, e_padded, n]`` sharded)
    are precomputed host-side and fed to the march scan as per-step
    inputs.  Both are None for autonomous (time-invariant) data, keeping
    the static-march memory profile.  Mirrors the single-device per-step
    rebuild, solve_system_2d.py (reference
    python/mfv2d/solve_system_2d.py:325-397 carry scheme).
    """
    from mfv2d_tpu.boundary import freeze_unsteady_boundary_conditions
    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.continuity import add_system_constraints
    from mfv2d_tpu.kform import TimeDependent
    from mfv2d_tpu.solver.fused import _sample_slots
    from mfv2d_tpu.solver.solve import (
        compute_forcing_vector,
        find_time_carry_indices,
    )
    from mfv2d_tpu.solve_system_2d import update_system_for_time_march

    marched = update_system_for_time_march(time_settings, system)
    compiled = CompiledSystem(marched)
    form_spec = marched.unknown_forms
    # Time-dependent OPERATOR coefficients would need per-step sharded
    # reassembly of the frozen blocks; fail loudly like the single-device
    # path instead of silently freezing them.
    if any(isinstance(f, TimeDependent) for f in compiled.fields):
        raise NotImplementedError(
            "TimeDependent interior-product (operator) fields are not yet"
            " supported in sharded marches (they would re-assemble and"
            " re-factorize the sharded blocks every step).  The"
            " single-device path supports them: drop device_mesh from"
            " SolverSettings."
        )

    has_unsteady = bool(unsteady_bcs) or has_td_rhs
    dt = time_settings.dt
    nt = time_settings.nt
    # The trapezoidal carry seed is the t = 0 forcing (f^0 contribution);
    # with TimeDependent forcing that differs from the step-0 solve's
    # t = dt forcing, mirroring the single-device setup which assembles at
    # t = 0 and rebuilds at t = dt before the first solve.
    forcing0 = None
    if has_td_rhs:
        TimeDependent.current_time = 0.0
        forcing0 = compute_forcing_vector(disc, marched)
        TimeDependent.current_time = dt
    forcing = compute_forcing_vector(disc, marched)
    forcing_raw = forcing.copy() if has_td_rhs else None
    linear_vectors = [
        forcing[disc.element_offsets[i] : disc.element_offsets[i + 1]]
        for i in range(disc.n_leaves)
    ]
    bcs0 = (
        freeze_unsteady_boundary_conditions(list(unsteady_bcs), dt)
        if unsteady_bcs
        else list(boundary_conditions)
    )
    lagrange_mat, lagrange_vec = add_system_constraints(
        marched,
        disc.mesh,
        disc.basis_cache,
        list(constrained_forms),
        bcs0,
        disc.leaf_indices,
        disc.element_offsets,
        linear_vectors,
    )
    if has_td_rhs:
        # Carry the weak-BC additions (in-place deltas from the constraint
        # assembly above) over to the t = 0 carry-seed forcing, matching
        # the single-device explicit_vec composition.
        forcing0 = forcing0 + (forcing - forcing_raw)
    else:
        forcing0 = forcing
    c_steps = None
    forcing_steps = None
    if has_unsteady:
        # Step i solves for t = (i + 1) dt.  Step 0 reuses the arrays
        # computed above (weak-BC additions included in `forcing`).
        c_steps = np.empty((nt, lagrange_vec.size))
        c_steps[0] = lagrange_vec
        forcing_steps = [forcing]
        pure_forcing = (
            None if has_td_rhs else compute_forcing_vector(disc, marched)
        )
        for ti in range(1, nt):
            t = (ti + 1) * dt
            if has_td_rhs:
                TimeDependent.current_time = t
                forcing_t = compute_forcing_vector(disc, marched)
            else:
                forcing_t = pure_forcing.copy()
            vec_views = [
                forcing_t[disc.element_offsets[i] : disc.element_offsets[i + 1]]
                for i in range(disc.n_leaves)
            ]
            _, vec_t = add_system_constraints(
                marched,
                disc.mesh,
                disc.basis_cache,
                list(constrained_forms),
                freeze_unsteady_boundary_conditions(list(unsteady_bcs or ()), t),
                disc.leaf_indices,
                disc.element_offsets,
                vec_views,
            )
            c_steps[ti] = vec_t
            forcing_steps.append(forcing_t)
        if all(np.array_equal(f, forcing_steps[0]) for f in forcing_steps[1:]):
            # Strong-BC-only unsteadiness: the element forcing is constant
            # and only the constraint values march — drop the big buffer.
            forcing_steps = None
        if np.ptp(c_steps, axis=0).max(initial=0.0) == 0.0:
            c_steps = None
    msys = MultiBucketShardedSystem.from_assembly(
        disc, compiled.linear_blocks, lagrange_mat, device_mesh
    )

    march_indices = tuple(
        sorted(
            marched.weight_forms.index(form)
            for form in time_settings.time_march_relations
        )
    )
    b_elems, carry_cols, mass_blocks = [], [], []
    for bucket, sub in msys.subsystems:
        p1, p2 = bucket.orders
        carry_cols.append(
            jnp.asarray(
                find_time_carry_indices(march_indices, form_spec, p1, p2),
                jnp.int32,
            )
        )
        b_elems.append(
            sub.shard_dofs(np.asarray(forcing)[bucket.gather].reshape(-1))
        )
        mass_blocks.append(_dual_mass_blocks(sub, form_spec))
    if forcing0 is forcing:
        b0_elems = list(b_elems)
    else:
        b0_elems = [
            sub.shard_dofs(np.asarray(forcing0)[bucket.gather].reshape(-1))
            for bucket, sub in msys.subsystems
        ]
    b_steps = None
    if forcing_steps is not None:
        b_steps = tuple(
            jnp.stack(
                [
                    sub.shard_dofs(f[bucket.gather].reshape(-1))
                    for f in forcing_steps
                ]
            )
            for bucket, sub in msys.subsystems
        )
    block_gemv = _elementwise_gemv(device_mesh)
    c_vec = jnp.asarray(lagrange_vec)
    sample_steps, slots = _sample_slots(
        time_settings.nt, time_settings.sample_rate
    )
    return (
        compiled,
        form_spec,
        msys,
        tuple(b_elems),
        c_vec,
        tuple(carry_cols),
        tuple(mass_blocks),
        block_gemv,
        sample_steps,
        jnp.asarray(slots),
        None if c_steps is None else jnp.asarray(c_steps),
        b_steps,
        tuple(b0_elems),
        marched,
        lagrange_mat,
    )


def _march_gather_samples(msys, bufs, sample_steps, n_dofs):
    """Per-bucket sample buffers -> flat global solutions [S, n_dofs]."""
    out = np.zeros((len(sample_steps), n_dofs))
    for (bucket, sub), buf in zip(msys.subsystems, bufs):
        arr = np.asarray(buf)
        for s_i in range(len(sample_steps)):
            out[s_i][bucket.gather.reshape(-1)] = arr[s_i][
                : sub.e_real
            ].reshape(-1)
    return out


def sharded_time_march(
    system,
    disc: Discretization,
    device_mesh: Mesh,
    time_settings,
    *,
    boundary_conditions=(),
    constrained_forms=(),
    cg_maximum_iterations: int = 2000,
    cg_tolerance: float = 1e-12,
    krylov_method: str = "cg",
    unsteady_bcs=None,
    has_td_rhs: bool = False,
    initial_solution=None,
):
    """Fully sharded linear trapezoidal time march: one jitted scan.

    Element data (DoFs, matrices, factorizations, carry slices, mass
    applications) stays sharded over the device mesh for the entire march;
    the only communication is one psum per Schur-CG matvec per bucket
    inside each step's saddle solve.  hp meshes run one sharded subsystem
    per order bucket.  Semantics match the host/fused marches (one linear
    solve per step, trapezoidal carry update).  Time-dependent boundary
    values / forcing (``unsteady_bcs`` / ``has_td_rhs``) enter as
    precomputed per-step scan inputs; ``initial_solution`` (flat primal
    DoFs) seeds the march with the consistent trapezoidal carry start.

    Returns ``(solutions [nt_sampled, n_dofs], sample_steps, lam)``.
    """
    (
        compiled,
        form_spec,
        msys,
        b_elems,
        c_vec,
        carry_cols,
        mass_blocks,
        block_gemv,
        sample_steps,
        slots_dev,
        c_steps,
        b_steps,
        b0_elems,
        _marched,
        _lagrange_mat,
    ) = _march_prologue(
        system, disc, device_mesh, time_settings, boundary_conditions,
        constrained_forms, unsteady_bcs, has_td_rhs,
    )
    if compiled.nonlin_blocks is not None or compiled.rhs_blocks is not None:
        raise NotImplementedError(
            "sharded_time_march handles linear marches; nonlinear systems"
            " use sharded_nonlinear_time_march."
        )

    subs = msys.subsystems
    krylov = _trace_krylov(msys, krylov_method, cg_maximum_iterations)
    two_over_dt = 2.0 / time_settings.dt
    n_lag = msys.n_lagrange
    cg_tol = jnp.asarray(cg_tolerance)
    use_cs = c_steps is not None
    use_bs = b_steps is not None
    xs = (slots_dev,) + ((c_steps,) if use_cs else ()) + (
        b_steps if use_bs else ()
    )

    @jax.jit
    def march(u0, lam0, carry0, carry_term0):
        def step(state, x):
            slot = x[0]
            c_t = x[1] if use_cs else c_vec
            bs_t = x[1 + use_cs :] if use_bs else b_elems
            us, lam, old_carries, carry_terms, bufs = state
            bases = tuple(
                b.at[:, cc].add(two_over_dt * oc + ct)
                for b, cc, oc, ct in zip(
                    bs_t, carry_cols, old_carries, carry_terms
                )
            )
            # Saddle residual of the current state (element-local + psums).
            r_elems = tuple(
                base - block_gemv(sub.blocks, u) - sub.trace_t_of(lam)
                for base, (_, sub), u in zip(bases, subs, us)
            )
            r_tr = c_t
            for (_, sub), u in zip(subs, us):
                r_tr = r_tr - sub.trace_of(u)
            # Saddle solve via the Schur complement.
            trace_rhs = -r_tr
            for (_, sub), r in zip(subs, r_elems):
                trace_rhs = trace_rhs + sub.trace_of(
                    sub.block_solve_sharded(r)
                )
            dlam, _, _ = krylov(trace_rhs, cg_tol)
            us = tuple(
                u + sub.block_solve_sharded(r - sub.trace_t_of(dlam))
                for u, (_, sub), r in zip(us, subs, r_elems)
            )
            lam = lam + dlam
            # Trapezoidal carry update from the marched forms' dual DoFs.
            new_carries = tuple(
                block_gemv(mb, u)[:, cc]
                for mb, u, cc in zip(mass_blocks, us, carry_cols)
            )
            new_terms = tuple(
                two_over_dt * (nc - oc) - ct
                for nc, oc, ct in zip(new_carries, old_carries, carry_terms)
            )
            idx = jnp.maximum(slot, 0)
            bufs = tuple(
                bf.at[idx].set(jnp.where(slot >= 0, u, bf[idx]))
                for bf, u in zip(bufs, us)
            )
            return (us, lam, new_carries, new_terms, bufs), None

        buf0 = tuple(
            jnp.zeros((len(sample_steps),) + u.shape) for u in u0
        )
        (_, lam_f, _, _, bufs), _ = jax.lax.scan(
            step, (u0, lam0, carry0, carry_term0, buf0), xs
        )
        return bufs, lam_f

    if initial_solution is None:
        u0 = tuple(jnp.zeros_like(b) for b in b_elems)
    else:
        sol = np.asarray(initial_solution)
        u0 = tuple(
            sub.shard_dofs(sol[bucket.gather].reshape(-1))
            for bucket, sub in subs
        )
    # Consistent trapezoidal start: old carry = dual(u0) on the carry rows
    # (zero for a zero state) and carry TERM = spatial residual of u0 on
    # those rows + 2/dt old carry; the marched-mass part of A u0 equals
    # 2/dt dual(u0) there, so the pieces cancel exactly like the
    # single-device setup (solve_system_2d.py, "Consistent trapezoidal
    # start").  For u0 = 0 this reduces to the forcing restricted to the
    # carry rows (trapezoidal f^0 contribution).
    carry0 = tuple(
        block_gemv(mb, u)[:, cc]
        for mb, u, cc in zip(mass_blocks, u0, carry_cols)
    )
    carry_term0 = tuple(
        (b - block_gemv(sub.blocks, u))[:, cc] + two_over_dt * oc
        for b, (_, sub), u, cc, oc in zip(
            b0_elems, subs, u0, carry_cols, carry0
        )
    )
    bufs, lam_f = march(u0, jnp.zeros(n_lag), carry0, carry_term0)
    out = _march_gather_samples(msys, bufs, sample_steps, disc.n_dofs)
    return out, sample_steps, np.asarray(lam_f)


def sharded_nonlinear_time_march(
    system,
    disc: Discretization,
    device_mesh: Mesh,
    time_settings,
    *,
    boundary_conditions=(),
    constrained_forms=(),
    max_iterations: int = 20,
    relax: float = 1.0,
    absolute_tolerance: float = 1e-10,
    relative_tolerance: float = 0.0,
    cg_maximum_iterations: int = 2000,
    cg_tolerance: float = 1e-12,
    krylov_method: str = "cg",
    unsteady_bcs=None,
    has_td_rhs: bool = False,
    initial_solution=None,
):
    """Fully sharded nonlinear (Picard) trapezoidal march: one jitted scan.

    Each time step runs a Picard defect-correction ``while_loop`` against
    the frozen linear operator: the residual evaluates element-locally per
    device (nonlinear advection fields reconstruct from the device's own
    DoFs), the correction is the sharded Schur-complement saddle solve (one
    psum per bucket per Krylov matvec), and the trapezoidal carry updates
    from the sharded dual (mass) application.  hp meshes run one sharded
    subsystem per order bucket.  Semantics match the host
    ``non_linear_solve_run``-per-step march and the single-device
    ``fused_nonlinear_time_march``.  Time-dependent boundary values /
    forcing (``unsteady_bcs`` / ``has_td_rhs``) enter as precomputed
    per-step scan inputs; ``initial_solution`` (flat primal DoFs) seeds
    the march with the consistent trapezoidal carry start.

    Returns ``(solutions [nt_sampled, n_dofs], sample_steps, lam,
    iterations [nt], residuals [nt])``.
    """
    (
        compiled,
        form_spec,
        msys,
        b_elems,
        c_vec,
        carry_cols,
        mass_blocks,
        block_gemv,
        sample_steps,
        slots_dev,
        c_steps,
        b_steps,
        b0_elems,
        _marched,
        _lagrange_mat,
    ) = _march_prologue(
        system, disc, device_mesh, time_settings, boundary_conditions,
        constrained_forms, unsteady_bcs, has_td_rhs,
    )
    subs = msys.subsystems
    residual_fns = [
        sub.make_picard_residual(
            form_spec, compiled.lhs_blocks, compiled.rhs_blocks
        )
        for _, sub in subs
    ]
    krylov = _trace_krylov(msys, krylov_method, cg_maximum_iterations)

    two_over_dt = 2.0 / time_settings.dt
    n_lag = msys.n_lagrange
    atol = jnp.asarray(absolute_tolerance)
    rtol = jnp.asarray(relative_tolerance)
    cg_tol = jnp.asarray(cg_tolerance)
    # Padding elements stay exactly zero through the march (zero forcing,
    # identity blocks, no constraint entries); the masks keep the residual
    # norm insensitive to them even so.
    masks = tuple(
        (jnp.arange(sub.e_padded) < sub.e_real)[:, None] for _, sub in subs
    )
    if n_lag:
        max_mag = jnp.abs(c_steps if c_steps is not None else c_vec).max()
    else:
        max_mag = jnp.asarray(0.0)
    for b in b_steps if b_steps is not None else b_elems:
        max_mag = jnp.maximum(max_mag, jnp.abs(b).max())
    use_cs = c_steps is not None
    use_bs = b_steps is not None
    xs = (slots_dev,) + ((c_steps,) if use_cs else ()) + (
        b_steps if use_bs else ()
    )

    @jax.jit
    def march(u0, lam0, carry0, carry_term0):
        def step(state, x):
            slot = x[0]
            c_t = x[1] if use_cs else c_vec
            bs_t = x[1 + use_cs :] if use_bs else b_elems
            us, lam, old_carries, carry_terms, bufs = state
            bases = tuple(
                b.at[:, cc].add(two_over_dt * oc + ct)
                for b, cc, oc, ct in zip(
                    bs_t, carry_cols, old_carries, carry_terms
                )
            )
            step_mag = max_mag
            for base in bases:
                step_mag = jnp.maximum(step_mag, jnp.abs(base).max())

            def cond(s):
                _, _, it, converged, _ = s
                return jnp.logical_and(
                    it < max_iterations, jnp.logical_not(converged)
                )

            def body(s):
                us_i, lami, it, _, _ = s
                # Element-local Picard residuals (one psum per bucket).
                r_elems = []
                r_tr = c_t
                mres = jnp.asarray(0.0)
                for fn, u, base, mask in zip(residual_fns, us_i, bases, masks):
                    r_elem, g_u = fn(u, lami, base)
                    r_elems.append(r_elem)
                    r_tr = r_tr - g_u
                    mres = jnp.maximum(mres, jnp.abs(r_elem * mask).max())
                if n_lag:
                    mres = jnp.maximum(mres, jnp.abs(r_tr).max())
                conv = jnp.logical_not(
                    jnp.logical_and(mres > atol, mres > step_mag * rtol)
                )
                # Frozen-operator correction via the sharded Schur solve —
                # under lax.cond so the converged exit iteration (which
                # previously computed and DISCARDED a full inner Krylov
                # solve, the dominant per-step cost) skips it.  The
                # predicate is psum-replicated, so every device takes the
                # same branch.
                def corrected(_):
                    trace_rhs = -r_tr
                    for (_, sub), r in zip(subs, r_elems):
                        trace_rhs = trace_rhs + sub.trace_of(
                            sub.block_solve_sharded(r)
                        )
                    dlam, _, _ = krylov(trace_rhs, cg_tol)
                    us_new = tuple(
                        u
                        + relax
                        * sub.block_solve_sharded(r - sub.trace_t_of(dlam))
                        for u, (_, sub), r in zip(us_i, subs, r_elems)
                    )
                    return us_new, lami + relax * dlam

                def unchanged(_):
                    return tuple(us_i), lami

                us_new, lam_new = jax.lax.cond(conv, unchanged, corrected, None)
                return (us_new, lam_new, jnp.where(conv, it, it + 1), conv, mres)

            us_new, lam_new, iters, _, mres = jax.lax.while_loop(
                cond,
                body,
                (us, lam, jnp.int32(0), jnp.bool_(False), jnp.inf),
            )
            new_carries = tuple(
                block_gemv(mb, u)[:, cc]
                for mb, u, cc in zip(mass_blocks, us_new, carry_cols)
            )
            new_terms = tuple(
                two_over_dt * (nc - oc) - ct
                for nc, oc, ct in zip(new_carries, old_carries, carry_terms)
            )
            idx = jnp.maximum(slot, 0)
            bufs = tuple(
                bf.at[idx].set(jnp.where(slot >= 0, u, bf[idx]))
                for bf, u in zip(bufs, us_new)
            )
            return (us_new, lam_new, new_carries, new_terms, bufs), (
                iters,
                mres,
            )

        buf0 = tuple(
            jnp.zeros((len(sample_steps),) + u.shape) for u in u0
        )
        (_, lam_f, _, _, bufs), (iters, residuals) = jax.lax.scan(
            step, (u0, lam0, carry0, carry_term0, buf0), xs
        )
        return bufs, lam_f, iters, residuals

    if initial_solution is None:
        u0 = tuple(jnp.zeros_like(b) for b in b_elems)
        carry_term0 = tuple(b[:, cc] for b, cc in zip(b0_elems, carry_cols))
        carry0 = tuple(jnp.zeros_like(ct) for ct in carry_term0)
    else:
        sol = np.asarray(initial_solution)
        u0 = tuple(
            sub.shard_dofs(sol[bucket.gather].reshape(-1))
            for bucket, sub in subs
        )
        # Consistent trapezoidal start (see sharded_time_march): old carry
        # = dual(u0) on the carry rows, carry term = spatial residual of
        # u0 there + 2/dt old carry (nonlinear terms included via the
        # Picard residual at lam = 0).
        carry0 = tuple(
            block_gemv(mb, u)[:, cc]
            for mb, u, cc in zip(mass_blocks, u0, carry_cols)
        )
        lam00 = jnp.zeros(n_lag)
        carry_term0 = tuple(
            fn(u, lam00, b)[0][:, cc] + two_over_dt * oc
            for fn, u, b, cc, oc in zip(
                residual_fns, u0, b0_elems, carry_cols, carry0
            )
        )
    bufs, lam_f, iters, residuals = march(
        u0, jnp.zeros(n_lag), carry0, carry_term0
    )
    out = _march_gather_samples(msys, bufs, sample_steps, disc.n_dofs)
    return (
        out,
        sample_steps,
        np.asarray(lam_f),
        np.asarray(iters, np.uint32),
        np.asarray(residuals),
    )


def _carry_flat_positions(disc, msys, march_indices):
    """Per-bucket positions in the global flat carry vector.

    The flat layout matches the single-device ``time_carry_index_array``
    ordering (concatenation over leaves in leaf order,
    solve_system_2d.py), so march checkpoints written by the sharded host
    loop resume on the single-device path and vice versa.

    Returns ``(positions, total)`` where ``positions[b]`` is an
    ``[E_real, ncc]`` int array for bucket ``b``.
    """
    from mfv2d_tpu.solver.solve import find_time_carry_indices

    form_spec = disc.form_spec
    ncc_leaf = np.zeros(disc.n_leaves, np.int64)
    ncc_bucket = []
    for bucket, _ in msys.subsystems:
        p1, p2 = bucket.orders
        ncc = len(find_time_carry_indices(march_indices, form_spec, p1, p2))
        ncc_bucket.append(ncc)
        ncc_leaf[bucket.leaf_ranks] = ncc
    offs = np.concatenate([[0], np.cumsum(ncc_leaf)])
    positions = [
        offs[bucket.leaf_ranks][:, None]
        + np.arange(ncc, dtype=np.int64)[None, :]
        for (bucket, _), ncc in zip(msys.subsystems, ncc_bucket)
    ]
    return positions, int(offs[-1])


def _carries_to_flat(msys, carries, positions, total):
    out = np.zeros(total)
    for (_, sub), c, pos in zip(msys.subsystems, carries, positions):
        out[pos.reshape(-1)] = np.asarray(c)[: sub.e_real].reshape(-1)
    return out


def _carries_from_flat(msys, flat, positions):
    flat = np.asarray(flat)
    out = []
    for (_, sub), pos in zip(msys.subsystems, positions):
        arr = np.zeros((sub.e_padded, pos.shape[1]))
        arr[: sub.e_real] = flat[pos]
        out.append(jax.device_put(arr, sub.dof_sharding))
    return out


def sharded_host_time_march(
    system,
    disc: Discretization,
    device_mesh: Mesh,
    time_settings,
    *,
    boundary_conditions=(),
    constrained_forms=(),
    max_iterations: int = 20,
    relax: float = 1.0,
    absolute_tolerance: float = 1e-10,
    relative_tolerance: float = 0.0,
    cg_maximum_iterations: int = 2000,
    cg_tolerance: float = 1e-12,
    krylov_method: str = "cg",
    unsteady_bcs=None,
    has_td_rhs: bool = False,
    initial_solution=None,
    newton: bool = False,
    vms_settings=None,
    anderson_m: int = 0,
    checkpoint_settings=None,
    resume_state: dict | None = None,
):
    """Host-driven sharded trapezoidal march: Newton / VMS / checkpoints.

    The fused scan marches (:func:`sharded_time_march`,
    :func:`sharded_nonlinear_time_march`) keep the whole march in one
    jitted program, which rules out per-step host work: exact-Newton
    Jacobian refactorization, the VMS unresolved-scale solve (host-driven
    Green's applications), and checkpoint writes.  This entry runs the
    SAME sharded per-step solve (element work sharded, one psum per bucket
    per Krylov matvec) under a host step loop, matching the single-device
    march semantics (reference python/mfv2d/solve_system_2d.py:325-397
    carry scheme) for exactly those combinations.

    ``resume_state`` (a :func:`mfv2d_tpu.checkpoint.load_march_state`
    dict) restores solution/lagrange/carries and skips completed steps;
    checkpoints written here use the single-device flat-carry layout, so
    the two paths' march checkpoints are interchangeable.

    Returns ``(solutions [S, n_dofs], sample_steps, lam, iters [nt],
    residuals [nt], fine_scales)``.
    """
    (
        compiled,
        form_spec,
        msys,
        b_elems,
        c_vec,
        carry_cols,
        mass_blocks,
        block_gemv,
        sample_steps,
        _slots_dev,
        c_steps,
        b_steps,
        b0_elems,
        marched,
        lagrange_mat,
    ) = _march_prologue(
        system, disc, device_mesh, time_settings, boundary_conditions,
        constrained_forms, unsteady_bcs, has_td_rhs,
    )
    subs = msys.subsystems
    residual_fns = [
        sub.make_picard_residual(
            form_spec, compiled.lhs_blocks, compiled.rhs_blocks
        )
        for _, sub in subs
    ]
    krylov = _trace_krylov(msys, krylov_method, cg_maximum_iterations)
    newton_ctx = None
    if newton:
        newton_ctx = {
            "jac_fns": [
                sub.make_newton_jacobian(
                    form_spec, compiled.lhs_blocks, compiled.rhs_blocks
                )
                for _, sub in subs
            ],
            "lagrange_mat": lagrange_mat,
            "device_mesh": device_mesh,
            "krylov_method": krylov_method,
            "cg_max": cg_maximum_iterations,
        }

    sg = None
    unresolved = None
    if vms_settings is not None:
        from mfv2d_tpu.boundary import freeze_unsteady_boundary_conditions
        from mfv2d_tpu.parallel.vms import ShardedSuyashGreen

        # The fine-scale operator freezes its (weak-BC) forcing at the
        # first time level, exactly like the single-device march builds
        # its SuyashGreenOperator once before the step loop.
        bcs0 = (
            freeze_unsteady_boundary_conditions(
                list(unsteady_bcs), time_settings.dt
            )
            if unsteady_bcs
            else list(boundary_conditions)
        )
        sg = ShardedSuyashGreen(
            marched,
            vms_settings,
            disc,
            device_mesh,
            constrained_forms,
            bcs0,
            inner_max_iterations=cg_maximum_iterations,
        )

    two_over_dt = 2.0 / time_settings.dt
    dt = time_settings.dt
    nt = time_settings.nt
    n_lag = msys.n_lagrange
    march_indices = tuple(
        sorted(
            marched.weight_forms.index(form)
            for form in time_settings.time_march_relations
        )
    )
    carry_pos, carry_total = _carry_flat_positions(disc, msys, march_indices)

    max_mag_static = 0.0
    if n_lag:
        max_mag_static = float(
            jnp.abs(c_steps if c_steps is not None else c_vec).max()
        )
    for b in b_steps if b_steps is not None else b_elems:
        max_mag_static = max(max_mag_static, float(jnp.abs(b).max()))

    start_step = 0
    lam = jnp.zeros(n_lag)
    if resume_state is not None:
        sol = np.asarray(resume_state["solution"])
        us = [
            sub.shard_dofs(sol[bucket.gather].reshape(-1))
            for bucket, sub in subs
        ]
        lam = jnp.asarray(resume_state["lagrange"])
        old_carries = _carries_from_flat(
            msys, resume_state["old_carry"], carry_pos
        )
        carry_terms = _carries_from_flat(
            msys, resume_state["carry_term"], carry_pos
        )
        start_step = int(resume_state["time_index"])
    elif initial_solution is None:
        us = [jnp.zeros_like(b) for b in b_elems]
        carry_terms = [b[:, cc] for b, cc in zip(b0_elems, carry_cols)]
        old_carries = [jnp.zeros_like(ct) for ct in carry_terms]
    else:
        sol = np.asarray(initial_solution)
        us = [
            sub.shard_dofs(sol[bucket.gather].reshape(-1))
            for bucket, sub in subs
        ]
        # Consistent trapezoidal start (see sharded_time_march).
        old_carries = [
            block_gemv(mb, u)[:, cc]
            for mb, u, cc in zip(mass_blocks, us, carry_cols)
        ]
        lam00 = jnp.zeros(n_lag)
        carry_terms = [
            fn(u, lam00, b)[0][:, cc] + two_over_dt * oc
            for fn, u, b, cc, oc in zip(
                residual_fns, us, b0_elems, carry_cols, old_carries
            )
        ]

    iters = np.zeros(nt, np.uint32)
    changes = np.zeros(nt)
    samples: list[np.ndarray] = []
    kept_steps: list[int] = []
    for ti in range(start_step, nt):
        c_t = c_steps[ti] if c_steps is not None else c_vec
        bs_t = (
            [bb[ti] for bb in b_steps] if b_steps is not None else b_elems
        )
        bases = [
            b.at[:, cc].add(two_over_dt * oc + ct)
            for b, cc, oc, ct in zip(
                bs_t, carry_cols, old_carries, carry_terms
            )
        ]
        step_mag = max_mag_static
        for base in bases:
            step_mag = max(step_mag, float(jnp.abs(base).max()))
        us, lam, step_res, unresolved = _sharded_nonlinear_iterate(
            disc,
            msys,
            residual_fns,
            bases,
            c_t,
            us,
            lam,
            krylov,
            maximum_iterations=max_iterations,
            relax=relax,
            absolute_tolerance=absolute_tolerance,
            relative_tolerance=relative_tolerance,
            max_mag=step_mag,
            cg_tolerance=cg_tolerance,
            anderson_m=anderson_m,
            newton_ctx=newton_ctx,
            sg=sg,
            unresolved=unresolved,
        )
        iters[ti] = len(step_res)
        changes[ti] = step_res[-1]

        new_carries = [
            block_gemv(mb, u)[:, cc]
            for mb, u, cc in zip(mass_blocks, us, carry_cols)
        ]
        carry_terms = [
            two_over_dt * (nc - oc) - ct
            for nc, oc, ct in zip(new_carries, old_carries, carry_terms)
        ]
        old_carries = new_carries

        if checkpoint_settings is not None and (
            (ti + 1) % max(1, checkpoint_settings.every) == 0
            or ti + 1 == nt
        ):
            from mfv2d_tpu.checkpoint import save_march_state

            save_march_state(
                checkpoint_settings.path,
                disc.mesh,
                _flat_from_sharded(disc, subs, us),
                np.asarray(lam),
                _carries_to_flat(msys, old_carries, carry_pos, carry_total),
                _carries_to_flat(msys, carry_terms, carry_pos, carry_total),
                ti + 1,
                dt,
            )

        if (ti % time_settings.sample_rate) == 0 or ti + 1 == nt:
            samples.append(_flat_from_sharded(disc, subs, us))
            kept_steps.append(ti)

    fine_scales = None
    if sg is not None:
        fine_scales = sg.recover_unresolved(
            _flat_from_sharded(disc, subs, us), unresolved
        )
    return (
        np.stack(samples) if samples else np.zeros((0, disc.n_dofs)),
        np.asarray(kept_steps, np.int64),
        np.asarray(lam),
        iters,
        changes,
        fine_scales,
    )

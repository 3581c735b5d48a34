"""Variational multi-scale fine-scale estimation (Suyash-Green operator).

Estimates the unresolved (fine-scale) part of the solution through the
fine-scale Green's function G' = A_f^{-1} - P A_c^{-1} P^T of a symmetric
operator, iterated against the non-symmetric advection operator
(reference: python/mfv2d/solve_system.py:654-961).  The per-element matrices
and projectors are produced by the batched device kernels; the two sparse
factorizations are host-side.
"""

from __future__ import annotations

import time
from collections.abc import Sequence

import jax.numpy as jnp
import numpy as np
from mfv2d_tpu.utils.lazy import lazy_module

sp = lazy_module("scipy.sparse")
sla = lazy_module("scipy.sparse.linalg")

from mfv2d_tpu.boundary import BoundaryCondition2DSteady
from mfv2d_tpu.compiler import CompiledSystem
from mfv2d_tpu.evaluation import (
    ElementBatch,
    element_matrix_fn,
    evaluate_static_fields,
    jit_element_matrices,
    jit_element_projector,
    reference_inclusion_matrix,
)
from mfv2d_tpu.kform import KFormUnknown
from mfv2d_tpu.solver.discretization import Discretization
from mfv2d_tpu.solver.solve import (
    SystemEvaluator,
    VMSSettings,
    compute_element_rhs_bucket,
)
from mfv2d_tpu.system import KFormSystem
from mfv2d_tpu.tracing import tracer


import jax


class _ChunkDownloader:
    """Background device->host streaming of block chunks with row guards.

    The config-5 fine-matrix download (~3.4 GB over the relay tunnel) and
    the host LAPACK inverse build that consumes it are both serial walls;
    neither needs the other's resource (tunnel IO vs host FLOPs).  This
    streams the chunks into ``dest`` on a daemon thread; consumers call
    ``wait_rows(n)`` (or ``wait_rows(None)`` for everything) before
    touching rows below ``n`` — the saddle build's 512-element LAPACK
    slices then interleave with the in-flight download.
    """

    def __init__(
        self,
        dest: np.ndarray,
        chunks,
        keep_chunks: bool = False,
        prefilled: int = 0,
    ) -> None:
        import threading

        self._dest = dest
        self._chunks = list(chunks)
        self._keep = keep_chunks
        self._prefilled = int(prefilled)
        self._bounds = []
        lo = 0
        for c in self._chunks:
            hi = lo + c.shape[0]
            self._bounds.append((lo, hi))
            lo = hi
        self._events = [threading.Event() for _ in self._chunks]
        for i in range(self._prefilled):
            # Caller already copied these rows into ``dest`` (e.g. the
            # chunk-0 tunnel-rate probe).
            if not keep_chunks:
                self._chunks[i] = None
            self._events[i].set()
        self._exc: BaseException | None = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        t0 = time.perf_counter()
        try:
            for i in range(self._prefilled, len(self._chunks)):
                lo, hi = self._bounds[i]
                self._dest[lo:hi] = np.asarray(self._chunks[i])
                if not self._keep:
                    self._chunks[i] = None  # free the device buffer
                self._events[i].set()
        except BaseException as exc:  # re-raised on the consumer side
            self._exc = exc
            for ev in self._events:
                ev.set()
        finally:
            dt = time.perf_counter() - t0
            tracer.add("vms-init-fine-download(bg)", dt)
            if self._exc is None and dt > 1.0:
                from mfv2d_tpu.config import config as _cfg

                _cfg.tunnel_gbps_observed = (
                    self._dest.nbytes / dt / 1e9
                )

    @property
    def chunk_bounds(self):
        return list(self._bounds)

    def wait_rows(self, n_rows: int | None = None) -> None:
        end = self._bounds[-1][1] if n_rows is None else n_rows
        for (lo, _hi), ev in zip(self._bounds, self._events):
            if lo < end:
                ev.wait()
        if self._exc is not None:
            raise self._exc


@jax.jit
def _block_gemv(blocks, v2d):
    """Batched block-diagonal matvec: [E,m,n] x [E,n] -> [E,m]."""
    return jnp.einsum("eij,ej->ei", blocks, v2d)


@jax.jit
def _galerkin_chunk(m_c, p):
    """Per-chunk ``P^T M_e P`` via exact Ozaki GEMMs (cutoff 10 + f64
    pair accumulation: dropped-pair truncation 2^-70, below f64-GEMM
    roundoff).  The shared inclusion P turns both batched products into
    single wide 2D GEMMs ([e*n, k] @ [k, m]) — ideal MXU shapes."""
    from mfv2d_tpu.ops.ozaki import matmul64

    e, n_f, _ = m_c.shape
    n_c = p.shape[1]
    mp = matmul64(m_c.reshape(e * n_f, n_f), p, cutoff=10, exact_sum=True)
    mp_t = mp.reshape(e, n_f, n_c).transpose(0, 2, 1).reshape(e * n_c, n_f)
    # (mp^T P) = (P^T M P)^T per element; transpose back at the end.
    ptmp = matmul64(mp_t, p, cutoff=10, exact_sum=True)
    return ptmp.reshape(e, n_c, n_c).transpose(0, 2, 1)


class _FineBucketView:
    """Adapter pairing a fine batch with a coarse bucket's leaf ranks."""

    def __init__(self, batch: ElementBatch, bucket) -> None:
        self.batch = batch
        self.orders = batch.orders
        self.leaf_ranks = bucket.leaf_ranks


class _GatherBucket:
    """Bucket stand-in carrying only a gather map."""

    def __init__(self, gather: np.ndarray) -> None:
        self.gather = gather


class _BucketsOnly:
    """Minimal Discretization stand-in for BlockSaddleSystem."""

    def __init__(self, n_dofs: int, gathers: Sequence[np.ndarray]) -> None:
        self.n_dofs = int(n_dofs)
        self.buckets = [_GatherBucket(g) for g in gathers]


def iterate_unresolved_contributions(
    apply_advection,
    greens_function,
    prolong_to_fine,
    fine_forcing: np.ndarray,
    convergence,
    iteration: str,
    relaxation: float,
    coarse_solution: np.ndarray,
    initial_guess: np.ndarray | None,
    rtol_override: float | None = None,
    atol_override: float | None = None,
) -> np.ndarray:
    """Fixed-point / GMRES driver for the unresolved-scale forcing.

    Shared by the single-chip and element-sharded VMS operators (the only
    difference between them is HOW ``apply_advection`` and
    ``greens_function`` execute) so the iteration policy cannot drift
    between the two paths.  Solves ``(I + F G') u = F G' r`` where
    ``r = forcing - F P u_coarse`` (reference solve_system.py:904-961).

    ``rtol_override``/``atol_override`` loosen (never tighten) the
    tolerances for this one invocation — the Picard driver's
    inexact-forcing schedule: while the outer residual is still large, the
    unresolved-scale forcing only needs to be as accurate as the iterate
    it feeds (its error maps ~1:1 into the outer residual through the
    O(1)-norm dual projection), and each saved GMRES iteration is one
    fewer Green's-function application — the dominant per-Picard cost at
    BASELINE config-5 scale.  The absolute override is the one that
    matters in practice: ``|b| = |F G' r|`` is fine-scale sized (1e-9 at
    config 5), so the fixed absolute tolerance governs the stop.
    """
    rtol = convergence.relative_tolerance
    if rtol_override is not None:
        rtol = max(rtol, float(rtol_override))
    atol = convergence.absolute_tolerance
    if atol_override is not None:
        atol = max(atol, float(atol_override))
    residual = fine_forcing - apply_advection(prolong_to_fine(coarse_solution))
    agr = apply_advection(greens_function(residual))
    u = np.array(agr) if initial_guess is None else np.array(initial_guess)

    if iteration == "gmres":
        # The unresolved-scale map u -> agr - F G' u is LINEAR, so the
        # fixed point solves (I + F G') u = agr; GMRES reaches the same
        # tolerance in far fewer Green's-function applications than the
        # stationary iteration (each matvec costs one G').
        import scipy.sparse.linalg as _sla

        def op(w):
            return w + apply_advection(greens_function(w))

        # dtype must be declared: scipy otherwise probes the matvec with
        # an int8 vector, which the jitted Green's-function path rejects.
        linop = _sla.LinearOperator(
            (agr.size, agr.size), matvec=op, dtype=np.float64
        )
        out, info = _sla.gmres(
            linop,
            agr,
            x0=u,
            rtol=rtol,
            atol=atol,
            maxiter=convergence.maximum_iterations,
        )
        if info == 0:
            return np.asarray(out)
        # Krylov stall: fall through to the stationary iteration.
        u = np.asarray(out)

    for _ in range(convergence.maximum_iterations):
        u_new = agr - apply_advection(greens_function(u))
        max_du = np.abs(u - u_new).max()
        max_u = np.abs(u_new).max()
        u = (
            u_new
            if relaxation == 1.0
            else (1 - relaxation) * u + relaxation * u_new
        )
        if max_u == 0 or max_du < max_u * rtol or max_du < atol:
            break
    return u


class SuyashGreenOperator:
    """Fine-scale Green's-function operator for VMS stabilization."""

    def __init__(
        self,
        system: KFormSystem,
        settings: VMSSettings,
        disc: Discretization,
        evaluator: SystemEvaluator,
        constrained_forms: Sequence[tuple[float, KFormUnknown]],
        strong_boundary_conditions: Sequence[BoundaryCondition2DSteady],
    ) -> None:
        from mfv2d_tpu.continuity import add_system_constraints

        self.disc = disc
        self.convergence = settings.fine_scale_convergence
        self.relaxation = settings.relaxation
        self.iteration = settings.iteration
        self.inexact_forcing = settings.inexact_forcing
        self.anticipate_factor = settings.anticipate_factor
        self.inexact_eta = settings.inexact_eta
        self.unknown_forms = settings.symmetric_system.unknown_forms
        self.compiled_advection = CompiledSystem(settings.nonsymmetric_system)
        compiled_sym = CompiledSystem(settings.symmetric_system)
        dk = settings.order_increase
        form_specs = disc.form_spec

        # Device-resident fine-scale operators (uniform-order meshes): the
        # fine advection operator and the coarse->fine projector are
        # block-diagonal with contiguous per-leaf DoFs, so their
        # applications are batched GEMMs on device.  The host-CSR
        # alternative rebuilds a ~100M-nnz block_diag per Picard iteration
        # and runs its SpMVs on (possibly one) host core — measured as THE
        # wall-time wall of BASELINE config 5.
        self._dev_ops = len(disc.buckets) == 1

        self.fine_batches: list[ElementBatch] = []
        fine_sym_buckets: list[np.ndarray] = []
        fine_guards: list = []
        coarse_guards: list = []
        coarse_sym_buckets: list[np.ndarray] = []
        fine_sizes = np.zeros(disc.n_leaves, np.int64)
        proj_leaf: list[np.ndarray | None] = [None] * disc.n_leaves
        fine_adv_leaf: list[np.ndarray | None] = [None] * disc.n_leaves
        coarse_adv_leaf: list[np.ndarray | None] = [None] * disc.n_leaves
        fine_sym_leaf: list[np.ndarray | None] = [None] * disc.n_leaves
        coarse_sym_leaf: list[np.ndarray | None] = [None] * disc.n_leaves
        forcing_leaf: list[np.ndarray | None] = [None] * disc.n_leaves

        for bucket in disc.buckets:
            p1, p2 = bucket.orders
            fine_basis = disc.basis_cache.get_basis2d(
                p1 + dk, p2 + dk, *bucket.batch.basis.integration_orders
            )
            fine_batch = ElementBatch(fine_basis, np.asarray(bucket.batch.corners))
            self.fine_batches.append(fine_batch)

            e = bucket.batch.n_elements
            n_c = form_specs.total_size(p1, p2)
            n_f = form_specs.total_size(p1 + dk, p2 + dk)
            if self._dev_ops:
                # Nested p -> p+dk spaces on the same element: the
                # coarse-to-fine L2 projector is the element-INDEPENDENT
                # reference inclusion matrix (see
                # evaluation.reference_inclusion_matrix) — one [n_f, n_c]
                # matrix replaces the per-element [E, n_f, n_c] table
                # (2.2 GB of HBM at BASELINE config-5 scale) and the
                # 512-element-chunked projector dispatches that built it.
                big1 = reference_inclusion_matrix(
                    form_specs, (p1, p2), (p1 + dk, p2 + dk)
                )
            else:
                projs = jit_element_projector(form_specs, bucket.batch, fine_batch)
                off_c = form_specs.form_offsets(p1, p2)
                off_f = form_specs.form_offsets(p1 + dk, p2 + dk)
                big = np.zeros((e, n_f, n_c))
                for i in range(len(form_specs)):
                    big[
                        :, off_f[i] : off_f[i + 1], off_c[i] : off_c[i + 1]
                    ] = np.asarray(projs[i])

            if not self._dev_ops:
                # The coarse advection operator and the host-materialized
                # fine advection blocks only feed the host-CSR path; the
                # dev path (re)builds its advection chunks device-side.
                statics_f = evaluate_static_fields(
                    fine_batch, self.compiled_advection.fields
                )
                fine_adv = np.asarray(
                    jit_element_matrices(
                        form_specs,
                        self.compiled_advection.linear_blocks,
                        fine_batch,
                        static_fields=statics_f,
                    )
                )
                statics_c = evaluate_static_fields(
                    bucket.batch, self.compiled_advection.fields
                )
                coarse_adv = np.asarray(
                    jit_element_matrices(
                        form_specs,
                        self.compiled_advection.linear_blocks,
                        bucket.batch,
                        static_fields=statics_c,
                    )
                )
            statics_sym = evaluate_static_fields(fine_batch, compiled_sym.fields)
            if self._dev_ops:
                # Pipelined fine assembly + Galerkin + download: dispatch
                # the assembly CHUNKS (no 3.4 GB device concat), enqueue
                # the per-chunk Galerkin GEMMs on them, and only then
                # stream the fine chunks into host RAM — the tunnel
                # download (~3.4 GB at config-5 scale, previously a
                # serial tail of vms-init-fine-matrices) overlaps the
                # Galerkin device work.
                with tracer.stage("vms-init-fine-matrices"):
                    keys = tuple(statics_sym.keys())
                    fine_fn = element_matrix_fn(
                        fine_batch, compiled_sym.lhs_blocks, form_specs, keys
                    )
                    fine_chunks = fine_fn(
                        fine_batch.corners,
                        None,
                        tuple(statics_sym[k] for k in keys),
                        as_chunks=True,
                    )
                # Time chunk 0 synchronously: its rate (assembly wait +
                # transfer) routes the Galerkin product and seeds the
                # dev-greens tunnel veto.  The relay tunnel swings
                # 2-50 MB/s between windows, which decides whether the
                # device Galerkin (downloads an extra [E, n_c, n_c]
                # coarse table) or the host triple product (consumes the
                # fine chunks ALREADY streaming in) is cheaper.
                fine_sym = np.empty((e, n_f, n_f))
                with tracer.stage("vms-init-fine-download"):
                    # Force chunk-0's device computation first (an
                    # element-sized fetch), so the timed full fetch
                    # measures the TRANSFER, not the assembly wait.
                    np.asarray(fine_chunks[0][:1, :1, :1])
                    _t_c0 = time.perf_counter()
                    c0 = np.asarray(fine_chunks[0])
                    rate_c0 = c0.nbytes / max(
                        time.perf_counter() - _t_c0, 1e-9
                    )
                    fine_sym[: c0.shape[0]] = c0
                    del c0
                from mfv2d_tpu.config import config as _cfg

                _cfg.tunnel_gbps_observed = rate_c0 / 1e9
                n_c = big1.shape[1]
                coarse_dl_s = e * n_c * n_c * 8 / max(rate_c0, 1e-9)
                # Route default: DEVICE, always.  The host np.matmul
                # triple product was measured (round 5, NH=16 A/B) to
                # inflate |vms| 40x (4.5e-12 -> 1.8e-10): its ordinary
                # f64 GEMM rounding (~n*eps relative) appears ABSOLUTELY
                # in G' = A_f^-1 - P A_c^-1 P^T through the structural
                # cancellation (cond * n * eps), while the exact-sum
                # Ozaki device product (truncation 2^-70) stays
                # consistent with the fine blocks.  The tunnel cost of
                # downloading the device result is real in slow windows,
                # but accuracy wins; MFV2D_TPU_GALERKIN=host remains as
                # an explicit opt-in for resolution studies that do not
                # read the fine scales.
                use_host_galerkin = _cfg.galerkin_route == "host" 
                if tracer.enabled:
                    print(
                        f"[trace] galerkin route: tunnel "
                        f"{rate_c0/1e6:.0f} MB/s, coarse download est "
                        f"{coarse_dl_s:.0f}s -> "
                        f"{'HOST' if use_host_galerkin else 'device'}",
                        flush=True,
                    )
                if not use_host_galerkin:
                    with tracer.stage("vms-init-galerkin"):
                        coarse_parts = self._galerkin_dispatch(
                            fine_chunks, big1
                        )
                # The ~3.4 GB download streams on a background thread;
                # the consumers below (host Galerkin chunks, fine-saddle
                # LAPACK slices) wait per-chunk through the guards, so
                # tunnel IO and host FLOPs overlap instead of
                # serializing.
                guard = _ChunkDownloader(
                    fine_sym,
                    fine_chunks,
                    keep_chunks=not use_host_galerkin,
                    prefilled=1,
                )
                fine_guards.append(guard.wait_rows)
                del fine_chunks
                if use_host_galerkin:
                    # P^T A_f P chunk-by-chunk as the download lands —
                    # exact f64, zero extra tunnel bytes — on ANOTHER
                    # daemon thread, so the main thread proceeds to the
                    # fine-saddle LAPACK build and all three (tunnel
                    # stream, Galerkin GEMMs, LAPACK slices) interleave.
                    # The coarse-saddle build below waits per-chunk
                    # through its own guard.
                    import threading as _threading

                    coarse_sym = np.empty((e, n_c, n_c))
                    g_bounds = guard.chunk_bounds
                    g_events = [_threading.Event() for _ in g_bounds]
                    g_exc: list = []

                    def _host_galerkin(
                        _g=guard, _b=g_bounds, _ev=g_events,
                        _x=g_exc, _cs=coarse_sym, _fs=fine_sym,
                        _p=big1,
                    ):
                        t0 = time.perf_counter()
                        try:
                            for k, (lo2, hi2) in enumerate(_b):
                                _g.wait_rows(hi2)
                                _cs[lo2:hi2] = np.matmul(
                                    _p.T, np.matmul(_fs[lo2:hi2], _p)
                                )
                                _ev[k].set()
                        except BaseException as exc:
                            _x.append(exc)
                            for ev in _ev:
                                ev.set()
                        finally:
                            tracer.add(
                                "vms-init-galerkin-host(bg)",
                                time.perf_counter() - t0,
                            )

                    _threading.Thread(
                        target=_host_galerkin, daemon=True
                    ).start()

                    def _coarse_wait(
                        n_rows=None, _b=g_bounds, _ev=g_events, _x=g_exc
                    ):
                        end = _b[-1][1] if n_rows is None else n_rows
                        for (lo2, _h), ev in zip(_b, _ev):
                            if lo2 < end:
                                ev.wait()
                        if _x:
                            raise _x[0]

                    coarse_guards.append(_coarse_wait)
                else:
                    with tracer.stage("vms-init-galerkin"):
                        coarse_sym = self._galerkin_finalize(
                            coarse_parts, big1, fine_sym,
                            wait=guard.wait_rows,
                        )
                    del coarse_parts
                    coarse_guards.append(None)
            else:
                with tracer.stage("vms-init-fine-matrices"):
                    fine_sym = np.asarray(
                        jit_element_matrices(
                            form_specs,
                            compiled_sym.lhs_blocks,
                            fine_batch,
                            static_fields=statics_sym,
                        )
                    )
                # Galerkin coarse operator P^T A_f P (solve_system.py:750).
                with tracer.stage("vms-init-galerkin"):
                    coarse_sym = np.einsum(
                        "eij,eik,ekl->ejl", big, fine_sym, big
                    )
            if len(fine_guards) < len(fine_sym_buckets) + 1:
                fine_guards.append(None)
            if len(coarse_guards) < len(fine_sym_buckets) + 1:
                coarse_guards.append(None)
            fine_sym_buckets.append(fine_sym)
            coarse_sym_buckets.append(coarse_sym)

            with tracer.stage("vms-init-forcing"):
                forcing = compute_element_rhs_bucket(
                    system, _FineBucketView(fine_batch, bucket)
                )

            for j, rank in enumerate(bucket.leaf_ranks):
                rank = int(rank)
                if not self._dev_ops:
                    proj_leaf[rank] = big[j]
                    fine_adv_leaf[rank] = fine_adv[j]
                    coarse_adv_leaf[rank] = coarse_adv[j]
                fine_sym_leaf[rank] = fine_sym[j]
                coarse_sym_leaf[rank] = coarse_sym[j]
                forcing_leaf[rank] = forcing[j]
                fine_sizes[rank] = n_f

        self.fine_offsets = np.concatenate([[0], np.cumsum(fine_sizes)])
        if self._dev_ops:
            bucket = disc.buckets[0]
            ranks = np.asarray(bucket.leaf_ranks)
            # Flat fine vectors are leaf-RANK ordered; assemble the device
            # advection chunks from rank-permuted corners so chunk k covers
            # vector rows [lo*n_f, hi*n_f) directly.
            perm = np.argsort(ranks)
            self._rank_batch = ElementBatch(
                self.fine_batches[0].basis,
                np.asarray(bucket.batch.corners)[perm],
            )
            self._incl_np = big1
            self._incl_dev = jnp.asarray(big1)
            self._adv_statics = evaluate_static_fields(
                self._rank_batch, self.compiled_advection.fields
            )
            self._fine_adv_chunks: list[jnp.ndarray] | None = None
            self._rebuild_fine_advection(None)
        if not self._dev_ops:
            self.projector_c2f = sp.csr_array(
                sp.block_diag(proj_leaf, format="csr")
            )
            # Host-CSR operators (hp meshes / LU path); at fine p=10 scale
            # these are ~100M-nnz builds, skipped entirely when the device
            # block operators serve every application.
            self.fine_linear_advection_operator = sp.coo_array(
                sp.block_diag(fine_adv_leaf, format="coo")
            )
            self.coarse_linear_advection_operator = sp.coo_array(
                sp.block_diag(coarse_adv_leaf, format="coo")
            )
            if self.compiled_advection.nonlin_blocks is None:
                self.fine_advection_operator = (
                    self.fine_linear_advection_operator.tocsr()
                )
                self.coarse_advection_operator = (
                    self.coarse_linear_advection_operator.tocsr()
                )

        # Fine-space forcing + weak BCs + constraints on the p-raised mesh.
        forcing_list = [np.asarray(f) for f in forcing_leaf]
        mesh = disc.mesh
        mesh.uniform_p_change(dk, dk)
        try:
            with tracer.stage("vms-init-fine-constraints"):
                fine_lag_mat, fine_lag_vec = add_system_constraints(
                    system,
                    mesh,
                    disc.basis_cache,
                    constrained_forms,
                    strong_boundary_conditions,
                    disc.leaf_indices,
                    self.fine_offsets,
                    forcing_list,
                )
        finally:
            mesh.uniform_p_change(-dk, -dk)

        self.fine_forcing = np.concatenate(forcing_list)
        self.fine_padding = fine_lag_vec.size

        coarse_lag_mat, coarse_lag_vec = add_system_constraints(
            system,
            mesh,
            disc.basis_cache,
            constrained_forms,
            strong_boundary_conditions,
            disc.leaf_indices,
            disc.element_offsets,
            None,
        )
        self.coarse_padding = coarse_lag_vec.size

        n_fine = int(self.fine_offsets[-1])
        # Measured at 53k fine DoFs (16x16 p=6+2): splu 138 s vs Schur-CG
        # 190 s end-to-end, so host LU stays the default until its
        # O(N^1.5) factorization cost and memory take over.
        self.matrix_free = (
            settings.matrix_free
            if settings.matrix_free is not None
            else n_fine > 150_000
        )
        if self.matrix_free:
            # Device-resident Schur CG on both hybridized saddle systems:
            # A is block-diagonal per element, so only the trace system is
            # global — no sparse LU of the fine space ever materializes.
            from mfv2d_tpu.solver.iterative import make_block_saddle_system

            fine_gathers = []
            for bucket, fine_sym in zip(disc.buckets, fine_sym_buckets):
                n_f = fine_sym.shape[1]
                fine_gathers.append(
                    self.fine_offsets[np.asarray(bucket.leaf_ranks)][:, None]
                    + np.arange(n_f)[None, :]
                )
            with tracer.stage("vms-init-fine-saddle"):
                # device_greens: the fine-space diagonal-inverse applies
                # are THE config-5 wall (BENCH.md 4b: 1,693 s of 3,810 on
                # the contended one-core host); HBM-resident Ozaki
                # refined applies are immune to host RAM contention.
                self.fine_saddle = make_block_saddle_system(
                    _BucketsOnly(n_fine, fine_gathers),
                    fine_sym_buckets,
                    fine_lag_mat,
                    device_greens=True,
                    slice_guard=(
                        fine_guards if any(fine_guards) else None
                    ),
                )
            with tracer.stage("vms-init-coarse-saddle"):
                # The coarse saddle opts into device Green's applies too:
                # its host sweeps measured 311 s of a contended config-5
                # run (70 applies over the 1.4 GB coarse table at
                # degraded RAM bandwidth).
                self.coarse_saddle = make_block_saddle_system(
                    disc, coarse_sym_buckets, coarse_lag_mat,
                    device_greens=True,
                    slice_guard=(
                        coarse_guards if any(coarse_guards) else None
                    ),
                )
            # The Green's function G' = A_f^{-1} - P A_c^{-1} P^T sees the
            # MAX of the two diagonal-inverse apply errors, so refinement
            # rounds that polish one side below the other side's floor are
            # unobservable in G' and cost a full pass over that side's
            # block + inverse tables per apply (measured: the coarse
            # saddle at rounds=2 spent 239 s over 82 config-5 calls
            # polishing to 1.7e-10 under a fine-apply floor of 4.1e-10).
            tol = max(
                self.fine_saddle.refine_floor(),
                self.coarse_saddle.refine_floor(),
            )
            self.fine_saddle.relax_refine_rounds(tol)
            self.coarse_saddle.relax_refine_rounds(tol)
            self.fine_decomp = None
            self.coarse_decomp = None
            self.fine_sym_mat = None
            self.coarse_sym_mat = None
            return

        # Direct-LU path materializes every block now: drain any
        # still-in-flight background download / Galerkin threads first.
        for g in list(fine_guards) + list(coarse_guards):
            if g is not None:
                g(None)
        fine_block = sp.block_diag(fine_sym_leaf)
        if fine_lag_mat is not None:
            fine_mat = sp.block_array(
                [[fine_block, fine_lag_mat.T], [fine_lag_mat, None]], format="csc"
            )
        else:
            fine_mat = sp.csc_array(fine_block)
        self.fine_sym_mat = fine_mat
        self.fine_decomp = sla.splu(sp.csc_matrix(fine_mat))

        coarse_block = sp.block_diag(coarse_sym_leaf)
        if coarse_lag_mat is not None:
            coarse_mat = sp.block_array(
                [[coarse_block, coarse_lag_mat.T], [coarse_lag_mat, None]],
                format="csc",
            )
        else:
            coarse_mat = sp.csc_array(coarse_block)
        self.coarse_sym_mat = coarse_mat
        self.coarse_decomp = sla.splu(sp.csc_matrix(coarse_mat))

    # -- operator application ------------------------------------------

    def __getattr__(self, name):
        # Dev mode never materializes the block-diagonal projector CSR
        # (~270M nnz at config-5 scale); build it lazily from the shared
        # inclusion matrix for the few host consumers (tests, hp paths).
        if name == "projector_c2f" and self.__dict__.get("_dev_ops"):
            e = self.disc.n_leaves
            mat = sp.csr_array(
                sp.kron(sp.eye(e, format="csr"), self._incl_np, format="csr")
            )
            self.projector_c2f = mat
            return mat
        raise AttributeError(name)

    def _rebuild_fine_advection(self, fine_dofs) -> None:
        """(Re)build the device-resident fine advection chunks.

        Stores ONE chunked ``[E, n_f, n_f]`` sum (linear + nonlinear at the
        current solution) instead of the previous separate linear and
        nonlinear tables — half the HBM residency (3.4 GB saved at
        BASELINE config-5 scale), paid for by re-assembling the linear
        blocks on device at each nonlinear update (~1 s chunked batched
        GEMMs vs a second resident table).
        """
        spec = self.disc.form_spec
        batch = self._rank_batch
        keys = tuple(self._adv_statics.keys())
        svals = tuple(self._adv_statics[k] for k in keys)
        lin_fn = element_matrix_fn(
            batch, self.compiled_advection.linear_blocks, spec, keys
        )
        nonlin_blocks = self.compiled_advection.nonlin_blocks
        nonlin_fn = (
            None
            if (nonlin_blocks is None or fine_dofs is None)
            else element_matrix_fn(batch, nonlin_blocks, spec, keys)
        )
        e = batch.n_elements
        n_f = spec.total_size(*batch.orders)
        dofs2 = (
            None
            if nonlin_fn is None
            else jnp.asarray(fine_dofs).reshape(e, n_f)
        )
        # ~0.5 GB f64 per chunk; power-of-two cap so every chunk (tail
        # included, via the evaluator's padding) reuses one compiled shape.
        cap = max(1, int(5e8 / (n_f * n_f * 8)))
        cap = 1 << (cap.bit_length() - 1)
        corners = batch.corners
        self._fine_adv_chunks = None  # free the old chunks before rebuilding
        chunks = []
        for lo in range(0, e, cap):
            hi = min(lo + cap, e)
            sv = tuple(s[lo:hi] for s in svals)
            mats = lin_fn(corners[lo:hi], None, sv)
            if nonlin_fn is not None:
                mats = mats + nonlin_fn(corners[lo:hi], dofs2[lo:hi], sv)
            chunks.append(mats)
        self._fine_adv_chunks = chunks

    @staticmethod
    def _galerkin_dispatch(m_chunks, p_np: np.ndarray):
        """Enqueue the per-chunk ``P^T M_e P`` device GEMMs (async).

        Returns the list of in-flight device chunk results, or None
        off-TPU / on a dispatch failure — the finalize step then runs the
        host triple product.  Dispatching BEFORE the caller downloads the
        fine blocks lets the Galerkin GEMMs compute while the ~3.4 GB
        block download streams through the tunnel.
        """
        if jax.default_backend() != "tpu":
            return None
        try:
            p_dev = jnp.asarray(p_np)
            return [_galerkin_chunk(c, p_dev) for c in m_chunks]
        except Exception as exc:
            if tracer.enabled:
                print(f"[trace] device galerkin fell back: {exc}", flush=True)
            return None

    @staticmethod
    def _galerkin_finalize(
        parts, p_np: np.ndarray, m_host: np.ndarray, wait=None
    ) -> np.ndarray:
        """``P^T A_f P``: collect the device Galerkin chunks, or host fall back.

        The seventh-session rejection of a device Galerkin build applied
        to ~1e-12-relative schemes (an INDEPENDENT coarse-side
        perturbation is inadmissible in ``G' = A_f^-1 - P A_c^-1 P^T``);
        cutoff 10 with per-pair f64 accumulation (see _galerkin_chunk)
        puts the Ozaki truncation at 2^-70 — at or below the host f64
        GEMM's own roundoff — so consistency with the downloaded fine
        blocks holds.  Replaces the single-threaded host triple product
        (187 s at config-5 scale).  A per-run probe pins the first
        elements against the host product; any failure falls back to the
        host path.
        """
        if parts is not None:
            try:
                outs = [np.asarray(c) for c in parts]
                coarse = outs[0] if len(outs) == 1 else np.concatenate(outs)
                k = min(4, m_host.shape[0])
                if wait is not None:
                    wait(k)
                ref = np.matmul(p_np.T, np.matmul(m_host[:k], p_np))
                err = float(
                    np.abs(coarse[:k] - ref).max()
                    / max(np.abs(ref).max(), 1e-300)
                )
                if not np.isfinite(err) or err > 1e-12:
                    raise RuntimeError(
                        f"device Galerkin probe error {err:.2e}"
                    )
                return coarse
            except Exception as exc:
                if tracer.enabled:
                    print(
                        f"[trace] device galerkin fell back: {exc}",
                        flush=True,
                    )
        if wait is not None:
            wait(None)
        return np.matmul(p_np.T, np.matmul(m_host, p_np))

    @staticmethod
    def _galerkin_coarse(
        m_dev, p_np: np.ndarray, m_host: np.ndarray
    ) -> np.ndarray:
        """``P^T A_f P`` from a single device block table (non-pipelined)."""
        e, n_f, _ = m_dev.shape
        step = max(1, min(e, int(5e8 / (n_f * n_f * 8))))
        chunks = [m_dev[lo : lo + step] for lo in range(0, e, step)]
        return SuyashGreenOperator._galerkin_finalize(
            SuyashGreenOperator._galerkin_dispatch(chunks, p_np), p_np, m_host
        )

    def _apply_fine_advection(self, v):
        """F v (fine advection, linear + current nonlinear part)."""
        with tracer.stage("vms-advection-apply"):
            return self._apply_fine_advection_inner(v)

    def _apply_fine_advection_inner(self, v):
        if self._dev_ops:
            # Retry ladder on transient HBM pressure: the exhaustion comes
            # from buffers another path just dropped (a failed dev-greens
            # upload/compile, freed-but-uncollected chunks from
            # _rebuild_advection), not from this apply's own ~10 MB
            # footprint — and the relay arena recovers on a timescale of
            # seconds, so escalating waits (a 2 s GC retry was measured
            # insufficient after a failed multi-GB compile) beat failing a
            # multi-hour solve.
            import gc
            import time as _time

            for wait in (0.0, 2.0, 15.0, 60.0):
                if wait:
                    gc.collect()
                    _time.sleep(wait)
                try:
                    return self._apply_fine_advection_dev(v)
                except Exception as exc:
                    if "RESOURCE_EXHAUSTED" not in str(exc):
                        raise
                    last = exc
            raise last
        return self.fine_advection_operator @ np.asarray(v)

    def _apply_fine_advection_dev(self, v):
        chunks = self._fine_adv_chunks
        e = sum(c.shape[0] for c in chunks)
        v2 = jnp.asarray(v).reshape(e, -1)
        parts = []
        lo = 0
        for c in chunks:
            parts.append(_block_gemv(c, v2[lo : lo + c.shape[0]]))
            lo += c.shape[0]
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        return np.asarray(out).ravel()

    def _project_to_coarse(self, x):
        """P^T x (dual projection of a fine vector to coarse DoFs).

        Host numpy in dev mode: the [E, n_f] @ [n_f, n_c] product is ~0.5
        GFLOP and the Green's pipeline around it is host-resident — two
        ~10 MB tunnel hops cost more than the host GEMM."""
        if self._dev_ops:
            n_f = self._incl_np.shape[0]
            return (np.asarray(x).reshape(-1, n_f) @ self._incl_np).ravel()
        return np.asarray(x) @ self.projector_c2f

    def _prolong_to_fine(self, u):
        """P u (coarse DoFs to the fine space)."""
        if self._dev_ops:
            n_c = self._incl_np.shape[1]
            return (np.asarray(u).reshape(-1, n_c) @ self._incl_np.T).ravel()
        return self.projector_c2f @ np.asarray(u)

    def fine_scale_greens_function(self, x: np.ndarray) -> np.ndarray:
        """G' x = A_f^{-1} x - P A_c^{-1} P^T x (solve_system.py:949-961)."""
        if self.matrix_free:
            # Static condensation: the assembled trace Schur complement is
            # factored once (trace-sized, sparse) and every G' application
            # is batched element solves + two triangular sweeps — the full
            # fine saddle matrix never materializes.
            from mfv2d_tpu.solver.iterative import solve_schur_direct

            # Plain numpy in, duck-typed out: lean saddle systems solve
            # entirely host-side inside solve_schur_direct (no tunnel hops).
            with tracer.stage("greens-fine-schur"):
                u_f, _, _, _ = solve_schur_direct(
                    self.fine_saddle,
                    x,
                    np.zeros(self.fine_saddle.n_lagrange),
                )
            with tracer.stage("greens-coarse-schur"):
                u_c, _, _, _ = solve_schur_direct(
                    self.coarse_saddle,
                    self._project_to_coarse(x),
                    np.zeros(self.coarse_saddle.n_lagrange),
                )
            return np.asarray(u_f) - self._prolong_to_fine(np.asarray(u_c))
        result_fine = self.fine_decomp.solve(np.pad(x, (0, self.fine_padding)))[
            : x.size
        ]
        coarse_sol = self.coarse_decomp.solve(
            np.pad(self._project_to_coarse(x), (0, self.coarse_padding))
        )
        result_coarse = self._prolong_to_fine(
            coarse_sol[: coarse_sol.size - self.coarse_padding]
        )
        return result_fine - result_coarse

    def set_apply_accuracy(self, tier: str) -> None:
        """Accuracy tier ("strict"/"loose") for the Green's saddle applies.

        The Picard driver runs in-loop unresolved-scale solves at the
        "loose" tier (fixed-point iterations self-correct, so loose
        device applies cost nothing in the final answer) and restores
        "strict" for the guarded convergence re-solve whose scales DO
        reach the answer."""
        for s in (
            getattr(self, "fine_saddle", None),
            getattr(self, "coarse_saddle", None),
        ):
            if s is not None and hasattr(s, "dev_greens_accuracy"):
                s.dev_greens_accuracy = tier

    def compute_unresolved_contributions(
        self,
        coarse_solution: np.ndarray,
        initial_guess: np.ndarray | None,
        rtol_override: float | None = None,
        atol_override: float | None = None,
    ) -> np.ndarray:
        """Fixed-point iteration for the unresolved-scale forcing."""
        return iterate_unresolved_contributions(
            self._apply_fine_advection,
            self.fine_scale_greens_function,
            self._prolong_to_fine,
            self.fine_forcing,
            self.convergence,
            self.iteration,
            self.relaxation,
            coarse_solution,
            initial_guess,
            rtol_override=rtol_override,
            atol_override=atol_override,
        )

    def recover_unresolved(
        self, coarse_solution: np.ndarray, unresolved_contribution: np.ndarray
    ) -> np.ndarray:
        """Unresolved scales from the unresolved-contribution forcing."""
        residual = (
            self.fine_forcing
            - self._apply_fine_advection(
                self._prolong_to_fine(
                    coarse_solution[: coarse_solution.size - self.coarse_padding]
                )
            )
            - unresolved_contribution
        )
        return self.fine_scale_greens_function(residual)

    def fine_results_to_coarse_dofs(self, x: np.ndarray, *, dual: bool) -> np.ndarray:
        """Project fine-scale results back to the coarse DoFs (padded)."""
        del dual  # both products are P^T x; kept for API parity
        return np.pad(self._project_to_coarse(x), (0, self.coarse_padding))

    def update_nonlinear_advection(self, coarse_dofs: np.ndarray) -> None:
        """Rebuild the advection operator with the current nonlinear field."""
        if self.compiled_advection.nonlin_blocks is None:
            return
        # coarse_dofs may carry lagrange padding; strip it.  (Dev mode must
        # not touch projector_c2f here: its lazy CSR build is ~270M nnz at
        # config-5 scale and exists only for host consumers.)
        n_coarse = (
            self.disc.n_leaves * self._incl_np.shape[1]
            if self._dev_ops
            else self.projector_c2f.shape[1]
        )
        fine_dofs = self._prolong_to_fine(coarse_dofs[:n_coarse])

        if self._dev_ops:
            # Single bucket: rebuild the device advection chunks (linear +
            # nonlinear summed — one resident table, no 100M-nnz host
            # block_diag rebuild).
            self._rebuild_fine_advection(fine_dofs)
            return

        nonlin_leaf: list[np.ndarray | None] = [None] * self.disc.n_leaves
        for bucket, fine_batch in zip(self.disc.buckets, self.fine_batches):
            gather = (
                self.fine_offsets[bucket.leaf_ranks][:, None]
                + np.arange(
                    self.disc.form_spec.total_size(*fine_batch.orders), dtype=np.int64
                )[None, :]
            )
            dofs = jnp.asarray(fine_dofs[gather])
            statics = evaluate_static_fields(
                fine_batch, self.compiled_advection.fields
            )
            mats = np.asarray(
                jit_element_matrices(
                    self.disc.form_spec,
                    self.compiled_advection.nonlin_blocks,
                    fine_batch,
                    dofs=dofs,
                    static_fields=statics,
                )
            )
            for j, rank in enumerate(bucket.leaf_ranks):
                nonlin_leaf[int(rank)] = mats[j]
        nonlin = sp.coo_array(sp.block_diag(nonlin_leaf, format="coo"))
        self.fine_advection_operator = (
            self.fine_linear_advection_operator + nonlin
        ).tocsr()

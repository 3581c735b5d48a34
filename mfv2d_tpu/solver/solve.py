"""Assembly of the global system and the nonlinear (Picard) solve loop.

Structure mirrors the reference solver (python/mfv2d/solve_system.py): the
element LHS is assembled once into a frozen saddle-point factorization; each
iteration re-evaluates the element residual with the current solution (the
nonlinear terms enter only through the residual — defect correction).  All
per-element work runs as batched, jitted device computations over the order
buckets; only the sparse factorization is host-side (scipy SuperLU), with a
dense on-device factorization available for small systems.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import numpy.typing as npt
from mfv2d_tpu.utils.lazy import lazy_module

sp = lazy_module("scipy.sparse")
sla = lazy_module("scipy.sparse.linalg")

from mfv2d_tpu.boundary import BoundaryCondition2DSteady
from mfv2d_tpu.compiler import CompiledSystem, SystemBlocks
from mfv2d_tpu.continuity import add_system_constraints
from mfv2d_tpu.evaluation import (
    ElementBatch,
    compute_element_vectors,
    evaluate_static_fields,
)
from mfv2d_tpu.kform import (
    KElementProjection,
    KFormUnknown,
    KWeight,
    UnknownFormOrder,
)
from mfv2d_tpu.mimetic import vtk_lagrange_ordering
from mfv2d_tpu.projection import element_dual_dofs, reconstruct
from mfv2d_tpu.progress import ProgressTracker
from mfv2d_tpu.solver.discretization import Discretization, OrderBucket
from mfv2d_tpu.system import ElementFormSpecification, KFormSystem
from mfv2d_tpu.vis import VTK_LAGRANGE_QUADRILATERAL, ReconstructedGrid


@dataclass(frozen=True)
class ConvergenceSettings:
    """Convergence criteria of an iterative solver."""

    maximum_iterations: int = 100
    absolute_tolerance: float = 1e-6
    relative_tolerance: float = 1e-5


@dataclass(frozen=True)
class SolverSettings:
    """Nonlinear solver settings (reference solve_system.py:554-601).

    ``linear_solver`` selects the inner linear solve: "direct" (host sparse
    LU of the frozen saddle matrix, the reference behavior), "dense"
    (on-device dense LU, enables the fused scan/while_loop fast paths),
    "schur_direct" (static condensation: assembled trace Schur complement,
    sparse-factored once), or the on-device matrix-free paths "schur",
    "pcg", "gmres" (see mfv2d_tpu.solver.iterative).
    """

    convergence: ConvergenceSettings = ConvergenceSettings()
    relaxation: float = 1.0
    linear_solver: str = "direct"
    method: str = "picard"
    """Nonlinear iteration: "picard" (frozen operator, the reference scheme)
    or "newton" (exact Jacobian via jax.jacfwd, rebuilt every iteration)."""
    device_mesh: object | None = None
    """A 1D ``jax.sharding.Mesh`` (axis "e"): run the solve element-sharded
    over it (mfv2d_tpu.parallel.sharding) — steady Picard solves and
    linear/nonlinear time marches on uniform-order meshes.  ``linear_solver``
    selects the trace Krylov method ("gmres" for nonsymmetric systems,
    otherwise the fused Schur CG)."""
    anderson_m: int = 0
    """Anderson acceleration window for the host Picard loop (0 = off,
    the reference behavior).  With ``m > 0`` each update extrapolates over
    the last ``m`` (iterate, preconditioned-residual) pairs via a small
    least-squares problem — typically 1.5-2x fewer Picard iterations on
    frozen-operator nonlinear solves at the cost of ``m`` stored iterate
    pairs.  Guarded: an extrapolation whose residual grows falls back to
    the plain damped update for that iteration."""


@dataclass(frozen=True)
class TimeSettings:
    """Trapezoidal time-march settings (reference solve_system.py:485-509)."""

    dt: float
    nt: int
    time_march_relations: Mapping[KWeight, KFormUnknown]
    sample_rate: int = 1


@dataclass(frozen=True)
class SystemSettings:
    """System, boundary conditions, constraints and initial conditions."""

    system: KFormSystem
    boundary_conditions: Sequence[BoundaryCondition2DSteady] = field(
        default_factory=tuple
    )
    constrained_forms: Sequence[tuple[float, KFormUnknown]] = field(
        default_factory=tuple
    )
    initial_conditions: Mapping[KFormUnknown, Callable] = field(default_factory=dict)
    over_integration_order: int = 3


@dataclass(frozen=True)
class VMSSettings:
    """Variational multi-scale fine-scale estimation settings."""

    symmetric_system: KFormSystem
    nonsymmetric_system: KFormSystem
    order_increase: int
    fine_scale_convergence: ConvergenceSettings
    relaxation: float = 1.0
    # None: pick automatically (matrix-free Schur CG once the fine space
    # exceeds ~150k DoFs, where a host sparse LU stops being practical).
    matrix_free: bool | None = None
    # "gmres" solves the (linear) unresolved-scale equation (I + F G') u = b
    # with a Krylov method — far fewer Green's-function applications than
    # the reference's fixed-point iteration ("fixed-point", solve_system.py
    # :858-897), which remains available for parity.
    iteration: str = "gmres"
    # Inexact-forcing schedule: while the outer Picard residual is still
    # large, solve the unresolved-scale equation only as tightly as the
    # iterate it feeds (each saved GMRES iteration is one fewer
    # Green's-function application — the dominant per-Picard cost at
    # BASELINE config-5 scale).  The converged answer is always re-solved
    # at fine_scale_convergence's own tolerance before the Picard loop is
    # allowed to exit, so the final solution and fine scales are
    # unaffected.  Disable for strict per-iteration parity with the
    # reference's fixed-tolerance iteration.
    inexact_forcing: bool = True
    # Anticipatory strict solve: once the previous outer residual is within
    # this factor of the Picard exit threshold, the in-loop unresolved-scale
    # solve runs at the STRICT apply tier and the configured tolerance
    # directly, so a convergence exit needs no guarded re-solve.  The
    # loose-converge -> strict-re-solve -> miss -> repeat cycle measured 3
    # extra Picard iterations on BASELINE config 5 (each paying ~5-8
    # contended host Green's applications); anticipating one iteration
    # early replaces that cycle with at most one already-strict iteration.
    # 0 disables (always loosen until the guarded re-solve).
    anticipate_factor: float = 3.0
    # Inexact-forcing multiplier: the in-loop unresolved-scale solve runs
    # at absolute tolerance eta = inexact_eta * (previous outer residual).
    # The u* error enters the NEXT outer residual through the dual
    # projection with measured amplification ~7-11x (config 5), so the
    # outer residual is floored at ~10 * eta — with 0.05 that floor is
    # ~0.5x the previous residual and DOMINATES the physics contraction
    # (~0.1x/iter) whenever the inner GMRES exits at (not below) its
    # tolerance: measured 17 Picard iterations instead of 13 on config 5,
    # with the residual tracking ~10x eta every iteration.  0.005 keeps
    # the floor at ~0.05x — below the physics rate — for ~1 extra inner
    # matvec per iteration on the near-identity (I + F G') operator.
    inexact_eta: float = 0.005


@dataclass(frozen=True)
class SolutionStatistics:
    """Solve statistics (reference solve_system.py:620-631)."""

    element_orders: dict[tuple[int, int], int]
    n_total_dofs: int
    n_leaf_dofs: int
    n_lagrange: int
    n_elems: int
    n_leaves: int
    iter_history: npt.NDArray[np.uint32]
    residual_history: npt.NDArray[np.float64]


# ---------------------------------------------------------------------------
# RHS assembly
# ---------------------------------------------------------------------------


def compute_element_rhs_bucket(system: KFormSystem, bucket: OrderBucket) -> np.ndarray:
    """Explicit forcing projections for one bucket: ``[E, N]``."""
    p1, p2 = bucket.orders
    parts: list[np.ndarray] = []
    for eq in system.equations:
        n = eq.weight.order.full_unknown_count(p1, p2)
        acc = np.zeros((bucket.batch.n_elements, n))
        for k, f in eq.right.explicit_terms:
            if not isinstance(f, KElementProjection) or f.func is None:
                continue
            acc += float(k) * np.asarray(
                element_dual_dofs(eq.weight.order, bucket.batch, f.func)
            )
        parts.append(acc)
    return np.concatenate(parts, axis=1)


def compute_forcing_vector(disc: Discretization, system: KFormSystem) -> np.ndarray:
    """Global explicit forcing vector over all buckets."""
    out = np.zeros(disc.n_dofs)
    for bucket in disc.buckets:
        out[bucket.gather] = compute_element_rhs_bucket(system, bucket)
    return out


# ---------------------------------------------------------------------------
# Batched residual / matrix evaluation
# ---------------------------------------------------------------------------


class SystemEvaluator:
    """Jitted per-bucket evaluation of element matrices and residuals.

    Static (callable) interior-product fields are host-evaluated once per
    bucket; unknown-form fields are reconstructed inside the trace from the
    DoFs argument, so the jitted residual stays valid across Picard
    iterations and time steps.
    """

    def __init__(
        self,
        form_spec: ElementFormSpecification,
        compiled: CompiledSystem,
        disc: Discretization,
    ) -> None:
        self.form_spec = form_spec
        self.compiled = compiled
        self.disc = disc
        self._static_fields = [
            evaluate_static_fields(bucket.batch, compiled.fields)
            for bucket in disc.buckets
        ]
        self._vec_fns: dict[tuple[int, int], Callable] = {}

    def refresh_static_fields(self) -> None:
        """Re-evaluate callable (static) interior-product fields.

        Serves TimeDependent OPERATOR fields: the march sets
        ``TimeDependent.current_time`` to the new time level and calls this
        before re-assembling, so the advecting field re-evaluates at that
        time.  Cheap: the jitted evaluators take the static values as
        ARGUMENTS (no retrace), and every consumer reads
        ``self._static_fields`` at call time.
        """
        self._static_fields = [
            evaluate_static_fields(bucket.batch, self.compiled.fields)
            for bucket in self.disc.buckets
        ]

    def _vector_fn(self, i_bucket: int, which: str) -> Callable:
        from mfv2d_tpu.evaluation import element_vector_fn

        blocks = (
            self.compiled.lhs_blocks if which == "lhs" else self.compiled.rhs_blocks
        )
        bucket = self.disc.buckets[i_bucket]
        statics = self._static_fields[i_bucket]
        static_keys = tuple(statics.keys())
        fn = element_vector_fn(bucket.batch, blocks, self.form_spec, static_keys)
        static_vals = tuple(statics[k] for k in static_keys)
        corners = bucket.batch.corners

        def wrapped(dofs):
            return fn(corners, dofs, static_vals)

        return wrapped

    def element_matrices(
        self, which: SystemBlocks, solution: np.ndarray | None = None
    ) -> list[np.ndarray]:
        """Batched element matrices per bucket for the given block set."""
        from mfv2d_tpu.evaluation import element_matrix_fn

        out = []
        for i, bucket in enumerate(self.disc.buckets):
            dofs = (
                jnp.asarray(solution[bucket.gather]) if solution is not None else None
            )
            statics = self._static_fields[i]
            static_keys = tuple(statics.keys())
            fn = element_matrix_fn(
                bucket.batch, which, self.form_spec, static_keys
            )
            out.append(
                np.asarray(
                    fn(
                        bucket.batch.corners,
                        dofs,
                        tuple(statics[k] for k in static_keys),
                    )
                )
            )
        return out

    def residual_value(self, solution: np.ndarray) -> np.ndarray:
        """Element-wise LHS(u) - RHS(u) evaluation, scattered globally."""
        out = np.zeros(self.disc.n_dofs)
        for i, bucket in enumerate(self.disc.buckets):
            dofs = jnp.asarray(solution[bucket.gather])
            val = self._vector_fn(i, "lhs")(dofs)
            if self.compiled.rhs_blocks is not None:
                val = val - self._vector_fn(i, "rhs")(dofs)
            out[bucket.gather] = np.asarray(val)
        return out

    def element_jacobians(self, solution: np.ndarray) -> list[np.ndarray]:
        """Exact per-element Jacobians d(LHS - RHS)/du via jax.jacfwd.

        The reference's Picard loop freezes the linear operator; the true
        Newton operator additionally carries the derivative of the
        solution-dependent interior-product fields.  Element independence
        makes the Jacobian block-diagonal, so it is computed as a vmap of a
        single-element jacfwd over each bucket.
        """
        from mfv2d_tpu.evaluation import ElementBatch
        from mfv2d_tpu.ops.geometry import JacobianTerms

        out: list[np.ndarray] = []
        for i, bucket in enumerate(self.disc.buckets):
            key = (i, 2)
            if key not in self._vec_fns:
                basis = bucket.batch.basis
                tb = bucket.batch.tb
                statics = self._static_fields[i]
                static_keys = list(statics.keys())
                compiled = self.compiled
                form_spec = self.form_spec

                def single(dofs_n, jac_terms, static_vals):
                    jac1 = JacobianTerms(*(t[None] for t in jac_terms))
                    b1 = ElementBatch.from_parts(basis, tb, jac1, 1)
                    st = {
                        k: v[None] for k, v in zip(static_keys, static_vals)
                    }
                    vec = compute_element_vectors(
                        form_spec,
                        compiled.lhs_blocks,
                        b1,
                        dofs_n[None],
                        static_fields=st,
                    )
                    if compiled.rhs_blocks is not None:
                        vec = vec - compute_element_vectors(
                            form_spec,
                            compiled.rhs_blocks,
                            b1,
                            dofs_n[None],
                            static_fields=st,
                        )
                    return vec[0]

                jac_fn = jax.jit(
                    jax.vmap(
                        jax.jacfwd(single, argnums=0),
                        in_axes=(0, tuple([0] * 5), tuple([0] * len(static_keys))),
                    )
                )
                self._vec_fns[key] = (jac_fn, static_keys)

            jac_fn, static_keys = self._vec_fns[key]
            bucket = self.disc.buckets[i]
            dofs = jnp.asarray(solution[bucket.gather])
            jac_terms = tuple(t for t in bucket.batch.jac)
            static_vals = tuple(
                self._static_fields[i][k] for k in static_keys
            )
            out.append(np.asarray(jac_fn(dofs, jac_terms, static_vals)))
        return out

    def matrices_per_leaf(self, matrices: list[np.ndarray]) -> list[np.ndarray]:
        """Reorder per-bucket matrix batches into leaf order."""
        out: list[np.ndarray | None] = [None] * self.disc.n_leaves
        for bucket, mats in zip(self.disc.buckets, matrices):
            for j, rank in enumerate(bucket.leaf_ranks):
                out[int(rank)] = mats[j]
        assert all(m is not None for m in out)
        return out  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# Linear system assembly + factorization
# ---------------------------------------------------------------------------


def compute_linear_system(
    disc: Discretization,
    system: KFormSystem,
    evaluator: SystemEvaluator,
    constrained_forms: Sequence[tuple[float, KFormUnknown]],
    boundary_conditions: Sequence[BoundaryCondition2DSteady],
    initial_solution: np.ndarray | None,
):
    """Forcing vector, element matrices, and Lagrange constraint block."""
    forcing = compute_forcing_vector(disc, system)
    # Per-leaf views for the in-place weak-BC additions.
    linear_vectors = [
        forcing[disc.element_offsets[i] : disc.element_offsets[i + 1]]
        for i in range(disc.n_leaves)
    ]
    matrices = evaluator.element_matrices(
        evaluator.compiled.lhs_blocks, initial_solution
    )
    lagrange_mat, lagrange_vec = add_system_constraints(
        system,
        disc.mesh,
        disc.basis_cache,
        constrained_forms,
        boundary_conditions,
        disc.leaf_indices,
        disc.element_offsets,
        linear_vectors,
    )
    return forcing, matrices, lagrange_mat, lagrange_vec


class FrozenSaddleSolver:
    """LU factorization of [[A, G^T], [G, 0]] reused across iterations.

    A is block-diagonal over elements.  Host scipy SuperLU by default; the
    matrix-free device path lives in :mod:`mfv2d_tpu.solver.iterative`.
    """

    def __init__(
        self,
        element_matrices_per_leaf: list[np.ndarray],
        lagrange_mat: sp.csr_array | None,
    ) -> None:
        main_mat = sp.block_diag(element_matrices_per_leaf, format="csr")
        if lagrange_mat is not None:
            main_mat = sp.block_array(
                ((main_mat, lagrange_mat.T), (lagrange_mat, None)), format="csr"
            )
        self.n_lagrange = 0 if lagrange_mat is None else lagrange_mat.shape[0]
        self._decomp = sla.splu(sp.csc_matrix(main_mat))

    def solve(self, rhs: np.ndarray) -> np.ndarray:
        return np.asarray(self._decomp.solve(rhs), np.float64)


def _preconditioned_newton_solve(
    solver: "FrozenSaddleSolver",
    evaluator: "SystemEvaluator",
    jac_blocks: list[np.ndarray],
    lagrange_mat,
    residual: np.ndarray,
    rel_tol: float,
    max_inner: int = 60,
) -> tuple[np.ndarray, bool]:
    """Solve ``J d = residual`` with the frozen factorization as preconditioner.

    Defect correction ``d += P^{-1}(residual - J d)`` converges at rate
    ``||I - P^{-1} J||``; each sweep costs one batched element GEMV plus one
    pair of triangular backsolves — far below a sparse refactorization.
    Returns ``(d, converged)``; on stall the caller refactorizes.
    """
    disc = evaluator.disc
    n = disc.n_dofs
    blocks_np = [np.asarray(b) for b in jac_blocks]

    def jac_apply(x: np.ndarray) -> np.ndarray:
        u = x[:n]
        out = np.zeros(n)
        for blocks, bucket in zip(blocks_np, disc.buckets):
            g = bucket.gather
            out[g] = np.einsum("eij,ej->ei", blocks, u[g], optimize=True)
        if lagrange_mat is None:
            return out
        lam = x[n:]
        out = out + lagrange_mat.T @ lam
        return np.concatenate((out, lagrange_mat @ u))

    r_norm = float(np.abs(residual).max())
    if r_norm == 0.0:
        return np.zeros_like(residual), True
    d = solver.solve(residual)
    prev = np.inf
    for _ in range(max_inner):
        s = residual - jac_apply(d)
        s_norm = float(np.abs(s).max())
        if s_norm <= rel_tol * r_norm:
            return d, True
        if s_norm >= 0.9 * prev:
            # Not contracting: the frozen operator is too far from J.
            return d, False
        prev = s_norm
        d = d + solver.solve(s)
    return d, False


def _sg_loose_applies_active(sg_operator) -> bool:
    """Whether any Green's saddle system serves LOOSE-tier device applies.

    When true, the in-loop unresolved scales carry up-to-10x-host-floor
    apply errors, so the convergence exit must re-solve at the strict
    tier even if the inner tolerance was never loosened."""
    for s in (
        getattr(sg_operator, "fine_saddle", None),
        getattr(sg_operator, "coarse_saddle", None),
    ):
        if s is not None and getattr(s, "_dev_greens_state", None) == "on-loose":
            return True
    return False


def non_linear_solve_run(
    max_iterations: int,
    relax: float,
    atol: float,
    rtol: float,
    print_residual: bool,
    evaluator: SystemEvaluator,
    explicit_vec: np.ndarray,
    time_carry_index_array: np.ndarray | None,
    time_carry_term: np.ndarray | None,
    solution: np.ndarray,
    global_lagrange: np.ndarray,
    max_mag: float,
    solver: FrozenSaddleSolver,
    lagrange_mat: sp.csr_array | None,
    fine_scales: np.ndarray | None = None,
    sg_operator=None,
    return_all_residuals: bool = False,
    newton: bool = False,
    checkpoint_cb=None,
    anderson_m: int = 0,
):
    """Picard / defect-correction iteration (reference solve_system.py:354).

    residual = forcing - (LHS(u) - RHS(u)) - G^T lambda  (plus VMS fine-scale
    forcing when enabled); update = frozen-LU solve of the residual.
    """
    progress_tracker: ProgressTracker | None = None
    iter_cnt = 0
    # Anderson acceleration (type II) over the damped-Picard fixed point
    # x_{k+1} = x_k + relax * P^{-1} r(x_k): keep the last m (iterate,
    # step) pairs and extrapolate via a small least-squares problem.
    # Exact-Newton steps don't need it (quadratic already).
    use_aa = anderson_m > 0 and not newton
    aa_x: list[np.ndarray] = []
    aa_f: list[np.ndarray] = []
    base_vec = np.array(explicit_vec, copy=True)
    if time_carry_term is not None:
        assert time_carry_index_array is not None
        base_vec[time_carry_index_array] += time_carry_term
    residuals = np.zeros(max_iterations)
    max_residual = 0.0
    unresolved_scales = fine_scales
    # Inexact-forcing schedule (VMSSettings.inexact_forcing): solve the
    # unresolved-scale equation only as accurately as the outer iterate
    # needs — the u* error enters the Picard residual through an
    # O(1)-norm dual projection, so an ABSOLUTE inner tolerance of
    # 0.05 * r_{k-1} keeps the forcing error one decade under the outer
    # residual it feeds.  Each saved GMRES iteration is one fewer
    # Green's-function application, the dominant per-Picard cost at
    # BASELINE config-5 scale (BENCH.md 4b: greens-fine-schur is 50% of
    # the wall).  Correctness is guarded below: a convergence exit
    # reached with a loosened tolerance first re-solves the scales at the
    # configured tolerance and re-measures.
    vms_inexact = (
        sg_operator is not None
        and getattr(sg_operator, "inexact_forcing", False)
    )
    vms_atol_final = (
        float(sg_operator.convergence.absolute_tolerance)
        if sg_operator is not None
        else 0.0
    )
    vms_anticipate = (
        float(getattr(sg_operator, "anticipate_factor", 0.0))
        if sg_operator is not None
        else 0.0
    )
    vms_eta_mult = (
        float(getattr(sg_operator, "inexact_eta", 0.05))
        if sg_operator is not None
        else 0.05
    )
    # The Picard loop exits when max_residual <= atol OR <= max_mag * rtol.
    exit_threshold = max(atol, max_mag * rtol)
    vms_loosened = False

    from mfv2d_tpu.tracing import tracer

    while iter_cnt < max_iterations:
        with tracer.stage("picard-residual"):
            main_value = evaluator.residual_value(solution)
        if lagrange_mat is not None:
            main_value = main_value + lagrange_mat.T @ global_lagrange
            main_value = np.concatenate((main_value, lagrange_mat @ solution))

        residual = base_vec - main_value
        if sg_operator is not None:
            with tracer.stage("picard-vms-advection"):
                sg_operator.update_nonlinear_advection(solution)
            eta_abs: float | None = None
            anticipate = False
            if vms_inexact:
                # Outer-residual scale this iteration will see: the
                # previous measured residual, or the forcing magnitude
                # before the first one exists.
                r_scale = (
                    residuals[iter_cnt - 1]
                    if iter_cnt > 0
                    else float(np.abs(base_vec).max())
                )
                # Within anticipate_factor of the exit threshold this
                # iteration plausibly converges: solve strictly NOW so the
                # exit measurement needs no re-solve/miss cycle.
                anticipate = (
                    vms_anticipate > 0
                    and r_scale <= vms_anticipate * exit_threshold
                )
                if not anticipate:
                    eta_abs = max(vms_atol_final, vms_eta_mult * r_scale)
            with tracer.stage("picard-vms-unresolved"):
                # In-loop unresolved solves run at the "loose" apply
                # tier: Picard self-corrects, so only the final
                # (re-)solve's Green's accuracy reaches the answer —
                # measured: loose applies EVERYWHERE cost 4x on rms err,
                # loose in-loop with a strict final re-solve does not.
                # Only when the guarded convergence re-solve exists
                # (vms_inexact) — without it nothing would restore the
                # strict-tier scales before they reach the answer.
                loose_ok = (
                    vms_inexact
                    and not anticipate
                    and hasattr(sg_operator, "set_apply_accuracy")
                )
                if loose_ok:
                    sg_operator.set_apply_accuracy("loose")
                try:
                    unresolved_scales = (
                        sg_operator.compute_unresolved_contributions(
                            solution, unresolved_scales, atol_override=eta_abs
                        )
                    )
                finally:
                    if loose_ok:
                        sg_operator.set_apply_accuracy("strict")
            vms_loosened = (
                eta_abs is not None and eta_abs > vms_atol_final
            ) or (loose_ok and _sg_loose_applies_active(sg_operator))
            residual -= sg_operator.fine_results_to_coarse_dofs(
                unresolved_scales, dual=True
            )

        max_residual = float(np.abs(residual).max())
        residuals[iter_cnt] = max_residual
        if print_residual:
            if progress_tracker is None:
                progress_tracker = ProgressTracker(
                    atol, max_residual, max_residual, max_iterations, err_width=20
                )
            else:
                progress_tracker.update_iteration(max_residual)
            # "\r" keeps a terminal single-line; flush + newline fallback
            # when stdout is a file so long runs show live progress in logs.
            import sys as _sys

            _end = "\r" if _sys.stdout.isatty() else "\n"
            print(
                progress_tracker.state_str("{} - {} | {}"),
                end=_end,
                flush=True,
            )

        if not (max_residual > atol and max_residual > max_mag * rtol):
            if vms_inexact and vms_loosened:
                # The exit was measured through a loosened unresolved-scale
                # solve; re-solve at the configured tolerance (warm-started,
                # so typically 1-2 extra Green's applications) and
                # re-measure before accepting convergence.
                with tracer.stage("picard-vms-unresolved"):
                    unresolved_scales = (
                        sg_operator.compute_unresolved_contributions(
                            solution, unresolved_scales
                        )
                    )
                vms_loosened = False
                residual = (
                    base_vec
                    - main_value
                    - sg_operator.fine_results_to_coarse_dofs(
                        unresolved_scales, dual=True
                    )
                )
                max_residual = float(np.abs(residual).max())
                residuals[iter_cnt] = max_residual
                if not (max_residual > atol and max_residual > max_mag * rtol):
                    break
            else:
                break

        if newton and iter_cnt > 0:
            # Exact-Newton step WITHOUT refactorizing: solve J_k d = r by
            # defect correction preconditioned with the frozen initial
            # factorization (J_k matvecs are cheap batched element GEMVs;
            # the host sparse refactorization was the per-iteration wall).
            # Falls back to a fresh factorization when the frozen
            # preconditioner no longer contracts (iterate drifted far).
            jac_blocks = evaluator.element_jacobians(solution)
            d_solution, ok = _preconditioned_newton_solve(
                solver,
                evaluator,
                jac_blocks,
                lagrange_mat,
                residual,
                rel_tol=1e-12,
            )
            if not ok:
                solver = FrozenSaddleSolver(
                    evaluator.matrices_per_leaf(jac_blocks), lagrange_mat
                )
                d_solution = solver.solve(residual)
        else:
            with tracer.stage("picard-solve"):
                # The update solve's accuracy never reaches the answer
                # directly: convergence is measured through the evaluator's
                # residual on the iterate, and the loop exits BEFORE
                # applying the update it just solved — so a relative apply
                # error eps shifts the next iterate by ~eps * |residual|,
                # which the measurement sees and later iterations correct.
                # Serve the main saddle's diagonal-inverse applies at the
                # loose device tier (when probed available) instead of
                # paying host-floor sweeps per update (measured 148.8 s of
                # host inv-applies across 16 Picard iterations at BASELINE
                # config-5 scale).
                import os as _os

                sys_obj = getattr(solver, "system", None)
                loosen = (
                    hasattr(sys_obj, "dev_greens_accuracy")
                    and _os.environ.get("MFV2D_TPU_PICARD_LOOSE", "1") != "0"
                )
                if loosen:
                    sys_obj.dev_greens_accuracy = "loose"
                try:
                    d_solution = solver.solve(residual)
                finally:
                    if loosen:
                        sys_obj.dev_greens_accuracy = "strict"
        n_lag = global_lagrange.size
        if use_aa:
            x_k = (
                np.concatenate((solution, global_lagrange))
                if n_lag
                else np.array(solution)
            )
            f_k = relax * np.asarray(d_solution)
            # Residual growth means the local linearization shifted (or the
            # VMS forcing moved); stale pairs then extrapolate the wrong
            # map — restart the window.
            if iter_cnt >= 1 and residuals[iter_cnt] > residuals[iter_cnt - 1]:
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
                    [aa_f[i + 1] - aa_f[i] for i in range(len(aa_f) - 1)], axis=1
                )
                dx = np.stack(
                    [aa_x[i + 1] - aa_x[i] for i in range(len(aa_x) - 1)], axis=1
                )
                gamma, *_ = np.linalg.lstsq(df, f_k, rcond=1e-10)
                # Large coefficients signal near-singular differences —
                # extrapolating there amplifies noise; take the plain step.
                if np.abs(gamma).max() <= 25.0:
                    x_new = x_k + f_k - (dx + df) @ gamma
            if n_lag:
                solution = x_new[:-n_lag]
                global_lagrange = x_new[-n_lag:]
            else:
                solution = x_new
        elif n_lag:
            solution = solution + relax * d_solution[:-n_lag]
            global_lagrange = global_lagrange + relax * d_solution[-n_lag:]
        else:
            solution = solution + relax * d_solution
        iter_cnt += 1
        if checkpoint_cb is not None:
            checkpoint_cb(iter_cnt, solution, global_lagrange, unresolved_scales)

    if not return_all_residuals:
        return (
            solution,
            global_lagrange,
            iter_cnt,
            np.array(max_residual),
            unresolved_scales,
        )
    return solution, global_lagrange, iter_cnt, residuals, unresolved_scales


# ---------------------------------------------------------------------------
# DoF conversions and time-march helpers
# ---------------------------------------------------------------------------


def compute_element_dual_from_primal_global(
    disc: Discretization, primal: np.ndarray
) -> np.ndarray:
    """Apply the per-form mass matrices to the whole solution vector."""
    from mfv2d_tpu.evaluation import jit_apply_mass

    out = np.zeros_like(primal)
    for bucket in disc.buckets:
        out[bucket.gather] = np.asarray(
            jit_apply_mass(
                disc.form_spec,
                bucket.batch,
                jnp.asarray(primal[bucket.gather]),
                inverse=False,
            )
        )
    return out


def compute_element_primal_from_dual_global(
    disc: Discretization, dual: np.ndarray
) -> np.ndarray:
    """Apply the per-form inverse mass matrices to the whole vector."""
    from mfv2d_tpu.evaluation import jit_apply_mass

    out = np.zeros_like(dual)
    for bucket in disc.buckets:
        out[bucket.gather] = np.asarray(
            jit_apply_mass(
                disc.form_spec,
                bucket.batch,
                jnp.asarray(dual[bucket.gather]),
                inverse=True,
            )
        )
    return out


def compute_initial_solution(
    disc: Discretization,
    system: KFormSystem,
    initial_conditions: Mapping[KFormUnknown, Callable],
) -> tuple[np.ndarray, np.ndarray]:
    """Project initial conditions: returns (dual dofs, primal dofs)."""
    dual = np.zeros(disc.n_dofs)
    for bucket in disc.buckets:
        p1, p2 = bucket.orders
        offsets = disc.form_spec.form_offsets(p1, p2)
        parts = []
        for i, form in enumerate(disc.form_spec.iter_forms()):
            n = offsets[i + 1] - offsets[i]
            func = initial_conditions.get(form)
            if func is None:
                parts.append(np.zeros((bucket.batch.n_elements, n)))
            else:
                parts.append(
                    np.asarray(element_dual_dofs(form.order, bucket.batch, func))
                )
        dual[bucket.gather] = np.concatenate(parts, axis=1)
    primal = compute_element_primal_from_dual_global(disc, dual)
    return dual, primal


def find_time_carry_indices(
    unknowns: Sequence[int],
    form_specs: ElementFormSpecification,
    order_1: int,
    order_2: int,
) -> npt.NDArray[np.uint32]:
    """DoF indices (within one element) carried by the time march."""
    output: list[npt.NDArray[np.uint32]] = []
    for iu, u in enumerate(unknowns):
        assert iu == 0 or unknowns[iu - 1] < u, "Unknowns must be sorted."
        offset = form_specs.form_offset(u, order_1, order_2)
        size = form_specs.form_size(u, order_1, order_2)
        output.append(offset + np.arange(size, dtype=np.uint32))
    return np.concatenate(output, dtype=np.uint32)


# ---------------------------------------------------------------------------
# Output reconstruction
# ---------------------------------------------------------------------------


def reconstruct_mesh_from_solution(
    disc: Discretization,
    recon_order: int | None,
    solution: np.ndarray,
    vms_solution: np.ndarray | None = None,
) -> ReconstructedGrid:
    """Sample every form on a per-element nodal grid (VTK Lagrange cells).

    Reconstruction is vectorized per order bucket (reconstruct_batched); the
    per-leaf host loop this replaces dominated warm-solve wall time.
    """
    from mfv2d_tpu.projection import reconstruct_batched

    form_spec = disc.form_spec
    n_leaves = disc.n_leaves
    per_leaf_points: list[np.ndarray | None] = [None] * n_leaves
    per_leaf_forms: list[dict | None] = [None] * n_leaves
    per_leaf_vms: list[dict | None] = [None] * n_leaves
    order_list = [tuple(int(v) for v in disc.element_orders[i]) for i in range(n_leaves)]

    for bucket in disc.buckets:
        p1, p2 = bucket.orders
        ro = max(p1, p2) if recon_order is None else recon_order
        nodes = np.linspace(-1.0, 1.0, ro + 1)
        xi = nodes[None, :]
        eta = nodes[:, None]
        corners = np.asarray(bucket.batch.corners)
        e = corners.shape[0]
        # Physical points via bilinear interpolation (NumPy).
        b11 = (1 - xi) / 2
        b12 = (1 + xi) / 2
        b21 = (1 - eta) / 2
        b22 = (1 + eta) / 2
        cx = corners[..., 0][:, :, None, None]
        cy = corners[..., 1][:, :, None, None]
        ex = (cx[:, 0] * b11 + cx[:, 1] * b12) * b21 + (
            cx[:, 3] * b11 + cx[:, 2] * b12
        ) * b22
        ey = (cy[:, 0] * b11 + cy[:, 1] * b12) * b21 + (
            cy[:, 3] * b11 + cy[:, 2] * b12
        ) * b22

        dofs = np.asarray(solution)[bucket.gather]
        basis = bucket.batch.basis
        offsets = form_spec.form_offsets(p1, p2)
        form_vals = {}
        vms_vals = {}
        for idx, (name, order) in enumerate(form_spec):
            fd = dofs[:, offsets[idx] : offsets[idx + 1]]
            vals = reconstruct_batched(corners, basis, order, fd, xi, eta)
            shape = (e, -1, 2) if order == UnknownFormOrder.FORM_ORDER_1 else (e, -1)
            form_vals[name] = np.reshape(vals, shape)
            if vms_solution is not None:
                vdofs = np.asarray(vms_solution)[bucket.gather][
                    :, offsets[idx] : offsets[idx + 1]
                ]
                m = np.asarray(bucket.batch.mass(order, False))
                vdofs = np.linalg.solve(m, vdofs[..., None])[..., 0]
                vvals = reconstruct_batched(corners, basis, order, vdofs, xi, eta)
                vms_vals[name] = np.reshape(vvals, shape)

        for j, rank in enumerate(bucket.leaf_ranks):
            rank = int(rank)
            per_leaf_points[rank] = np.stack(
                [ex[j].ravel(), ey[j].ravel()], axis=1
            )
            per_leaf_forms[rank] = {k: v[j] for k, v in form_vals.items()}
            if vms_solution is not None:
                per_leaf_vms[rank] = {k: v[j] for k, v in vms_vals.items()}

    cell_arrays: list[np.ndarray] = []
    node_cnt = 0
    xy_parts: list[np.ndarray] = []
    build: dict[str, list[np.ndarray]] = {n: [] for n in form_spec.names}
    vms_build: dict[str, list[np.ndarray]] = (
        {n: [] for n in form_spec.names} if vms_solution is not None else {}
    )
    for rank in range(n_leaves):
        p1, p2 = order_list[rank]
        ro = max(p1, p2) if recon_order is None else recon_order
        ordering = vtk_lagrange_ordering(ro).astype(np.int64) + node_cnt
        cell_arrays.append(np.concatenate(((ordering.size,), ordering)))
        node_cnt += ordering.size
        xy_parts.append(per_leaf_points[rank])
        for name in form_spec.names:
            build[name].append(per_leaf_forms[rank][name])
            if vms_solution is not None:
                vms_build[name].append(per_leaf_vms[rank][name])

    xy = np.concatenate(xy_parts, axis=0)
    points = np.concatenate([xy, np.zeros((node_cnt, 1))], axis=1)
    grid = ReconstructedGrid(
        points=points,
        cells=np.concatenate(cell_arrays).astype(np.int64),
        cell_types=np.full(n_leaves, VTK_LAGRANGE_QUADRILATERAL, np.uint8),
    )
    for name in build:
        grid.point_data[name] = np.concatenate(build[name], axis=0)
    for name in vms_build:
        grid.point_data["vms-" + name] = np.concatenate(vms_build[name], axis=0)
    grid.cell_data["orders"] = np.array(order_list)
    return grid

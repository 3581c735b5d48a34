"""Element-sharded VMS fine-scale estimation (config-5 scale-out path).

The single-chip VMS operator (:mod:`mfv2d_tpu.solver.vms`) is capacity-bound:
BASELINE config 5 (64x64 p=8, +2 fine orders) just fits one v5e after the
round-3 residency work.  Past that, every VMS object partitions cleanly over
elements — the fine/coarse saddle systems are hybridized (block-diagonal A +
trace constraints, one psum per Krylov matvec), the fine advection operator
and the coarse<->fine transfers are element-local, and the only replicated
state is the trace vectors.  This module composes those pieces from
:mod:`mfv2d_tpu.parallel.sharding` into a sharded Suyash-Green operator and a
sharded VMS-stabilized nonlinear steady solve.

Reference: python/mfv2d/solve_system.py:654-961 (the VMS formulation); the
element partitioning is the distributed seam of docs/modules/solving.rst.
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mfv2d_tpu.compiler import CompiledSystem, collect_fields
from mfv2d_tpu.evaluation import (
    ElementBatch,
    compute_element_matrices,
    evaluate_static_fields,
    reference_inclusion_matrix,
)
from mfv2d_tpu.parallel.sharding import (
    ShardedBlockSystem,
    _pad_to_multiple,
)
from mfv2d_tpu.solver.discretization import Discretization
from mfv2d_tpu.solver.solve import VMSSettings, compute_element_rhs_bucket
from mfv2d_tpu.solver.vms import iterate_unresolved_contributions
from mfv2d_tpu.system import KFormSystem
from mfv2d_tpu.tracing import tracer


class _FineDisc:
    """Discretization stand-in for the (rank-ordered) fine element batch."""

    def __init__(self, batch: ElementBatch, form_spec) -> None:
        self.buckets = [SimpleNamespace(batch=batch, orders=batch.orders)]
        self.form_spec = form_spec


def _make_sharded_assembler(
    basis, corners_padded, form_spec, blocks_ir, mesh: Mesh, with_dofs: bool
):
    """Reusable jitted sharded element-matrix assembler.

    Statics (callable fields) are host-evaluated ONCE on the padded
    corners; the returned closure re-dispatches the same jitted program
    every call (re-jitting per call would retrace/recompile the assembly
    in the hottest loop of the sharded VMS solve).  Call signature:
    ``assemble(corners_padded[, dofs_padded])`` -> sharded
    ``[E_pad, n, n]``.
    """
    field_keys = collect_fields(blocks_ir)
    statics = evaluate_static_fields(
        ElementBatch(basis, np.asarray(corners_padded)), field_keys
    )
    static_keys = tuple(statics.keys())
    shard_by_rank = {
        2: NamedSharding(mesh, P("e", None)),
        3: NamedSharding(mesh, P("e", None, None)),
    }
    static_vals = tuple(
        jax.device_put(
            np.asarray(statics[k]), shard_by_rank[np.asarray(statics[k]).ndim]
        )
        for k in static_keys
    )
    in_specs = (
        (P("e", None, None),)
        + ((P("e", None),) if with_dofs else ())
        + tuple(
            P("e", *([None] * (np.asarray(statics[k]).ndim - 1)))
            for k in static_keys
        )
    )

    @partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs,
        out_specs=P("e", None, None),
    )
    def assemble(corners_local, *rest):
        if with_dofs:
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

    jitted = jax.jit(assemble)

    def run(corners, dofs=None):
        args = (corners,) + ((dofs,) if with_dofs else ()) + static_vals
        return jitted(*args)

    return run


class ShardedSuyashGreen:
    """Element-sharded fine-scale Green's operator ``G' = A_f^-1 - P A_c^-1 P^T``.

    Mirrors :class:`mfv2d_tpu.solver.vms.SuyashGreenOperator` (dev mode) with
    every element-sized object sharded over the device mesh:

    - fine/coarse symmetric saddle systems are :class:`ShardedBlockSystem`s
      (sharded assembly, sharded explicit inverses, one psum per trace
      matvec); the coarse operator is the Galerkin product ``C^T A_f C``
      computed shard-locally with the replicated inclusion matrix ``C``,
    - the fine advection operator is one sharded ``[E, n_f, n_f]`` sum
      (linear + nonlinear), re-assembled shard-locally per nonlinear update,
    - coarse<->fine transfers are element-local GEMMs against ``C``.

    Uniform-order (single-bucket) meshes only — the single-chip operator
    covers hp meshes until they outgrow one chip.
    """

    def __init__(
        self,
        system: KFormSystem,
        settings: VMSSettings,
        disc: Discretization,
        device_mesh: Mesh,
        constrained_forms=(),
        strong_boundary_conditions=(),
        inner_max_iterations: int = 4000,
    ) -> None:
        from mfv2d_tpu.continuity import add_system_constraints

        self.inner_max_iterations = int(inner_max_iterations)

        if len(disc.buckets) != 1:
            raise NotImplementedError(
                "ShardedSuyashGreen expects a uniform-order mesh."
            )
        self.disc = disc
        self.mesh = device_mesh
        self.convergence = settings.fine_scale_convergence
        self.iteration = settings.iteration
        self.relaxation = settings.relaxation
        self.inexact_forcing = settings.inexact_forcing
        self.anticipate_factor = settings.anticipate_factor
        self.inexact_eta = settings.inexact_eta
        self.compiled_advection = CompiledSystem(settings.nonsymmetric_system)
        compiled_sym = CompiledSystem(settings.symmetric_system)
        dk = settings.order_increase
        form_spec = disc.form_spec
        nd = device_mesh.devices.size

        bucket = disc.buckets[0]
        p1, p2 = bucket.orders
        ranks = np.asarray(bucket.leaf_ranks)
        perm = np.argsort(ranks)
        corners_rk = np.asarray(bucket.batch.corners)[perm]
        e_real = corners_rk.shape[0]
        fine_basis = disc.basis_cache.get_basis2d(
            p1 + dk, p2 + dk, *bucket.batch.basis.integration_orders
        )
        self.fine_batch = ElementBatch(fine_basis, corners_rk)
        self.n_c = form_spec.total_size(p1, p2)
        self.n_f = form_spec.total_size(p1 + dk, p2 + dk)
        self.e_real = e_real

        incl = reference_inclusion_matrix(
            form_spec, (p1, p2), (p1 + dk, p2 + dk)
        )
        self._incl_np = incl
        self._incl_dev = jnp.asarray(incl)

        # Padded sharded corner batch shared by every assembly.
        corners_p = _pad_to_multiple(corners_rk, nd)
        if corners_p.shape[0] > e_real:
            corners_p[e_real:] = np.array(
                [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
            )
        self.e_padded = corners_p.shape[0]
        self._corners_dev = jax.device_put(
            corners_p, NamedSharding(device_mesh, P("e", None, None))
        )

        # Fine forcing (rank order) + constraints on the p-raised mesh.
        fine_view = SimpleNamespace(
            batch=self.fine_batch, orders=self.fine_batch.orders
        )
        forcing = np.asarray(compute_element_rhs_bucket(system, fine_view))
        forcing_list = [forcing[i] for i in range(e_real)]
        self.fine_offsets = np.arange(e_real + 1, dtype=np.int64) * self.n_f
        mesh2d = disc.mesh
        mesh2d.uniform_p_change(dk, dk)
        try:
            fine_lag_mat, fine_lag_vec = add_system_constraints(
                system,
                mesh2d,
                disc.basis_cache,
                list(constrained_forms),
                list(strong_boundary_conditions),
                disc.leaf_indices,
                self.fine_offsets,
                forcing_list,
            )
        finally:
            mesh2d.uniform_p_change(-dk, -dk)
        self.fine_forcing = np.concatenate(forcing_list)

        # Fine symmetric saddle system: sharded assembly + trace tables.
        fine_disc = _FineDisc(self.fine_batch, form_spec)
        with tracer.stage("svms-fine-saddle"):
            self.fine_saddle = ShardedBlockSystem.from_assembly(
                fine_disc, compiled_sym.lhs_blocks, fine_lag_mat, device_mesh
            )

        # Coarse Galerkin operator C^T A_f C, shard-local (padding elements
        # become C^T C — invertible, never referenced by constraints).
        coarse_lag_mat, _ = add_system_constraints(
            system,
            mesh2d,
            disc.basis_cache,
            list(constrained_forms),
            list(strong_boundary_conditions),
            disc.leaf_indices,
            disc.element_offsets,
            None,
        )

        @partial(
            jax.shard_map, mesh=device_mesh,
            in_specs=(P("e", None, None), P(None, None)),
            out_specs=P("e", None, None),
        )
        def galerkin(blocks_local, c):
            return jnp.einsum("ji,ejk,kl->eil", c, blocks_local, c)

        with tracer.stage("svms-coarse-saddle"):
            coarse_blocks = jax.jit(galerkin)(
                self.fine_saddle.blocks, self._incl_dev
            )
            self.coarse_saddle = ShardedBlockSystem(
                disc, coarse_blocks, coarse_lag_mat, device_mesh,
                _prepadded_device=True,
            )

        # Fine advection: one sharded linear+nonlinear sum.  The linear
        # blocks are geometry-only — assembled ONCE and reused; nonlinear
        # updates re-run only the dofs-dependent assembly.  All jitted
        # kernels (assemblers, GEMV, trace-Krylov runners) are built once
        # here: rebuilding them per call would retrace/recompile in the
        # hottest loop of the solve.
        with tracer.stage("svms-advection"):
            self._lin_assemble = _make_sharded_assembler(
                self.fine_batch.basis,
                self._corners_dev,
                form_spec,
                self.compiled_advection.linear_blocks,
                device_mesh,
                with_dofs=False,
            )
            self._nonlin_assemble = (
                None
                if self.compiled_advection.nonlin_blocks is None
                else _make_sharded_assembler(
                    self.fine_batch.basis,
                    self._corners_dev,
                    form_spec,
                    self.compiled_advection.nonlin_blocks,
                    device_mesh,
                    with_dofs=True,
                )
            )
            self._adv_lin_blocks = self._lin_assemble(self._corners_dev)
            self._adv_blocks = self._adv_lin_blocks

        @partial(
            jax.shard_map, mesh=device_mesh,
            in_specs=(P("e", None, None), P("e", None)),
            out_specs=P("e", None),
        )
        def gemv(blocks, x):
            return jnp.einsum("eij,ej->ei", blocks, x)

        self._adv_gemv = jax.jit(gemv)

        from mfv2d_tpu.parallel.sharding import _trace_krylov

        self._fine_krylov = _trace_krylov(
            self.fine_saddle, "cg", self.inner_max_iterations
        )
        self._coarse_krylov = _trace_krylov(
            self.coarse_saddle, "cg", self.inner_max_iterations
        )

    # -- operator pieces ------------------------------------------------

    def _rebuild_advection(self, fine_dofs: np.ndarray | None) -> None:
        """(Re)build the sharded advection sum at the current solution."""
        if fine_dofs is None or self._nonlin_assemble is None:
            self._adv_blocks = self._adv_lin_blocks
            return
        d = np.asarray(fine_dofs).reshape(self.e_real, self.n_f)
        dofs_p = jax.device_put(
            _pad_to_multiple(d, self.mesh.devices.size),
            NamedSharding(self.mesh, P("e", None)),
        )
        self._adv_blocks = None  # free the old sum before re-assembly
        self._adv_blocks = self._adv_lin_blocks + self._nonlin_assemble(
            self._corners_dev, dofs_p
        )

    def _apply_fine_advection(self, v: np.ndarray) -> np.ndarray:
        """F v: element-local sharded batched GEMV (no communication)."""
        v2 = self.fine_saddle.shard_dofs(np.asarray(v))
        return self.fine_saddle.unshard_dofs(self._adv_gemv(self._adv_blocks, v2))

    def _prolong_to_fine(self, u: np.ndarray) -> np.ndarray:
        """P u: coarse DoFs -> fine space (element-local GEMM vs C)."""
        out = np.asarray(u).reshape(self.e_real, self.n_c) @ self._incl_np.T
        return out.ravel()

    def _project_to_coarse(self, x: np.ndarray) -> np.ndarray:
        """P^T x: dual projection to coarse DoFs."""
        out = np.asarray(x).reshape(self.e_real, self.n_f) @ self._incl_np
        return out.ravel()

    @staticmethod
    def _saddle_solve(system, krylov, b_sharded, tol):
        """Sharded saddle solve against the CACHED trace-Krylov runner
        (zero constraint RHS — the Green's function sees homogeneous
        multiplier data)."""
        ainv_b = system.block_solve_sharded(b_sharded)
        lam, _, _ = krylov(system.trace_of(ainv_b), tol)
        return system.block_solve_sharded(b_sharded - system.trace_t_of(lam))

    def fine_scale_greens_function(self, x: np.ndarray) -> np.ndarray:
        """G' x via two sharded saddle solves (trace CG, one psum/matvec)."""
        tol = max(self.convergence.absolute_tolerance * 1e-2, 1e-13)
        with tracer.stage("svms-greens-fine"):
            u_f = self._saddle_solve(
                self.fine_saddle,
                self._fine_krylov,
                self.fine_saddle.shard_dofs(np.asarray(x)),
                tol,
            )
        with tracer.stage("svms-greens-coarse"):
            u_c = self._saddle_solve(
                self.coarse_saddle,
                self._coarse_krylov,
                self.coarse_saddle.shard_dofs(self._project_to_coarse(x)),
                tol,
            )
        return self.fine_saddle.unshard_dofs(u_f) - self._prolong_to_fine(
            self.coarse_saddle.unshard_dofs(u_c)
        )

    # -- VMS iteration (mirrors solver.vms) ------------------------------

    def update_nonlinear_advection(self, coarse_dofs: np.ndarray) -> None:
        if self.compiled_advection.nonlin_blocks is None:
            return
        n_coarse = self.e_real * self.n_c
        self._rebuild_advection(self._prolong_to_fine(coarse_dofs[:n_coarse]))

    def compute_unresolved_contributions(
        self,
        coarse_solution: np.ndarray,
        initial_guess: np.ndarray | None,
        rtol_override: float | None = None,
        atol_override: float | None = None,
    ) -> np.ndarray:
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
        residual = (
            self.fine_forcing
            - self._apply_fine_advection(self._prolong_to_fine(coarse_solution))
            - unresolved_contribution
        )
        return self.fine_scale_greens_function(residual)


def sharded_vms_steady_solve(
    system: KFormSystem,
    vms_settings: VMSSettings,
    disc: Discretization,
    device_mesh: Mesh,
    *,
    boundary_conditions=(),
    constrained_forms=(),
    maximum_iterations: int = 40,
    relax: float = 1.0,
    absolute_tolerance: float = 1e-9,
    relative_tolerance: float = 0.0,
    cg_maximum_iterations: int = 4000,
    cg_tolerance: float = 1e-12,
    anderson_m: int = 0,
):
    """Fully sharded VMS-stabilized nonlinear steady solve (config 5 shape).

    One Picard iteration does: sharded residual of the frozen saddle system,
    sharded nonlinear advection re-assembly, the unresolved-scale GMRES
    (every matvec = one sharded fine + one sharded coarse saddle solve and
    one sharded advection GEMV), and the frozen sharded Schur correction.
    Replicated state: trace vectors and the host-driven outer loops.

    Returns ``(solution_flat, lam, residual_history, fine_scales)`` where
    ``fine_scales`` are the recovered unresolved-scale fine DoFs.
    """
    from mfv2d_tpu.continuity import add_system_constraints
    from mfv2d_tpu.parallel.sharding import _trace_krylov
    from mfv2d_tpu.solver.solve import compute_forcing_vector

    if len(disc.buckets) != 1:
        raise NotImplementedError(
            "sharded_vms_steady_solve expects a uniform-order mesh."
        )
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

    from mfv2d_tpu.parallel.sharding import MultiBucketShardedSystem

    msys = MultiBucketShardedSystem.from_assembly(
        disc, compiled.linear_blocks, lagrange_mat, device_mesh
    )
    bucket, sub = msys.subsystems[0]
    residual_fn = sub.make_picard_residual(
        form_spec, compiled.lhs_blocks, compiled.rhs_blocks
    )
    krylov = _trace_krylov(msys, "cg", cg_maximum_iterations)

    sg = ShardedSuyashGreen(
        system,
        vms_settings,
        disc,
        device_mesh,
        constrained_forms,
        boundary_conditions,
        inner_max_iterations=cg_maximum_iterations,
    )

    b = sub.shard_dofs(np.asarray(forcing)[bucket.gather].reshape(-1))
    u = jnp.zeros_like(b)
    lam = jnp.zeros(msys.n_lagrange)
    c_vec = jnp.asarray(lagrange_vec)
    unresolved = None

    # The main sharded system's element axis follows the bucket's BATCH
    # order while the global (and VMS) DoF layout is leaf-RANK contiguous;
    # bucket.gather converts between them (identity on regular meshes).
    gather_flat = np.asarray(bucket.gather).reshape(-1)

    residuals = []
    max_mag = float(jnp.abs(b).max())
    aa_x: list[np.ndarray] = []
    aa_f: list[np.ndarray] = []
    for _ in range(maximum_iterations):
        r_elem, g_u = residual_fn(u, lam, b)
        u_global = np.zeros(disc.n_dofs)
        u_global[gather_flat] = sub.unshard_dofs(u)
        with tracer.stage("svms-advection-update"):
            sg.update_nonlinear_advection(u_global)
        with tracer.stage("svms-unresolved"):
            unresolved = sg.compute_unresolved_contributions(u_global, unresolved)
        vms_coarse = sg._project_to_coarse(unresolved)
        r_elem = r_elem - sub.shard_dofs(vms_coarse[gather_flat])
        r_trace = c_vec - g_u

        max_res = float(jnp.abs(r_elem[: sub.e_real]).max())
        if msys.n_lagrange:
            max_res = max(max_res, float(jnp.abs(r_trace).max()))
        residuals.append(max_res)
        if max_res <= absolute_tolerance or max_res <= max_mag * relative_tolerance:
            break

        a_r = sub.block_solve_sharded(r_elem)
        trace_rhs = -r_trace + sub.trace_of(a_r)
        dlam, _, _ = krylov(trace_rhs, cg_tolerance)
        du = sub.block_solve_sharded(r_elem - sub.trace_t_of(dlam))
        if anderson_m > 0:
            # Same guarded type-II extrapolation as the single-chip loop
            # (solver.solve non_linear_solve_run) over (u, lam).
            x_k = np.concatenate(
                (np.asarray(u).reshape(-1), np.asarray(lam))
            )
            f_k = relax * np.concatenate(
                (np.asarray(du).reshape(-1), np.asarray(dlam))
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
            n_u = np.asarray(u).size
            u = jax.device_put(
                x_new[:n_u].reshape(np.asarray(u).shape), sub.dof_sharding
            )
            lam = jnp.asarray(x_new[n_u:])
        else:
            u = u + relax * du
            lam = lam + relax * dlam

    out = np.zeros(disc.n_dofs)
    out[gather_flat] = sub.unshard_dofs(u)
    fine_scales = sg.recover_unresolved(out, unresolved)
    return out, np.asarray(lam), np.asarray(residuals), fine_scales

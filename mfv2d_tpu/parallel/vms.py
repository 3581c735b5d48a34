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
from mfv2d_tpu.parallel.sharding import _pad_to_multiple
from mfv2d_tpu.solver.discretization import Discretization
from mfv2d_tpu.solver.solve import VMSSettings, compute_element_rhs_bucket
from mfv2d_tpu.solver.vms import iterate_unresolved_contributions
from mfv2d_tpu.system import KFormSystem
from mfv2d_tpu.tracing import tracer


def _fine_discretization(disc: Discretization, dk: int) -> Discretization:
    """Fine (p+dk) Discretization sharing the coarse mesh and leaf order.

    Bucket list order matches ``disc.buckets`` index-for-index so per-bucket
    inclusion matrices / transfers pair up, and each fine bucket keeps the
    COARSE bucket's integration rule — the Galerkin product ``C^T A_f C``
    must be evaluated on the same quadrature as the single-chip operator
    (solver/vms.py) for bit-parity.  The flat fine DoF layout is
    leaf-rank-contiguous (``element_offsets``), which is what the fine
    constraint assembly consumes.
    """
    from mfv2d_tpu.solver.discretization import OrderBucket

    form_spec = disc.form_spec
    fine_orders = disc.element_orders + dk
    sizes = np.array(
        [form_spec.total_size(int(o1), int(o2)) for o1, o2 in fine_orders],
        np.int64,
    )
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    fd = Discretization(
        mesh=disc.mesh,
        form_spec=form_spec,
        basis_cache=disc.basis_cache,
        leaf_indices=disc.leaf_indices,
        element_orders=fine_orders,
        element_sizes=sizes,
        element_offsets=offsets,
    )
    for bucket in disc.buckets:
        p1, p2 = bucket.orders
        fine_basis = disc.basis_cache.get_basis2d(
            p1 + dk, p2 + dk, *bucket.batch.basis.integration_orders
        )
        batch = ElementBatch(fine_basis, np.asarray(bucket.batch.corners))
        n = form_spec.total_size(p1 + dk, p2 + dk)
        gather = (
            offsets[bucket.leaf_ranks][:, None]
            + np.arange(n, dtype=np.int64)[None, :]
        )
        fd.buckets.append(
            OrderBucket(
                orders=(p1 + dk, p2 + dk),
                leaf_ranks=bucket.leaf_ranks,
                batch=batch,
                gather=gather,
            )
        )
    return fd


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

    - fine/coarse symmetric saddle systems are
      :class:`MultiBucketShardedSystem`s (sharded assembly, sharded explicit
      inverses, one psum per bucket per trace matvec); the coarse operator
      is the Galerkin product ``C^T A_f C`` computed shard-locally with the
      replicated per-bucket inclusion matrices ``C``,
    - the fine advection operator is one sharded ``[E, n_f, n_f]`` sum
      (linear + nonlinear), re-assembled shard-locally per nonlinear update,
    - coarse<->fine transfers are element-local GEMMs against ``C``.

    hp meshes run one sharded subsystem per order bucket
    (:class:`MultiBucketShardedSystem` for both saddles, per-bucket
    inclusion matrices and advection sums); uniform meshes are the
    single-bucket instance of the same code.
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
        from mfv2d_tpu.parallel.sharding import MultiBucketShardedSystem

        self.inner_max_iterations = int(inner_max_iterations)

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

        fd = self.fine_disc = _fine_discretization(disc, dk)
        self._incl_np = [
            reference_inclusion_matrix(form_spec, cb.orders, fb.orders)
            for cb, fb in zip(disc.buckets, fd.buckets)
        ]
        self._incl_dev = [jnp.asarray(c) for c in self._incl_np]

        # Fine forcing (leaf-rank flat layout) + constraints on the
        # p-raised mesh (weak-BC additions land in the per-leaf views).
        forcing = np.zeros(fd.n_dofs)
        for fb in fd.buckets:
            view = SimpleNamespace(batch=fb.batch, orders=fb.batch.orders)
            forcing[fb.gather] = np.asarray(
                compute_element_rhs_bucket(system, view)
            )
        forcing_views = [
            forcing[fd.element_offsets[i] : fd.element_offsets[i + 1]]
            for i in range(fd.n_leaves)
        ]
        mesh2d = disc.mesh
        mesh2d.uniform_p_change(dk, dk)
        try:
            fine_lag_mat, _ = add_system_constraints(
                system,
                mesh2d,
                disc.basis_cache,
                list(constrained_forms),
                list(strong_boundary_conditions),
                disc.leaf_indices,
                fd.element_offsets,
                forcing_views,
            )
        finally:
            mesh2d.uniform_p_change(-dk, -dk)
        self.fine_forcing = forcing

        # Fine symmetric saddle system: sharded assembly + trace tables,
        # one subsystem per order bucket.
        with tracer.stage("svms-fine-saddle"):
            self.fine_saddle = MultiBucketShardedSystem.from_assembly(
                fd, compiled_sym.lhs_blocks, fine_lag_mat, device_mesh
            )

        # Coarse Galerkin operator C^T A_f C per bucket, shard-local
        # (padding elements become C^T C — invertible, never referenced by
        # constraints).
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
            galerkin_j = jax.jit(galerkin)
            coarse_blocks = [
                galerkin_j(sub.blocks, c)
                for (_, sub), c in zip(self.fine_saddle.subsystems, self._incl_dev)
            ]
            self.coarse_saddle = MultiBucketShardedSystem(
                disc, coarse_blocks, coarse_lag_mat, device_mesh,
                _prepadded_device=True,
            )

        # Fine advection: one sharded linear+nonlinear sum per bucket.  The
        # linear blocks are geometry-only — assembled ONCE and reused;
        # nonlinear updates re-run only the dofs-dependent assembly.  All
        # jitted kernels (assemblers, GEMV, trace-Krylov runners) are built
        # once here: rebuilding them per call would retrace/recompile in
        # the hottest loop of the sharded VMS solve.
        with tracer.stage("svms-advection"):
            self._lin_assemble = []
            self._nonlin_assemble = []
            adv_lin = []
            for fb, (_, sub) in zip(fd.buckets, self.fine_saddle.subsystems):
                la = _make_sharded_assembler(
                    fb.batch.basis,
                    sub.corners_padded,
                    form_spec,
                    self.compiled_advection.linear_blocks,
                    device_mesh,
                    with_dofs=False,
                )
                self._lin_assemble.append(la)
                self._nonlin_assemble.append(
                    None
                    if self.compiled_advection.nonlin_blocks is None
                    else _make_sharded_assembler(
                        fb.batch.basis,
                        sub.corners_padded,
                        form_spec,
                        self.compiled_advection.nonlin_blocks,
                        device_mesh,
                        with_dofs=True,
                    )
                )
                adv_lin.append(la(sub.corners_padded))
            self._adv_lin_blocks = adv_lin
            self._adv_blocks = list(adv_lin)

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
        """(Re)build the sharded advection sums at the current solution."""
        if fine_dofs is None or self.compiled_advection.nonlin_blocks is None:
            self._adv_blocks = list(self._adv_lin_blocks)
            return
        d = np.asarray(fine_dofs)
        nd = self.mesh.devices.size
        self._adv_blocks = []  # free the old sums before re-assembly
        for fb, (_, sub), lin, na in zip(
            self.fine_disc.buckets,
            self.fine_saddle.subsystems,
            self._adv_lin_blocks,
            self._nonlin_assemble,
        ):
            dofs_p = jax.device_put(
                _pad_to_multiple(d[fb.gather], nd), sub.dof_sharding
            )
            self._adv_blocks.append(lin + na(sub.corners_padded, dofs_p))

    def _apply_fine_advection(self, v: np.ndarray) -> np.ndarray:
        """F v: element-local sharded batched GEMVs (no communication)."""
        out = np.zeros(self.fine_disc.n_dofs)
        for fb, (_, sub), blocks in zip(
            self.fine_disc.buckets,
            self.fine_saddle.subsystems,
            self._adv_blocks,
        ):
            v2 = sub.shard_dofs(np.asarray(v)[fb.gather].reshape(-1))
            out[fb.gather.reshape(-1)] = sub.unshard_dofs(
                self._adv_gemv(blocks, v2)
            )
        return out

    def _prolong_to_fine(self, u: np.ndarray) -> np.ndarray:
        """P u: coarse DoFs -> fine space (element-local GEMMs vs C)."""
        out = np.zeros(self.fine_disc.n_dofs)
        u = np.asarray(u)
        for cb, fb, c in zip(
            self.disc.buckets, self.fine_disc.buckets, self._incl_np
        ):
            out[fb.gather] = u[cb.gather] @ c.T
        return out

    def _project_to_coarse(self, x: np.ndarray) -> np.ndarray:
        """P^T x: dual projection to coarse DoFs."""
        out = np.zeros(self.disc.n_dofs)
        x = np.asarray(x)
        for cb, fb, c in zip(
            self.disc.buckets, self.fine_disc.buckets, self._incl_np
        ):
            out[cb.gather] = x[fb.gather] @ c
        return out

    def _saddle_solve(self, msys, krylov, b_flat, tol):
        """Multi-bucket sharded saddle solve against the CACHED trace-Krylov
        runner (zero constraint RHS — the Green's function sees homogeneous
        multiplier data)."""
        out, _lam, _res, _iters = msys.solve_schur(
            b_flat,
            np.zeros(msys.n_lagrange),
            self.inner_max_iterations,
            tol,
            krylov=krylov,
        )
        return out

    def fine_scale_greens_function(self, x: np.ndarray) -> np.ndarray:
        """G' x via two sharded saddle solves (trace CG, one psum/matvec)."""
        tol = max(self.convergence.absolute_tolerance * 1e-2, 1e-13)
        with tracer.stage("svms-greens-fine"):
            u_f = self._saddle_solve(
                self.fine_saddle, self._fine_krylov, np.asarray(x), tol
            )
        with tracer.stage("svms-greens-coarse"):
            u_c = self._saddle_solve(
                self.coarse_saddle,
                self._coarse_krylov,
                self._project_to_coarse(x),
                tol,
            )
        return u_f - self._prolong_to_fine(u_c)

    # -- VMS iteration (mirrors solver.vms) ------------------------------

    def update_nonlinear_advection(self, coarse_dofs: np.ndarray) -> None:
        if self.compiled_advection.nonlin_blocks is None:
            return
        n_coarse = self.disc.n_dofs
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
    initial_solution=None,
    initial_lagrange=None,
    initial_unresolved=None,
    newton: bool = False,
    checkpoint_cb=None,
):
    """Fully sharded VMS-stabilized nonlinear steady solve (config 5 shape).

    One Picard iteration does: sharded residual of the frozen saddle system,
    sharded nonlinear advection re-assembly, the unresolved-scale GMRES
    (every matvec = one sharded fine + one sharded coarse saddle solve and
    one sharded advection GEMV), and the frozen sharded Schur correction.
    Replicated state: trace vectors and the host-driven outer loops.
    ``newton=True`` replaces the frozen-operator correction with the
    per-iteration exact ``jacfwd`` Jacobian rebuild (same semantics as the
    single-device ``non_linear_solve_run(newton=True)`` with a VMS
    operator); ``checkpoint_cb(it, flat_solution, lam, unresolved)`` and
    the ``initial_*`` warm starts serve checkpoint/resume.

    Returns ``(solution_flat, lam, residual_history, fine_scales)`` where
    ``fine_scales`` are the recovered unresolved-scale fine DoFs.
    """
    from mfv2d_tpu.continuity import add_system_constraints
    from mfv2d_tpu.parallel.sharding import _trace_krylov
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

    from mfv2d_tpu.parallel.sharding import MultiBucketShardedSystem

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

    # The main sharded systems' element axes follow each bucket's BATCH
    # order while the global (and VMS) DoF layout is leaf-RANK contiguous;
    # bucket.gather converts between them (identity on regular meshes).
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

    from mfv2d_tpu.parallel.sharding import (
        _flat_from_sharded,
        _sharded_nonlinear_iterate,
    )

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
            "krylov_method": "cg",
            "cg_max": cg_maximum_iterations,
        }

    max_mag = max((float(jnp.abs(b).max()) for b in bs), default=0.0)
    us, lam, residuals, unresolved = _sharded_nonlinear_iterate(
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
        anderson_m=anderson_m,
        newton_ctx=newton_ctx,
        sg=sg,
        unresolved=initial_unresolved,
        checkpoint_cb=checkpoint_cb,
    )

    out = _flat_from_sharded(disc, subs, us)
    fine_scales = sg.recover_unresolved(out, unresolved)
    return out, np.asarray(lam), np.asarray(residuals), fine_scales

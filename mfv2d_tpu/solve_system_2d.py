"""The main solver entry point: steady/unsteady hybridized MSEM solve.

Orchestrates the full pipeline (reference: python/mfv2d/solve_system_2d.py):

1. compile the k-form system to block op-lists,
2. bucket the mesh leaves by order and build batched element spaces,
3. assemble batched element matrices + forcing + Lagrange constraints,
4. factorize the frozen saddle system once,
5. run the Picard loop (and the trapezoidal time march when requested),
6. reconstruct output grids and optionally hp-refine the mesh.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from mfv2d_tpu.compiler import CompiledSystem
from mfv2d_tpu.kform import KEquation
from mfv2d_tpu.mesh.quadtree import Mesh
from mfv2d_tpu.ops.basis import FemCache
from mfv2d_tpu.progress import HistogramFormat
from mfv2d_tpu.solver.discretization import discretize_mesh
from mfv2d_tpu.solver.solve import (
    ConvergenceSettings,
    FrozenSaddleSolver,
    SolutionStatistics,
    SolverSettings,
    SystemEvaluator,
    SystemSettings,
    TimeSettings,
    VMSSettings,
    compute_element_dual_from_primal_global,
    compute_forcing_vector,
    compute_initial_solution,
    compute_linear_system,
    find_time_carry_indices,
    non_linear_solve_run,
    reconstruct_mesh_from_solution,
)
from mfv2d_tpu.system import KFormSystem
from mfv2d_tpu.vis import ReconstructedGrid


def solve_system_2d(
    mesh: Mesh,
    system_settings: SystemSettings,
    solver_settings: SolverSettings = SolverSettings(),
    time_settings: TimeSettings | None = None,
    refinement_settings=None,
    vms_settings: VMSSettings | None = None,
    *,
    recon_order: int | None = None,
    print_residual: bool = False,
    checkpoint_settings=None,
) -> tuple[Sequence[ReconstructedGrid], SolutionStatistics, Mesh]:
    """Solve the k-form system on the mesh; see the reference docstring.

    Returns reconstructed solution grids (one per sampled time), statistics,
    and the (possibly refined) mesh.
    """
    system = system_settings.system

    if vms_settings is not None:
        for name, sub in (
            ("symmetric", vms_settings.symmetric_system),
            ("nonsymmetric", vms_settings.nonsymmetric_system),
        ):
            if sub.unknown_forms != system.unknown_forms:
                raise ValueError(
                    f"VMS {name} system does not contain the same forms in the"
                    " matching order as the full system."
                )
        if vms_settings.order_increase > system_settings.over_integration_order:
            raise ValueError(
                "VMS order increase exceeds the over-integration order."
            )

    constrained_forms = system_settings.constrained_forms
    boundary_conditions = system_settings.boundary_conditions

    from mfv2d_tpu.boundary import (
        BoundaryCondition2DUnsteady,
        freeze_unsteady_boundary_conditions,
    )

    has_unsteady_bcs = any(
        isinstance(bc, BoundaryCondition2DUnsteady)
        for bc in (boundary_conditions or [])
    )
    from mfv2d_tpu.kform import KExplicit, TimeDependent

    has_td_rhs = any(
        isinstance(f, KExplicit) and isinstance(f.func, TimeDependent)
        for eq in system.equations
        for _, f in eq.right.explicit_terms
    )
    if has_td_rhs and time_settings is None:
        raise ValueError("TimeDependent forcing requires time_settings.")
    if has_unsteady_bcs:
        if time_settings is None:
            raise ValueError(
                "Unsteady boundary conditions require time_settings."
            )
        # Step n solves for t = (n + 1) dt; the initial system is frozen at
        # the first time level and re-evaluated inside the march loop.
        boundary_conditions = freeze_unsteady_boundary_conditions(
            boundary_conditions, time_settings.dt
        )
    for _, form in constrained_forms:
        if form not in system.unknown_forms:
            raise ValueError(
                f"Form {form} which is to be zeroed is not involved in the system."
            )
        if boundary_conditions and form in (bc.form for bc in boundary_conditions):
            raise ValueError(
                f"Form {form} can not be zeroed because it is involved in a strong"
                " boundary condition."
            )

    basis_cache = FemCache(order_difference=system_settings.over_integration_order)

    if time_settings is not None:
        if time_settings.sample_rate < 1:
            raise ValueError("Sample rate can not be less than 1.")
        if len(time_settings.time_march_relations) < 1:
            raise ValueError("Problem has no time march relations.")

    if solver_settings.device_mesh is not None:
        return _solve_sharded(
            mesh,
            system_settings,
            solver_settings,
            time_settings,
            basis_cache,
            recon_order,
            boundary_conditions,
            has_unsteady_bcs=has_unsteady_bcs,
            has_td_rhs=has_td_rhs,
            vms_settings=vms_settings,
            refinement_settings=refinement_settings,
            checkpoint_settings=checkpoint_settings,
        )

    if time_settings is not None:
        system = update_system_for_time_march(time_settings, system)

    from mfv2d_tpu.tracing import tracer

    # The evaluator host-evaluates callable fields at construction, so any
    # TimeDependent clock state left over from a previous march must reset
    # BEFORE setup.
    TimeDependent.current_time = 0.0
    with tracer.stage("setup"):
        compiled = CompiledSystem(system)
        disc = discretize_mesh(mesh, system.unknown_forms, basis_cache)
        evaluator = SystemEvaluator(system.unknown_forms, compiled, disc)

    # Time-dependent OPERATOR coefficients (interior-product fields): the
    # march re-evaluates the field, re-assembles the frozen element
    # matrices, and refactorizes at every time level (per-step reassembly;
    # reference interior-product field machinery:
    # src/evaluation/integrating_fields.c:13-353, which only ever evaluates
    # at a fixed state).  Steady solves have no time to evaluate at.
    has_td_fields = any(
        isinstance(f, TimeDependent) for f in compiled.fields
    )
    if has_td_fields and time_settings is None:
        raise ValueError(
            "TimeDependent interior-product (operator) fields require"
            " time_settings."
        )
    if has_td_fields and vms_settings is not None:
        raise NotImplementedError(
            "TimeDependent operator fields with vms_settings are not"
            " supported: the fine-scale operator would need per-step"
            " reconstruction.  March without VMS, or freeze the field."
        )

    # Initial conditions
    if system_settings.initial_conditions:
        initial_dual, solution = compute_initial_solution(
            disc, system, system_settings.initial_conditions
        )
    else:
        initial_dual = None
        solution = np.zeros(disc.n_dofs)

    # Time-carry bookkeeping
    if time_settings is not None:
        march_indices = tuple(
            sorted(
                system.weight_forms.index(form)
                for form in time_settings.time_march_relations
            )
        )
        time_carry_index_array = np.concatenate(
            [
                find_time_carry_indices(
                    march_indices,
                    system.unknown_forms,
                    *(int(v) for v in disc.element_orders[i]),
                )
                + disc.element_offsets[i]
                for i in range(disc.n_leaves)
            ]
        )
        if initial_dual is not None:
            old_solution_carry = initial_dual[time_carry_index_array]
        else:
            old_solution_carry = np.zeros(time_carry_index_array.size)
    else:
        time_carry_index_array = None
        old_solution_carry = None

    initial_solution = solution if system_settings.initial_conditions else None
    if has_td_rhs:
        TimeDependent.current_time = 0.0
    with tracer.stage("assembly+constraints"):
        forcing, matrices, lagrange_mat, lagrange_vec = compute_linear_system(
            disc,
            system,
            evaluator,
            constrained_forms,
            boundary_conditions if boundary_conditions is not None else [],
            initial_solution,
        )

    explicit_vec = forcing
    if lagrange_mat is not None:
        explicit_vec = np.concatenate((forcing, lagrange_vec))

    if time_settings is not None:
        assert time_carry_index_array is not None
        if initial_solution is not None:
            # Consistent trapezoidal start: carry_0 = F_0 - A u_0 (the
            # reference uses F_0 regardless of the initial state,
            # solve_system_2d.py:274-276, which injects an O(dt) transient
            # on the first step when u_0 != 0).  residual_value includes the
            # marched 2/dt mass term, which equals 2/dt * dual(u_0) on the
            # carry rows, so it is added back.
            spatial = explicit_vec[: disc.n_dofs] - evaluator.residual_value(solution)
            time_carry_term = (
                spatial[time_carry_index_array]
                + 2.0 / time_settings.dt * old_solution_carry
            )
        else:
            time_carry_term = explicit_vec[time_carry_index_array]
    else:
        time_carry_term = None

    _t_factor = __import__("time").perf_counter()
    if solver_settings.linear_solver == "direct":
        solver = FrozenSaddleSolver(
            evaluator.matrices_per_leaf(matrices), lagrange_mat
        )
    elif solver_settings.linear_solver == "dense":
        from mfv2d_tpu.solver.iterative import DenseSaddleSolver

        solver = DenseSaddleSolver(disc, matrices, lagrange_mat)
    else:
        from mfv2d_tpu.solver.iterative import IterativeSaddleSolver

        solver = IterativeSaddleSolver(
            disc,
            matrices,
            lagrange_mat,
            ConvergenceSettings(
                maximum_iterations=max(
                    200, 4 * (disc.n_dofs + int(lagrange_vec.size))
                ),
                absolute_tolerance=solver_settings.convergence.absolute_tolerance
                * 1e-3,
                relative_tolerance=1e-12,
            ),
            method=solver_settings.linear_solver,
        )

    tracer.add("factorize", __import__("time").perf_counter() - _t_factor)

    if vms_settings is not None:
        from mfv2d_tpu.solver.vms import SuyashGreenOperator

        with tracer.stage("vms-init"):
            sg_operator = SuyashGreenOperator(
                system,
                vms_settings,
                disc,
                evaluator,
                constrained_forms,
                boundary_conditions,
            )
    else:
        sg_operator = None

    _t_solve = __import__("time").perf_counter()
    resulting_grids: list[ReconstructedGrid] = []

    global_lagrange = np.zeros_like(lagrange_vec)
    max_mag = float(np.abs(explicit_vec).max())

    conv = solver_settings.convergence
    max_iterations = conv.maximum_iterations
    relax = solver_settings.relaxation
    atol = conv.absolute_tolerance
    rtol = conv.relative_tolerance
    fine_scales = None

    # Resume a checkpointed march: restore solution + carry state and skip
    # the already-completed steps (mfv2d_tpu/checkpoint.py).  Steady solves
    # resume their Picard iterate the same way (solution + lagrange + VMS
    # unresolved scales) — long config-5-scale runs survive crashes.
    start_index = 0
    _steady_ckpt_prior = (0, 0.0)  # (completed iterations, elapsed seconds)
    if (
        checkpoint_settings is not None
        and checkpoint_settings.resume_from
        and time_settings is None
    ):
        import os as _os

        from mfv2d_tpu.checkpoint import load_steady_state

        if _os.path.exists(checkpoint_settings.resume_from):
            state = load_steady_state(checkpoint_settings.resume_from)
            solution = state["solution"]
            if solution.size != disc.n_dofs:
                raise ValueError(
                    "Checkpoint DoF count does not match the mesh/system:"
                    f" {solution.size} != {disc.n_dofs}."
                )
            global_lagrange = state["lagrange"]
            fine_scales = state["fine_scales"]
            _steady_ckpt_prior = (state["iteration"], state["elapsed"])
        # A missing file means "first attempt": start fresh and begin
        # checkpointing — retry harnesses can pass resume_from
        # unconditionally.
    elif checkpoint_settings is not None and checkpoint_settings.resume_from:
        from mfv2d_tpu.checkpoint import load_march_state

        state = load_march_state(checkpoint_settings.resume_from)
        if state["solution"].size != disc.n_dofs:
            raise ValueError(
                "Checkpoint DoF count does not match the mesh/system:"
                f" {state['solution'].size} != {disc.n_dofs}."
            )
        solution = state["solution"]
        global_lagrange = state["lagrange"]
        old_solution_carry = state["old_carry"]
        time_carry_term = state["carry_term"]
        start_index = state["time_index"]

    # Initial grid: reconstructed AFTER any checkpoint resume, so a resumed
    # march's first grid shows the restored state (labelled with its time),
    # not the fresh zero/IC state.
    grid = reconstruct_mesh_from_solution(disc, recon_order, solution)
    grid.field_data["time"] = np.array(
        [start_index * time_settings.dt if time_settings is not None else 0.0]
    )
    resulting_grids.append(grid)

    use_fused_march = (
        time_settings is not None
        and compiled.rhs_blocks is None
        and compiled.nonlin_blocks is None
        and sg_operator is None
        and not print_residual
        and solver_settings.linear_solver == "dense"
        and checkpoint_settings is None
        and not has_unsteady_bcs
        and not has_td_rhs
        and not has_td_fields
    )
    # Nonlinear marches fuse too (scan over steps, while_loop Picard inside)
    # when the dense on-device solver is selected and nothing forces a host
    # loop (VMS, Newton rebuilds, per-step output, checkpoints, unsteady BC).
    use_fused_nonlinear_march = (
        not use_fused_march
        and time_settings is not None
        and sg_operator is None
        and not print_residual
        and solver_settings.linear_solver == "dense"
        and checkpoint_settings is None
        and not has_unsteady_bcs
        and not has_td_rhs
        and not has_td_fields
    )
    if use_fused_march:
        # Linear march: run the entire scan on device (solver/fused.py).
        from mfv2d_tpu.solver.fused import fused_linear_time_march

        nt = time_settings.nt
        dt = time_settings.dt
        us, sample_steps, global_lagrange = fused_linear_time_march(
            disc,
            matrices,
            lagrange_mat,
            explicit_vec,
            time_carry_index_array,
            solution,
            old_solution_carry,
            np.asarray(time_carry_term),
            dt,
            nt,
            time_settings.sample_rate,
        )
        changes = np.zeros(nt)
        iters = np.ones(nt, np.uint32)
        for s_i, time_index in enumerate(sample_steps):
            grid = reconstruct_mesh_from_solution(disc, recon_order, us[s_i])
            grid.field_data["time"] = np.array([(int(time_index) + 1) * dt])
            resulting_grids.append(grid)
        solution = us[-1]
    elif use_fused_nonlinear_march:
        if solver_settings.method == "newton":
            from mfv2d_tpu.solver.fused import (
                fused_newton_time_march as fused_nonlinear_time_march,
            )
        else:
            from mfv2d_tpu.solver.fused import fused_nonlinear_time_march

        nt = time_settings.nt
        dt = time_settings.dt
        us, sample_steps, global_lagrange, iters, changes = (
            fused_nonlinear_time_march(
                disc,
                evaluator,
                matrices,
                lagrange_mat,
                explicit_vec,
                time_carry_index_array,
                solution,
                old_solution_carry,
                np.asarray(time_carry_term),
                dt,
                nt,
                max_iterations,
                relax,
                atol,
                rtol,
                max_mag,
                time_settings.sample_rate,
                **(
                    {}
                    if solver_settings.method == "newton"
                    else {"anderson_m": solver_settings.anderson_m}
                ),
            )
        )
        for s_i, time_index in enumerate(sample_steps):
            grid = reconstruct_mesh_from_solution(disc, recon_order, us[s_i])
            grid.field_data["time"] = np.array([(int(time_index) + 1) * dt])
            resulting_grids.append(grid)
        solution = us[-1]
    elif time_settings is not None:
        nt = time_settings.nt
        dt = time_settings.dt
        changes = np.zeros(nt)
        iters = np.zeros(nt, np.uint32)
        rebuild_each_step = has_unsteady_bcs or has_td_rhs
        pure_forcing = (
            compute_forcing_vector(disc, system)
            if (has_unsteady_bcs and not has_td_rhs)
            else None
        )
        for time_index in range(start_index, nt):
            assert old_solution_carry is not None and time_carry_term is not None
            if has_td_fields:
                # TimeDependent OPERATOR fields: re-evaluate the field at
                # the new time level, re-assemble the frozen element
                # matrices + forcing + constraint values, and refactorize.
                # Every step pays one assembly + factorization — the price
                # of a genuinely time-varying operator.
                TimeDependent.current_time = (time_index + 1) * dt
                evaluator.refresh_static_fields()
                bcs_t = (
                    freeze_unsteady_boundary_conditions(
                        system_settings.boundary_conditions or [],
                        (time_index + 1) * dt,
                    )
                    if has_unsteady_bcs
                    else (boundary_conditions or [])
                )
                with tracer.stage("assembly+constraints"):
                    forcing, matrices, _lag_mat_t, lagrange_vec_t = (
                        compute_linear_system(
                            disc,
                            system,
                            evaluator,
                            constrained_forms,
                            bcs_t,
                            solution,
                        )
                    )
                explicit_vec = (
                    np.concatenate((forcing, lagrange_vec_t))
                    if lagrange_mat is not None
                    else forcing
                )
                max_mag = float(np.abs(explicit_vec).max())
                _t_refac = __import__("time").perf_counter()
                if solver_settings.linear_solver == "direct":
                    solver = FrozenSaddleSolver(
                        evaluator.matrices_per_leaf(matrices), lagrange_mat
                    )
                elif solver_settings.linear_solver == "dense":
                    from mfv2d_tpu.solver.iterative import DenseSaddleSolver

                    solver = DenseSaddleSolver(disc, matrices, lagrange_mat)
                else:
                    from mfv2d_tpu.solver.iterative import (
                        IterativeSaddleSolver,
                    )

                    solver = IterativeSaddleSolver(
                        disc,
                        matrices,
                        lagrange_mat,
                        ConvergenceSettings(
                            maximum_iterations=max(
                                200,
                                4 * (disc.n_dofs + int(lagrange_vec.size)),
                            ),
                            absolute_tolerance=solver_settings.convergence.absolute_tolerance
                            * 1e-3,
                            relative_tolerance=1e-12,
                        ),
                        method=solver_settings.linear_solver,
                    )
                tracer.add(
                    "factorize", __import__("time").perf_counter() - _t_refac
                )
            elif rebuild_each_step and (time_index > 0 or has_td_rhs):
                # Re-evaluate time-dependent boundary values / forcing at
                # the new time level; the constraint matrix itself is
                # time-independent.
                from mfv2d_tpu.continuity import add_system_constraints

                if has_td_rhs:
                    TimeDependent.current_time = (time_index + 1) * dt
                frozen = freeze_unsteady_boundary_conditions(
                    system_settings.boundary_conditions or [],
                    (time_index + 1) * dt,
                )
                forcing_t = (
                    compute_forcing_vector(disc, system)
                    if has_td_rhs
                    else pure_forcing.copy()
                )
                vec_views = [
                    forcing_t[
                        disc.element_offsets[i] : disc.element_offsets[i + 1]
                    ]
                    for i in range(disc.n_leaves)
                ]
                _, lagrange_vec_t = add_system_constraints(
                    system,
                    mesh,
                    basis_cache,
                    constrained_forms,
                    frozen,
                    disc.leaf_indices,
                    disc.element_offsets,
                    vec_views,
                )
                assert lagrange_vec_t.size == lagrange_vec.size
                explicit_vec = (
                    np.concatenate((forcing_t, lagrange_vec_t))
                    if lagrange_mat is not None
                    else forcing_t
                )
                max_mag = float(np.abs(explicit_vec).max())
            current_carry = 2 / dt * old_solution_carry + time_carry_term

            solution, global_lagrange, iter_cnt, max_residual, fine_scales = (
                non_linear_solve_run(
                    max_iterations,
                    relax,
                    atol,
                    rtol,
                    print_residual,
                    evaluator,
                    explicit_vec,
                    time_carry_index_array,
                    current_carry,
                    solution,
                    global_lagrange,
                    max_mag,
                    solver,
                    lagrange_mat,
                    fine_scales,
                    sg_operator,
                    False,
                    newton=solver_settings.method == "newton",
                    anderson_m=solver_settings.anderson_m,
                )
            )
            changes[time_index] = float(max_residual)
            iters[time_index] = iter_cnt

            projected = compute_element_dual_from_primal_global(disc, solution)
            new_solution_carry = projected[time_carry_index_array]
            time_carry_term = (
                2 / dt * (new_solution_carry - old_solution_carry) - time_carry_term
            )
            old_solution_carry = new_solution_carry

            if checkpoint_settings is not None and (
                (time_index + 1) % checkpoint_settings.every == 0
                or time_index + 1 == nt
            ):
                from mfv2d_tpu.checkpoint import save_march_state

                save_march_state(
                    checkpoint_settings.path,
                    mesh,
                    solution,
                    global_lagrange,
                    old_solution_carry,
                    time_carry_term,
                    time_index + 1,
                    dt,
                )

            if (time_index % time_settings.sample_rate) == 0 or time_index + 1 == nt:
                grid = reconstruct_mesh_from_solution(
                    disc, recon_order, solution, _vms_to_coarse(sg_operator, fine_scales, disc)
                )
                grid.field_data["time"] = np.array([(time_index + 1) * dt])
                resulting_grids.append(grid)

            if print_residual:
                print(
                    f"Time step {time_index:d} finished in {iter_cnt:d} iterations"
                    f" with residual of {float(max_residual):.5e}"
                )
    elif (
        solver_settings.linear_solver == "dense"
        and sg_operator is None
        and not print_residual
        and checkpoint_settings is None  # fused loop can't checkpoint
    ):
        # Steady solve fully on device (solver/fused.py): Picard with the
        # frozen LU, or exact-Newton with in-trace Jacobian refactorization.
        if solver_settings.method == "newton":
            from mfv2d_tpu.solver.fused import fused_newton_solve as _fused
        else:
            from mfv2d_tpu.solver.fused import fused_picard_solve as _fused

        _fused_kwargs = (
            {}
            if solver_settings.method == "newton"
            else {"anderson_m": solver_settings.anderson_m}
        )
        solution, global_lagrange, iter_cnt, all_residuals, _ = _fused(
            disc,
            evaluator,
            matrices,
            lagrange_mat,
            explicit_vec,
            solution,
            global_lagrange,
            max_iterations,
            relax,
            atol,
            rtol,
            max_mag,
            **_fused_kwargs,
        )
        changes = np.asarray(all_residuals)[:iter_cnt]
        iters = np.array((iter_cnt,), np.uint32)
        grid = reconstruct_mesh_from_solution(disc, recon_order, solution)
        resulting_grids.append(grid)
    else:
        ckpt_cb = None
        if checkpoint_settings is not None:
            from mfv2d_tpu.checkpoint import save_steady_state

            _prior_iters, _prior_elapsed = _steady_ckpt_prior
            _t_ckpt0 = __import__("time").perf_counter()
            _cs = checkpoint_settings

            def ckpt_cb(it, sol, lag, unres):
                if it % max(1, _cs.every) != 0:
                    return
                save_steady_state(
                    _cs.path,
                    sol,
                    lag,
                    unres,
                    _prior_iters + it,
                    _prior_elapsed
                    + __import__("time").perf_counter()
                    - _t_ckpt0,
                )

        solution, global_lagrange, iter_cnt, all_residuals, fine_scales = (
            non_linear_solve_run(
                max_iterations,
                relax,
                atol,
                rtol,
                print_residual,
                evaluator,
                explicit_vec,
                None,
                None,
                solution,
                global_lagrange,
                max_mag,
                solver,
                lagrange_mat,
                fine_scales,
                sg_operator,
                True,
                newton=solver_settings.method == "newton",
                checkpoint_cb=ckpt_cb,
                anderson_m=solver_settings.anderson_m,
            )
        )
        if ckpt_cb is not None and iter_cnt % max(1, _cs.every) != 0:
            # Always persist the final (converged) iterate, like the march
            # path does for its last step — a crash between here and the
            # caller otherwise replays up to every-1 iterations.
            save_steady_state(
                _cs.path,
                solution,
                global_lagrange,
                fine_scales,
                _prior_iters + iter_cnt,
                _prior_elapsed + __import__("time").perf_counter() - _t_ckpt0,
            )
        changes = np.asarray(all_residuals)[:iter_cnt]
        iters = np.array((iter_cnt,), np.uint32)
        grid = reconstruct_mesh_from_solution(
            disc, recon_order, solution, _vms_to_coarse(sg_operator, fine_scales, disc)
        )
        resulting_grids.append(grid)

    tracer.add("solve+reconstruct", __import__("time").perf_counter() - _t_solve)
    mesh_orders = disc.element_orders
    orders, counts = np.unique(mesh_orders, axis=0, return_counts=True)
    stats = SolutionStatistics(
        element_orders={
            (int(o[0]), int(o[1])): int(c) for o, c in zip(orders, counts)
        },
        n_total_dofs=explicit_vec.size,
        n_lagrange=int(lagrange_vec.size),
        n_elems=mesh.element_count,
        n_leaves=mesh.leaf_count,
        n_leaf_dofs=disc.n_dofs,
        iter_history=iters,
        residual_history=np.asarray(changes),
    )

    if refinement_settings is not None:
        from mfv2d_tpu.refinement import perform_mesh_refinement

        if refinement_settings.report_order_distribution:
            order_hist = HistogramFormat(5, 60, 5, label_format=lambda x: f"{x:.1f}")
            geo_order = np.linalg.norm(mesh_orders, axis=1) / np.sqrt(2)
            print("Initial mesh order distribution\n" + "=" * 60)
            print(order_hist.format(geo_order))
            print("=" * 60)

        _t_ref = __import__("time").perf_counter()
        output_mesh, error_estimates, h_ref_cost = perform_mesh_refinement(
            disc,
            solution,
            system,
            evaluator,
            refinement_settings.error_estimate,
            refinement_settings.h_refinement_ratio,
            refinement_settings.refinement_limit,
            refinement_settings.report_error_distribution,
            boundary_conditions,
            refinement_settings.upper_order_limit,
            refinement_settings.lower_order_limit,
            system_settings.constrained_forms,
            anisotropic_p=refinement_settings.anisotropic_p,
        )
        tracer.add("refinement", __import__("time").perf_counter() - _t_ref)
        resulting_grids[-1].cell_data["error_estimate"] = error_estimates
        resulting_grids[-1].cell_data["h_ref_cost_estimate"] = h_ref_cost
        if refinement_settings.report_order_distribution:
            geo_order = np.linalg.norm(
                [
                    output_mesh.get_leaf_orders(int(ie))
                    for ie in output_mesh.get_leaf_indices()
                ],
                axis=1,
            ) / np.sqrt(2)
            print("Refined mesh order distribution\n" + "=" * 60)
            print(order_hist.format(geo_order))
            print("=" * 60)
    else:
        output_mesh = mesh

    if tracer.enabled:
        print(tracer.report())
    return tuple(resulting_grids), stats, output_mesh


def _fine_to_coarse_dual(disc, dk: int, fine_scales: np.ndarray) -> np.ndarray:
    """Dual (P^T) projection of fine-scale VMS results to coarse DoFs.

    The sharded entry path's equivalent of the single-device
    ``fine_results_to_coarse_dofs(..., dual=True)`` — one inclusion-matrix
    GEMM per order bucket.
    """
    from mfv2d_tpu.evaluation import reference_inclusion_matrix
    from mfv2d_tpu.parallel.vms import _fine_discretization

    fd = _fine_discretization(disc, dk)
    out = np.zeros(disc.n_dofs)
    x = np.asarray(fine_scales)
    for cb, fb in zip(disc.buckets, fd.buckets):
        c = reference_inclusion_matrix(disc.form_spec, cb.orders, fb.orders)
        out[cb.gather] = x[fb.gather] @ c
    return out


def _vms_to_coarse(sg_operator, fine_scales, disc):
    """Project fine-scale VMS results to coarse dual DoFs for output.

    The reference slices the fine-space vector with coarse offsets
    (solve_system.py:233-239), which misaligns for order_increase > 0; the
    dual projection is the consistent restriction.
    """
    if fine_scales is None or sg_operator is None:
        return None
    return sg_operator.fine_results_to_coarse_dofs(fine_scales, dual=True)[
        : disc.n_dofs
    ]


def update_system_for_time_march(
    time_settings: TimeSettings, system: KFormSystem
) -> KFormSystem:
    """Add the 2/dt <w, u> terms of the trapezoidal rule to marched equations."""
    for w, u in time_settings.time_march_relations.items():
        if u not in system.unknown_forms:
            raise ValueError(f"Unknown form {u} is not in the system.")
        if w not in system.weight_forms:
            raise ValueError(f"Weight form {w} is not in the system.")
        if u.order != w.order:
            raise ValueError(
                f"Forms {u} and {w} in the time march relation can not be used, as"
                f" they have differing orders ({u.order} vs {w.order})."
            )

    time_march_indices = tuple(
        (
            system.unknown_forms.index(time_settings.time_march_relations[eq.weight])
            if eq.weight in time_settings.time_march_relations
            else None
        )
        for eq in system.equations
    )

    new_equations: list[KEquation] = []
    for eq, m_idx in zip(system.equations, time_march_indices):
        if m_idx is None:
            new_equations.append(eq)
        else:
            new_equations.append(
                eq.left
                + 2
                / time_settings.dt
                * (system.weight_forms[m_idx] @ system.unknown_forms.get_form(m_idx))
                == eq.right
            )
    return KFormSystem(*new_equations)


def _solve_sharded(
    mesh: Mesh,
    system_settings: SystemSettings,
    solver_settings: SolverSettings,
    time_settings: TimeSettings | None,
    basis_cache: FemCache,
    recon_order: int | None,
    boundary_conditions,
    *,
    has_unsteady_bcs: bool = False,
    has_td_rhs: bool = False,
    vms_settings: VMSSettings | None = None,
    refinement_settings=None,
    checkpoint_settings=None,
) -> tuple[Sequence[ReconstructedGrid], SolutionStatistics, Mesh]:
    """Element-sharded solve over ``solver_settings.device_mesh``.

    Routes to the mfv2d_tpu.parallel.sharding training steps: the steady
    Picard solve, or the linear/nonlinear trapezoidal march — each fully
    sharded with one trace psum per matvec/residual.  Unsteady boundary
    values / TimeDependent forcing enter the marches as precomputed
    per-step scan inputs; initial conditions seed both the steady Picard
    iterate and the marches' consistent trapezoidal carry start.
    """
    from mfv2d_tpu.parallel.sharding import (
        sharded_nonlinear_time_march,
        sharded_steady_solve,
        sharded_time_march,
    )
    from mfv2d_tpu.solver.solve import compute_initial_solution

    system = system_settings.system
    device_mesh = solver_settings.device_mesh
    disc = discretize_mesh(mesh, system.unknown_forms, basis_cache)
    conv = solver_settings.convergence
    krylov = "gmres" if solver_settings.linear_solver == "gmres" else "cg"
    # ``boundary_conditions`` arrives frozen at t = dt for unsteady runs;
    # the marches additionally receive the ORIGINAL (unsteady) list so
    # they can re-freeze the boundary values at every time level.
    bcs = list(boundary_conditions or [])
    raw_bcs = (
        list(system_settings.boundary_conditions or [])
        if has_unsteady_bcs
        else None
    )
    cforms = list(system_settings.constrained_forms)
    cg_cap = max(200, 4 * disc.n_dofs)
    cg_tol = conv.absolute_tolerance * 1e-3

    if system_settings.initial_conditions:
        _, initial_solution = compute_initial_solution(
            disc, system, system_settings.initial_conditions
        )
    else:
        initial_solution = None

    grids: list[ReconstructedGrid] = []
    if time_settings is None:
        vms_dual = None
        # Steady checkpoint wiring shared by the Picard/Newton/VMS
        # branches: (solution, lagrange, [unresolved], iteration, elapsed),
        # same file format as the single-device loop; a missing resume
        # file means "first attempt".
        ckpt_cb = None
        resume_steady = None
        _prior_iters, _prior_elapsed, _t0 = 0, 0.0, 0.0
        if checkpoint_settings is not None:
            import os as _os
            import time as _time

            from mfv2d_tpu.checkpoint import (
                load_steady_state,
                save_steady_state,
            )

            if checkpoint_settings.resume_from and _os.path.exists(
                checkpoint_settings.resume_from
            ):
                resume_steady = load_steady_state(
                    checkpoint_settings.resume_from
                )
                if resume_steady["solution"].size != disc.n_dofs:
                    raise ValueError(
                        "Checkpoint DoF count does not match the"
                        f" mesh/system: {resume_steady['solution'].size}"
                        f" != {disc.n_dofs}."
                    )
                _prior_iters = resume_steady["iteration"]
                _prior_elapsed = resume_steady["elapsed"]
            _cs = checkpoint_settings
            _t0 = _time.perf_counter()

            def ckpt_cb(it, sol, lag, unres):
                if it % max(1, _cs.every) == 0:
                    save_steady_state(
                        _cs.path,
                        sol,
                        lag,
                        unres,
                        _prior_iters + it,
                        _prior_elapsed + _time.perf_counter() - _t0,
                    )

        newton = solver_settings.method == "newton"
        fine_scales = None
        if vms_settings is not None:
            from mfv2d_tpu.parallel.vms import sharded_vms_steady_solve

            u, lam, residuals, fine_scales = sharded_vms_steady_solve(
                system,
                vms_settings,
                disc,
                device_mesh,
                boundary_conditions=bcs,
                constrained_forms=cforms,
                maximum_iterations=conv.maximum_iterations,
                relax=solver_settings.relaxation,
                absolute_tolerance=conv.absolute_tolerance,
                relative_tolerance=conv.relative_tolerance,
                cg_maximum_iterations=cg_cap,
                cg_tolerance=cg_tol,
                anderson_m=solver_settings.anderson_m,
                initial_solution=(
                    resume_steady["solution"]
                    if resume_steady is not None
                    else initial_solution
                ),
                initial_lagrange=(
                    resume_steady["lagrange"]
                    if resume_steady is not None
                    else None
                ),
                initial_unresolved=(
                    resume_steady["fine_scales"]
                    if resume_steady is not None
                    else None
                ),
                newton=newton,
                checkpoint_cb=ckpt_cb,
            )
            vms_dual = _fine_to_coarse_dual(
                disc, vms_settings.order_increase, fine_scales
            )
        else:
            extra = {}
            if resume_steady is not None:
                extra["initial_solution"] = resume_steady["solution"]
                extra["initial_lagrange"] = resume_steady["lagrange"]
            else:
                extra["initial_solution"] = initial_solution
            if newton:
                from mfv2d_tpu.parallel.sharding import (
                    sharded_newton_steady_solve as _steady,
                )
            else:
                _steady = sharded_steady_solve
            u, lam, residuals = _steady(
                system,
                disc,
                device_mesh,
                boundary_conditions=bcs,
                constrained_forms=cforms,
                maximum_iterations=conv.maximum_iterations,
                relax=solver_settings.relaxation,
                absolute_tolerance=conv.absolute_tolerance,
                relative_tolerance=conv.relative_tolerance,
                cg_maximum_iterations=cg_cap,
                cg_tolerance=cg_tol,
                krylov_method=krylov,
                checkpoint_cb=ckpt_cb,
                **extra,
            )
        if checkpoint_settings is not None:
            # Persist the final (converged) iterate regardless of the
            # `every` stride, like the single-device path.  For VMS the
            # recovered fine scales stand in for the in-loop unresolved
            # contributions — on resume they are only an inner-solve warm
            # start, never part of the answer.
            save_steady_state(
                checkpoint_settings.path,
                np.asarray(u),
                np.asarray(lam),
                fine_scales,
                _prior_iters + len(residuals),
                _prior_elapsed + _time.perf_counter() - _t0,
            )
        grid = reconstruct_mesh_from_solution(disc, recon_order, u, vms_dual)
        grid.field_data["time"] = np.array([0.0])
        grids.append(grid)
        iters = np.array((len(residuals),), np.uint32)
        changes = np.asarray(residuals)
        lam_size = np.asarray(lam).size
    else:
        marched = update_system_for_time_march(time_settings, system)
        marched_compiled = CompiledSystem(marched)
        # Resume a checkpointed sharded march (same file format as the
        # single-device path — the two paths' checkpoints interchange).
        resume_state = None
        if (
            checkpoint_settings is not None
            and checkpoint_settings.resume_from
        ):
            import os as _os

            from mfv2d_tpu.checkpoint import load_march_state

            if _os.path.exists(checkpoint_settings.resume_from):
                resume_state = load_march_state(
                    checkpoint_settings.resume_from
                )
                if resume_state["solution"].size != disc.n_dofs:
                    raise ValueError(
                        "Checkpoint DoF count does not match the"
                        f" mesh/system: {resume_state['solution'].size}"
                        f" != {disc.n_dofs}."
                    )
        start_index = (
            int(resume_state["time_index"]) if resume_state is not None else 0
        )
        grid0 = reconstruct_mesh_from_solution(
            disc,
            recon_order,
            resume_state["solution"]
            if resume_state is not None
            else (
                initial_solution
                if initial_solution is not None
                else np.zeros(disc.n_dofs)
            ),
        )
        grid0.field_data["time"] = np.array([start_index * time_settings.dt])
        grids.append(grid0)
        march_fine = None
        needs_host_march = (
            vms_settings is not None
            or solver_settings.method == "newton"
            or checkpoint_settings is not None
        )
        linear = (
            marched_compiled.nonlin_blocks is None
            and marched_compiled.rhs_blocks is None
        )
        if needs_host_march:
            # Newton refactorization, VMS unresolved-scale solves, and
            # checkpoint writes are host work — the fused scan marches
            # cannot express them, so those combinations run the sharded
            # per-step solve under a host step loop.
            from mfv2d_tpu.parallel.sharding import sharded_host_time_march

            us, sample_steps, lam, iters, changes, march_fine = (
                sharded_host_time_march(
                    system,
                    disc,
                    device_mesh,
                    time_settings,
                    boundary_conditions=bcs,
                    constrained_forms=cforms,
                    max_iterations=conv.maximum_iterations,
                    relax=solver_settings.relaxation,
                    absolute_tolerance=conv.absolute_tolerance,
                    relative_tolerance=conv.relative_tolerance,
                    cg_maximum_iterations=cg_cap,
                    cg_tolerance=cg_tol,
                    krylov_method=krylov,
                    unsteady_bcs=raw_bcs,
                    has_td_rhs=has_td_rhs,
                    initial_solution=initial_solution,
                    newton=solver_settings.method == "newton",
                    vms_settings=vms_settings,
                    anderson_m=solver_settings.anderson_m,
                    checkpoint_settings=checkpoint_settings,
                    resume_state=resume_state,
                )
            )
            iters = np.asarray(iters, np.uint32)
            changes = np.asarray(changes)
        elif linear:
            us, sample_steps, lam = sharded_time_march(
                system,
                disc,
                device_mesh,
                time_settings,
                boundary_conditions=bcs,
                constrained_forms=cforms,
                cg_maximum_iterations=cg_cap,
                cg_tolerance=cg_tol,
                krylov_method=krylov,
                unsteady_bcs=raw_bcs,
                has_td_rhs=has_td_rhs,
                initial_solution=initial_solution,
            )
            iters = np.ones(time_settings.nt, np.uint32)
            changes = np.zeros(time_settings.nt)
        else:
            us, sample_steps, lam, iters, changes = sharded_nonlinear_time_march(
                system,
                disc,
                device_mesh,
                time_settings,
                boundary_conditions=bcs,
                constrained_forms=cforms,
                max_iterations=conv.maximum_iterations,
                relax=solver_settings.relaxation,
                absolute_tolerance=conv.absolute_tolerance,
                relative_tolerance=conv.relative_tolerance,
                cg_maximum_iterations=cg_cap,
                cg_tolerance=cg_tol,
                krylov_method=krylov,
                unsteady_bcs=raw_bcs,
                has_td_rhs=has_td_rhs,
                initial_solution=initial_solution,
            )
            iters = np.asarray(iters, np.uint32)
            changes = np.asarray(changes)
        for s_i, step in enumerate(sample_steps):
            # The recovered fine scales exist only for the final state of
            # a VMS march; earlier sampled grids carry the coarse solution
            # alone (the single-device march re-recovers per sample).
            g_vms = (
                _fine_to_coarse_dual(
                    disc, vms_settings.order_increase, march_fine
                )
                if march_fine is not None and s_i == len(sample_steps) - 1
                else None
            )
            g = reconstruct_mesh_from_solution(
                disc, recon_order, us[s_i], g_vms
            )
            g.field_data["time"] = np.array([(int(step) + 1) * time_settings.dt])
            grids.append(g)
        lam_size = np.asarray(lam).size
        u = np.asarray(us[-1])

    mesh_orders = disc.element_orders
    orders, counts = np.unique(mesh_orders, axis=0, return_counts=True)
    stats = SolutionStatistics(
        element_orders={
            (int(o[0]), int(o[1])): int(c) for o, c in zip(orders, counts)
        },
        n_total_dofs=disc.n_dofs + lam_size,
        n_lagrange=int(lam_size),
        n_elems=mesh.element_count,
        n_leaves=mesh.leaf_count,
        n_leaf_dofs=disc.n_dofs,
        iter_history=iters,
        residual_history=changes,
    )

    output_mesh = mesh
    if refinement_settings is not None:
        # The error estimators are element-local host machinery operating
        # on the flat solution vector, so the sharded solve hands off to
        # the same refinement driver the single-device path uses (the
        # marched system for time marches, matching that path).
        from mfv2d_tpu.refinement import perform_mesh_refinement
        from mfv2d_tpu.solver.solve import SystemEvaluator

        ref_system = (
            update_system_for_time_march(time_settings, system)
            if time_settings is not None
            else system
        )
        evaluator = SystemEvaluator(
            ref_system.unknown_forms, CompiledSystem(ref_system), disc
        )
        output_mesh, error_estimates, h_ref_cost = perform_mesh_refinement(
            disc,
            u,
            ref_system,
            evaluator,
            refinement_settings.error_estimate,
            refinement_settings.h_refinement_ratio,
            refinement_settings.refinement_limit,
            refinement_settings.report_error_distribution,
            bcs,
            refinement_settings.upper_order_limit,
            refinement_settings.lower_order_limit,
            system_settings.constrained_forms,
            anisotropic_p=refinement_settings.anisotropic_p,
        )
        grids[-1].cell_data["error_estimate"] = error_estimates
        grids[-1].cell_data["h_ref_cost_estimate"] = h_ref_cost
    return grids, stats, output_mesh

"""hp-refinement: estimators drive refinement and errors drop on re-solve."""

import numpy as np
import pytest

import mfv2d_tpu as mf


def u_exact(x, y):
    # Localized bump: elements near the center should get refined first.
    return np.exp(-8 * (x**2 + y**2)) + 0.05 * x


def source_exact(x, y):
    r2 = x**2 + y**2
    return (256 * r2 - 32) * np.exp(-8 * r2)


def grad_u_flux(x, y):
    """Rotated gradient of u (weak BC data for the direct formulation)."""
    gx = -16 * x * np.exp(-8 * (x**2 + y**2)) + 0.05
    gy = -16 * y * np.exp(-8 * (x**2 + y**2))
    return np.stack((gy, -gx), axis=-1)


def _system():
    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    p = q.weight
    system = mf.KFormSystem(
        v.derivative @ u.derivative == -(v @ source_exact) + (v ^ grad_u_flux),
        p @ u.derivative - p @ q == 0,
        sorting=lambda f: f.order,
    )
    return system, u, q


def _solve(mesh, refinement_settings=None):
    system, u, q = _system()
    bc = mf.BoundaryCondition2DSteady(u, mesh.boundary_indices, u_exact)
    return (
        mf.solve_system_2d(
            mesh,
            system_settings=mf.SystemSettings(system, boundary_conditions=[bc]),
            solver_settings=mf.SolverSettings(
                mf.ConvergenceSettings(absolute_tolerance=1e-10, relative_tolerance=0)
            ),
            refinement_settings=refinement_settings,
            recon_order=8,
        ),
        u,
    )


def _err(grid):
    return float(
        np.sqrt(
            np.mean((grid.point_data["u"] - u_exact(grid.points[:, 0], grid.points[:, 1])) ** 2)
        )
    )


def test_explicit_estimator_refines_center():
    system, u, q = _system()
    mesh = mf.examples.unit_square_mesh(4, 4, 2)
    settings = mf.RefinementSettings(
        error_estimate=mf.ErrorEstimateExplicit(u, u_exact),
        refinement_limit=mf.RefinementLimitElementCount(0.5, 4),
        h_refinement_ratio=0.0,  # always p-refine
    )
    (sols, stats, new_mesh), _ = _solve(mesh, settings)
    grid = sols[-1]
    assert "error_estimate" in grid.cell_data
    # The 4 elements touching the center have the largest error; they must
    # have been p-refined (order 2 -> 3).
    refined = [
        i
        for i in new_mesh.get_leaf_indices()
        if new_mesh.get_leaf_orders(int(i)) == (3, 3)
    ]
    assert len(refined) == 4
    centers = [new_mesh.get_leaf_corners(int(i)).mean(axis=0) for i in refined]
    for c in centers:
        assert np.linalg.norm(c) < 0.5  # near the bump


def test_refinement_loop_reduces_error():
    mesh = mf.examples.unit_square_mesh(3, 3, 2)
    system, u, q = _system()
    settings = mf.RefinementSettings(
        error_estimate=mf.ErrorEstimateExplicit(u, u_exact),
        refinement_limit=mf.RefinementLimitElementCount(1.0, 5),
    )
    errors = []
    for _ in range(3):
        (sols, stats, mesh), _ = _solve(mesh, settings)
        errors.append(_err(sols[-1]))
    assert errors[1] < errors[0] and errors[2] < errors[1], errors
    assert errors[-1] < errors[0] * 0.5, errors


def test_order_reduction_estimator():
    mesh = mf.examples.unit_square_mesh(3, 3, 3)
    system, u, q = _system()
    settings = mf.RefinementSettings(
        error_estimate=mf.ErrorEstimateL2OrderReduction(u, 1),
        refinement_limit=mf.RefinementLimitElementCount(1.0, 3),
    )
    (sols, stats, new_mesh), _ = _solve(mesh, settings)
    assert new_mesh.leaf_count >= mesh.leaf_count
    err_est = sols[-1].cell_data["error_estimate"]
    assert np.all(np.isfinite(err_est)) and np.all(err_est >= 0)
    # Largest estimated errors should be in central elements.
    worst = np.argmax(err_est)
    c = mesh.get_leaf_corners(int(mesh.get_leaf_indices()[worst])).mean(axis=0)
    assert np.linalg.norm(c) < 0.7


def test_local_inverse_estimator():
    mesh = mf.examples.unit_square_mesh(3, 3, 2)
    system, u, q = _system()
    settings = mf.RefinementSettings(
        error_estimate=mf.ErrorEstimateLocalInverse(u, 1),
        refinement_limit=mf.RefinementLimitUnknownCount(0.3, 100),
    )
    (sols, stats, new_mesh), _ = _solve(mesh, settings)
    err_est = sols[-1].cell_data["error_estimate"]
    assert np.all(np.isfinite(err_est)) and np.all(err_est >= 0)
    # Refinement happened within budget.
    assert new_mesh.leaf_count >= mesh.leaf_count


def test_h_refinement_splits():
    """With h_refinement_ratio = inf every refined element gets h-split."""
    mesh = mf.examples.unit_square_mesh(2, 2, 4)
    system, u, q = _system()
    settings = mf.RefinementSettings(
        error_estimate=mf.ErrorEstimateExplicit(u, u_exact),
        refinement_limit=mf.RefinementLimitElementCount(1.0, 2),
        h_refinement_ratio=np.inf,
    )
    (sols, stats, new_mesh), _ = _solve(mesh, settings)
    assert new_mesh.element_count == mesh.element_count + 8  # two splits
    assert new_mesh.leaf_count == mesh.leaf_count + 6


def test_custom_estimator():
    mesh = mf.examples.unit_square_mesh(3, 3, 2)
    system, u, q = _system()

    def estimator(x, y, w, **kwargs):
        err = kwargs["u"] - u_exact(x, y)
        return float(np.sum(err**2 * w)), np.inf  # h-cost inf -> p-refine

    settings = mf.RefinementSettings(
        error_estimate=mf.ErrorEstimateCustom([u], estimator),
        refinement_limit=mf.RefinementLimitElementCount(1.0, 2),
    )
    (sols, stats, new_mesh), _ = _solve(mesh, settings)
    assert new_mesh.leaf_count == mesh.leaf_count  # p-refined only
    raised = [
        int(i)
        for i in new_mesh.get_leaf_indices()
        if new_mesh.get_leaf_orders(int(i)) == (3, 3)
    ]
    assert len(raised) == 2


def test_solve_on_split_mesh_with_hanging_nodes():
    """h-split then re-solve: exercises hanging-node continuity constraints."""
    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    mesh.split_element(0, (3, 3), (3, 3), (3, 3), (3, 3))
    (sols, stats, _), _ = _solve(mesh)
    assert stats.n_leaves == 7
    err = _err(sols[-1])
    # Solve must be well-posed and MORE accurate than the unsplit mesh
    # (unsplit 2x2 p=3 gives ~0.0345; the split resolves the bump better).
    assert err < 0.03, err


def test_refinement_loop_with_h_splits_reduces_error():
    mesh = mf.examples.unit_square_mesh(2, 2, 3)
    settings = mf.RefinementSettings(
        error_estimate=mf.ErrorEstimateExplicit(u_exact_form(), u_exact),
        refinement_limit=mf.RefinementLimitElementCount(1.0, 3),
        h_refinement_ratio=np.inf,  # force h-splitting
    )
    errors = []
    for _ in range(3):
        (sols, stats, mesh), _ = _solve(mesh, settings)
        errors.append(_err(sols[-1]))
    assert errors[-1] < errors[0], errors


def u_exact_form():
    return mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)


def test_anisotropic_p_refinement():
    """A solution varying only in x should drive p1-only raises."""

    def u_aniso(x, y):
        return np.sin(3 * np.pi * x) + 0.001 * y

    def source_aniso(x, y):
        return -9 * np.pi**2 * np.sin(3 * np.pi * x)

    def flux_aniso(x, y):
        gx = 3 * np.pi * np.cos(3 * np.pi * x)
        gy = 0.001 + 0 * y
        return np.stack((gy, -gx), axis=-1)

    u = mf.KFormUnknown("u", mf.UnknownFormOrder.FORM_ORDER_0)
    v = u.weight
    q = mf.KFormUnknown("q", mf.UnknownFormOrder.FORM_ORDER_1)
    p = q.weight
    system = mf.KFormSystem(
        v.derivative @ u.derivative == -(v @ source_aniso) + (v ^ flux_aniso),
        p @ u.derivative - p @ q == 0,
        sorting=lambda f: f.order,
    )
    mesh = mf.examples.unit_square_mesh(3, 3, 2)
    bc = mf.BoundaryCondition2DSteady(u, mesh.boundary_indices, u_aniso)
    settings = mf.RefinementSettings(
        # Reconstruct above the element order: at p=2 on a 3x3 mesh every
        # GLL node lands on a zero of sin(3 pi x), so estimating at the
        # element's own rule would measure pure roundoff noise.
        error_estimate=mf.ErrorEstimateExplicit(
            u, u_aniso, reconstruction_orders=(6, 6)
        ),
        refinement_limit=mf.RefinementLimitElementCount(1.0, 9),
        h_refinement_ratio=0.0,
        anisotropic_p=True,
    )
    sols, stats, new_mesh = mf.solve_system_2d(
        mesh,
        mf.SystemSettings(system, boundary_conditions=[bc]),
        mf.SolverSettings(mf.ConvergenceSettings(10, 1e-10, 0)),
        refinement_settings=settings,
        recon_order=6,
    )
    orders = [new_mesh.get_leaf_orders(int(i)) for i in new_mesh.get_leaf_indices()]
    raised_p1_only = sum(1 for o in orders if o == (3, 2))
    raised_both = sum(1 for o in orders if o == (3, 3))
    # The x-only solution must drive p1-dominant refinement.
    assert raised_p1_only > 0, orders
    assert raised_p1_only >= raised_both, orders


def test_fine_solve_estimator_drives_refinement():
    """ErrorEstimateFineSolve refines without any exact solution."""
    from mfv2d_tpu.models import poisson

    model = poisson.mixed_poisson()
    mesh = mf.examples.unit_square_mesh(3, 3, 2)
    errs = []
    for _ in range(3):
        settings = mf.RefinementSettings(
            error_estimate=mf.ErrorEstimateFineSolve(model.u, order_increase=1),
            refinement_limit=mf.RefinementLimitElementCount(0.35, 6),
            h_refinement_ratio=0.0,
        )
        sols, stats, mesh = mf.solve_system_2d(
            mesh,
            mf.SystemSettings(model.system),
            refinement_settings=settings,
            recon_order=8,
        )
        grid = sols[-1]
        pts = grid.points
        errs.append(
            float(
                np.sqrt(
                    np.mean(
                        (grid.point_data["u"] - poisson.u_exact(pts[:, 0], pts[:, 1]))
                        ** 2
                    )
                )
            )
        )
    # Error must decay monotonically over projection-driven rounds.
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 0.25 * errs[0]


def test_fine_solve_estimator_hp_buckets_match_exact_error():
    """The bucket-batched fine-solve estimator on an hp (two-bucket) mesh.

    Pins the fine-DoF offset mapping: every element's fine-vs-coarse error
    measure must track the TRUE per-element L2 error of the coarse
    solution (correlation + same dominant element), which breaks loudly if
    fine slices are gathered from the wrong leaves or offsets.
    """
    from mfv2d_tpu.models import poisson
    from mfv2d_tpu.refinement import error_estimate_with_fine_solve
    from mfv2d_tpu.solver.discretization import discretize_mesh
    from mfv2d_tpu.ops.basis import FemCache
    from mfv2d_tpu.projection import reconstruct_batched
    from mfv2d_tpu.refinement import ErrorEstimateFineSolve, _jacobian_np

    from mfv2d_tpu.compiler import CompiledSystem
    from mfv2d_tpu.solver.solve import (
        FrozenSaddleSolver,
        SystemEvaluator,
        compute_linear_system,
        non_linear_solve_run,
    )

    model = poisson.mixed_poisson()
    orders = np.array([[2, 2], [3, 3]] * 4 + [[2, 2]])
    mesh = mf.examples.unit_square_mesh(3, 3, orders)
    disc = discretize_mesh(mesh, model.system.unknown_forms, FemCache(2))
    compiled = CompiledSystem(model.system)
    evaluator = SystemEvaluator(disc.form_spec, compiled, disc)
    forcing, matrices, lagrange_mat, lagrange_vec = compute_linear_system(
        disc, model.system, evaluator, [], [], None
    )
    solver = FrozenSaddleSolver(
        evaluator.matrices_per_leaf(matrices), lagrange_mat
    )
    explicit_vec = np.concatenate((forcing, lagrange_vec))
    solution, _, _, _, _ = non_linear_solve_run(
        20, 1.0, 1e-10, 0.0, False, evaluator, explicit_vec, None, None,
        np.zeros(disc.n_dofs), np.zeros(lagrange_mat.shape[0]),
        float(np.abs(explicit_vec).max()), solver, lagrange_mat,
    )
    est = ErrorEstimateFineSolve(model.u, order_increase=1)
    err, hc, dc = error_estimate_with_fine_solve(
        disc, solution, model.system, [], [], est
    )
    assert err.shape == (disc.n_leaves,)
    assert np.all(np.isfinite(err)) and np.all(err >= 0)

    # True per-element squared L2 errors of the coarse solution.
    truth = np.empty(disc.n_leaves)
    form_specs = disc.form_spec
    idx = form_specs.index(model.u)
    for bucket in disc.buckets:
        p1, p2 = bucket.orders
        basis = disc.basis_cache.get_basis2d(p1, p2)
        rule = disc.basis_cache.get_integration_rule(p1 + 3)
        xi = rule.nodes[None, :]
        eta = rule.nodes[:, None]
        corners = np.asarray(bucket.batch.corners)
        off = form_specs.form_offset(idx, p1, p2)
        size = form_specs.form_size(idx, p1, p2)
        recon = np.asarray(
            reconstruct_batched(
                corners, basis, model.u.order,
                solution[bucket.gather][:, off : off + size], xi, eta,
            )
        )
        from mfv2d_tpu.refinement import _physical_coordinates_np

        x, y = _physical_coordinates_np(corners, xi, eta)
        exact = poisson.u_exact(x, y)
        det = _jacobian_np(corners, xi, eta)[4]
        w2d = rule.weights[None, :] * rule.weights[:, None]
        truth[np.asarray(bucket.leaf_ranks)] = np.sum(
            (recon - exact) ** 2 * w2d[None] * det, axis=(1, 2)
        )

    # Estimated and true element errors must rank the elements coherently.
    corr = np.corrcoef(np.log(err + 1e-30), np.log(truth + 1e-30))[0, 1]
    assert corr > 0.9, corr
    assert np.argmax(err) == np.argmax(truth)

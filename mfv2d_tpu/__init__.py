"""mfv2d_tpu: a TPU-native 2D mimetic spectral element method framework.

A from-scratch rebuild of the capabilities of the ``mfv2d`` reference solver
(https://github.com/j4nr0th/mfv2d) designed for TPU hardware: the k-form DSL
compiles to traced JAX computations, element assembly runs as batched MXU
GEMMs over all elements of an order bucket at once, and the global solve is
either a dense on-device factorization or matrix-free Krylov with
element-local matvecs plus constraint gather/scatter.
"""

from mfv2d_tpu import config as _config  # noqa: F401  (enables x64)

# Examples
from mfv2d_tpu import examples as examples

# Mesh
from mfv2d_tpu.mesh.manifold import GeoID as GeoID
from mfv2d_tpu.mesh.manifold import Line as Line
from mfv2d_tpu.mesh.manifold import Manifold2D as Manifold2D
from mfv2d_tpu.mesh.manifold import Surface as Surface
from mfv2d_tpu.mesh.quadtree import Mesh as Mesh
from mfv2d_tpu.mimetic import mesh_create as mesh_create
from mfv2d_tpu.mimetic import integrate_over_elements as integrate_over_elements

# K-forms
from mfv2d_tpu.kform import KEquation as KEquation
from mfv2d_tpu.kform import KFormUnknown as KFormUnknown
from mfv2d_tpu.kform import KWeight as KWeight
from mfv2d_tpu.kform import TimeDependent as TimeDependent
from mfv2d_tpu.kform import UnknownFormOrder as UnknownFormOrder

# System / compiler
from mfv2d_tpu.system import ElementFormSpecification as ElementFormSpecification
from mfv2d_tpu.system import KFormSystem as KFormSystem
from mfv2d_tpu.compiler import CompiledSystem as CompiledSystem
from mfv2d_tpu.compiler import system_as_string as system_as_string

# Boundary conditions
from mfv2d_tpu.boundary import BoundaryCondition2DSteady as BoundaryCondition2DSteady
from mfv2d_tpu.boundary import (
    BoundaryCondition2DUnsteady as BoundaryCondition2DUnsteady,
)

# Refinement
from mfv2d_tpu.refinement import ErrorEstimateCustom as ErrorEstimateCustom
from mfv2d_tpu.refinement import ErrorEstimateExplicit as ErrorEstimateExplicit
from mfv2d_tpu.refinement import ErrorEstimateFineSolve as ErrorEstimateFineSolve
from mfv2d_tpu.refinement import (
    ErrorEstimateL2OrderReduction as ErrorEstimateL2OrderReduction,
)
from mfv2d_tpu.refinement import ErrorEstimateLocalInverse as ErrorEstimateLocalInverse
from mfv2d_tpu.refinement import ErrorEstimateVMS as ErrorEstimateVMS
from mfv2d_tpu.refinement import (
    RefinementLimitElementCount as RefinementLimitElementCount,
)
from mfv2d_tpu.refinement import RefinementLimitErrorValue as RefinementLimitErrorValue
from mfv2d_tpu.refinement import (
    RefinementLimitUnknownCount as RefinementLimitUnknownCount,
)
from mfv2d_tpu.refinement import RefinementSettings as RefinementSettings
from mfv2d_tpu.refinement import (
    compute_legendre_coefficients as compute_legendre_coefficients,
)
from mfv2d_tpu.refinement import (
    compute_legendre_error_estimates as compute_legendre_error_estimates,
)

# Solver
from mfv2d_tpu.solver.solve import ConvergenceSettings as ConvergenceSettings
from mfv2d_tpu.solver.solve import SolutionStatistics as SolutionStatistics
from mfv2d_tpu.solver.solve import SolverSettings as SolverSettings
from mfv2d_tpu.checkpoint import CheckpointSettings as CheckpointSettings
from mfv2d_tpu.checkpoint import load_mesh as load_mesh
from mfv2d_tpu.checkpoint import save_mesh as save_mesh
from mfv2d_tpu.solver.solve import SystemSettings as SystemSettings
from mfv2d_tpu.solver.solve import TimeSettings as TimeSettings
from mfv2d_tpu.solver.solve import VMSSettings as VMSSettings
from mfv2d_tpu.solve_system_2d import solve_system_2d as solve_system_2d

"""Inverse-problem pipeline: solution/measurement samplers, state-estimation
methods (least squares, PBDW, weighted LS, polynomial LS) and
Christoffel-function-based optimal sensor placement.

Rebuild of the CEMRACS tutorial reference implementations
(reference: src/notebooks/InverseProblemPipeline.ipynb cells 24, 44, 52).
"""

from romhighcontrast_tpu.inverse.samplers import (
    sample_solution_uniform,
    sample_solution_grid,
    sample_measurements_uniform,
    sample_measurements_grid,
    sample_measurements_sobol,
    sample_measurements_latin_square,
    sample_measurements_optimal,
    MEASUREMENT_SAMPLERS,
)
from romhighcontrast_tpu.inverse.christoffel import inverse_christoffel_function
from romhighcontrast_tpu.inverse.state_estimation import (
    estimate_state_least_squares,
    estimate_state_pbdw,
    estimate_state_weighted_least_squares,
    estimate_state_polynomial_least_squares,
    pbdw_correction,
    STATE_ESTIMATORS,
)

__all__ = [
    "sample_solution_uniform",
    "sample_solution_grid",
    "sample_measurements_uniform",
    "sample_measurements_grid",
    "sample_measurements_sobol",
    "sample_measurements_latin_square",
    "sample_measurements_optimal",
    "MEASUREMENT_SAMPLERS",
    "inverse_christoffel_function",
    "estimate_state_least_squares",
    "estimate_state_pbdw",
    "estimate_state_weighted_least_squares",
    "estimate_state_polynomial_least_squares",
    "pbdw_correction",
    "STATE_ESTIMATORS",
]

"""Reduced-order-model layer: basis containers, builders, online problems,
parameter estimators (reference: src/lib/ReducedBasis.py, src/lib/Estimators.py)."""

from romhighcontrast_tpu.rom.basis import (
    ReducedBasis,
    get_high_contrast_coefficient,
    orthonormalize_base,
    sort_orthogonalize_base,
)
from romhighcontrast_tpu.rom.builders import (
    GreedyBuilder,
    PCABuilder,
    RandomBuilder,
    GREEDY_FOR_GALERKIN,
    GREEDY_FOR_H10,
    get_inf_solutions_starting_basis,
    get_starting_basis,
)
from romhighcontrast_tpu.rom.estimators import (
    EstimatorInv,
    EstimatorLinear,
    EstimatorNear,
    EstimatorTree,
    EstimatorNN,
)
from romhighcontrast_tpu.rom.online import OnlineGalerkin

__all__ = [
    "ReducedBasis",
    "OnlineGalerkin",
    "get_high_contrast_coefficient",
    "orthonormalize_base",
    "sort_orthogonalize_base",
    "GreedyBuilder",
    "PCABuilder",
    "RandomBuilder",
    "GREEDY_FOR_GALERKIN",
    "GREEDY_FOR_H10",
    "get_inf_solutions_starting_basis",
    "get_starting_basis",
    "EstimatorInv",
    "EstimatorLinear",
    "EstimatorNear",
    "EstimatorTree",
    "EstimatorNN",
]

"""Experiment drivers: parameter grids, the paper experiment pipeline,
checkpointed persistence, convergence plots (reference:
src/experiments/HighContrast.py, src/experiments/NonLinearROM.py)."""

from romhighcontrast_tpu.experiments.grids import get_a2test_and_train, get_full_a
from romhighcontrast_tpu.experiments.driver import (
    TypeOfProblems,
    experiment,
    default_builders,
)

__all__ = [
    "get_a2test_and_train",
    "get_full_a",
    "TypeOfProblems",
    "experiment",
    "default_builders",
]

"""Visualization utilities and interactive dashboards
(reference: src/lib/VizUtils.py, src/notebooks/functions4notebooks.py)."""

from romhighcontrast_tpu.viz.vizutils import (
    save_fig,
    squared_subplots,
    plot_solution,
    plot_solutions_together,
    plot_approximate_solutions_together,
)

__all__ = [
    "save_fig",
    "squared_subplots",
    "plot_solution",
    "plot_solutions_together",
    "plot_approximate_solutions_together",
]

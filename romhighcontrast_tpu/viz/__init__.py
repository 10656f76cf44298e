"""Visualization: field rendering built on a cached plotting-grid evaluation
operator, plus interactive dashboards (capabilities of the reference's
src/lib/VizUtils.py and src/notebooks/functions4notebooks.py)."""

from romhighcontrast_tpu.viz.fields import (
    FieldGrid,
    comparison_gallery,
    field_gallery,
    figure_file,
    panel_grid,
)

__all__ = [
    "FieldGrid",
    "comparison_gallery",
    "field_gallery",
    "figure_file",
    "panel_grid",
]

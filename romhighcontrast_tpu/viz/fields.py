"""Field rendering for FEM/polynomial solutions.

Covers the capabilities of the reference's plotting helpers
(src/lib/VizUtils.py) with a different architecture: everything is built
around :class:`FieldGrid`, a cached plotting-grid *evaluation operator*.
Rendering a coefficient vector is one matmul through the grid's evaluation
matrix, so a single ``FieldGrid`` serves any number of panels, dashboards
re-render interactively without rebuilding geometry, and the same operator
powers galleries, comparisons, and custom figures.  (The reference instead
re-evaluates solutions point-by-point inside each plotting call —
VizUtils.py:57 — through the interpreted double loop it also uses for
measurements.)
"""

from __future__ import annotations

import math
from contextlib import contextmanager

import numpy as np


class FieldGrid:
    """A plotting-resolution evaluation operator for a solution space.

    Args:
      space: a FOM space exposing ``x_domain``, ``y_domain``,
        ``blocks_geometry`` and ``evaluate_solutions`` (FemSpace or
        PolynomialSpace).
      resolution: points per dimension of the rendering grid.
    """

    def __init__(self, space, resolution: int = 96):
        self.space = space
        self.resolution = int(resolution)
        self.xs = np.linspace(*space.x_domain, self.resolution)
        self.ys = np.linspace(*space.y_domain, self.resolution)
        X, Y = np.meshgrid(self.xs, self.ys)
        #: (resolution^2, 2) evaluation points, row-major in y
        self.points = np.stack([X.ravel(), Y.ravel()], axis=1)
        self.extent = (space.x_domain[0], space.x_domain[1],
                       space.y_domain[0], space.y_domain[1])

    def render(self, coefficients) -> np.ndarray:
        """Evaluate coefficient vector(s) ``(..., dim)`` on the grid;
        returns ``(..., resolution, resolution)`` (rows = y)."""
        u = np.atleast_2d(np.asarray(coefficients))
        vals = np.asarray(self.space.evaluate_solutions(self.points, u))
        out = vals.reshape(u.shape[:-1] + (self.resolution, self.resolution))
        return out if np.asarray(coefficients).ndim > 1 else out[0]

    def block_edges(self) -> tuple[np.ndarray, np.ndarray]:
        """Interior block-boundary coordinates (x-edges, y-edges)."""
        nrb, ncb = self.space.blocks_geometry
        return (np.linspace(*self.space.x_domain, ncb + 1)[1:-1],
                np.linspace(*self.space.y_domain, nrb + 1)[1:-1])

    def draw(self, ax, field, *, style: str = "image", levels: int = 12,
             clim=None, cmap=None, blocks: bool = True, sensors=None,
             sensor_style: dict | None = None, colorbar: bool = False):
        """Draw one rendered field on ``ax``; returns the image/contour artist.

        style: ``"image"`` (imshow on the domain extent) or ``"contour"``
          (filled contours with ``levels`` levels).
        sensors: optional ``(m, 2)`` measurement locations to overlay.
        """
        field = np.asarray(field)
        vmin, vmax = clim if clim is not None else (None, None)
        if style == "contour":
            artist = ax.contourf(self.xs, self.ys, field, levels=levels,
                                 cmap=cmap, vmin=vmin, vmax=vmax)
        else:
            artist = ax.imshow(field, origin="lower", extent=self.extent,
                               cmap=cmap, vmin=vmin, vmax=vmax)
        if blocks:
            ex, ey = self.block_edges()
            ax.vlines(ex, *self.space.y_domain, colors="k", lw=0.8,
                      linestyles=":", alpha=0.6)
            ax.hlines(ey, *self.space.x_domain, colors="k", lw=0.8,
                      linestyles=":", alpha=0.6)
        if sensors is not None:
            kw = dict(marker=".", s=14, c="w")
            kw.update(sensor_style or {})
            ax.scatter(*np.asarray(sensors).T, **kw)
        if colorbar:
            ax.figure.colorbar(artist, ax=ax, shrink=0.85)
        ax.set_xticks([])
        ax.set_yticks([])
        return artist


def panel_grid(n_panels: int, *, ncols: int | None = None,
               panel_size: float = 3.2, share: bool = True):
    """Create a figure with ``n_panels`` axes in a near-square layout.

    Returns ``(fig, axes)`` with ``axes`` a flat list of exactly
    ``n_panels`` axes (surplus grid slots are removed).
    """
    import matplotlib.pyplot as plt

    n_panels = int(n_panels)
    if ncols is None:
        ncols = int(math.ceil(math.sqrt(n_panels)))
    nrows = int(math.ceil(n_panels / ncols))
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(panel_size * ncols, panel_size * nrows),
        sharex=share, sharey=share, squeeze=False,
    )
    flat = list(axes.ravel())
    for ax in flat[n_panels:]:
        fig.delaxes(ax)
    return fig, flat[:n_panels]


def field_gallery(space, coefficients, *, labels=None, resolution: int = 96,
                  style: str = "contour", levels: int = 12, sensors=None,
                  blocks: bool = True, share_clim: bool = False, clim=None,
                  cmap=None, panel_size: float = 3.2, ncols=None,
                  colorbar: bool = False, grid: FieldGrid | None = None):
    """One panel per solution; returns ``(fig, axes)``.

    labels: optional sequence of per-panel title strings (callers format
      their own coefficient labels).
    share_clim: color-scale all panels jointly (useful for comparing
      magnitudes across a parameter sweep).
    """
    grid = grid or FieldGrid(space, resolution)
    # atleast_2d (not 3d) on the COEFFICIENTS: a single unbatched vector must
    # become one panel, not resolution panels of (res, 1) columns
    fields = grid.render(np.atleast_2d(np.asarray(coefficients)))
    fig, axes = panel_grid(len(fields), panel_size=panel_size, ncols=ncols)
    if share_clim and clim is None:
        clim = (float(fields.min()), float(fields.max()))
    for k, (ax, f) in enumerate(zip(axes, fields)):
        grid.draw(ax, f, style=style, levels=levels, clim=clim, cmap=cmap,
                  blocks=blocks, sensors=sensors, colorbar=colorbar)
        if labels is not None:
            ax.set_title(labels[k], fontsize=9)
    fig.tight_layout()
    return fig, axes


def comparison_gallery(space, truth, estimates, *, labels=None,
                       resolution: int = 96, style: str = "image",
                       levels: int = 12, sensors=None, panel_size: float = 3.2,
                       cmap=None, grid: FieldGrid | None = None):
    """Truth vs estimate, one row per pair, shared color scale per row;
    returns ``(fig, axes (n, 2))``.

    The rightmost column also shows the sensor locations when given, since
    estimates are typically reconstructed from those measurements.
    """
    import matplotlib.pyplot as plt

    grid = grid or FieldGrid(space, resolution)
    vt = grid.render(np.atleast_2d(np.asarray(truth)))
    ve = grid.render(np.atleast_2d(np.asarray(estimates)))
    n = len(vt)
    fig, axes = plt.subplots(n, 2, figsize=(2 * panel_size, panel_size * n),
                             squeeze=False)
    for k in range(n):
        clim = (min(vt[k].min(), ve[k].min()), max(vt[k].max(), ve[k].max()))
        grid.draw(axes[k, 0], ve[k], style=style, levels=levels, clim=clim,
                  cmap=cmap)
        grid.draw(axes[k, 1], vt[k], style=style, levels=levels, clim=clim,
                  cmap=cmap, sensors=sensors)
        axes[k, 0].set_title("estimate" if labels is None else labels[k],
                             fontsize=9)
        axes[k, 1].set_title("truth", fontsize=9)
    fig.tight_layout()
    return fig, axes


@contextmanager
def figure_file(path, *, size=(4.0, 4.0), dpi=None, tight: bool = True):
    """Context manager: yields ``(fig, ax)``; saves to ``path`` on exit.

    The suffix decides the format (``.png`` appended when missing)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=size)
    try:
        yield fig, ax
        if tight:
            fig.tight_layout()
        p = str(path)
        if not p.endswith((".png", ".jpg", ".svg", ".pdf")):
            p += ".png"
        fig.savefig(p, dpi=dpi)
    finally:
        plt.close(fig)

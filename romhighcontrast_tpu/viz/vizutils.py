"""Matplotlib plotting helpers (reference: src/lib/VizUtils.py).

Same capabilities: solution heatmaps/contours with block-boundary grid lines,
multi-solution layouts, approximation-vs-truth panels.  Evaluation on the
plotting grid goes through the evaluation-operator matmul (one E build per
grid, reused for all solutions) instead of the reference's per-solution loop.
"""

from __future__ import annotations

import itertools
from contextlib import contextmanager

import numpy as np

AXES_PROPORTIONS = (3, 3)


@contextmanager
def save_fig(pathplot, axes_xy_proportions=(4, 4), dpi=None):
    """Context manager yielding an axis, saved on exit
    (reference: VizUtils.py:12-16)."""
    import matplotlib.pylab as plt

    fig, ax = plt.subplots(figsize=axes_xy_proportions)
    yield ax
    suffix = "" if str(pathplot)[-4:] in (".png", ".jpg", ".svg") else ".png"
    plt.savefig(f"{pathplot}{suffix}", dpi=dpi)
    plt.close()


def squared_subplots(n_subplots, axes_xy_proportions=(4, 4)):
    """Yield axes arranged in a near-square grid (reference: VizUtils.py:19-30)."""
    import matplotlib.pylab as plt

    if n_subplots <= 0:
        return
    nrows = int(np.sqrt(n_subplots))
    ncols = int(np.ceil(n_subplots / nrows))
    fig, ax = plt.subplots(
        nrows=nrows, ncols=ncols, sharex=True, sharey=True,
        figsize=(axes_xy_proportions[0] * ncols, axes_xy_proportions[1] * nrows),
    )
    ax = np.array(ax).reshape(nrows, ncols) if n_subplots > 1 else np.array(
        [[ax]]
    )
    for i, j in itertools.product(range(nrows), range(ncols)):
        yield ax[i, j]


def plot_solution(ax, x, y, u_reshaped, sm, contour_levels=0, vmin=None, vmax=None,
                  colorbar=True, cmap=None, add_grid=True):
    """Heatmap/contour of one solution with block-boundary dashed grid
    (reference: VizUtils.py:33-47)."""
    import matplotlib.pylab as plt

    if contour_levels:
        h = ax.contourf(x, y, u_reshaped, levels=contour_levels, origin="lower",
                        cmap=cmap)
    else:
        h = ax.imshow(u_reshaped, vmin=vmin, vmax=vmax, origin="lower", cmap=cmap,
                      extent=(sm.x_domain[0], sm.x_domain[1],
                              sm.y_domain[0], sm.y_domain[1]))
    if colorbar:
        plt.colorbar(h)
    if add_grid:
        ax.vlines(np.linspace(*sm.x_domain, num=sm.blocks_geometry[1] + 1)[1:-1],
                  ymin=sm.y_domain[0], ymax=sm.y_domain[1],
                  linestyle="dashed", alpha=0.7, color="black")
        ax.hlines(np.linspace(*sm.y_domain, num=sm.blocks_geometry[0] + 1)[1:-1],
                  xmin=sm.x_domain[0], xmax=sm.x_domain[1],
                  linestyle="dashed", alpha=0.7, color="black")


def _eval_on_grid(sm, solutions, num_points):
    x, y = np.meshgrid(
        np.linspace(*sm.x_domain, num=num_points),
        np.linspace(*sm.y_domain, num=num_points),
    )
    pts = np.concatenate((x.reshape(-1, 1), y.reshape(-1, 1)), axis=1)
    vals = np.asarray(sm.evaluate_solutions(pts, solutions))
    return x, y, vals.reshape(len(solutions), num_points, num_points)


def plot_solutions_together(sm, diffusion_coefficients, solutions,
                            num_points_per_dim_to_plot=100, contour_levels=0,
                            axes_xy_proportions=AXES_PROPORTIONS, titles=None,
                            colorbar=False, measurement_points=None, cmap=None,
                            add_grid=True, measurements_color="white",
                            vmin=None, vmax=None):
    """Grid layout of many solutions (reference: VizUtils.py:50-70); one
    evaluation-matrix build serves all panels."""
    import matplotlib.pylab as plt
    from matplotlib import ticker

    solutions = np.atleast_2d(np.asarray(solutions))
    x, y, vals = _eval_on_grid(sm, solutions, num_points_per_dim_to_plot)
    for i, (ax, u) in enumerate(
        zip(squared_subplots(len(solutions), axes_xy_proportions), vals)
    ):
        if titles:
            if diffusion_coefficients is not None:
                ax.set_title(
                    f"a={np.round(np.reshape(diffusion_coefficients[i], sm.blocks_geometry), 2)}"
                )
            else:
                ax.set_title(titles[i])
        plot_solution(ax, x, y, u, sm, contour_levels, colorbar=colorbar,
                      cmap=cmap, add_grid=add_grid, vmin=vmin, vmax=vmax)
        ax.xaxis.set_major_locator(ticker.NullLocator())
        ax.yaxis.set_major_locator(ticker.NullLocator())
        if measurement_points is not None:
            ax.scatter(*np.asarray(measurement_points).T, marker="o", alpha=1,
                       s=10, color=measurements_color)
    plt.tight_layout()


def plot_approximate_solutions_together(sm, diffusion_coefficients, solutions,
                                        approximate_solutions,
                                        num_points_per_dim_to_plot=100,
                                        contour_levels=0, measurement_points=None,
                                        colorbar=False,
                                        axes_xy_proportions=AXES_PROPORTIONS):
    """Side-by-side approximation vs truth (reference: VizUtils.py:73-100)."""
    import matplotlib.pylab as plt

    solutions = np.atleast_2d(np.asarray(solutions))
    approx = np.atleast_2d(np.asarray(approximate_solutions))
    x, y, vt = _eval_on_grid(sm, solutions, num_points_per_dim_to_plot)
    _, _, va = _eval_on_grid(sm, approx, num_points_per_dim_to_plot)
    for i, a in enumerate(diffusion_coefficients):
        fig, ax = plt.subplots(
            ncols=2, figsize=(axes_xy_proportions[0] * 2, axes_xy_proportions[1])
        )
        fig.suptitle(
            "State estimation of \n a="
            f"{np.round(np.reshape(a, sm.blocks_geometry)[::-1], 2)}"
        )
        vmin = min(va[i].min(), vt[i].min())
        vmax = max(va[i].max(), vt[i].max())
        plot_solution(ax[0], x, y, va[i], sm, contour_levels, vmin=vmin, vmax=vmax,
                      colorbar=colorbar)
        plot_solution(ax[1], x, y, vt[i], sm, contour_levels, vmin=vmin, vmax=vmax,
                      colorbar=colorbar)
        ax[0].set_title("\n Approximation")
        ax[1].set_title("\n Solution")
        if measurement_points is not None:
            ax[1].scatter(*np.asarray(measurement_points).T, marker="x", alpha=0.8,
                          s=5, color="white")
    plt.tight_layout()

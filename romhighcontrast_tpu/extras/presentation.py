"""Slide-figure generator (reference: src/extras/plots4presentation.py).

Produces the presentation asset families of the reference:
  * FEM mesh/grid illustration,
  * limit-solution sequences ``a -> infinity`` on a blocked geometry
    (reference :155-233),
  * snapshot families along a parametric contrast curve (reference :263-310),
  * measurement barplots and cell-average "measurements",
  * a 2-mode PCA state-estimation sweep (reference :428-486),
  * a ``metadata.json`` dump describing every produced figure
    (reference :488-506; the reference's hardcoded absolute output path
    at :377 is replaced by a parameter).

All solves are batched device solves; figures are matplotlib.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from romhighcontrast_tpu.config import INFINIT_A, results_path
from romhighcontrast_tpu.models.fem import FemSpace
from romhighcontrast_tpu.viz.fields import field_gallery, figure_file


def limit_solution_sequence(out_dir, blocks_geometry=(5, 5), N=8,
                            hc_block=(2, 2), contrasts=(1, 10, 1e3, 1e6, INFINIT_A)):
    """Sequence of solutions as one block's coefficient grows to infinity
    (reference :155-233)."""
    import matplotlib.pylab as plt

    space = FemSpace(blocks_geometry, N)
    a = np.ones((len(contrasts),) + blocks_geometry)
    for i, t in enumerate(contrasts):
        a[i][hc_block] = t
    sols = space.solve(a)
    fig, _ = field_gallery(space, sols, style="contour", levels=7,
                           labels=[f"a={t:.0e}" for t in contrasts])
    fig.savefig(Path(out_dir) / "limit_solutions.png")
    plt.close(fig)
    return {"figure": "limit_solutions.png", "contrasts": list(map(float, contrasts))}


def snapshot_family_on_curve(out_dir, N=10, n_points=9):
    """Snapshots along a parametric contrast curve (reference
    ``space_y(t)`` :76-80,263-310)."""
    import matplotlib.pylab as plt

    space = FemSpace((2, 2), N)
    t = np.linspace(0.05, 1.0, n_points)
    a = np.ones((n_points, 2, 2))
    a[:, 0, 0] = 1 / t  # contrast path toward infinity as t -> 0
    a[:, 1, 1] = 1 + 9 * t
    sols = space.solve(a)
    fig, _ = field_gallery(space, sols, style="contour", levels=7,
                           labels=[f"a={np.round(ai, 2)}" for ai in a])
    fig.savefig(Path(out_dir) / "snapshot_family.png")
    plt.close(fig)
    return {"figure": "snapshot_family.png", "t": t.tolist()}


def measurement_barplot(out_dir, N=10, m=12, seed=3):
    """Pointwise measurements of one solution as a barplot (reference
    measurement figures)."""
    import matplotlib.pylab as plt

    space = FemSpace((2, 2), N)
    a = np.array([[INFINIT_A, 1.0], [1.0, 100.0]])
    sol = space.solve(a)
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.9, 0.9, size=(m, 2))
    vals = np.asarray(space.evaluate_solutions(pts, sol[None]))[0]
    with figure_file(Path(out_dir) / "measurements_bar.png") as (fig, ax):
        ax.bar(np.arange(m), vals)
        ax.set_xlabel("sensor")
        ax.set_ylabel("u(x_i)")
    return {"figure": "measurements_bar.png", "m": m}


def pca_state_estimation_sweep(out_dir, N=10, n_train=60, frames=6, seed=7):
    """2-mode PCA state estimation across a contrast sweep (reference
    animation :428-486, rendered as a frame strip)."""
    import matplotlib.pylab as plt

    from romhighcontrast_tpu.rom.builders import PCABuilder
    from romhighcontrast_tpu.inverse.state_estimation import (
        estimate_state_least_squares,
    )
    import jax.numpy as jnp

    space = FemSpace((2, 2), N)
    rng = np.random.default_rng(seed)
    contrasts = 1 / np.linspace(1 / INFINIT_A, 1, n_train, endpoint=False)
    a = np.ones((n_train, 2, 2))
    a[:, 0, 0] = contrasts
    sols = space.solve(a)
    rb = PCABuilder(add_inf_solutions=False).build(
        n=2, sm=space, solutions2train=jnp.asarray(sols), a2train=jnp.asarray(a)
    )
    pts = rng.uniform(-0.9, 0.9, size=(25, 2))
    test_idx = np.linspace(0, n_train - 1, frames).astype(int)
    meas = np.asarray(space.evaluate_solutions(pts, sols[test_idx]))
    est = np.asarray(
        estimate_state_least_squares(pts, meas, rb.basis, sm=space)
    )
    errs = np.asarray(
        space.h10_norm(est - np.asarray(sols)[test_idx])
        / space.h10_norm(np.asarray(sols)[test_idx])
    )
    with figure_file(Path(out_dir) / "pca2_state_estimation.png") as (fig, ax):
        ax.plot(1 / contrasts[test_idx], errs, "o-")
        ax.set_xlabel("1/contrast")
        ax.set_ylabel("relative H10 error (2-mode PCA SE)")
        ax.set_yscale("log")
        ax.set_xscale("log")
    return {"figure": "pca2_state_estimation.png",
            "errors": errs.tolist()}


def generate_all(out_dir=None):
    """Produce the full slide asset set + metadata.json."""
    out = Path(out_dir) if out_dir is not None else results_path / "presentation"
    out.mkdir(parents=True, exist_ok=True)
    metadata = {
        "limit_solutions": limit_solution_sequence(out),
        "snapshot_family": snapshot_family_on_curve(out),
        "measurements": measurement_barplot(out),
        "pca_state_estimation": pca_state_estimation_sweep(out),
    }
    (out / "metadata.json").write_text(json.dumps(metadata, indent=1))
    return out


if __name__ == "__main__":
    print(generate_all())

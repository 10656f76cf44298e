"""The paper study configurations, runnable as
``python -m romhighcontrast_tpu.experiments.highcontrast``
(reference: HighContrast.py __main__, :490-548).

Two studies on the (4,4) geometry, mesh 20, 1000 offline samples:
  * "GeomAssumptions": nested high-contrast group families D1..D4,
  * "NotGeomAssumptions": diagonal patterns D1..D4,
each running all four builders and producing the paper figure set.

The reference parallelises experiment configs with ``Pool(4)``
(HighContrast.py:527) — here each experiment's snapshot batch is itself one
device-wide tensor program, so configs run sequentially (or shard the
snapshot axis across the mesh via parallel.sharded_snapshot_solve when more
than one device is attached).
"""

from __future__ import annotations

import itertools

import numpy as np

from romhighcontrast_tpu.config import INFINIT_A
from romhighcontrast_tpu.experiments.driver import default_builders, experiment
from romhighcontrast_tpu.experiments.plots import (
    gather_experiments,
    paper_plots,
    plot_results,
)

GENERAL_PARAMS = dict(
    mesh_discretization_per_dim=20,
    diff_coef_refinement=10,
    num_measurements=100,
    max_num_samples_offline=1000,
    seed=42,
    vn_max_dim=15,
    recalculate=False,
    recalculate_basis=False,
    blocks_geometry=(4, 4),
    # flagship fused two-level kernel; interior-cluster configs (NotGeom
    # diagonals) are split onto the f64 deflated path automatically
    method="pallas",
    verbose=True,
)


def geom_assumptions_blocks():
    """Nested hc-group families (reference: HighContrast.py:512-516)."""
    groups = [[(0, 1)], [(1, 3)], [(2, 1), (2, 2), (2, 3)]]
    complement = set(itertools.product(range(4), range(4)))
    for g in groups:
        complement -= set(g)
    groups.append(sorted(complement))
    return groups


def not_geom_assumptions_blocks():
    """Diagonal patterns (reference: HighContrast.py:533-538)."""
    return [
        [(0, 0), (1, 1), (2, 2), (3, 3)],
        [(0, 2), (1, 3), (2, 0), (3, 1)],
        [(1, 0), (0, 1), (3, 2), (2, 3)],
        [(0, 3), (1, 2), (2, 1), (3, 0)],
    ]


def run_study(study: str = "GeomAssumptions", results_dir=None, builders=None,
              **overrides):
    """Run one nested-dimension study D1..Dd and produce the figure set."""
    params = {**GENERAL_PARAMS, **overrides}
    blocks = (
        geom_assumptions_blocks()
        if study == "GeomAssumptions"
        else not_geom_assumptions_blocks()
    )
    builders = default_builders() if builders is None else builders
    mesh_n = params["mesh_discretization_per_dim"]
    names = [f"{mesh_n}_{study}D{i + 1}" for i in range(len(blocks))]
    blocks_list = [blocks[: i + 1] for i in range(len(blocks))]

    for name, hc_blocks in zip(names, blocks_list):
        res = experiment(
            name=name,
            reduced_basis_builders=builders,
            high_contrast_blocks=hc_blocks,
            results_dir=results_dir,
            **params,
        )
        plot_results(
            name,
            [b.name for b in builders],
            res.a_high_contrast,
            results_dir=results_dir,
            a2show=None,
            space=res.space,
        )
    gather_experiments(
        names,
        blocks_list,
        "Greedy galerkin",
        name=f"{study}_{mesh_n}",
        results_dir=results_dir,
    )
    paper_plots(names, blocks_list, [b.name for b in builders],
                results_dir=results_dir)
    return names


if __name__ == "__main__":
    import sys

    studies = sys.argv[1:] or ["GeomAssumptions", "NotGeomAssumptions"]
    for study in studies:
        run_study(study)

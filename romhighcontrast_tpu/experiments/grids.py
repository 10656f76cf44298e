"""Contrast-parameter grid construction (reference: HighContrast.py:59-64,
99-115).

Semantics preserved exactly:

* per high-contrast group, a 1D grid ``1/linspace(1/INFINIT_A, 1, k,
  endpoint=False)`` (log-like spacing accumulating toward infinity) with
  ``k = min(diff_coef_refinement * int(log2(INFINIT_A)),
  ceil(max_num_samples ** (1/d)))``;
* the meshgrid over groups, randomly subsampled to the offline budget with
  the seeded numpy stream;
* the ``{INFINIT_A, 1}^d`` corner set always prepended.
"""

from __future__ import annotations

import numpy as np

from romhighcontrast_tpu.config import INFINIT_A


def get_full_a(a_per_block: np.ndarray, blocks_geometry, high_contrast_blocks):
    """Expand per-group contrast columns to full (n, nrb, ncb) coefficient
    grids: every block not in a group gets coefficient 1
    (reference: HighContrast.py:59-64)."""
    a = np.ones((len(a_per_block),) + tuple(blocks_geometry))
    for a_vec, group in zip(np.asarray(a_per_block).T, high_contrast_blocks):
        for ix in group:
            a[:, ix[0], ix[1]] = a_vec
    return a


def contrast_grid(
    num_groups: int,
    diff_coef_refinement: int,
    max_num_samples_offline: int,
    seed: int,
):
    """The (subsampled grid + corner set) of per-group contrasts,
    shape (n, num_groups) (reference: HighContrast.py:102-113)."""
    k = min(
        diff_coef_refinement * int(np.log2(INFINIT_A)),
        int(np.ceil(max_num_samples_offline ** (1 / num_groups))),
    )
    axis = 1 / np.linspace(1 / INFINIT_A, 1, num=k, endpoint=False)
    a_high_contrast = np.stack(
        [g.ravel() for g in np.meshgrid(*([axis] * num_groups))], axis=1
    )
    np.random.seed(seed)
    a_inf = np.stack(
        [g.ravel() for g in np.meshgrid(*([[INFINIT_A, 1]] * num_groups))], axis=1
    )
    budget = max_num_samples_offline - len(a_inf)
    if len(a_high_contrast) > budget:
        keep = np.random.choice(
            len(a_high_contrast), size=max(0, budget), replace=False
        )
        a_high_contrast = a_high_contrast[keep]
    return np.vstack((a_inf, a_high_contrast))


def get_a2test_and_train(
    blocks_geometry,
    high_contrast_blocks,
    mesh_discretization_per_dim,
    diff_coef_refinement,
    max_num_samples_offline,
    seed,
    method: str = "mixed",
):
    """Build the FOM space and the train/test coefficient sets
    (reference: get_a2test_and_train, HighContrast.py:99-115).
    Returns (space, a_full (n, nrb, ncb), a_high_contrast (n, d))."""
    from romhighcontrast_tpu.models.fem import FemSpace

    space = FemSpace(blocks_geometry, N=mesh_discretization_per_dim, method=method)
    a_high_contrast = contrast_grid(
        len(high_contrast_blocks), diff_coef_refinement, max_num_samples_offline, seed
    )
    a = get_full_a(a_high_contrast, blocks_geometry, high_contrast_blocks)
    return space, a, a_high_contrast

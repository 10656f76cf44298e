"""Interior stiff-cluster handling: labeling, deflated solver, routing.

Regression tests for the critical bug class where high-contrast block
components NOT touching the Dirichlet boundary carry 1/contrast near-null
modes (lambda_min(scaled) ~ 1e-12 measured at contrast 1e10) and the
fast-path solvers silently returned garbage."""

import numpy as np
import pytest

import jax.numpy as jnp

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import FemSpace, INFINIT_A
from romhighcontrast_tpu.ops import clusters as cl

from oracle import FemOracle


def test_cluster_labels_components_and_boundary_exclusion():
    a = np.ones((3, 4, 4))
    a[0, 1, 1] = INFINIT_A          # interior single
    a[1, 1, 1] = a[1, 2, 2] = INFINIT_A  # two diagonal (separate) components
    a[2, 0, 1] = INFINIT_A          # boundary-touching -> excluded
    labels = np.asarray(cl.cluster_labels(jnp.asarray(a), 3))
    assert labels.shape == (3, 11, 11)
    assert len(np.unique(labels[0])) == 2  # background + one cluster
    assert len(np.unique(labels[1])) == 3  # background + two clusters
    assert np.all(labels[2] == 0)  # boundary components dropped


def test_has_interior_cluster_host_check():
    a = np.ones((2, 4, 4))
    a[0, 0, 1] = INFINIT_A
    assert not cl.has_interior_cluster(a[:1]).any()
    a[1, 2, 2] = INFINIT_A
    assert bool(cl.has_interior_cluster(a).any())
    assert cl.has_interior_cluster(a).shape == (a.shape[0],)


@pytest.mark.parametrize(
    "blocks",
    [
        [(1, 1)],
        [(1, 1), (1, 2), (2, 1), (2, 2)],
        [(1, 1), (2, 2)],
        [(1, 1), (0, 3)],
        [(1, 1), (1, 2), (2, 1)],
    ],
)
def test_interior_cluster_solve_matches_oracle(blocks):
    """Forward error must be in the eps64 * kappa class (~1e-5 at contrast
    1e10) — the same accuracy the reference's LAPACK/SuperLU solves achieve
    at this conditioning."""
    space = FemSpace((4, 4), 6)
    oracle = FemOracle((4, 4), 6)
    a = np.ones((1, 4, 4))
    for b in blocks:
        a[0][b] = INFINIT_A
    u = np.asarray(space.solve(a, method="mixed"))
    ref = oracle.solve(a[0])
    rel = np.max(np.abs(u[0] - ref)) / np.max(np.abs(ref))
    assert rel < 1e-4, rel


def test_mixed_batch_interior_and_boundary_samples():
    """One batch mixing easy, boundary-stiff, and interior-stiff samples
    must be correct for all of them."""
    space = FemSpace((4, 4), 6)
    oracle = FemOracle((4, 4), 6)
    a = np.ones((3, 4, 4))
    a[1, 0, 2] = INFINIT_A
    a[2, 2, 1] = INFINIT_A
    u = np.asarray(space.solve(a))
    for k in range(3):
        ref = oracle.solve(a[k])
        rel = np.max(np.abs(u[k] - ref)) / np.max(np.abs(ref))
        assert rel < 1e-4, (k, rel)


def test_moderate_contrast_keeps_fast_path():
    """Below the stiffness threshold no cluster machinery engages and the
    solver reaches deep accuracy."""
    space = FemSpace((4, 4), 6)
    oracle = FemOracle((4, 4), 6)
    a = np.ones((1, 4, 4))
    a[0, 1, 1] = 1e4  # interior but below STIFF_THRESHOLD
    assert not cl.has_interior_cluster(a).any()
    u = np.asarray(space.solve(a))
    ref = oracle.solve(a[0])
    rel = np.max(np.abs(u[0] - ref)) / np.max(np.abs(ref))
    assert rel < 1e-9, rel


def test_experiment_driver_with_interior_groups(tmp_path):
    """End-to-end experiment with a diagonal (interior) high-contrast group —
    the configuration class that exposed the cluster bug."""
    from romhighcontrast_tpu.experiments.driver import experiment
    from romhighcontrast_tpu.rom.builders import GreedyBuilder, RandomBuilder

    res = experiment(
        name="diag",
        reduced_basis_builders=[RandomBuilder(False), GreedyBuilder()],
        mesh_discretization_per_dim=4,
        diff_coef_refinement=3,
        vn_max_dim=3,
        num_measurements=10,
        blocks_geometry=(4, 4),
        high_contrast_blocks=[[(0, 0), (1, 1), (2, 2), (3, 3)]],
        max_num_samples_offline=16,
        seed=0,
        verbose=False,
        results_dir=tmp_path,
    )
    sols = res.store["solutions"]
    assert np.all(np.isfinite(sols))
    # residual sanity on the snapshots themselves
    r = np.asarray(
        res.space.apply(jnp.asarray(res.a), jnp.asarray(sols))
        - np.asarray(res.space.load)[None]
    )
    rel = np.linalg.norm(r, axis=1) / np.linalg.norm(np.asarray(res.space.load))
    assert rel.max() < 1e-3, rel.max()
    errs = res.store["Greedy galerkin"]["errors"]
    for n in ("1", "2", "3"):
        assert np.all(np.isfinite(errs[n]["forward_modeling"]))

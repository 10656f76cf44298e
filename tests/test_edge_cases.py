"""Edge cases across the stack: nonsquare geometries end-to-end, N=1 blocks,
polynomial-space greedy, CLI parsing."""

import numpy as np
import pytest

import jax.numpy as jnp

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import FemSpace, GreedyBuilder, PolynomialSpace, INFINIT_A


def test_nonsquare_geometry_end_to_end(tmp_path):
    from romhighcontrast_tpu.experiments.driver import experiment
    from romhighcontrast_tpu.rom.builders import RandomBuilder

    res = experiment(
        name="nonsq",
        reduced_basis_builders=[RandomBuilder(), GreedyBuilder()],
        mesh_discretization_per_dim=3,
        diff_coef_refinement=3,
        vn_max_dim=3,
        num_measurements=10,
        blocks_geometry=(2, 3),
        high_contrast_blocks=[[(0, 2)], [(1, 0)]],
        max_num_samples_offline=25,
        seed=1,
        verbose=False,
        results_dir=tmp_path,
    )
    assert res.space.vspace_dim == (2 * 3 - 1) * (3 * 3 - 1)
    errs = res.store["Greedy galerkin"]["errors"]
    assert float(np.max(errs["3"]["forward_modeling"])) < float(
        np.max(errs["1"]["forward_modeling"])
    )


def test_single_cell_blocks_N1():
    """N=1: stiff blocks have no interior vertices, leaving a
    contrast-dependent near-null mode — solve() must route to the exact
    dense path (tiny dims) and still be correct."""
    space = FemSpace((3, 3), 1)
    assert space.vspace_dim == 4
    a = np.ones((2, 3, 3))
    a[0, 1, 1] = INFINIT_A
    u = np.asarray(space.solve(a))
    K = np.asarray(space.dense_operator(a))
    r = np.einsum("bij,bj->bi", K, u) - np.asarray(space.load)
    # direct-solve forward error at cond ~ 1e10 is O(eps64 * cond) ~ 1e-6;
    # the reference's LAPACK path has the same floor
    assert np.max(np.abs(r)) / np.max(np.abs(np.asarray(space.load))) < 1e-4


def test_greedy_works_on_polynomial_space():
    """Greedy over a one-parameter contrast family in the polynomial space
    (a full 4-parameter manifold over three decades is genuinely not
    4-dim-approximable — verified)."""
    pspace = PolynomialSpace(5)
    a = np.ones((30, 2, 2))
    a[:, 0, 0] = np.geomspace(1, 1e3, 30)
    sols = pspace.solve(a)
    h1 = pspace.h10_norm(sols)
    rb = GreedyBuilder().build(n=4, sm=pspace, solutions2train=sols,
                               a2train=jnp.asarray(a), solutions2train_h1norm=h1)
    # raw snapshot bases are near-parallel -> ill-conditioned reduced Gram;
    # orthonormalize before the online solve (as the experiment driver does,
    # reference: HighContrast.py:189)
    rb.orthonormalize()
    fm = rb.forward_modeling(pspace, jnp.asarray(a))
    rel = np.asarray(pspace.h10_norm(fm - sols) / h1)
    assert rel.max() < 0.05


def test_cli_parse_blocks_and_bench_alias():
    from romhighcontrast_tpu.cli import _parse_blocks

    assert _parse_blocks("0,1") == [[(0, 1)]]
    assert _parse_blocks("0,0+1,1;2,2") == [[(0, 0), (1, 1)], [(2, 2)]]


def test_cli_experiment_smoke(tmp_path, capsys):
    from romhighcontrast_tpu.cli import main

    rc = main([
        "experiment", "--name", "cli_smoke", "--mesh", "3",
        "--blocks", "2", "2", "--hc-blocks", "0,0", "--samples", "10",
        "--vn-max-dim", "2", "--measurements", "8",
        "--results-dir", str(tmp_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "cli_smoke" in out


def test_batched_multi_dim_leading_axes():
    """solve() with extra leading batch dims (e.g. (2, 3, nrb, ncb))."""
    space = FemSpace((2, 2), 4)
    a = np.ones((2, 3, 2, 2))
    a[0, :, 0, 0] = 100.0
    u = np.asarray(space.solve(a))
    assert u.shape == (2, 3, space.vspace_dim)
    assert np.all(np.isfinite(u))

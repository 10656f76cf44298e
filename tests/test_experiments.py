"""End-to-end experiment driver, persistence, grids, and plotting."""

import numpy as np
import pytest

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import INFINIT_A
from romhighcontrast_tpu.experiments.driver import experiment, TypeOfProblems
from romhighcontrast_tpu.experiments.grids import contrast_grid, get_full_a
from romhighcontrast_tpu.experiments.persistence import ExperimentStore
from romhighcontrast_tpu.rom.builders import (
    GreedyBuilder,
    RandomBuilder,
    GREEDY_FOR_GALERKIN,
)


def test_contrast_grid_semantics():
    g = contrast_grid(num_groups=2, diff_coef_refinement=10,
                      max_num_samples_offline=50, seed=42)
    # corner set {INF, 1}^2 prepended
    corners = g[:4]
    assert set(map(tuple, corners.tolist())) == {
        (INFINIT_A, INFINIT_A),
        (INFINIT_A, 1.0),
        (1.0, INFINIT_A),
        (1.0, 1.0),
    }
    assert len(g) <= 50
    assert g.min() >= 1.0 and g.max() <= INFINIT_A
    # reproducibility
    g2 = contrast_grid(2, 10, 50, seed=42)
    np.testing.assert_array_equal(g, g2)


def test_get_full_a_expands_groups():
    a_pb = np.array([[2.0, 3.0], [5.0, 7.0]])  # (n=2, d=2)
    groups = [[(0, 0), (1, 1)], [(0, 1)]]
    a = get_full_a(a_pb, (2, 2), groups)
    assert a.shape == (2, 2, 2)
    np.testing.assert_allclose(a[0], [[2.0, 3.0], [1.0, 2.0]])
    np.testing.assert_allclose(a[1], [[5.0, 7.0], [1.0, 5.0]])


def test_persistence_roundtrip(tmp_path):
    store = ExperimentStore(tmp_path / "exp")
    store["solutions"] = np.arange(6.0).reshape(2, 3)
    store["meta"] = {"errors": {"1": {"fm": np.array([0.5])}}, "t": 1.25}
    store.save()
    store2 = ExperimentStore(tmp_path / "exp")
    np.testing.assert_array_equal(store2["solutions"], store["solutions"])
    assert store2["meta"]["t"] == 1.25
    np.testing.assert_array_equal(store2["meta"]["errors"]["1"]["fm"], [0.5])


def test_stage2_measurement_stream_pinned(tmp_path, monkeypatch):
    """Stage-2 measurement points must CONTINUE the numpy stream seeded
    (and partially consumed by the grid subsample) inside
    ``contrast_grid`` — reference parity (HighContrast.py:155 draws from
    the ambient stream).  Any host-side RNG call inserted between the
    grid build and the measurement draw would silently shift every
    experiment's sensors; this pins the exact stream."""
    real_uniform = np.random.uniform
    drawn = []

    def record(*args, **kwargs):
        out = real_uniform(*args, **kwargs)
        size = kwargs.get("size", args[-1] if args else None)
        if size == (13, 2) and not drawn:
            drawn.append(np.array(out))
        return out

    monkeypatch.setattr(np.random, "uniform", record)
    experiment(
        name="rngpin",
        reduced_basis_builders=[RandomBuilder()],
        mesh_discretization_per_dim=4,
        diff_coef_refinement=4,
        vn_max_dim=2,
        num_measurements=13,
        blocks_geometry=(2, 2),
        high_contrast_blocks=[[(0, 0)]],
        max_num_samples_offline=20,
        seed=42,
        verbose=False,
        results_dir=tmp_path,
    )
    monkeypatch.undo()
    assert len(drawn) == 1
    # replay the stream exactly: the grid build reseeds + consumes its
    # subsample choice(), then stage 2 draws the measurement points
    contrast_grid(num_groups=1, diff_coef_refinement=4,
                  max_num_samples_offline=20, seed=42)
    expected = np.random.uniform(size=(13, 2))
    np.testing.assert_array_equal(drawn[0], expected)


def test_experiment_end_to_end(tmp_path):
    builders = [RandomBuilder(), GreedyBuilder(GREEDY_FOR_GALERKIN)]
    res = experiment(
        name="tiny",
        reduced_basis_builders=builders,
        mesh_discretization_per_dim=4,
        diff_coef_refinement=4,
        vn_max_dim=3,
        num_measurements=20,
        blocks_geometry=(2, 2),
        high_contrast_blocks=[[(0, 0)]],
        max_num_samples_offline=20,
        seed=42,
        verbose=False,
        results_dir=tmp_path,
    )
    store = res.store
    assert "solutions" in store
    assert store["solutions"].shape[1] == res.space.vspace_dim
    for b in builders:
        entry = store[b.name]
        assert entry["basis"].shape == (3, res.space.vspace_dim)
        for n in ("1", "2", "3"):
            errs = entry["errors"][n]
            for problem in TypeOfProblems._fields:
                assert problem in errs
            # greedy fm error at n=3 should be small on a 1-param manifold
        assert np.max(entry["errors"]["3"]["projection"]) < np.max(
            entry["errors"]["1"]["projection"]
        ) * 1.01

    # idempotent re-entry: second run loads, does not recompute
    res2 = experiment(
        name="tiny",
        reduced_basis_builders=builders,
        mesh_discretization_per_dim=4,
        diff_coef_refinement=4,
        vn_max_dim=3,
        num_measurements=20,
        blocks_geometry=(2, 2),
        high_contrast_blocks=[[(0, 0)]],
        max_num_samples_offline=20,
        seed=42,
        verbose=False,
        results_dir=tmp_path,
    )
    np.testing.assert_array_equal(
        res2.store["solutions"], store["solutions"]
    )


def test_plots_from_experiment(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    builders = [RandomBuilder(), GreedyBuilder(GREEDY_FOR_GALERKIN)]
    res = experiment(
        name="plotme",
        reduced_basis_builders=builders,
        mesh_discretization_per_dim=4,
        diff_coef_refinement=4,
        vn_max_dim=3,
        num_measurements=15,
        blocks_geometry=(2, 2),
        high_contrast_blocks=[[(0, 0)]],
        max_num_samples_offline=16,
        seed=42,
        verbose=False,
        results_dir=tmp_path,
    )
    from romhighcontrast_tpu.experiments.plots import (
        plot_results,
        gather_experiments,
        paper_plots,
    )

    names = [b.name for b in builders]
    folder = plot_results("plotme", names, res.a_high_contrast,
                          results_dir=tmp_path, a2show=res.a[:1], space=res.space)
    pngs = list(folder.rglob("*.png"))
    assert len(pngs) >= 10, [p.name for p in pngs]

    rates = gather_experiments(
        ["plotme"], [[[(0, 0)]]], "Greedy galerkin", results_dir=tmp_path
    )
    assert "plotme" in rates and rates["plotme"] < 0  # error decays

    out = paper_plots(["plotme"], [[[(0, 0)]]], names, results_dir=tmp_path)
    assert list(out.glob("*.png"))


def test_stats_fallback_matches_padded_path(tmp_path, monkeypatch):
    """The non-padded stats fallback (spaces without forward_reduced_padded)
    must produce the same error curves as the padded scan.  Uses vn_max_dim
    high enough that RAW-snapshot Gram matrices are near-singular on the
    1-parameter manifold — with the raw basis in the reduced solves (the
    round-4 bug) fm/projection errors explode; the orthonormalized basis
    keeps them equal to the padded path's.  The fallback is also restricted
    to the space PROTOCOL surface (forward_reduced/project/h10_norm), so it
    stays valid for non-FEM spaces."""
    from romhighcontrast_tpu.models.fem import FemSpace

    config = dict(
        reduced_basis_builders=[RandomBuilder()],
        mesh_discretization_per_dim=4,
        diff_coef_refinement=4,
        vn_max_dim=6,
        num_measurements=20,
        blocks_geometry=(2, 2),
        high_contrast_blocks=[[(0, 0)]],
        max_num_samples_offline=20,
        seed=42,
        verbose=False,
    )
    res_pad = experiment(name="padded", results_dir=tmp_path / "p", **config)
    monkeypatch.delattr(FemSpace, "forward_reduced_padded")
    res_fb = experiment(name="fallback", results_dir=tmp_path / "f", **config)

    key = RandomBuilder().name
    errs_pad = res_pad.store[key]["errors"]
    errs_fb = res_fb.store[key]["errors"]
    for n in errs_pad:
        for problem in ("forward_modeling", "projection", "state_estimation"):
            np.testing.assert_allclose(
                np.asarray(errs_fb[n][problem]),
                np.asarray(errs_pad[n][problem]),
                rtol=1e-4, atol=1e-9,
                err_msg=f"n={n} {problem}",
            )

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


def test_host_lu_matches_oracle():
    """ops.host_lu assembles the exact reference operator (scipy oracle
    parity to ~4e-16) and real-f64 LU residuals sit at the f64 floor for
    boundary-safe samples."""
    from romhighcontrast_tpu.ops import host_lu

    oracle = FemOracle((3, 3), 7)
    rng = np.random.default_rng(0)
    a = np.exp(rng.uniform(0, np.log(INFINIT_A), (2, 3, 3)))
    wE, wW, wS, wN, dg = host_lu.stencil_weights_np(a, 7)
    for i in range(2):
        K1 = host_lu.assemble_csr(wE[i], wW[i], wS[i], wN[i], dg[i])
        K2 = oracle.stiffness(a[i])
        assert abs(K1 - K2).max() <= 1e-14 * abs(K2).max()
    x, res = host_lu.solve_lu_batch(a, 7, oracle.load())
    assert res.max() < 1e-10


def test_host_banded_matches_lu():
    """solve_banded_batch (LAPACK banded Cholesky, the default host route —
    2.2x faster than splu on this host) must agree with solve_lu_batch to
    f64 solver precision at extreme contrast, including an interior
    cluster, with self-reported residuals in the same class."""
    from romhighcontrast_tpu.ops import host_lu

    oracle = FemOracle((3, 3), 7)
    rng = np.random.default_rng(1)
    a = np.exp(rng.uniform(0, np.log(INFINIT_A), (2, 3, 3)))
    a[1] = 1.0
    a[1, 1, 1] = INFINIT_A          # interior cluster sample
    # shared load-vector rhs AND per-sample rhs shapes
    for rhs in (oracle.load(), np.broadcast_to(
            oracle.load(), (2, oracle.load().size)).copy()):
        x_lu, res_lu = host_lu.solve_lu_batch(a, 7, rhs)
        x_b, res_b = host_lu.solve_banded_batch(a, 7, rhs)
        for i in range(2):
            # two backward-stable f64 solvers each carry O(eps64 * kappa)
            # SOLUTION error; at the cluster sample's kappa ~ 1e12 they may
            # legitimately disagree by ~1e-4 relative (measured 1.4e-5)
            scale = np.max(np.abs(x_lu[i]))
            assert np.max(np.abs(x_b[i] - x_lu[i])) < 5e-4 * scale
        # same accuracy class (both eps64*kappa-bounded, floor ~1e-12)
        assert res_b.max() < max(10 * res_lu.max(), 1e-10)


def test_host_lu_cluster_route_accuracy():
    """cluster_method='host' routes interior-cluster samples to real-f64
    LU: the clean samples keep fast-path accuracy and the cluster sample
    lands in the LU (eps64*kappa) class."""
    from romhighcontrast_tpu.ops import stencil as st

    space = FemSpace((3, 3), 7)
    a = np.ones((3, 3, 3))
    a[0, 1, 1] = INFINIT_A          # interior cluster
    a[1, 1, 1] = 1e3                # moderate: fast path
    sols = space.solve(jnp.asarray(a), tol=1e-11, method="mixed",
                       cluster_method="host")
    w = space.weights(jnp.asarray(a))
    r = space.load[None, :] - st.apply_operator_flat(w, sols,
                                                     space.grid_shape)
    rel = np.asarray(jnp.linalg.norm(r, axis=-1)
                     / jnp.linalg.norm(space.load))
    assert rel[0] < 5e-3            # eps64 * kappa class (LU itself ~1e-4)
    assert np.all(rel[1:] < 1e-9)


def test_harmonic_deflation_basis_properties():
    """The harmonic-extension deflation vectors: 1 on their own cluster,
    0 on other clusters, K-harmonic outside (residual of the exterior
    problem ~0), and they improve (or match) the indicator's accuracy.

    NOTE (round-4 TPU measurement, do-not-retry): on TPU the enrichment
    does NOT move the emulated-f64 floor (4.8e-2 vs 6.0e-2 one-shot max,
    both refine to ~1.2e-2) — the floor is the recurrence, not the coarse
    space; the production fix is the host-LU route.  The basis remains a
    tested API for real-f64 backends."""
    from romhighcontrast_tpu.ops import solvers
    from romhighcontrast_tpu.ops import stencil as st

    space = FemSpace((3, 3), 8)
    a = np.ones((2, 3, 3))
    a[0, 1, 1] = INFINIT_A
    a[1, 1, 1] = INFINIT_A
    a[1, 1, 2] = INFINIT_A          # touches boundary col -> dropped
    aj = jnp.asarray(a)
    w = space.weights(aj)
    lab_np, kmax = cl.cluster_labels_host(a, space.N)
    labels = jnp.asarray(lab_np)
    X = cl.harmonic_deflation_basis(w, labels, kmax)
    assert X.shape == (2, kmax) + space.grid_shape
    Xn = np.asarray(X)
    # 1 on own cluster vertices
    m0 = lab_np[0] == 1
    np.testing.assert_allclose(Xn[0, 0][m0], 1.0, atol=1e-10)
    # harmonic outside: K X restricted to free vertices ~ 0
    KX = np.asarray(st.apply_operator(w, X))
    free = lab_np[0] == 0
    assert np.abs(KX[0, 0][free]).max() < 1e-6 * np.abs(KX[0, 0]).max()
    # solves with the enriched basis converge to the deflated class
    rhs = jnp.broadcast_to(space.load.reshape(space.grid_shape),
                           (2,) + space.grid_shape)
    x, info = solvers.solve_pcg_deflated(w, rhs, labels, kmax, tol=1e-11,
                                         deflation_basis=X)
    r = rhs - st.apply_operator(w, x)
    rel = np.asarray(jnp.linalg.norm(r.reshape(2, -1), axis=-1)
                     / jnp.linalg.norm(rhs.reshape(2, -1), axis=-1))
    assert rel[0] < 1e-3 and rel[1] < 1e-8

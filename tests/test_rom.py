"""Reduced-basis builders and online problems: structural and golden tests."""

import numpy as np
import pytest

import jax.numpy as jnp

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import (
    FemSpace,
    GreedyBuilder,
    PCABuilder,
    RandomBuilder,
    GREEDY_FOR_GALERKIN,
    GREEDY_FOR_H10,
    INFINIT_A,
)
from romhighcontrast_tpu.rom.basis import (
    get_high_contrast_coefficient,
    orthonormalize_base,
    sort_orthogonalize_base,
)
from romhighcontrast_tpu.rom.builders import get_starting_basis
from romhighcontrast_tpu.rom.estimators import (
    EstimatorInv,
    EstimatorLinear,
    EstimatorNear,
)


@pytest.fixture(scope="module")
def training_set():
    """Small but real training set: (2,2) blocks, one hc group, corner set
    plus a log-spaced grid — the reference's sampling structure."""
    space = FemSpace((2, 2), 6)
    contrasts = np.concatenate([[INFINIT_A, 1.0], 1 / np.linspace(1e-10, 1, 18, endpoint=False)])
    a = np.ones((len(contrasts), 2, 2))
    a[:, 0, 0] = contrasts
    sols = np.asarray(space.solve(a))
    h1 = np.asarray(space.h10_norm(sols))
    return space, jnp.asarray(a), jnp.asarray(sols), jnp.asarray(h1)


def test_orthonormalize_base():
    rng = np.random.default_rng(0)
    rb = rng.standard_normal((4, 30))
    q = np.asarray(orthonormalize_base(rb))
    np.testing.assert_allclose(q @ q.T, np.eye(4), atol=1e-10)
    # same span
    _, s, _ = np.linalg.svd(np.vstack([rb, q]))
    assert (s > 1e-10).sum() == 4


def test_sort_orthogonalize_base_orders_by_contrast():
    rng = np.random.default_rng(1)
    rb = rng.standard_normal((3, 20))
    a_sel = np.array([1.0, 1e10, 1e5])
    a_sorted, q = sort_orthogonalize_base(jnp.asarray(a_sel), jnp.asarray(rb))
    np.testing.assert_allclose(np.asarray(a_sorted), [1e10, 1e5, 1.0])
    # first orthonormal vector is parallel to the highest-contrast snapshot
    v = np.asarray(q)[0]
    cos = abs(v @ rb[1]) / np.linalg.norm(rb[1])
    np.testing.assert_allclose(cos, 1.0, rtol=1e-10)


def test_get_starting_basis_quirk():
    """add_inf_solutions=False must also drop inf snapshots from the pool
    (reference behavior, ReducedBasis.py:153-164)."""
    sols = jnp.arange(12, dtype=float).reshape(4, 3)
    a = jnp.asarray(
        [
            [[INFINIT_A, 1.0]],
            [[1.0, 2.0]],
            [[INFINIT_A, INFINIT_A]],
            [[3.0, 1.0]],
        ]
    )
    basis, ab, pool, a_pool = get_starting_basis(sols, a, add_inf_solutions=False)
    assert basis.shape == (0, 3)
    assert pool.shape[0] == 2  # only the two non-inf snapshots remain
    basis2, ab2, pool2, _ = get_starting_basis(sols, a, add_inf_solutions=True)
    assert basis2.shape[0] == 2 and pool2.shape[0] == 2


def test_random_builder(training_set):
    space, a, sols, h1 = training_set
    rb = RandomBuilder(add_inf_solutions=True).build(
        n=4, sm=space, solutions2train=sols, a2train=a, solutions2train_h1norm=h1
    )
    assert rb.basis.shape == (4, space.vspace_dim)
    assert rb.a.shape[0] == 4
    # reproducible under the same seed
    rb2 = RandomBuilder(add_inf_solutions=True).build(
        n=4, sm=space, solutions2train=sols, a2train=a, solutions2train_h1norm=h1
    )
    np.testing.assert_array_equal(np.asarray(rb.basis), np.asarray(rb2.basis))


def test_pca_builder_matches_svd(training_set):
    space, a, sols, h1 = training_set
    rb = PCABuilder(add_inf_solutions=False).build(
        n=3, sm=space, solutions2train=sols, a2train=a
    )
    # compare against numpy SVD of the centered non-inf pool
    pool = np.asarray(sols)[~np.any(np.asarray(a) == INFINIT_A, axis=(1, 2))]
    X = pool - pool.mean(0)
    _, _, Vt = np.linalg.svd(X, full_matrices=False)
    got = np.asarray(rb.basis)
    for k in range(3):
        cos = abs(got[k] @ Vt[k]) / (np.linalg.norm(got[k]) * np.linalg.norm(Vt[k]))
        np.testing.assert_allclose(cos, 1.0, rtol=1e-8)


@pytest.mark.parametrize("flavor", [GREEDY_FOR_GALERKIN, GREEDY_FOR_H10])
def test_greedy_error_decays_monotonically(flavor, training_set):
    space, a, sols, h1 = training_set
    rb = GreedyBuilder(flavor).build(
        n=5, sm=space, solutions2train=sols, a2train=a, solutions2train_h1norm=h1
    )
    assert rb.basis.shape == (5, space.vspace_dim)
    # max relative projection error decays with n
    errs = []
    for n in range(1, 6):
        sub = rb[:n]
        sub.orthonormalize()
        proj = space.project(sols, sub.basis)
        errs.append(float(jnp.max(space.h10_norm(proj - sols) / h1)))
    assert all(e2 <= e1 * 1.001 for e1, e2 in zip(errs, errs[1:])), errs
    assert errs[-1] < 0.02  # 1-parameter manifold, 5 basis vectors


def test_greedy_beats_random(training_set):
    space, a, sols, h1 = training_set
    n = 4
    greedy = GreedyBuilder(GREEDY_FOR_H10).build(
        n=n, sm=space, solutions2train=sols, a2train=a, solutions2train_h1norm=h1
    )
    rand = RandomBuilder(add_inf_solutions=False).build(
        n=n, sm=space, solutions2train=sols, a2train=a
    )

    def max_err(rb):
        proj = space.project(sols, rb.basis)
        return float(jnp.max(space.h10_norm(proj - sols) / h1))

    assert max_err(greedy) <= max_err(rand) * 1.5


def test_state_estimation_recovers_span_member(training_set):
    space, a, sols, h1 = training_set
    rb = GreedyBuilder(GREEDY_FOR_GALERKIN).build(
        n=4, sm=space, solutions2train=sols, a2train=a, solutions2train_h1norm=h1
    )
    pts = np.random.default_rng(3).uniform(-0.8, 0.8, size=(30, 2))
    truth = rb.basis[1:2]  # an element of the span
    meas = space.evaluate_solutions(pts, truth)
    c, est = rb.state_estimation(space, pts, meas, return_coefs=True)
    rel = float(space.h10_norm(est - truth)[0] / space.h10_norm(truth)[0])
    assert rel < 1e-8
    assert c.shape == (4, 1)


def test_parameter_estimators_semantics():
    a_base = jnp.asarray([[[2.0, 4.0]], [[8.0, 16.0]]])  # (n=2, 1, 2)
    c = jnp.asarray([[1.0, 0.5], [0.0, 0.5]])  # (n=2, k=2)
    lin = EstimatorLinear(a_base).estimate_parameter(c)
    np.testing.assert_allclose(np.asarray(lin[0]), [[2.0, 4.0]])
    np.testing.assert_allclose(np.asarray(lin[1]), [[5.0, 10.0]])
    inv = EstimatorInv(a_base).estimate_parameter(c)
    np.testing.assert_allclose(np.asarray(inv[0]), [[2.0, 4.0]])
    np.testing.assert_allclose(
        np.asarray(inv[1]), [[1 / (0.5 / 2 + 0.5 / 8), 1 / (0.5 / 4 + 0.5 / 16)]]
    )
    near = EstimatorNear(a_base.reshape(2, -1)).estimate_parameter(c.T)
    np.testing.assert_allclose(np.asarray(near), [[2.0, 4.0], [2.0, 4.0]])


def test_basis_slicing_and_wiring(training_set):
    space, a, sols, h1 = training_set
    rb = RandomBuilder().build(n=5, sm=space, solutions2train=sols, a2train=a)
    sub = rb[:3]
    assert sub.dim == 3
    assert sub.inverse_parameter_estimator is not None
    assert sub.ambient_space_dim == space.vspace_dim
    # inverse estimator round-trip: c = e_k picks out snapshot parameter a_k
    c = jnp.zeros((3, 1)).at[1, 0].set(1.0)
    est = sub.parameter_estimation_inverse(c)
    np.testing.assert_allclose(np.asarray(est[0]), np.asarray(sub.a[1]), rtol=1e-10)


def test_online_galerkin_matches_forward_reduced(training_set):
    """The precomputed online solver must reproduce forward_reduced exactly
    and its fused error stats must match the direct H10 computation."""
    from romhighcontrast_tpu.rom.online import OnlineGalerkin

    space, a, sols, h1 = training_set
    _, _, Vt = np.linalg.svd(sols, full_matrices=False)
    V = jnp.asarray(Vt[:4])
    online = OnlineGalerkin(space, V)
    u_direct = np.asarray(space.forward_reduced(a, V))
    u_online = np.asarray(online.solve(a))
    np.testing.assert_allclose(u_online, u_direct, rtol=1e-10, atol=1e-12)
    # coefficients lift to the same solutions
    c = np.asarray(online.coefficients(a))
    np.testing.assert_allclose(c @ np.asarray(V), u_online, rtol=1e-10,
                               atol=1e-12)
    # fused error stats == direct H10 norm of the lifted error
    c2, err = online.solve_and_errors(a, sols)
    err_direct = np.asarray(space.h10_norm(u_online - sols))
    np.testing.assert_allclose(np.asarray(err), err_direct, rtol=1e-7,
                               atol=1e-10)
    # forward_modeling reuses the cached online solver
    from romhighcontrast_tpu.rom.basis import ReducedBasis

    rb = ReducedBasis().set(V, a[:4])
    u_rb = np.asarray(rb.forward_modeling(space, a))
    np.testing.assert_allclose(u_rb, u_direct, rtol=1e-10, atol=1e-12)
    assert rb.online(space) is rb.online(space)

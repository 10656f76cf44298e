"""Golden-value parity of the FEM core against the independent scipy oracle,
plus structural properties (SPD, symmetry, convergence)."""

import numpy as np
import pytest

import jax.numpy as jnp

import romhighcontrast_tpu  # noqa: F401  (enables x64)
from romhighcontrast_tpu import FemSpace, INFINIT_A
from romhighcontrast_tpu.ops import assembly

from oracle import FemOracle

GEOMS = [((2, 2), 4), ((2, 3), 5), ((4, 4), 3)]


def random_a(geometry, rng, contrast=1e4):
    nrb, ncb = geometry
    return np.exp(rng.uniform(0, np.log(contrast), size=(nrb, ncb)))


@pytest.mark.parametrize("geometry,N", GEOMS)
def test_dense_operator_matches_oracle(geometry, N):
    rng = np.random.default_rng(0)
    a = random_a(geometry, rng)
    space = FemSpace(geometry, N)
    oracle = FemOracle(geometry, N)
    K = np.asarray(space.dense_operator(a))
    K_ref = oracle.stiffness(a).toarray()
    assert K.shape == K_ref.shape == (space.vspace_dim,) * 2
    np.testing.assert_allclose(K, K_ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("geometry,N", GEOMS)
def test_load_vector_matches_oracle(geometry, N):
    space = FemSpace(geometry, N)
    oracle = FemOracle(geometry, N)
    np.testing.assert_allclose(np.asarray(space.load), oracle.load(), rtol=1e-13)


def test_apply_matches_dense():
    rng = np.random.default_rng(1)
    geometry, N = (3, 2), 4
    space = FemSpace(geometry, N)
    a = np.stack([random_a(geometry, rng) for _ in range(5)])
    x = rng.standard_normal((5, space.vspace_dim))
    Kx = np.asarray(space.apply(a, x))
    K = np.asarray(space.dense_operator(a))
    np.testing.assert_allclose(Kx, np.einsum("bij,bj->bi", K, x), rtol=1e-11)


def test_operator_spd():
    rng = np.random.default_rng(2)
    geometry, N = (2, 2), 5
    space = FemSpace(geometry, N)
    a = random_a(geometry, rng, contrast=INFINIT_A)
    K = np.asarray(space.dense_operator(a))
    np.testing.assert_allclose(K, K.T, rtol=1e-12)
    evals = np.linalg.eigvalsh(K)
    assert evals.min() > 0


@pytest.mark.parametrize("method", ["cholesky", "pcg"])
def test_solve_matches_oracle(method):
    rng = np.random.default_rng(3)
    geometry, N = (2, 2), 8
    space = FemSpace(geometry, N)
    oracle = FemOracle(geometry, N)
    a = np.stack(
        [random_a(geometry, rng)]
        + [random_a(geometry, rng, contrast=INFINIT_A) for _ in range(2)]
        + [np.ones(geometry)]
    )
    u = np.asarray(space.solve(a, method=method))
    for k in range(a.shape[0]):
        u_ref = oracle.solve(a[k])
        err = oracle.h10_norm(u[k] - u_ref, a[k]) / oracle.h10_norm(u_ref, a[k])
        assert err < 1e-9, f"sample {k}: rel err {err}"


def test_solve_high_contrast_corner_set():
    """The corner set {INFINIT_A, 1}^d is the stress case (cond ~ 1e12+)."""
    geometry, N = (2, 2), 6
    space = FemSpace(geometry, N)
    oracle = FemOracle(geometry, N)
    corners = np.array(
        [[[INFINIT_A, 1.0], [1.0, INFINIT_A]], [[INFINIT_A] * 2, [INFINIT_A] * 2]]
    )
    u = np.asarray(space.solve(corners, method="pcg"))
    for k in range(corners.shape[0]):
        u_ref = oracle.solve(corners[k])
        err = np.max(np.abs(u[k] - u_ref)) / np.max(np.abs(u_ref))
        assert err < 1e-8, f"corner {k}: rel err {err}"


def test_h10_norm_matches_oracle():
    rng = np.random.default_rng(4)
    geometry, N = (3, 3), 3
    space = FemSpace(geometry, N)
    oracle = FemOracle(geometry, N)
    u = rng.standard_normal((4, space.vspace_dim))
    np.testing.assert_allclose(
        np.asarray(space.h10_norm(u)), oracle.h10_norm(u), rtol=1e-11
    )


def test_fem_convergence_constant_coefficient():
    """For a = 1 the FEM solution must converge to the analytic series
    solution of -Δu = 1 on the square (validates the whole discretisation,
    independent of any implementation)."""
    geometry = (2, 2)
    errors = []
    for N in (4, 8, 16):
        space = FemSpace(geometry, N)
        u = np.asarray(space.solve(np.ones(geometry), method="cholesky"))
        # analytic solution on [-1,1]^2 via eigen-expansion
        xs = np.linspace(-1, 1, 2 * N + 1)[1:-1]
        X, Y = np.meshgrid(xs, xs, indexing="xy")
        exact = np.zeros_like(X)
        L = 2.0
        for p in range(1, 40, 2):
            for q in range(1, 40, 2):
                kx, ky = p * np.pi / L, q * np.pi / L
                coef = 16 / (np.pi**2 * p * q * (kx**2 + ky**2))
                exact += coef * np.sin(kx * (X + 1)) * np.sin(ky * (Y + 1))
        err = np.max(np.abs(u.reshape(2 * N - 1, 2 * N - 1) - exact))
        errors.append(err)
    # O(h^2) convergence => error ratio ~ 4 per refinement
    assert errors[1] / errors[0] < 0.35
    assert errors[2] / errors[1] < 0.35


def test_dense_family_contracts_to_operator():
    rng = np.random.default_rng(5)
    geometry, N = (2, 3), 3
    space = FemSpace(geometry, N)
    a = random_a(geometry, rng)
    fam = np.asarray(space.dense_family())
    K_from_family = np.einsum("q,qij->ij", a.ravel(), fam)
    np.testing.assert_allclose(
        K_from_family, np.asarray(space.dense_operator(a)), rtol=1e-12
    )


def test_evaluation_matches_oracle():
    rng = np.random.default_rng(6)
    geometry, N = (2, 2), 7
    space = FemSpace(geometry, N)
    oracle = FemOracle(geometry, N)
    sols = rng.standard_normal((3, space.vspace_dim))
    pts = rng.uniform(-0.95, 0.95, size=(40, 2))
    got = np.asarray(space.evaluate_solutions(pts, sols))
    want = oracle.evaluate(pts, sols)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_evaluation_interpolates_vertices():
    """Evaluating at interior mesh vertices must return the coefficients."""
    rng = np.random.default_rng(7)
    geometry, N = (2, 3), 4
    space = FemSpace(geometry, N)
    sols = rng.standard_normal((2, space.vspace_dim))
    X, Y = np.meshgrid(space.points_c[1:-1], space.points_r[1:-1], indexing="xy")
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    got = np.asarray(space.evaluate_solutions(pts, sols))
    np.testing.assert_allclose(got, sols, rtol=1e-10, atol=1e-12)


def test_riesz_l2_shape_and_h10_raises():
    space = FemSpace((2, 2), 10)
    r = space.generate_riesz(np.array([[0.0, 0.0], [0.3, 0.2]]), norm="l2")
    assert r.shape == (2, space.vspace_dim)
    with pytest.raises(NotImplementedError):
        space.generate_riesz(np.array([[0.0, 0.0]]), norm="h10")


def test_reduced_family_matches_dense():
    rng = np.random.default_rng(8)
    geometry, N = (2, 2), 4
    space = FemSpace(geometry, N)
    V = rng.standard_normal((3, space.vspace_dim))
    fam = np.asarray(space.dense_family())
    want = np.einsum("ki,qij,lj->qkl", V, fam, V)
    got = np.asarray(space.reduced_family(V))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_projection_is_h10_orthogonal_and_exact_in_span():
    rng = np.random.default_rng(9)
    geometry, N = (2, 2), 6
    space = FemSpace(geometry, N)
    a_batch = np.stack([random_a(geometry, rng) for _ in range(4)])
    sols = np.asarray(space.solve(a_batch, method="cholesky"))
    V = sols[:2]
    # exactness: projecting span members returns them
    proj = np.asarray(space.project(V, V))
    np.testing.assert_allclose(proj, V, rtol=1e-8, atol=1e-12)
    # orthogonality: residual is H10-orthogonal to the basis
    proj_all = np.asarray(space.project(sols, V))
    resid = sols - proj_all
    KV = np.asarray(space.apply_laplacian(V))
    inner = resid @ KV.T
    assert np.max(np.abs(inner)) < 1e-8


def test_forward_reduced_is_galerkin():
    """With V = full solution included, the reduced Galerkin solve recovers
    the FOM solution for that parameter."""
    rng = np.random.default_rng(10)
    geometry, N = (2, 2), 5
    space = FemSpace(geometry, N)
    a_batch = np.stack([random_a(geometry, rng) for _ in range(3)])
    sols = np.asarray(space.solve(a_batch, method="cholesky"))
    V = sols  # basis contains all truths
    fm = np.asarray(space.forward_reduced(a_batch, V))
    rel = np.asarray(space.h10_norm(fm - sols) / space.h10_norm(sols))
    assert np.max(rel) < 1e-8


def test_forward_reduced_empty_basis_returns_zero():
    space = FemSpace((2, 2), 3)
    a = np.ones((4, 2, 2))
    out = np.asarray(space.forward_reduced(a, np.empty((0, space.vspace_dim))))
    assert out.shape == (4, space.vspace_dim)
    assert np.all(out == 0)

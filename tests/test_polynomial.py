"""Polynomial FOM space: structure, self-consistency, and cross-model
agreement with the FEM space (both discretise the same PDE)."""

import numpy as np
import pytest

import jax.numpy as jnp

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import FemSpace, PolynomialSpace


@pytest.fixture(scope="module")
def pspace():
    return PolynomialSpace(lagrange_polynomials_degree=6)


def test_dimensions(pspace):
    q = 6
    assert pspace.quarter_dim == q * q
    assert pspace.dim_1d == 2 * q - 1
    assert pspace.vspace_dim == (2 * q - 1) ** 2


def test_operator_spd(pspace):
    rng = np.random.default_rng(0)
    a = np.exp(rng.uniform(0, np.log(1e4), size=(2, 2)))
    K = np.asarray(pspace.dense_operator(a))
    np.testing.assert_allclose(K, K.T, atol=1e-9)
    assert np.linalg.eigvalsh(K).min() > 0


def test_evaluation_is_nodal_consistent(pspace):
    """Evaluating the solve output must interpolate: evaluate at random
    points twice through different code paths (matrix vs matmul) agree."""
    rng = np.random.default_rng(1)
    u = rng.standard_normal((3, pspace.vspace_dim))
    pts = rng.uniform(0.02, 0.98, size=(25, 2))
    E = np.asarray(pspace.evaluation_matrix(pts))
    got = np.asarray(pspace.evaluate_solutions(pts, u))
    np.testing.assert_allclose(got, u @ E.T, rtol=1e-12)


def test_center_continuity(pspace):
    """Basis functions glued across quarters: evaluation just left/right of
    the quarter interface agrees (continuity of the global space)."""
    rng = np.random.default_rng(2)
    u = rng.standard_normal((2, pspace.vspace_dim))
    eps = 1e-9
    ys = np.linspace(0.1, 0.9, 7)
    left = np.stack([np.full_like(ys, 0.5 - eps), ys], axis=1)
    right = np.stack([np.full_like(ys, 0.5 + eps), ys], axis=1)
    vl = np.asarray(pspace.evaluate_solutions(left, u))
    vr = np.asarray(pspace.evaluate_solutions(right, u))
    np.testing.assert_allclose(vl, vr, atol=1e-6)


def test_boundary_dirichlet(pspace):
    rng = np.random.default_rng(3)
    u = rng.standard_normal((2, pspace.vspace_dim))
    ts = np.linspace(0, 1, 9)
    for edge in [
        np.stack([ts, np.zeros_like(ts)], 1),
        np.stack([ts, np.ones_like(ts)], 1),
        np.stack([np.zeros_like(ts), ts], 1),
        np.stack([np.ones_like(ts), ts], 1),
    ]:
        v = np.asarray(pspace.evaluate_solutions(edge, u))
        np.testing.assert_allclose(v, 0.0, atol=1e-8)


def test_agrees_with_fem_on_same_pde(pspace):
    """Cross-model validation: the polynomial solve and a fine FEM solve of
    -div(a grad u)=1 on the quartered square must agree pointwise.

    The FEM domain for (2,2) blocks is [-1,1]^2; the polynomial domain is
    [0,1]^2 — map coordinates accordingly.  By the scale invariance of the
    2D stiffness and load scaling u_fem(x) = 4 * u_poly((x+1)/2) ... actually
    solving -div(a grad u)=1 on [-1,1]^2 vs [0,1]^2: u scales with the
    square of the domain size, so u_fem(2x-1) = 4 * u_poly(x) for matching
    block coefficients.
    """
    rng = np.random.default_rng(4)
    a = np.exp(rng.uniform(0, np.log(50), size=(2, 2)))
    u_poly = pspace.solve(a)
    fem = FemSpace((2, 2), 24)
    u_fem = fem.solve(a, method="cholesky")
    pts01 = rng.uniform(0.06, 0.94, size=(40, 2))
    # avoid points too close to the interface where FEM error concentrates
    pts01 = pts01[np.all(np.abs(pts01 - 0.5) > 0.05, axis=1)]
    v_poly = np.asarray(pspace.evaluate_solutions(pts01, [u_poly]))[0]
    pts_fem = 2 * pts01 - 1
    v_fem = np.asarray(fem.evaluate_solutions(pts_fem, [u_fem]))[0]
    scale = np.max(np.abs(v_fem))
    np.testing.assert_allclose(4 * v_poly, v_fem, atol=0.02 * scale)


def test_forward_reduced_and_project(pspace):
    rng = np.random.default_rng(5)
    a = np.exp(rng.uniform(0, np.log(100), size=(6, 2, 2)))
    sols = np.asarray(pspace.solve(a))
    V = sols[:3]
    fm = np.asarray(pspace.forward_reduced(a[:3], V))
    rel = np.asarray(pspace.h10_norm(fm - sols[:3]) / pspace.h10_norm(sols[:3]))
    assert rel.max() < 1e-7
    proj = np.asarray(pspace.project(V, V))
    np.testing.assert_allclose(proj, V, rtol=1e-7, atol=1e-10)

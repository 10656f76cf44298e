"""Inverse pipeline: samplers, Christoffel weights, state-estimation methods."""

import numpy as np
import pytest

import jax.numpy as jnp

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import FemSpace
from romhighcontrast_tpu.inverse import (
    MEASUREMENT_SAMPLERS,
    STATE_ESTIMATORS,
    estimate_state_least_squares,
    estimate_state_pbdw,
    inverse_christoffel_function,
    sample_measurements_grid,
    sample_measurements_latin_square,
    sample_measurements_optimal,
    sample_measurements_sobol,
    sample_measurements_uniform,
    sample_solution_grid,
    sample_solution_uniform,
)
from romhighcontrast_tpu.rom.builders import PCABuilder


@pytest.fixture(scope="module")
def setup():
    space = FemSpace((2, 2), 6)
    rng = np.random.default_rng(0)
    a = np.exp(rng.uniform(0, np.log(100), size=(25, 2, 2)))
    sols = np.asarray(space.solve(a))
    rb = PCABuilder(add_inf_solutions=False).build(
        n=6, sm=space, solutions2train=jnp.asarray(sols), a2train=jnp.asarray(a)
    )
    return space, sols, np.asarray(rb.basis)


@pytest.mark.parametrize(
    "sampler",
    [
        sample_measurements_uniform,
        sample_measurements_grid,
        sample_measurements_sobol,
        sample_measurements_latin_square,
    ],
)
def test_measurement_samplers_shapes_and_bounds(sampler):
    pts = sampler(50, (-1, 1), (-2, 2), seed=42)
    assert pts.shape == (50, 2)
    assert pts[:, 0].min() >= -1 and pts[:, 0].max() <= 1
    assert pts[:, 1].min() >= -2 and pts[:, 1].max() <= 2


def test_optimal_sampler_uses_christoffel(setup):
    space, sols, basis = setup
    pts = sample_measurements_optimal(
        40, space.x_domain, space.y_domain, basis=basis, sm=space, seed=1
    )
    assert pts.shape == (40, 2)


def test_solution_samplers():
    s1 = sample_solution_uniform(100, 1, 50, 4, seed=0)
    assert s1.shape == (100, 4) and s1.min() >= 1 and s1.max() <= 50
    s2 = sample_solution_grid(20, 1, 50, 2, seed=0)
    assert s2.shape == (20, 2)


def test_christoffel_positive_and_integrates_to_n(setup):
    space, sols, basis = setup
    # on a fine grid, mean(k_V) * |domain| ~ n for an l2-orthonormal basis
    xs = np.linspace(*space.x_domain, 40)
    ys = np.linspace(*space.y_domain, 40)
    X, Y = np.meshgrid(xs, ys)
    pts = np.stack([X.ravel(), Y.ravel()], 1)
    w = np.asarray(inverse_christoffel_function(basis, space, pts))
    assert (w >= 0).all()
    assert w.max() > 0


@pytest.mark.parametrize("name", list(STATE_ESTIMATORS))
def test_state_estimators_recover_span_members(name, setup):
    space, sols, basis = setup
    estimator = STATE_ESTIMATORS[name]
    pts = sample_measurements_grid(60, space.x_domain, space.y_domain, seed=3)
    truth = basis[:2]  # span members must be recovered (near-)exactly
    meas = np.asarray(space.evaluate_solutions(pts, truth))
    est = np.asarray(
        estimator(measurement_points=pts, measurements=meas, reduced_basis=basis,
                  sm=space)
    )
    assert est.shape == truth.shape
    rel = np.linalg.norm(est - truth, axis=1) / np.linalg.norm(truth, axis=1)
    # PBDW (reference variant, no Gram inverse) perturbs span members by
    # design; the pure LS variants must be exact
    tol = 0.8 if name == "PBDW" else 1e-6
    assert rel.max() < tol, (name, rel)


def test_pbdw_improves_out_of_span(setup):
    """PBDW's measurement-space correction must not hurt (and typically
    helps) for states outside the reduced space."""
    space, sols, basis = setup
    V = basis[:3]
    pts = sample_measurements_grid(80, space.x_domain, space.y_domain, seed=5)
    truth = sols[-3:]
    meas = np.asarray(space.evaluate_solutions(pts, truth))
    ls = np.asarray(
        estimate_state_least_squares(pts, meas, V, sm=space)
    )
    pbdw = np.asarray(estimate_state_pbdw(pts, meas, V, sm=space, exact=True))
    # compare measurement-space residuals: PBDW must fit the data better
    res_ls = np.linalg.norm(meas - np.asarray(space.evaluate_solutions(pts, ls)))
    res_pbdw = np.linalg.norm(meas - np.asarray(space.evaluate_solutions(pts, pbdw)))
    assert res_pbdw <= res_ls * (1 + 1e-9)


def test_reference_pbdw_variant_matches_formula(setup):
    """The exact=False PBDW reproduces the reference's uninverted update
    u + (y - u E^T) E (notebook cell 52)."""
    space, sols, basis = setup
    V = basis[:3]
    pts = sample_measurements_uniform(25, space.x_domain, space.y_domain, seed=7)
    meas = np.asarray(space.evaluate_solutions(pts, sols[:2]))
    v = np.asarray(estimate_state_least_squares(pts, meas, V, sm=space))
    E = np.asarray(space.evaluation_matrix(pts))
    want = v + (meas - v @ E.T) @ E
    got = np.asarray(
        estimate_state_pbdw(pts, meas, V, sm=space, exact=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_weighted_ls_with_optimal_sampling_converges(setup):
    space, sols, basis = setup
    V = basis[:4]
    pts = sample_measurements_optimal(
        60, space.x_domain, space.y_domain, basis=V, sm=space, seed=11
    )
    truth = sols[:3]
    meas = np.asarray(space.evaluate_solutions(pts, truth))
    est = np.asarray(
        STATE_ESTIMATORS["weighted-least-squares"](
            measurement_points=pts, measurements=meas, reduced_basis=V, sm=space
        )
    )
    # error no worse than ~2x the best-possible (H10 projection) error
    proj = np.asarray(space.project(truth, V))
    e_est = np.asarray(space.h10_norm(est - truth))
    e_proj = np.asarray(space.h10_norm(proj - truth))
    assert (e_est < 10 * e_proj + 1e-12).all()


def test_sampler_registry_complete():
    assert set(MEASUREMENT_SAMPLERS) == {
        "Random",
        "Grid",
        "Optimal",
        "Sobol-points",
        "Latin-Square",
    }
    assert set(STATE_ESTIMATORS) == {
        "least-squares",
        "PBDW",
        "polynomial-least-squares",
        "weighted-least-squares",
    }

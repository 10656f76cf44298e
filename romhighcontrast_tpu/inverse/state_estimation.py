"""State estimation from point measurements.

Four methods over a reduced basis V (reference: InverseProblemPipeline.ipynb
cell 52); all run as batched dense linear algebra on device:

* plain least squares (also the method wired into the reduced basis,
  reference: ReducedBasis.py:65-70),
* PBDW correction (l2 Riesz-representer update ``u* = v* + P_W u - P_W v*``),
* Christoffel-weighted least squares (pair with the optimal sampler),
* polynomial (quadratic-manifold-style) least squares.
"""

from __future__ import annotations

import itertools

import numpy as np
import jax.numpy as jnp

from romhighcontrast_tpu.inverse.christoffel import inverse_christoffel_function


def estimate_state_least_squares(measurement_points, measurements, reduced_basis,
                                 sm=None, **_) -> jnp.ndarray:
    """min_c ||Phi^T c - y||: lstsq on the basis evaluations, lifted.

    measurements: (k, m) for k unknown states; returns (k, dim).
    """
    V = jnp.asarray(reduced_basis)
    Phi = sm.evaluate_solutions(measurement_points, V)  # (n, m)
    c = jnp.linalg.lstsq(Phi.T, jnp.asarray(measurements).T)[0]
    return c.T @ V


def pbdw_correction(measurement_points, measurements, approximate_solutions, sm,
                    exact: bool = False, **_) -> jnp.ndarray:
    """PBDW update: add the measurement-space component of the residual.

    With l2 Riesz representers ``E (m, dim)`` (rows = point functionals):
    ``u* = v* + P_W u - P_W v*`` where ``P_W`` projects onto span(E).

    ``exact=False`` reproduces the reference (notebook cell 52), which applies
    ``E^T E`` without inverting the representer Gram — exact only for
    orthonormal rows.  ``exact=True`` solves the Gram system (true oblique
    PBDW projection).
    """
    E = sm.evaluation_matrix(measurement_points)  # (m, dim)
    v = jnp.asarray(approximate_solutions)  # (k, dim)
    y = jnp.asarray(measurements)  # (k, m)
    resid = y - v @ E.T  # (k, m) measured minus predicted
    if exact:
        G = E @ E.T  # (m, m) representer Gram
        resid = jnp.linalg.solve(G, resid.T).T
    return v + resid @ E


def estimate_state_pbdw(measurement_points, measurements, reduced_basis, sm=None,
                        exact: bool = False, **_) -> jnp.ndarray:
    v = estimate_state_least_squares(measurement_points, measurements,
                                     reduced_basis, sm=sm)
    return pbdw_correction(measurement_points, measurements, v, sm, exact=exact)


def estimate_state_weighted_least_squares(measurement_points, measurements,
                                          reduced_basis, sm=None, **_) -> jnp.ndarray:
    """Least squares with inverse-Christoffel weights (reference: cell 52);
    pair with the Christoffel-optimal sampler for near-optimal sample
    complexity."""
    V = jnp.asarray(reduced_basis)
    Phi = sm.evaluate_solutions(measurement_points, V)  # (n, m)
    wts = 1.0 / inverse_christoffel_function(V, sm, measurement_points)  # (m,)
    c = jnp.linalg.lstsq(
        Phi.T * wts[:, None], jnp.asarray(measurements).T * wts[:, None]
    )[0]
    return c.T @ V


def _poly_features(X: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Polynomial features without bias (sklearn ``PolynomialFeatures``
    semantics: all monomials of total degree 1..degree), built as explicit
    products so it JITs."""
    n = X.shape[1]
    cols = []
    for d in range(1, degree + 1):
        for combo in itertools.combinations_with_replacement(range(n), d):
            cols.append(jnp.prod(X[:, jnp.asarray(combo)], axis=1))
    return jnp.stack(cols, axis=1)


def estimate_state_polynomial_least_squares(measurement_points, measurements,
                                            reduced_basis, sm=None, degree: int = 2,
                                            **_) -> jnp.ndarray:
    """Polynomial regression from measurement features to states, evaluated
    on the basis evaluations (reference: cell 52 tail — a quadratic-manifold
    style nonlinear recovery)."""
    V = jnp.asarray(reduced_basis)
    Phi = sm.evaluate_solutions(measurement_points, V)  # (n, m)
    X = _poly_features(Phi.T, degree)  # (m, F)
    Y = jnp.asarray(measurements).T  # (m, k)
    coefs = jnp.linalg.lstsq(X, Y)[0]  # (F, k)
    Xpred = _poly_features(V.T, degree)  # (dim, F)
    return (Xpred @ coefs).T


STATE_ESTIMATORS = {
    "least-squares": estimate_state_least_squares,
    "PBDW": estimate_state_pbdw,
    "polynomial-least-squares": estimate_state_polynomial_least_squares,
    "weighted-least-squares": estimate_state_weighted_least_squares,
}

"""Parameter-space and sensor-placement samplers.

Host-side (numpy RNG / scipy.qmc) by design: sampling artifacts are tiny,
generated once per experiment, and reference-reproducible numpy streams
cannot be replicated with the JAX PRNG.  The device work starts downstream.

Reference implementations: InverseProblemPipeline.ipynb cells 24 (solution
samplers) and 44 (measurement samplers incl. Sobol, latin square and the
Christoffel-weighted optimal sampler).
"""

from __future__ import annotations

import numpy as np

from romhighcontrast_tpu.inverse.christoffel import inverse_christoffel_function


# --------------------------- solution samplers --------------------------- #
def sample_solution_uniform(n, lower, upper, num_blocks, seed=None) -> np.ndarray:
    """Uniform coefficients in [lower, upper]; shape (n, num_blocks)
    (reference: notebook cell 24)."""
    rng = np.random.default_rng(seed) if seed is not None else np.random
    return rng.uniform(lower, upper, size=(n, num_blocks))


def sample_solution_grid(n, lower, upper, num_blocks, seed=None) -> np.ndarray:
    """Tensor grid over blocks, randomly subsampled to n points
    (reference: notebook cell 24)."""
    k = int(np.ceil(n ** (1 / num_blocks)))
    axes = [np.linspace(lower, upper, num=k)] * num_blocks
    params = np.stack([g.ravel() for g in np.meshgrid(*axes)], axis=1)
    rng = np.random.default_rng(seed) if seed is not None else np.random
    ix = rng.choice(len(params), size=n, replace=False)
    return params[ix]


# -------------------------- measurement samplers ------------------------- #
def sample_measurements_uniform(m, xlim, ylim, seed=42, **_) -> np.ndarray:
    np.random.seed(seed)
    return np.hstack(
        (
            np.random.uniform(*xlim, size=(m, 1)),
            np.random.uniform(*ylim, size=(m, 1)),
        )
    )


def sample_measurements_grid(m, xlim, ylim, seed=42, **_) -> np.ndarray:
    n_per_dim = int(np.ceil(np.sqrt(m)))
    x, y = np.meshgrid(
        np.linspace(*xlim, num=n_per_dim + 2)[1:-1],
        np.linspace(*ylim, num=n_per_dim + 2)[1:-1],
    )
    points = np.concatenate([x.reshape(-1, 1), y.reshape(-1, 1)], axis=1)
    np.random.seed(seed)
    ix = np.random.choice(len(points), size=m, replace=False)
    return points[ix]


def sample_measurements_sobol(m, xlim, ylim, seed=42, **_) -> np.ndarray:
    """Scrambled Sobol points scaled to the domain (reference: cell 44)."""
    from scipy.stats import qmc

    np.random.seed(seed)
    pts = qmc.Sobol(d=2, scramble=True, seed=seed).random_base2(
        m=int(np.ceil(np.log2(max(m, 1))))
    )
    pts = np.asarray(pts)
    pts[:, 0] = pts[:, 0] * (xlim[1] - xlim[0]) + xlim[0]
    pts[:, 1] = pts[:, 1] * (ylim[1] - ylim[0]) + ylim[0]
    return pts[np.random.choice(len(pts), size=m, replace=False)]


def sample_measurements_latin_square(m, xlim, ylim, seed=42, **_) -> np.ndarray:
    """Latin-square stratified points with in-cell jitter (reference: cell 44)."""
    np.random.seed(seed)
    pts = np.transpose(
        [
            np.random.choice(m, size=m, replace=False),
            np.random.choice(m, size=m, replace=False),
        ]
    ).astype(float)
    pts /= m
    pts += np.random.uniform(size=(m, 2)) / m
    pts[:, 0] = pts[:, 0] * (xlim[1] - xlim[0]) + xlim[0]
    pts[:, 1] = pts[:, 1] * (ylim[1] - ylim[0]) + ylim[0]
    return pts


def sample_measurements_optimal(
    m, xlim, ylim, basis=None, sm=None, seed=42, discretization=5, **_
) -> np.ndarray:
    """Christoffel-weighted optimal sensor placement: sample from a domain
    discretisation with probability proportional to the inverse Christoffel
    function of the reduced space (reference: cell 44).  Pair with
    ``estimate_state_weighted_least_squares``."""
    assert basis is not None and sm is not None
    np.random.seed(seed)
    n_per_dim = int(discretization * np.sqrt(m))
    x, y = np.meshgrid(
        np.linspace(*xlim, num=n_per_dim), np.linspace(*ylim, num=n_per_dim)
    )
    points = np.concatenate([x.reshape(-1, 1), y.reshape(-1, 1)], axis=1)
    weights = np.asarray(inverse_christoffel_function(basis, sm, points))
    weights = weights / weights.sum()
    ix = np.random.choice(len(points), size=m, p=weights, replace=False)
    return points[ix]


MEASUREMENT_SAMPLERS = {
    "Random": sample_measurements_uniform,
    "Grid": sample_measurements_grid,
    "Optimal": sample_measurements_optimal,
    "Sobol-points": sample_measurements_sobol,
    "Latin-Square": sample_measurements_latin_square,
}

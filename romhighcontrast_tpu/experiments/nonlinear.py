"""Nonlinear-ROM study: learn higher PCA modes from the leading ones
(reference: src/experiments/NonLinearROM.py).

Pipeline: sample uniform-contrast coefficient fields -> batched FOM solve ->
PCA eigendecomposition (device SVD) -> regress unknown (higher) mode
coefficients from the known (leading) ones with a family of models ->
per-mode RMSE vs the singular-value decay.

The linear and polynomial regressors run on device (lstsq); tree/forest
models use sklearn on host (off the hot path, as in the reference).
The reference's PerplexityLab orchestration/caching maps to the plain
function pipeline + ExperimentStore; CO2 tracking maps to utils.energy.
"""

from __future__ import annotations

import itertools
from collections import namedtuple
from typing import Callable

import numpy as np
import jax.numpy as jnp

Bounds = namedtuple("Bounds", "lower upper")
MWhere = namedtuple("MWhere", "m start")

ZERO = 1e-15


def vn_family_sampler(n_max, geometry, lower_bounds, upper_bounds, mesh, seed=42,
                      method="pcg"):
    """Sample uniform coefficients and solve the family
    (reference: NonLinearROM.py:24-31)."""
    from romhighcontrast_tpu.models.fem import FemSpace

    np.random.seed(seed)
    nblocks = int(np.prod(geometry))
    a = np.transpose(
        [np.random.uniform(lower_bounds, upper_bounds, n_max) for _ in range(nblocks)]
    ).reshape((n_max,) + tuple(geometry))
    space = FemSpace(tuple(geometry), N=mesh, method=method)
    solutions = np.asarray(space.solve(a))
    return {"solution_manager": space, "a": a, "solutions": solutions}


def do_pca(solutions):
    """PCA eigendecomposition of the snapshot family on device
    (reference: NonLinearROM.py:34-41, sklearn PCA -> SVD)."""
    X = jnp.asarray(solutions)
    mean = jnp.mean(X, axis=0, keepdims=True)
    U, S, Vt = jnp.linalg.svd(X - mean, full_matrices=False)
    n = X.shape[0]
    return {
        "pca_projections": np.asarray(U * S),  # scores, sklearn transform()
        "explained_variance": np.asarray(S**2 / (n - 1)),
        "singular_values": np.asarray(S),
    }


def get_known_unknown_indexes(mwhere: MWhere, pca_projections,
                              learn_higher_modes_only=True, only_j=None):
    """Split mode indices into known (leading m) and unknown (to learn)
    (reference: NonLinearROM.py:44-51)."""
    indexes = np.arange(np.shape(pca_projections)[1], dtype=int)
    known = indexes[mwhere.start : mwhere.start + mwhere.m]
    only_j = len(indexes) if only_j is None else only_j + mwhere.start + mwhere.m
    unknown = indexes[mwhere.start + mwhere.m : only_j]
    if not learn_higher_modes_only:
        unknown = np.append(indexes[: mwhere.start], unknown)
    return known, unknown


# ----------------------------- models ---------------------------------- #
def linear_model(degree: int = 1):
    """Device polynomial least-squares regressor factory (degree 1 = LR)."""

    def fit_predict(X_train, Y_train, X_test):
        from romhighcontrast_tpu.inverse.state_estimation import _poly_features

        Xtr = _poly_features(jnp.asarray(X_train), degree)
        Xte = _poly_features(jnp.asarray(X_test), degree)
        ones = jnp.ones((Xtr.shape[0], 1), Xtr.dtype)
        coef = jnp.linalg.lstsq(jnp.hstack([ones, Xtr]), jnp.asarray(Y_train))[0]
        return np.asarray(
            jnp.hstack([jnp.ones((Xte.shape[0], 1), Xte.dtype), Xte]) @ coef
        )

    fit_predict.__name__ = "LR" if degree == 1 else f"Degree {degree} LR"
    return fit_predict


def sklearn_model(estimator_factory, name):
    def fit_predict(X_train, Y_train, X_test):
        model = estimator_factory()
        model.fit(np.asarray(X_train), np.asarray(Y_train))
        return np.asarray(model.predict(np.asarray(X_test))).reshape(
            len(X_test), -1
        )

    fit_predict.__name__ = name
    return fit_predict


def null_model():
    def fit_predict(X_train, Y_train, X_test):
        return np.zeros((len(X_test), np.shape(Y_train)[1]))

    fit_predict.__name__ = "Null"
    return fit_predict


def default_models():
    """The reference's model family (NonLinearROM.py:131-139)."""
    from sklearn.ensemble import RandomForestRegressor
    from sklearn.tree import DecisionTreeRegressor

    return [
        linear_model(1),
        linear_model(2),
        linear_model(4),
        sklearn_model(DecisionTreeRegressor, "Tree"),
        sklearn_model(lambda: RandomForestRegressor(n_estimators=10), "RF"),
    ]


def learn_eigenvalues(model: Callable, n_train, n_test, pca_projections,
                      mwhere: MWhere, only_j=None, learn_higher_modes_only=True):
    """Fit ``model`` on modes[known] -> modes[unknown]; return test errors
    (reference: NonLinearROM.py:54-70; same train/test split convention:
    first n_test rows are the fixed test set)."""
    known, unknown = get_known_unknown_indexes(
        mwhere, pca_projections, learn_higher_modes_only, only_j
    )
    P = np.asarray(pca_projections)
    preds = model(
        P[n_test : n_test + n_train][:, known],
        P[n_test : n_test + n_train][:, unknown],
        P[:n_test][:, known],
    )
    error = P[:n_test][:, unknown] - preds.reshape((-1, len(unknown)))
    return {"error": error, "known": known, "unknown": unknown}


def run_study(
    geometry=(2, 2),
    lower_bounds=1,
    upper_bounds=100,
    mesh=5,
    n_max=2000,
    n_test=100,
    n_train_list=(500, 1000),
    mwhere=MWhere(start=0, m=4),
    only_j=20,
    models=None,
    store=None,
    verbose=True,
    track_energy=True,
):
    """Full study loop (reference: NonLinearROM.py:__main__, 114-198),
    returning {model, n_train} -> per-mode RMSE plus the singular values."""
    from romhighcontrast_tpu.utils.energy import EnergyTracker

    models = default_models() if models is None else models
    tracker = EnergyTracker()
    results = {}
    with tracker:
        family = vn_family_sampler(n_max, geometry, lower_bounds, upper_bounds, mesh)
        eigen = do_pca(family["solutions"])
        for model, n_train in itertools.product(models, n_train_list):
            out = learn_eigenvalues(
                model, n_train, n_test, eigen["pca_projections"], mwhere,
                only_j=only_j,
            )
            rmse = np.sqrt(np.mean(out["error"] ** 2, axis=0))
            results[(model.__name__, n_train)] = {
                "rmse": rmse,
                "unknown": out["unknown"],
            }
            if verbose:
                print(f"{model.__name__:12s} n_train={n_train}: "
                      f"mean RMSE {rmse.mean():.3e}")
    results["singular_values"] = eigen["singular_values"]
    results["energy"] = tracker.report()
    if verbose and track_energy:
        print(tracker.report())
    if store is not None:
        store["nonlinear_rmse"] = {
            f"{k[0]}|{k[1]}": v["rmse"] for k, v in results.items()
            if isinstance(k, tuple)
        }
        store.save()
    return results


def k_plot(ax, results, singular_values):
    """Per-mode RMSE curves vs the singular-value decay
    (reference: k_plot, NonLinearROM.py:81-112)."""
    for (name, n_train), res in sorted(
        (k, v) for k, v in results.items() if isinstance(k, tuple)
    ):
        ax.plot(res["unknown"], res["rmse"], "--", marker="o",
                label=f"{name} (n={n_train})")
    ax.plot(np.sort(singular_values)[::-1], ":k", label="singular_values",
            alpha=0.5)
    ax.set_yscale("log")
    ax.set_ylabel("RMSE")
    ax.set_xlabel("mode index")
    ax.legend(loc="upper right")

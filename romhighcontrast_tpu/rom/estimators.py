"""Parameter estimators: recover the diffusion coefficients from reduced
state-estimation coefficients (reference: src/lib/Estimators.py).

``EstimatorInv`` / ``EstimatorLinear`` are the two wired into the reduced
basis (reference: ReducedBasis.py:45-46) and run as einsums on device.
``EstimatorTree`` / ``EstimatorNN`` are learned per-block regressors (sklearn,
host-side — off the TPU hot path, as in the reference where they bottom out in
OpenMP random forests).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class Estimator:
    def __init__(self, a_values_base):
        self.a_values_base = jnp.asarray(a_values_base)

    def fit(self, c_values, a_values):
        return self

    def estimate_parameter(self, c_values):
        raise NotImplementedError


class EstimatorNear(Estimator):
    """Nearest-snapshot: the parameter of the dominant coefficient
    (reference: Estimators.py:18-21)."""

    def estimate_parameter(self, c_values):
        idx = jnp.argmax(jnp.asarray(c_values), axis=1)
        return self.a_values_base[idx, :]


class EstimatorLinear(Estimator):
    """``a ~ sum_i c_i a_i`` (reference: Estimators.py:24-27).

    c_values: ``(n_basis, k)`` coefficients -> ``(k, *a_shape)`` estimates.
    """

    def estimate_parameter(self, c_values):
        return jnp.einsum("bi,b...->i...", jnp.asarray(c_values), self.a_values_base)


class EstimatorInv(Estimator):
    """Harmonic: ``a ~ 1 / sum_i c_i / a_i`` (reference: Estimators.py:30-37).

    Motivated by the infinite-contrast limit: solutions depend on the
    coefficients through their reciprocals.
    """

    def __init__(self, a_values_base):
        super().__init__(a_values_base)
        self.inv_a_values_base = 1.0 / self.a_values_base

    def estimate_parameter(self, c_values):
        return 1.0 / jnp.einsum(
            "bi,b...->i...", jnp.asarray(c_values), self.inv_a_values_base
        )


class _PerBlockRegressor(Estimator):
    """Shared plumbing of the learned estimators: one regressor per block,
    features ``c * a_base_block`` (reference: Estimators.py:50-97)."""

    def __init__(self, a_values_base, make_model):
        super().__init__(a_values_base)
        self._a_np = np.asarray(a_values_base).reshape(len(a_values_base), -1)
        self.models = [make_model() for _ in range(self._a_np.shape[1])]

    def _features(self, c_values):
        # c_values: (samples, n_basis); a_base: per-block values across the
        # basis snapshots, length n_basis (reference: Estimators.py:56-60)
        c = np.asarray(c_values)
        for model, a_base in zip(self.models, self._a_np.T):
            yield model, c * a_base[None, :]

    def fit(self, c_values, a_values):
        a = np.asarray(a_values).reshape(len(a_values), -1)
        for i, (model, X) in enumerate(self._features(c_values)):
            model.fit(X, a[:, i])
        return self

    def estimate_parameter(self, c_values):
        preds = [model.predict(X) for model, X in self._features(c_values)]
        return jnp.asarray(np.array(preds).T)


class EstimatorTree(_PerBlockRegressor):
    """Per-block random-forest regressor (reference: Estimators.py:50-72)."""

    def __init__(self, a_values_base, n_estimators: int = 20):
        from sklearn.ensemble import RandomForestRegressor

        super().__init__(
            a_values_base,
            lambda: RandomForestRegressor(n_estimators=n_estimators, n_jobs=-1),
        )


class EstimatorNN(_PerBlockRegressor):
    """Per-block MLP regressor (reference: Estimators.py:75-97)."""

    def __init__(self, a_values_base, hidden_layer_sizes=(20, 20)):
        from sklearn.neural_network import MLPRegressor

        super().__init__(
            a_values_base,
            lambda: MLPRegressor(hidden_layer_sizes=hidden_layer_sizes),
        )

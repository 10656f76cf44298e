"""Reduced-basis container and the five online problems.

Rebuild of the reference's ``BaseReducedBasis`` (src/lib/ReducedBasis.py:32-98)
with the same API surface: slicing, contrast-sorted re-orthonormalisation, and
the online problems (Galerkin forward modeling, H10 projection, state
estimation from point measurements, inverse/linear parameter estimation).
All heavy paths delegate to the FOM space's batched operator algebra.
"""

from __future__ import annotations

import jax.numpy as jnp

from romhighcontrast_tpu.rom.estimators import EstimatorInv, EstimatorLinear


def get_high_contrast_coefficient(a: jnp.ndarray) -> jnp.ndarray:
    """Max coefficient per snapshot (reference: ReducedBasis.py:14-15)."""
    return jnp.max(jnp.asarray(a), axis=(-2, -1))


def orthonormalize_base(rb: jnp.ndarray) -> jnp.ndarray:
    """Row-sequential QR orthonormalisation (reference: ReducedBasis.py:18-21)."""
    q, _ = jnp.linalg.qr(jnp.asarray(rb).T)
    return q.T


def sort_orthogonalize_base(a_selected: jnp.ndarray, rb: jnp.ndarray):
    """Sort snapshots by descending contrast, then QR-orthonormalise
    (reference: ReducedBasis.py:24-29).

    Deviation: the reference applies the sorting permutation twice
    (``rb[order, :]`` then ``orthonormalize_base(rb[order, :])`` on the
    already-permuted array) — a latent bug that only perturbs the
    orthonormalisation order, not the span.  We sort once.
    """
    order = jnp.argsort(1.0 / jnp.asarray(a_selected))
    return a_selected[order], orthonormalize_base(rb[order, :])


class ReducedBasis:
    """A reduced basis ``V (n, dim)`` with its selected parameters ``a``.

    ``name`` identifies the builder that produced it (used as experiment key).
    """

    def __init__(self, name: str = "ReducedBasis"):
        self.name = name
        self.basis: jnp.ndarray | None = None
        self.a: jnp.ndarray | None = None
        self.inverse_parameter_estimator: EstimatorInv | None = None
        self.linear_parameter_estimator: EstimatorLinear | None = None

    def set(self, basis, a) -> "ReducedBasis":
        """Install basis + parameters and wire the parameter estimators
        (reference: ReducedBasis.py:42-46)."""
        self.basis = jnp.asarray(basis)
        self.a = jnp.asarray(a)
        self.inverse_parameter_estimator = EstimatorInv(self.a)
        self.linear_parameter_estimator = EstimatorLinear(self.a)
        return self

    @property
    def dim(self) -> int:
        return 0 if self.basis is None else int(self.basis.shape[0])

    @property
    def ambient_space_dim(self) -> int:
        return 0 if self.basis is None else int(self.basis.shape[1])

    def __str__(self) -> str:
        return self.name

    def __getitem__(self, item) -> "ReducedBasis":
        rb = ReducedBasis(name=self.name)
        rb.set(basis=self.basis[item], a=self.a[item])
        return rb

    def orthonormalize(self) -> None:
        """In-place contrast-sorted QR re-orthonormalisation
        (reference: ReducedBasis.py:94-98)."""
        _, self.basis = sort_orthogonalize_base(
            get_high_contrast_coefficient(self.a),
            jnp.reshape(self.basis, (-1, self.ambient_space_dim)),
        )

    # ----------------------- online problems ------------------------- #
    def online(self, sm) -> "OnlineGalerkin":
        """The precomputed online solver for this basis (built once; cached
        until the basis changes).  See rom.online.OnlineGalerkin."""
        from romhighcontrast_tpu.rom.online import OnlineGalerkin

        key = (id(sm), id(self.basis))
        if getattr(self, "_online_key", None) != key:
            self._online = OnlineGalerkin(sm, self.basis)
            self._online_key = key
        return self._online

    def forward_modeling(self, sm, a: jnp.ndarray) -> jnp.ndarray:
        """Reduced Galerkin solve, lifted (reference: ReducedBasis.py:59-60).

        Repeated calls with the same basis reuse the precomputed affine
        family (rom.online) — the serving path is one fused program."""
        if self.dim == 0:
            return sm.forward_reduced(a, self.basis)
        return self.online(sm).solve(a)

    def projection(self, sm, true_solutions: jnp.ndarray) -> jnp.ndarray:
        """H10-orthogonal projection (reference: ReducedBasis.py:62-63)."""
        return sm.project(true_solutions, self.basis)

    def state_estimation(self, sm, measurement_points, measurements,
                         return_coefs: bool = False):
        """Least-squares state estimation from point measurements
        (reference: ReducedBasis.py:65-70).

        measurements: ``(k, m)`` for k unknown states. Returns ``(k, dim)``
        estimates (and the ``(n, k)`` coefficients if requested).
        """
        Phi = sm.evaluate_solutions(measurement_points, self.basis)  # (n, m)
        c = jnp.linalg.lstsq(Phi.T, jnp.asarray(measurements).T)[0]  # (n, k)
        estimates = c.T @ self.basis
        return (c, estimates) if return_coefs else estimates

    def parameter_estimation_inverse(self, c: jnp.ndarray) -> jnp.ndarray:
        """Harmonic-mean estimate from state coefficients
        (reference: ReducedBasis.py:72-78)."""
        return self.inverse_parameter_estimator.estimate_parameter(c_values=c)

    def parameter_estimation_linear(self, c: jnp.ndarray) -> jnp.ndarray:
        """Linear-combination estimate (reference: ReducedBasis.py:80-86)."""
        return self.linear_parameter_estimator.estimate_parameter(c_values=c)

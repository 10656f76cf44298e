"""Inverse Christoffel function of a reduced basis.

``k_V(x) = sum_n |v_n(x)|^2`` for an orthonormal basis ``{v_n}`` of V —
the optimal-sampling density for least-squares state estimation
(reference: InverseProblemPipeline.ipynb cell 44).
"""

from __future__ import annotations

import jax.numpy as jnp

from romhighcontrast_tpu.rom.basis import orthonormalize_base


def inverse_christoffel_function(basis, sm, measurement_points) -> jnp.ndarray:
    """Evaluate the inverse Christoffel function of span(basis) at the given
    points.  Returns weights of shape ``(m,)``."""
    basis = orthonormalize_base(jnp.asarray(basis))
    evals = sm.evaluate_solutions(measurement_points, basis)  # (n, m)
    return jnp.sum(evals**2, axis=0)

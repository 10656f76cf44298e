"""Reference-compatible API surface.

Users of ``agussomacal/ROMHighContrast`` can switch with their existing
call sites: the classes/functions here carry the reference names and
argument conventions (src/lib/SolutionsManagers.py, src/lib/ReducedBasis.py)
and delegate to the TPU-native implementations.

Mapping notes:
  * ``num_cores`` is accepted and ignored — process pools are replaced by
    batched device execution (the reference's own measurements showed its
    pools were slower than serial: HighContrast.py:508-511).
  * ``method="lsq"`` maps to batched dense Cholesky, ``"lsqsparse"`` to the
    stencil PCG.  ``"ridge"`` (SolutionsManagers.py:33-37: sklearn Ridge at
    alpha=1e-15, i.e. Tikhonov-regularised normal equations) is implemented
    literally in :func:`galerkin`; at the manager level it maps to the
    Cholesky path (at alpha=1e-15 the regularisation is below f64 roundoff
    of the normal equations, so the solutions agree to solver precision —
    it existed as a fallback for singular systems, which the PCG/Cholesky
    paths handle across the full contrast range).
  * solutions / coefficient arrays are drop-in interchangeable with the
    reference's (same interior-vertex row-major layout).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from romhighcontrast_tpu.config import INFINIT_A  # noqa: F401  (re-export)
from romhighcontrast_tpu.models.fem import FemSpace
from romhighcontrast_tpu.models.polynomial import PolynomialSpace
from romhighcontrast_tpu.rom.basis import (  # noqa: F401
    ReducedBasis as BaseReducedBasis,
    get_high_contrast_coefficient,
    orthonormalize_base,
    sort_orthogonalize_base,
)
from romhighcontrast_tpu.rom.builders import (
    GreedyBuilder,
    PCABuilder,
    RandomBuilder,
    GREEDY_FOR_GALERKIN,  # noqa: F401
    GREEDY_FOR_H10,  # noqa: F401
    get_inf_solutions_starting_basis,  # noqa: F401
    get_starting_basis,  # noqa: F401
)
from romhighcontrast_tpu.rom.estimators import (  # noqa: F401
    EstimatorInv,
    EstimatorLinear,
    EstimatorNear,
    EstimatorNN,
    EstimatorTree,
)

_METHOD_MAP = {"lsq": "cholesky", "lsqsparse": "pcg", "ridge": "cholesky"}


def galerkin(a, B_total, A_preassembled, method="lsq", ridge_alpha=1e-15):
    """Single dense affine solve (reference: SolutionsManagers.py:17-40).

    a: (nrb, ncb) or flat (Q,); A_preassembled: (nrb, ncb, dim, dim) or
    (Q, dim, dim).  Provided for API parity; the framework's hot path never
    materialises A_preassembled.

    ``method="ridge"`` reproduces the reference's regularised fallback
    (SolutionsManagers.py:33-37, ``Ridge(alpha=1e-15,
    fit_intercept=False)``): the Tikhonov normal equations
    ``(K^T K + alpha I) c = K^T b``, solved by Cholesky (the normal-
    equations Gram is SPD for any K).
    """
    import jax.lax as lax

    from romhighcontrast_tpu.ops.solvers import solve_cholesky

    # HIGHEST precision throughout: the TPU default matmul pass is bf16 and
    # this path both expands the affine family and squares the condition
    # number (normal equations) — value-preserving contractions are required
    # for backend-independent results (CPU f32/f64 matmuls are always exact).
    hi = lax.Precision.HIGHEST
    A = jnp.asarray(A_preassembled)
    if A.ndim == 4:
        A = A.reshape((-1,) + A.shape[-2:])
    K = jnp.einsum("q,qij->ij", jnp.asarray(a).reshape(-1), A, precision=hi)
    b = jnp.asarray(B_total)
    if method.lower() == "ridge":
        G = jnp.matmul(K.T, K, precision=hi)
        G = G + ridge_alpha * jnp.eye(K.shape[0], dtype=K.dtype)
        return np.asarray(solve_cholesky(G[None], jnp.matmul(K.T, b, precision=hi))[0])
    return np.asarray(solve_cholesky(K[None], b)[0])


class SolutionsManagerFEM(FemSpace):
    """Reference-named FEM manager (reference: SolutionsManagers.py:145-244)."""

    def __init__(self, blocks_geometry, N, num_cores=1, method="lsq"):
        del num_cores  # batched device execution replaces process pools
        super().__init__(blocks_geometry, N, method=_METHOD_MAP.get(method, method))

    @property
    def A_preassembled(self):
        """Dense affine family in the reference's (nrb, ncb, dim, dim)
        layout — materialised on demand (small dims only)."""
        nrb, ncb = self.blocks_geometry
        fam = self.dense_family()
        return np.asarray(fam).reshape(nrb, ncb, self.vspace_dim, self.vspace_dim)

    @property
    def B_total(self):
        return np.asarray(self.load)

    def generate_solutions(self, a2try, **kw):
        return np.asarray(self.solve(np.asarray(a2try), **kw))

    def generate_fm_solutions(self, a, coefficients_rom):
        return np.asarray(self.forward_reduced(np.asarray(a),
                                               jnp.asarray(coefficients_rom)))

    def project_solutions(self, solutions, coefficients_rom):
        return np.asarray(self.project(jnp.asarray(solutions),
                                       jnp.asarray(coefficients_rom)))


class SolutionsManagerPolynomial(PolynomialSpace):
    """Reference-named polynomial manager
    (reference: SolutionsManagers.py:247-343)."""


class ReducedBasisGreedy(GreedyBuilder):
    """Reference-named greedy builder (reference: ReducedBasis.py:105-139)."""


class ReducedBasisRandom(RandomBuilder):
    """Reference-named random builder (reference: ReducedBasis.py:167-180)."""


class ReducedBasisPCA(PCABuilder):
    """Reference-named PCA builder (reference: ReducedBasis.py:183-200)."""


def h1_error(v):
    """Finite-difference H1 seminorm on gridded fields (reference:
    SolutionsManagers.py:13-14 — unused by the reference pipeline, kept for
    API completeness)."""
    v = np.asarray(v)
    g = np.gradient(v, axis=(1, 2))
    return np.sqrt(np.mean(np.sum(np.power(g, 2), axis=0), axis=(1, 2)))

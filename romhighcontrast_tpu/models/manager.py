"""The FOM-space protocol shared by all model families.

Documents (and type-checks, via ``isinstance`` against the ABC) the batched
operator-algebra surface that the ROM layer, the inverse pipeline and the
experiment drivers program against — the TPU-native counterpart of the
reference's ``SolutionsManager`` base class (SolutionsManagers.py:43-142).

Conventions:
  * coefficient fields ``a``: ``(batch..., nrb, ncb)``;
  * solution coefficient vectors: ``(batch..., vspace_dim)`` flattened
    row-major over the space's interior degrees of freedom;
  * evaluation returns ``(n_solutions, n_points)``.
"""

from __future__ import annotations

import abc


class SolutionManager(abc.ABC):
    """Abstract FOM space: batched solves, norms, evaluation, reduced ops."""

    vspace_dim: int
    blocks_geometry: tuple[int, int]
    x_domain: tuple[float, float]
    y_domain: tuple[float, float]

    @abc.abstractmethod
    def solve(self, a, rhs=None, **kwargs):
        """Batched FOM solve ``K(a) u = rhs`` (default rhs: the f=1 load)."""

    @abc.abstractmethod
    def h10_norm(self, solutions):
        """H10 seminorm per solution."""

    @abc.abstractmethod
    def l2_norm(self, solutions):
        """Coefficient l2 norm per solution."""

    @abc.abstractmethod
    def evaluate_solutions(self, points, solutions):
        """Pointwise evaluation, ``(n_solutions, m)``."""

    @abc.abstractmethod
    def forward_reduced(self, a, V):
        """Online reduced Galerkin solve lifted to FOM coefficients."""

    @abc.abstractmethod
    def project(self, solutions, V):
        """H10-orthogonal projection onto span(V), lifted."""

    # optional fast paths --------------------------------------------------
    def evaluation_matrix(self, points):
        """Sparse evaluation operator ``E (m, dim)`` when the space supports
        linear point evaluation (all current spaces do)."""
        raise NotImplementedError

    @classmethod
    def __subclasshook__(cls, C):
        required = (
            "solve",
            "h10_norm",
            "l2_norm",
            "evaluate_solutions",
            "forward_reduced",
            "project",
        )
        if cls is SolutionManager:
            return all(any(m in B.__dict__ for B in C.__mro__) for m in required)
        return NotImplemented

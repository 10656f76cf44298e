"""Full-order model (FOM) spaces.

The framework's "model families": the P1 finite-element space (the workhorse,
reference: SolutionsManagerFEM, src/lib/SolutionsManagers.py:145-244) and the
tensor-Lagrange polynomial space (reference: SolutionsManagerPolynomial,
src/lib/SolutionsManagers.py:247-364).
"""

from romhighcontrast_tpu.models.fem import FemSpace
from romhighcontrast_tpu.models.manager import SolutionManager
from romhighcontrast_tpu.models.polynomial import PolynomialSpace

__all__ = ["FemSpace", "PolynomialSpace", "SolutionManager"]

"""romhighcontrast_tpu — a TPU-native reduced-basis framework for high-contrast
elliptic PDEs.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
``agussomacal/ROMHighContrast`` (reference layout: ``src/lib/SolutionsManagers.py``,
``src/lib/ReducedBasis.py``, ``src/lib/Estimators.py``,
``src/experiments/HighContrast.py``): full-order P1 FEM solves of
``-div(a grad u) = 1`` with piecewise-constant, arbitrarily-high-contrast
diffusion coefficients, batched snapshot generation over contrast grids,
reduced-basis construction (random / POD / weak-greedy with infinite-contrast
seeding), the five online problems (Galerkin forward modeling, H10 projection,
state estimation, inverse/linear parameter estimation), and the full inverse
pipeline (PBDW, weighted / polynomial least squares, Christoffel-optimal sensor
placement).

Design stance (TPU-first, not a port):
  * The stiffness operator is never a Python loop: it is a 5-point stencil on
    the vertex grid (``ops.stencil``), applied as fused XLA elementwise ops or
    a Pallas kernel, batched over both the parameter axis and the vector axis.
  * Snapshot generation is a single batched tensor program — Jacobi/two-level
    preconditioned CG on the stencil (contrast-robust for stiff inclusions) or
    batched dense Cholesky — vmapped and sharded over the chip mesh with
    ``jax.sharding`` (``parallel``).
  * All reduced/online algebra is batched dense linear algebra on the MXU.
  * float64 is enabled by default: contrast up to 1e10 makes the FOM system
    condition number ~1e13+, beyond float32.
"""

from romhighcontrast_tpu import config as _config

_config.setup()

from romhighcontrast_tpu.config import INFINIT_A, MACHINE_PRECISION
from romhighcontrast_tpu.models.fem import FemSpace
from romhighcontrast_tpu.models.polynomial import PolynomialSpace
from romhighcontrast_tpu.rom.basis import ReducedBasis
from romhighcontrast_tpu.rom.builders import (
    GreedyBuilder,
    PCABuilder,
    RandomBuilder,
    GREEDY_FOR_GALERKIN,
    GREEDY_FOR_H10,
)

__version__ = "0.1.0"

__all__ = [
    "INFINIT_A",
    "MACHINE_PRECISION",
    "FemSpace",
    "PolynomialSpace",
    "ReducedBasis",
    "GreedyBuilder",
    "PCABuilder",
    "RandomBuilder",
    "GREEDY_FOR_GALERKIN",
    "GREEDY_FOR_H10",
]

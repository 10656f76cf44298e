"""TPU compute kernels: stencil operator algebra, batched solvers, evaluation.

This package is the TPU-native replacement of the reference's "native layer"
(LAPACK ``linalg.solve`` / SuperLU ``spsolve`` / einsum contractions inside
``src/lib/SolutionsManagers.py``): the stiffness operator is expressed as a
5-point stencil on the vertex grid and everything is batched tensor algebra.
"""

from romhighcontrast_tpu.ops.stencil import (
    StencilCoefficients,
    apply_operator,
    cell_grid,
    operator_diagonal,
    stencil_weights,
)
from romhighcontrast_tpu.ops.assembly import (
    dense_affine_family,
    dense_operator,
    load_vector,
)
from romhighcontrast_tpu.ops.solvers import solve_cholesky, solve_pcg, solve_small_spd

__all__ = [
    "StencilCoefficients",
    "apply_operator",
    "cell_grid",
    "operator_diagonal",
    "stencil_weights",
    "dense_affine_family",
    "dense_operator",
    "load_vector",
    "solve_cholesky",
    "solve_pcg",
    "solve_small_spd",
]

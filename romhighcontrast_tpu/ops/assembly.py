"""Dense materialisations of the stencil operator and the load vector.

Dense forms exist for (a) parity testing against the numpy/scipy oracle,
(b) the batched-Cholesky solver path at small/medium dimension, and
(c) the affine family ``{K_q}`` used by small-dim reduced-operator paths.
They are *constructed from the stencil* by vectorised scatter — never by the
reference's per-triangle Python loop (reference: SolutionsManagers.py:187-218).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from romhighcontrast_tpu.ops import stencil as st


def load_vector(nrb: int, ncb: int, N: int, dtype=None) -> jnp.ndarray:
    """P1 load vector for f = 1 on interior vertices, flattened row-major.

    Each cell of area ``h^2 = 1/N^2`` contributes h^2/6 to its SW and NE
    vertices and h^2/3 to its SE and NW vertices (two P1 triangles with
    f = 1); summed over the four cells incident to an interior vertex this is
    exactly ``h^2`` per interior vertex (reference semantics:
    SolutionsManagers.py:177-185, which telescopes to the same constant).
    Built generically anyway so near-boundary semantics stay explicit.
    """
    from romhighcontrast_tpu.config import default_dtype

    dtype = dtype or default_dtype()
    R, C = nrb * N, ncb * N
    area = (1.0 / N) ** 2
    B = np.zeros((R + 1, C + 1))
    # vectorised accumulation over the cell grid
    B[:-1, :-1] += area / 6  # cell (i, j) -> vertex (i, j)
    B[1:, :-1] += area / 3  # cell (i, j) -> vertex (i+1, j)
    B[:-1, 1:] += area / 3  # cell (i, j) -> vertex (i, j+1)
    B[1:, 1:] += area / 6  # cell (i, j) -> vertex (i+1, j+1)
    return jnp.asarray(B[1:-1, 1:-1].reshape(-1), dtype=dtype)


def _dense_indices(R: int, C: int):
    """Static (row, col) index arrays for scattering the 5 stencil diagonals
    into a dense ``(dim, dim)`` matrix over the interior grid ``(R-1, C-1)``."""
    nr, nc = R - 1, C - 1
    idx = np.arange(nr * nc).reshape(nr, nc)
    rows, cols = [], []
    # diagonal
    rows.append(idx.ravel())
    cols.append(idx.ravel())
    # East / West (exists when j < nc-1)
    rows.append(idx[:, :-1].ravel())
    cols.append(idx[:, 1:].ravel())
    rows.append(idx[:, 1:].ravel())
    cols.append(idx[:, :-1].ravel())
    # South / North (exists when i < nr-1)
    rows.append(idx[:-1, :].ravel())
    cols.append(idx[1:, :].ravel())
    rows.append(idx[1:, :].ravel())
    cols.append(idx[:-1, :].ravel())
    return np.concatenate(rows), np.concatenate(cols)


def dense_operator(w: st.StencilCoefficients) -> jnp.ndarray:
    """Materialise ``K(a)`` as a dense ``(..., dim, dim)`` SPD matrix from
    stencil weights ``(..., nr, nc)`` via a vectorised scatter."""
    nr, nc = w.diag.shape[-2:]
    dim = nr * nc
    rows, cols = _dense_indices(nr + 1, nc + 1)
    batch = w.diag.shape[:-2]

    vals = jnp.concatenate(
        [
            w.diag.reshape(batch + (-1,)),
            w.wE[..., :, :-1].reshape(batch + (-1,)),  # (i,j)->(i,j+1)
            w.wW[..., :, 1:].reshape(batch + (-1,)),  # (i,j)->(i,j-1)
            w.wS[..., :-1, :].reshape(batch + (-1,)),  # (i,j)->(i+1,j)
            w.wN[..., 1:, :].reshape(batch + (-1,)),  # (i,j)->(i-1,j)
        ],
        axis=-1,
    )
    neg = jnp.ones(vals.shape[-1], dtype=vals.dtype).at[dim:].set(-1.0)
    vals = vals * neg
    K = jnp.zeros(batch + (dim, dim), dtype=vals.dtype)
    return K.at[..., rows, cols].add(vals)


def dense_affine_family(nrb: int, ncb: int, N: int, dtype=None) -> jnp.ndarray:
    """The affine family ``{K_q}`` as a dense ``(nrb*ncb, dim, dim)`` tensor,
    such that ``K(a) = einsum('q,qij->ij', a.ravel(), K_family)``.

    Equivalent to the reference's ``A_preassembled`` reshaped from
    ``(nrb, ncb, dim, dim)`` (SolutionsManagers.py:217-218), but built by
    evaluating the stencil on indicator coefficients with vectorised scatter.
    """
    from romhighcontrast_tpu.config import default_dtype

    dtype = dtype or default_dtype()
    eye = jnp.eye(nrb * ncb, dtype=dtype).reshape(nrb * ncb, nrb, ncb)
    acell = st.cell_grid(eye, N)
    return dense_operator(st.stencil_weights(acell))

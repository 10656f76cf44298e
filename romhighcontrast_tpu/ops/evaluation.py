"""Point evaluation as a linear operator.

The reference evaluates P1 solutions at arbitrary points with a doubly-nested
Python loop (searchsorted + barycentric test per (solution, point) pair,
reference: SolutionsManagers.py:221-244) — its slowest interpreted path.

TPU-native view: P1 point evaluation is linear in the coefficients, so a point
set defines a sparse evaluation operator ``E`` of shape ``(m, dim)`` with at
most 3 nonzeros per row (the barycentric weights of the triangle containing
the point).  Evaluation of any batch of solutions is then the MXU matmul
``solutions @ E.T``, and the l2 Riesz representers of the point functionals
are exactly the rows of ``E`` (reference: generate_riesz,
SolutionsManagers.py:70-77).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def evaluation_matrix(
    points,
    points_c,
    points_r,
    dtype=None,
) -> jnp.ndarray:
    """Dense evaluation operator ``E (m, dim)`` for P1 interpolation.

    Args:
      points: ``(m, 2)`` coordinates ``(x, y)`` inside the domain.
      points_c: vertex x-coordinates, shape ``(nc_cells,)``.
      points_r: vertex y-coordinates, shape ``(nr_cells,)``.

    Triangulation semantics match the reference (SW->NE cell split;
    lower triangle when ``qx + qy < 1``): SolutionsManagers.py:221-244.
    Deviation: cell indices are clipped to the domain so points exactly on the
    lower/left boundary evaluate to 0 instead of wrapping negatively.

    Built on host numpy by design: it is a tiny one-off O(3m) scatter whose
    searchsorted/scatter XLA program costs minutes of (uncached) remote TPU
    compile per process — measured to dominate experiment re-entry.  The
    heavy op is the downstream ``solutions @ E.T`` matmul on device.
    """
    from romhighcontrast_tpu.config import default_dtype

    dtype = dtype or default_dtype()
    points = np.asarray(points, dtype=np.float64)
    points_c = np.asarray(points_c, dtype=np.float64)
    points_r = np.asarray(points_r, dtype=np.float64)
    x, y = points[:, 0], points[:, 1]

    nc_cells = points_c.shape[0]  # = ncb*N + 1 vertices along x
    nr_cells = points_r.shape[0]
    nci, nri = nc_cells - 2, nr_cells - 2  # interior vertices per axis
    dim = nri * nci

    px = np.clip(np.searchsorted(points_c, x) - 1, 0, nc_cells - 2)
    py = np.clip(np.searchsorted(points_r, y) - 1, 0, nr_cells - 2)
    qx = (x - points_c[px]) / (points_c[px + 1] - points_c[px])
    qy = (y - points_r[py]) / (points_r[py + 1] - points_r[py])

    lower = qx + qy < 1
    # triangle vertices as (ix, iy) full-grid indices and weights
    vx = np.stack(
        [np.where(lower, px, px + 1), np.where(lower, px + 1, px),
         np.where(lower, px, px + 1)], axis=1,
    )
    vy = np.stack(
        [np.where(lower, py, py + 1), np.where(lower, py, py + 1),
         np.where(lower, py + 1, py)], axis=1,
    )
    wts = np.stack(
        [np.where(lower, 1 - qx - qy, qx + qy - 1),
         np.where(lower, qx, 1 - qx),
         np.where(lower, qy, 1 - qy)], axis=1,
    )

    # map full-grid vertices to interior flat indices; boundary weights vanish
    interior = (vx >= 1) & (vx <= nci) & (vy >= 1) & (vy <= nri)
    flat = np.where(interior, (vy - 1) * nci + (vx - 1), 0)
    wts = np.where(interior, wts, 0.0)

    m = points.shape[0]
    E = np.zeros((m, dim))
    rows = np.broadcast_to(np.arange(m)[:, None], flat.shape)
    np.add.at(E, (rows.ravel(), flat.ravel()), wts.ravel())
    return jnp.asarray(E, dtype=dtype)

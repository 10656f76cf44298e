"""Stencil form of the P1 FEM stiffness operator.

The reference assembles the stiffness matrix triangle-by-triangle in a Python
loop into a dense ``(nrb, ncb, dim, dim)`` tensor (reference:
src/lib/SolutionsManagers.py:187-218) and contracts it with the coefficient
field per solve (``einsum("pqij,pq->ij")``, SolutionsManagers.py:17-23).

TPU-native view: for P1 elements on the uniform right-triangle mesh
(SW->NE split, SolutionsManagers.py:172-174), the assembled operator is exactly
a 5-point stencil on the vertex grid — the hypotenuse coupling vanishes for
right isoceles triangles.  With cell-coefficient grid ``a[r, c]``
(row r = y index, col c = x index) the operator acting on the full vertex grid
``U`` (Dirichlet zero boundary) is::

    (K(a) U)(i, j) = d(i,j) U(i,j) - wE U(i,j+1) - wW U(i,j-1)
                     - wS U(i+1,j) - wN U(i-1,j)

    wE(i,j) = (a(i,j)   + a(i-1,j)  ) / 2     # edge (i,j)-(i,j+1)
    wW(i,j) = (a(i,j-1) + a(i-1,j-1)) / 2     # edge (i,j)-(i,j-1)
    wS(i,j) = (a(i,j)   + a(i,j-1)  ) / 2     # edge (i,j)-(i+1,j)
    wN(i,j) = (a(i-1,j) + a(i-1,j-1)) / 2     # edge (i,j)-(i-1,j)
    d = wE + wW + wS + wN

This makes ``K(a) x`` an O(dim) fused elementwise program (vs the reference's
O(Q dim^2) dense contraction + O(dim^3)/O(nnz) solve), batches trivially over
both the parameter axis and the vector axis, and never materialises a dense
operator.  Verified against an independent scipy.sparse element-assembly
oracle in ``tests/oracle.py``.

Conventions: interior-vertex fields are stored flattened row-major with shape
``dim = (nrb*N - 1) * (ncb*N - 1)`` exactly like the reference
(rows = y, SolutionsManagers.py:153-155,233), so coefficient vectors are
interchangeable with the reference's.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def cell_grid(a: jnp.ndarray, N: int) -> jnp.ndarray:
    """Expand per-block coefficients ``(..., nrb, ncb)`` to the per-cell grid
    ``(..., nrb*N, ncb*N)`` (each block is N x N cells)."""
    a = jnp.asarray(a)
    return jnp.repeat(jnp.repeat(a, N, axis=-2), N, axis=-1)


class StencilCoefficients(NamedTuple):
    """Edge weights of the 5-point stencil on the interior vertex grid.

    All arrays have shape ``(..., R-1, C-1)`` where ``R = nrb*N`` and
    ``C = ncb*N`` are the cell-grid dimensions; entry ``[i-1, j-1]``
    corresponds to interior vertex ``(i, j)`` of the full vertex grid.
    """

    wE: jnp.ndarray
    wW: jnp.ndarray
    wS: jnp.ndarray
    wN: jnp.ndarray
    diag: jnp.ndarray


def stencil_weights(acell: jnp.ndarray) -> StencilCoefficients:
    """Edge weights from the cell-coefficient grid ``(..., R, C)``."""
    aSE = acell[..., 1:, 1:]
    aNE = acell[..., :-1, 1:]
    aSW = acell[..., 1:, :-1]
    aNW = acell[..., :-1, :-1]
    wE = (aSE + aNE) * 0.5
    wW = (aSW + aNW) * 0.5
    wS = (aSE + aSW) * 0.5
    wN = (aNE + aNW) * 0.5
    return StencilCoefficients(wE=wE, wW=wW, wS=wS, wN=wN, diag=wE + wW + wS + wN)


def stencil_weights_split(a: jnp.ndarray, N: int) -> StencilCoefficients:
    """float64 stencil weights built through FLOAT32 expansion + two-sum.

    Expanding the block coefficients to the cell grid and averaging them in
    emulated f64 costs ~12 ms per 1000 paper-config samples on TPU (the
    expansion alone is ~8 ms); the same result is reproduced to ~1e-15
    relative by expanding f32 (hi, lo) halves and reconstructing each edge
    average with an error-free two-sum:

        a = hi + lo (exact split),  hi1+hi2 = s + e (two-sum, exact),
        w = 0.5 * (s + (e + lo1 + lo2))   [f64 only in the final combine]

    Only the final combine touches f64 on the expanded grid (2 ops/plane vs
    the naive ~6), everything else is cheap f32.  The ~1e-15 discrepancy is
    far below the mixed-precision solver's 1e-13 residual floor.
    """
    f64 = a.dtype
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(f64)).astype(jnp.float32)
    chi = cell_grid(hi, N)
    clo = cell_grid(lo, N)

    def corner(c, dr, dc):
        sl_r = slice(1, None) if dr else slice(None, -1)
        sl_c = slice(1, None) if dc else slice(None, -1)
        return c[..., sl_r, sl_c]

    def avg(r1, c1, r2, c2):
        x1, y1 = corner(chi, r1, c1), corner(clo, r1, c1)
        x2, y2 = corner(chi, r2, c2), corner(clo, r2, c2)
        s = x1 + x2
        t = s - x1
        e = (x1 - (s - t)) + (x2 - t)  # exact two-sum error term
        return (s.astype(f64) + (e + (y1 + y2)).astype(f64)) * 0.5

    wE = avg(1, 1, 0, 1)  # (aSE + aNE) / 2
    wW = avg(1, 0, 0, 0)  # (aSW + aNW) / 2
    wS = avg(1, 1, 1, 0)  # (aSE + aSW) / 2
    wN = avg(0, 1, 0, 0)  # (aNE + aNW) / 2
    return StencilCoefficients(wE=wE, wW=wW, wS=wS, wN=wN,
                               diag=wE + wW + wS + wN)


def apply_operator(w: StencilCoefficients, u: jnp.ndarray) -> jnp.ndarray:
    """Apply ``K(a)`` to interior-grid field(s) ``u`` of shape
    ``(..., R-1, C-1)``.  Leading axes of ``w`` and ``u`` broadcast, so a
    single call evaluates any (parameter-batch x vector-batch) combination.
    """
    pad = [(0, 0)] * (u.ndim - 2) + [(1, 1), (1, 1)]
    U = jnp.pad(u, pad)
    return (
        w.diag * u
        - w.wE * U[..., 1:-1, 2:]
        - w.wW * U[..., 1:-1, :-2]
        - w.wS * U[..., 2:, 1:-1]
        - w.wN * U[..., :-2, 1:-1]
    )


def operator_diagonal(w: StencilCoefficients) -> jnp.ndarray:
    """Diagonal of ``K(a)`` on the interior grid (Jacobi preconditioner)."""
    return w.diag


def apply_operator_flat(
    w: StencilCoefficients, x: jnp.ndarray, grid_shape: tuple[int, int]
) -> jnp.ndarray:
    """Apply ``K(a)`` to flattened coefficient vector(s) ``(..., dim)``."""
    u = x.reshape(x.shape[:-1] + grid_shape)
    return apply_operator(w, u).reshape(x.shape)


def _shift(x: jnp.ndarray, axis: int, by: int) -> jnp.ndarray:
    """Zero-fill shift along the last two axes (neighbor lookup)."""
    pad = [(0, 0)] * x.ndim
    if by == -1:
        pad[axis] = (0, 1)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(1, None)
    else:
        pad[axis] = (1, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, -1)
    return jnp.pad(x, pad)[tuple(sl)]


def symmetrized_weights(w: StencilCoefficients):
    """Jacobi-symmetrized operator ``K~ = D^{-1/2} K D^{-1/2}`` as stencil
    weights with *unit diagonal*, plus the scaling ``s = D^{-1/2}``.

    Every entry of ``K~`` is O(1) regardless of the coefficient contrast, so
    the scaled system is faithfully representable (and its matvec accurately
    computable) in float32 — the key to the mixed-precision solve path.
    ``x = s * x~`` and ``r~ = s * r`` convert between the systems.
    """
    import jax

    s = jax.lax.rsqrt(w.diag)
    sE = _shift(s, -1, -1)
    sW = _shift(s, -1, +1)
    sS = _shift(s, -2, -1)
    sN = _shift(s, -2, +1)
    wt = StencilCoefficients(
        wE=w.wE * s * sE,
        wW=w.wW * s * sW,
        wS=w.wS * s * sS,
        wN=w.wN * s * sN,
        diag=jnp.ones_like(w.diag),
    )
    return wt, s

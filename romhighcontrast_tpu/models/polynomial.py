"""Tensor-Lagrange polynomial FOM space on the 2x2 quartered unit square.

Rebuild of the reference's ``SolutionsManagerPolynomial`` +
``init_polynomial_variables`` (src/lib/SolutionsManagers.py:247-364): the
V space is spanned by tensor products of 1D Lagrange polynomials on
sine-spaced nodes, per quarter of ``[0,1]^2`` (2x2 block geometry only), glued
continuously at the quarter interfaces and vanishing on the boundary.  The
diffusion coefficient is constant per quarter, giving a 4-term affine family
``K(a) = sum_s a_s K_s``.

Dimensions are tiny (``vspace_dim = (2q-1)^2``), so everything is dense
batched linear algebra on the MXU.

Documented deviations from the reference (the class is defined but never
exercised by any reference experiment or test, and its ``init`` is broken
with modern scipy):

* the 1D basis is built as the first ``q`` cardinal polynomials on the
  ``q+1`` sine nodes (vanishing at the outer-boundary node) — the intended
  construction; the reference's ``lagrange(points, eye(q))`` raises an
  IndexError (SolutionsManagers.py:353-354).
* the load vector includes the quarter-to-local Jacobian ``1/4`` so the
  space solves the same PDE as :class:`~romhighcontrast_tpu.models.fem.FemSpace`
  (verified by cross-model agreement tests); the reference omits it
  (SolutionsManagers.py:304-312).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from romhighcontrast_tpu.config import default_dtype
from romhighcontrast_tpu.ops import solvers


def _basis_polynomials(q: int) -> list[np.poly1d]:
    """First q cardinal Lagrange polynomials on the q+1 sine-spaced nodes of
    [0, 1]; cardinal node order matches the reference (node 0 = quarter
    center), all vanish at node q = 1 (Dirichlet boundary)."""
    nodes = (1 + np.sin(np.linspace(-np.pi / 2, np.pi / 2, q + 1))) / 2
    polys = []
    for k in range(q):
        w = np.zeros(q + 1)
        w[k] = 1.0
        # Newton-free cardinal polynomial: product form, numerically fine for
        # the small degrees used here.
        p = np.poly1d([1.0])
        for j in range(q + 1):
            if j != k:
                p = p * np.poly1d([1.0, -nodes[j]]) / (nodes[k] - nodes[j])
        polys.append(p)
    return polys


def _placement_matrices(q: int) -> np.ndarray:
    """P (4, q^2, vspace_dim): place quarter-local tensor dofs into the global
    (2q-1)x(2q-1) grid (reference: SolutionsManagers.py:357-363)."""
    dim_1d = 2 * q - 1
    vdim = dim_1d * dim_1d
    center = q * dim_1d - q  # flat index of the grid midpoint (q-1, q-1)
    P = np.zeros((4, q * q, vdim))
    for i in range(q * q):
        u, v = i // q, i % q  # tensor index (axis-0 dof, axis-1 dof)
        P[0, i, center - v - dim_1d * u] = 1
        P[1, i, center + v - dim_1d * u] = 1
        P[2, i, center - v + dim_1d * u] = 1
        P[3, i, center + v + dim_1d * u] = 1
    return P


class PolynomialSpace:
    """Polynomial FOM space; same batched API surface as :class:`FemSpace`
    where meaningful (solve / norms / evaluate / reduced ops)."""

    def __init__(self, lagrange_polynomials_degree: int):
        q = int(lagrange_polynomials_degree)
        self.lagrange_polynomials_degree = q
        self.quarter_dim = q * q
        self.dim_1d = 2 * q - 1
        self.vspace_dim = self.dim_1d**2
        self.blocks_geometry = (2, 2)
        self.x_domain = (0.0, 1.0)
        self.y_domain = (0.0, 1.0)
        self.dtype = default_dtype()
        self._polys = _basis_polynomials(q)
        self._P = _placement_matrices(q)

        # 1D integrals over the local coordinate t in [0, 1]
        mass = np.zeros((q, q))
        stiff = np.zeros((q, q))
        for i in range(q):
            for j in range(q):
                mass[i, j] = np.polyval(np.polyint(self._polys[i] * self._polys[j]), 1)
                dij = np.polyder(self._polys[i]) * np.polyder(self._polys[j])
                stiff[i, j] = np.polyval(np.polyint(dij), 1)
        # quarter stiffness: grad-x term + grad-y term (the reference's trace
        # contraction einsum("abcdd->abc"), SolutionsManagers.py:314)
        Aq = np.einsum("ij,kl->ikjl", stiff, mass) + np.einsum(
            "ij,kl->ikjl", mass, stiff
        )
        Aq = Aq.reshape(self.quarter_dim, self.quarter_dim)
        # high-degree poly1d arithmetic leaves O(eps * |coef|) asymmetry in
        # the integrals; the exact operator is symmetric — enforce it
        Aq = 0.5 * (Aq + Aq.T)
        # affine family over the 4 quarters (2D stiffness is scale-invariant)
        fam = np.einsum("sqi,qp,spj->sij", self._P, Aq, self._P)
        fam = 0.5 * (fam + fam.transpose(0, 2, 1))
        self.A_family = jnp.asarray(fam, self.dtype)

        # load vector for f = 1 with the quarter Jacobian 1/4
        bq = np.array(
            [
                np.polyval(np.polyint(self._polys[i // q]), 1)
                * np.polyval(np.polyint(self._polys[i % q]), 1)
                for i in range(self.quarter_dim)
            ]
        )
        self.load = jnp.asarray(
            0.25 * np.einsum("sqi,q->i", self._P, bq), self.dtype
        )

    # ------------------------------------------------------------------ #
    def dense_operator(self, a: jnp.ndarray) -> jnp.ndarray:
        """K(a) (..., vdim, vdim) for quarter coefficients a (..., 4) or
        (..., 2, 2) (row-major quarters: [y<c & x<c, y<c & x>=c, ...])."""
        a = jnp.asarray(a, self.dtype)
        if a.shape[-2:] == (2, 2):
            a = a.reshape(a.shape[:-2] + (4,))
        return jnp.einsum("...s,sij->...ij", a, self.A_family)

    def solve(self, a: jnp.ndarray, rhs: jnp.ndarray | None = None, **_) -> jnp.ndarray:
        K = self.dense_operator(a)
        squeeze = K.ndim == 2
        if squeeze:
            K = K[None]
        out = solvers.solve_cholesky(K, self.load if rhs is None else rhs)
        return out[0] if squeeze else out

    generate_solutions = solve

    # ------------------------------------------------------------------ #
    def h10_norm(self, solutions: jnp.ndarray) -> jnp.ndarray:
        K1 = jnp.sum(self.A_family, axis=0)
        u = jnp.asarray(solutions, self.dtype)
        return jnp.sqrt(jnp.maximum(jnp.einsum("...i,ij,...j->...", u, K1, u), 0.0))

    @staticmethod
    def l2_norm(solutions: jnp.ndarray) -> jnp.ndarray:
        u = jnp.asarray(solutions)
        return jnp.sqrt(jnp.sum(u * u, axis=-1))

    H10norm = h10_norm
    l2norm = l2_norm

    # ------------------------------------------------------------------ #
    def evaluation_matrix(self, points: jnp.ndarray) -> jnp.ndarray:
        """E (m, vdim): P1-free polynomial point evaluation as a linear map
        (reference loop: SolutionsManagers.py:316-343)."""
        pts = np.asarray(points, dtype=np.float64)
        q = self.lagrange_polynomials_degree
        # quarter id s = sx + 2*sy (x >= 0.5 -> sx = 1), reference semantics
        sx = (pts[:, 0] >= 0.5).astype(int)
        sy = (pts[:, 1] >= 0.5).astype(int)
        s = sx + 2 * sy
        # local coordinates: t = |2p - 1|, axes swapped as in the reference
        # (point_in_square = |2p-1|[:, [1, 0]], SolutionsManagers.py:325)
        t0 = np.abs(2 * pts[:, 1] - 1)  # pairs with tensor axis 0 (i // q)
        t1 = np.abs(2 * pts[:, 0] - 1)  # pairs with tensor axis 1 (i % q)
        e0 = np.stack([np.polyval(p, t0) for p in self._polys])  # (q, m)
        e1 = np.stack([np.polyval(p, t1) for p in self._polys])  # (q, m)
        eq = (e0[:, None, :] * e1[None, :, :]).reshape(self.quarter_dim, -1)  # (q^2, m)
        # per-point placement: E[m] = P[s_m].T @ eq[:, m]
        E = np.einsum("mqi,qm->mi", self._P[s], eq)
        return jnp.asarray(E, self.dtype)

    def evaluate_solutions(self, points: jnp.ndarray, solutions: jnp.ndarray
                           ) -> jnp.ndarray:
        E = self.evaluation_matrix(points)
        return jnp.asarray(solutions, self.dtype) @ E.T

    # ------------------------------------------------------------------ #
    def reduced_family(self, V: jnp.ndarray) -> jnp.ndarray:
        V = jnp.asarray(V, self.dtype)
        return jnp.einsum("ki,sij,lj->skl", V, self.A_family, V)

    def reduced_rhs(self, V: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(V, self.dtype) @ self.load

    def forward_reduced(self, a: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
        a = jnp.asarray(a, self.dtype)
        if a.shape[-2:] == (2, 2):
            a = a.reshape(a.shape[:-2] + (4,))
        a = jnp.atleast_2d(a)
        V = jnp.asarray(V, self.dtype)
        if V.shape[0] == 0:
            return jnp.zeros((a.shape[0], self.vspace_dim), self.dtype)
        F = self.reduced_family(V)
        A = jnp.einsum("bs,skl->bkl", a, F)
        c = solvers.solve_small_spd(A, self.reduced_rhs(V))
        return c @ V

    def project(self, solutions: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
        u = jnp.atleast_2d(jnp.asarray(solutions, self.dtype))
        V = jnp.asarray(V, self.dtype)
        if V.shape[0] == 0:
            return jnp.zeros((u.shape[0], self.vspace_dim), self.dtype)
        K1 = jnp.sum(self.A_family, axis=0)
        KV = V @ K1  # K1 symmetric
        G = V @ KV.T
        c = solvers.solve_spd_shared(G, u @ KV.T)
        return c @ V

    generate_fm_solutions = forward_reduced
    project_solutions = project

    def __str__(self) -> str:
        return self.__class__.__name__

"""Independent numpy/scipy reference implementation for golden-value tests.

Deliberately derived from first principles — generic per-triangle P1
assembly from vertex coordinates (not the reference's hardcoded stencil
increments, not the framework's closed-form stencil weights) — so agreement
between all three is a strong mutual check.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


class FemOracle:
    """P1 FEM on the uniform right-triangle mesh over (nrb, ncb) blocks of
    N x N cells on [-ncb/2, ncb/2] x [-nrb/2, nrb/2]."""

    def __init__(self, blocks_geometry, N):
        self.nrb, self.ncb = blocks_geometry
        self.N = N
        self.R = self.nrb * N  # cell rows
        self.C = self.ncb * N  # cell cols
        self.nvr, self.nvc = self.R + 1, self.C + 1  # vertex grid
        self.xs = np.linspace(-self.ncb / 2, self.ncb / 2, self.nvc)
        self.ys = np.linspace(-self.nrb / 2, self.nrb / 2, self.nvr)
        self.dim = (self.R - 1) * (self.C - 1)

        # triangle vertex indices (flat over the full vertex grid, row-major)
        def vid(i, j):
            return i * self.nvc + j

        ii, jj = np.meshgrid(np.arange(self.R), np.arange(self.C), indexing="ij")
        ii, jj = ii.ravel(), jj.ravel()
        lower = np.stack([vid(ii, jj), vid(ii, jj + 1), vid(ii + 1, jj)], axis=1)
        upper = np.stack(
            [vid(ii + 1, jj + 1), vid(ii + 1, jj), vid(ii, jj + 1)], axis=1
        )
        self.tris = np.concatenate([lower, upper], axis=0)
        self.tri_cell = np.concatenate([np.stack([ii, jj], 1)] * 2, axis=0)

        # interior vertex mask and renumbering
        interior = np.zeros((self.nvr, self.nvc), dtype=bool)
        interior[1:-1, 1:-1] = True
        self.interior = interior.ravel()
        self.renum = -np.ones(self.nvr * self.nvc, dtype=int)
        self.renum[self.interior] = np.arange(self.dim)

        # per-triangle geometry
        vx = self.xs[self.tris % self.nvc]
        vy = self.ys[self.tris // self.nvc]
        x0, x1, x2 = vx.T
        y0, y1, y2 = vy.T
        det = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        self.area = np.abs(det) / 2
        # gradients of barycentric coordinates
        gx = np.stack([(y1 - y2), (y2 - y0), (y0 - y1)], axis=1) / det[:, None]
        gy = np.stack([(x2 - x1), (x0 - x2), (x1 - x0)], axis=1) / det[:, None]
        # local stiffness (ntri, 3, 3) without coefficient
        self.Sloc = (
            gx[:, :, None] * gx[:, None, :] + gy[:, :, None] * gy[:, None, :]
        ) * self.area[:, None, None]

    def cell_coefficients(self, a):
        a = np.asarray(a)
        acell = np.repeat(np.repeat(a, self.N, axis=0), self.N, axis=1)
        return acell[self.tri_cell[:, 0], self.tri_cell[:, 1]]

    def stiffness(self, a) -> sp.csr_matrix:
        atri = self.cell_coefficients(a)
        S = self.Sloc * atri[:, None, None]
        rows = np.repeat(self.tris, 3, axis=1).ravel()
        cols = np.tile(self.tris, (1, 3)).ravel()
        K = sp.coo_matrix(
            (S.ravel(), (rows, cols)),
            shape=(self.nvr * self.nvc,) * 2,
        ).tocsr()
        K = K[self.interior][:, self.interior]
        return K

    def load(self) -> np.ndarray:
        b = np.zeros(self.nvr * self.nvc)
        np.add.at(b, self.tris.ravel(), np.repeat(self.area / 3, 3))
        return b[self.interior]

    def solve(self, a) -> np.ndarray:
        return spla.spsolve(self.stiffness(a).tocsc(), self.load())

    def h10_norm(self, u, a=None) -> np.ndarray:
        a = np.ones((self.nrb, self.ncb)) if a is None else a
        K = self.stiffness(a)
        u = np.atleast_2d(u)
        return np.sqrt(np.einsum("ki,ki->k", u, u @ K.T))

    def evaluate(self, points, solutions) -> np.ndarray:
        """Pointwise P1 evaluation, direct per-point triangle search."""
        solutions = np.atleast_2d(solutions)
        full = np.zeros((len(solutions), self.nvr, self.nvc))
        full[:, 1:-1, 1:-1] = solutions.reshape(-1, self.R - 1, self.C - 1)
        out = np.zeros((len(solutions), len(points)))
        hx = self.xs[1] - self.xs[0]
        hy = self.ys[1] - self.ys[0]
        for m, (x, y) in enumerate(np.asarray(points)):
            j = min(max(int((x - self.xs[0]) // hx), 0), self.C - 1)
            i = min(max(int((y - self.ys[0]) // hy), 0), self.R - 1)
            qx = (x - self.xs[j]) / hx
            qy = (y - self.ys[i]) / hy
            if qx + qy < 1:
                w = [(i, j, 1 - qx - qy), (i, j + 1, qx), (i + 1, j, qy)]
            else:
                w = [
                    (i + 1, j + 1, qx + qy - 1),
                    (i + 1, j, 1 - qx),
                    (i, j + 1, 1 - qy),
                ]
            for wi, wj, wv in w:
                out[:, m] += wv * full[:, wi, wj]
        return out

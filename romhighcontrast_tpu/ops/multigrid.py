"""Geometric multigrid V-cycle preconditioner for the stencil system.

STATUS: measured and deliberately NOT wired into the public solve API.
At the paper config with contrast 1e10, V-cycle-preconditioned CG needs 46
iterations to 1e-4 (vs 207 for plain CG on the symmetrized system), but each
V-cycle costs ~8 matvec-equivalents — a net ~2x slowdown; the standalone
V-cycle iteration stalls outright (convergence factor ~0.99) because the
coarse grids cannot represent the D^{1/2}-warped low modes of the scaled
operator and 2x2 arithmetic cell averaging smears the contrast interfaces.
The production fast path uses in-kernel Chebyshev polynomial preconditioning
instead (ops/pallas_cg_v2.py); see docs/ROADMAP.md for the full measurement
ledger.  Kept as a tested experiment (tests/test_multigrid.py) — at LOW
contrast and fine meshes it behaves as textbook MG and may become relevant
for future mesh-refinement studies.

Design:
  * level hierarchy by 2x2 cell-coefficient averaging (exact inside blocks;
    smears at block interfaces once levels stop aligning — acceptable for a
    preconditioner wrapped in CG);
  * all level operators kept in the *Jacobi-symmetrized* form (unit
    diagonal), with per-level scalings ``s_l = diag(K_l)^{-1/2}`` used to
    move residuals/corrections between the scaled spaces — this keeps every
    quantity O(1) in f32 at any contrast;
  * smoothing: damped Richardson on the scaled system (x += w * r, the
    scaled Jacobi), w = 0.6 (lambda_max(K~) <= 2 by Gershgorin);
  * transfers: vertex-grid full-weighting restriction / bilinear
    prolongation (coarse vertices = odd-index fine vertices);
  * coarsest level: a fixed number of smoothing sweeps (keeps the
    preconditioner a fixed linear operator).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from romhighcontrast_tpu.ops import stencil as st


class MGLevel(NamedTuple):
    wt: st.StencilCoefficients  # symmetrized weights, unit diagonal
    s: jnp.ndarray  # diag(K)^{-1/2} on this level's interior grid


def coarsen_cells(acell: jnp.ndarray) -> jnp.ndarray:
    """2x2 arithmetic cell-coefficient averaging ``(..., R, C) -> (..., R/2, C/2)``."""
    return 0.25 * (
        acell[..., ::2, ::2]
        + acell[..., 1::2, ::2]
        + acell[..., ::2, 1::2]
        + acell[..., 1::2, 1::2]
    )


def build_hierarchy(acell: jnp.ndarray, min_cells: int = 4, dtype=jnp.float32):
    """Level list from the fine cell-coefficient grid (batched)."""
    levels = []
    a = acell
    while True:
        w = st.stencil_weights(a)
        wt, s = st.symmetrized_weights(w)
        levels.append(
            MGLevel(
                wt=st.StencilCoefficients(*(x.astype(dtype) for x in wt)),
                s=s.astype(dtype),
            )
        )
        R, C = a.shape[-2:]
        if R % 2 or C % 2 or min(R, C) // 2 < min_cells:
            break
        a = coarsen_cells(a)
    return levels


def _restrict(r):
    """Full-weighting on interior grids: coarse (m, n) from fine
    (2m+1, 2n+1).  Implemented via zero-padded shifts."""
    pad = [(0, 0)] * (r.ndim - 2) + [(1, 1), (1, 1)]
    R = jnp.pad(r, pad)

    def sl(di, dj):
        # value at fine vertex (2I+1+di, 2J+1+dj) for coarse (I, J):
        # padded index offset: +1
        return R[..., 1 + 1 + di :: 2, 1 + 1 + dj :: 2][
            ..., : (r.shape[-2] - 1) // 2, : (r.shape[-1] - 1) // 2
        ]

    out = 4.0 * sl(0, 0)
    for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        out = out + 2.0 * sl(di, dj)
    for di, dj in [(-1, -1), (-1, 1), (1, -1), (1, 1)]:
        out = out + sl(di, dj)
    return out / 16.0


def _prolong(e, fine_shape):
    """Bilinear prolongation: coarse (m, n) -> fine (2m+1, 2n+1)."""
    m, n = e.shape[-2:]
    fm, fn = fine_shape
    assert fm == 2 * m + 1 and fn == 2 * n + 1
    pad = [(0, 0)] * (e.ndim - 2) + [(1, 1), (1, 1)]
    E = jnp.pad(e, pad)  # coarse with zero boundary ring
    out = jnp.zeros(e.shape[:-2] + fine_shape, e.dtype)
    # coincident fine vertices (odd, odd)
    out = out.at[..., 1::2, 1::2].set(e)
    # fine vertices on coarse horizontal edges (odd row, even col)
    horiz = 0.5 * (E[..., 1:-1, :-1] + E[..., 1:-1, 1:])  # (m, n+1)
    out = out.at[..., 1::2, 0::2].set(horiz)
    # vertical edges (even row, odd col)
    vert = 0.5 * (E[..., :-1, 1:-1] + E[..., 1:, 1:-1])  # (m+1, n)
    out = out.at[..., 0::2, 1::2].set(vert)
    # cell centers (even, even)
    cent = 0.25 * (
        E[..., :-1, :-1] + E[..., :-1, 1:] + E[..., 1:, :-1] + E[..., 1:, 1:]
    )
    out = out.at[..., 0::2, 0::2].set(cent)
    return out


def v_cycle(levels, r0, pre: int = 2, post: int = 2, coarse_sweeps: int = 16,
            omega: float = 0.6):
    """One symmetric V-cycle on the scaled fine residual ``r0``; returns the
    scaled correction.  Fixed linear operator (no inner dots), safe as a CG
    preconditioner."""

    def smooth(wt, x, b, sweeps):
        for _ in range(sweeps):
            x = x + omega * (b - st.apply_operator(wt, x))
        return x

    def cycle(l, b):
        wt = levels[l].wt
        if l == len(levels) - 1:
            return smooth(wt, jnp.zeros_like(b), b, coarse_sweeps)
        x = smooth(wt, jnp.zeros_like(b), b, pre)
        resid = b - st.apply_operator(wt, x)
        # move to the coarse scaled space: unscale (r = r~/s), restrict,
        # rescale (b_c~ = s_c * r_c)
        r_uns = resid / jnp.maximum(levels[l].s, 1e-30)
        rc = _restrict(r_uns)
        bc = levels[l + 1].s * rc
        ec = cycle(l + 1, bc)
        # back to fine: scale out, prolong, scale in
        e_uns = levels[l + 1].s * ec
        ef = _prolong(e_uns, b.shape[-2:])
        x = x + ef / jnp.maximum(levels[l].s, 1e-30)
        x = smooth(wt, x, b, post)
        return x

    return cycle(0, r0)

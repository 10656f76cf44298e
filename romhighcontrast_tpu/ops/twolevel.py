"""Two-level coarse space for the fused mixed-precision CG path.

The Jacobi-symmetrized operator ``K~ = D^{-1/2} K D^{-1/2}`` has a
contrast-independent spectrum for stiff boundary-touching inclusions, but its
lower end is still the smooth-mode tail ``lambda_min ~ (pi h)^2 / 2`` — at the
paper grid that is kappa ~ 2.6e3 and ~200 CG matvecs per 4 decades.  The
low modes of ``K~`` are exactly ``D^{1/2} v`` with ``v`` a low-energy mode of
``K`` (smooth, near-constant on stiff blocks), so a *warped* geometric coarse
space

    W = D^{1/2} P,    P = bilinear interpolation from a coarse vertex grid

captures them at ANY contrast — the warp is built into the space instead of
being (unrepresentably) left to plain geometric coarse grids, which is
precisely why classic multigrid failed here (docs/ROADMAP.md, do-not-retry).

The coarse Gram ``G = W^T K~ W = P^T K P`` is the coarse Galerkin FEM matrix
of the *original* coefficient field: a per-sample 9-point stencil on the
coarse vertex grid.  This module assembles its 9 bands with separable
row/column contractions (the bilinear hats factor as ``hr(i) * hc(j)``), so
setup is a handful of small MXU matmuls per sample instead of m stencil
applies.

Measured effect (CPU prototype, paper config, contrast 1e10, f32): additive
``z = Cheb_deg3(r) + W Ghat^{-1} W^T r`` cuts the inner solve from
18 outer x 13 matvecs = 234 to 11 outer x 4 matvecs = 44; an inexact coarse
solve by 4 Chebyshev sweeps on the Jacobi-normalized ``Ghat`` costs only +1
outer iteration (the coarse spectrum sits in [6e-3, 1.5], and the
out-of-window tail is absorbed by the outer CG like the fine window's).

Reference equivalent being replaced: none — the reference pays dense LU per
sample (src/lib/SolutionsManagers.py:17-40); this is TPU-side iteration
economics for the same solve.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from romhighcontrast_tpu.ops import stencil as st


def coarse_stride(n: int) -> int:
    """Default 1D coarse stride for ``n`` interior fine vertices.

    Targets ~15 coarse nodes per dim (coarse cost saturates there while the
    deflated cut ``mu ~ (pi * stride * h)^2`` keeps falling), i.e. stride
    ``(n+1)/16``, floored at 2.  At the paper grid (n=79) this is 5 — which
    also aligns coarse nodes with the 20-cell block boundaries (measured to
    matter: stride 8 needs ~2x the outer iterations of stride 5).

    EXCEPT in the mid-size band (100 <= n < 200): the denser ``(n+1)/32``
    coarse grid wins on outer iterations outright.  Measured (interleaved
    TPU sweeps, scripts/sweep_r4_stride.py, 2026-08-19): n=159 stride 5 =
    5,277-5,612 solves/s vs stride 10 = 4,410 at BS=2, and still 6,508 vs
    3,652 at BS=8 where stride 5 DOUBLES the packed coarse tile (so the
    win is iteration counts, not lane accounting).  At n=255 (mesh 64) the
    denser grid LOSES (stride 8 = 1,420-1,618 vs stride 16 = 1,866) —
    density there doubles the coarse rows instead.

    AND the stride is capped at 16: strides past ~16 collapse regardless
    of the (scale-free) nominal spectral design — at n=511 (mesh 128) the
    uncapped stride 32 has ratio 1/16 and fine window [0.116, 2], exactly
    the paper grid's design, yet burns 11,341 mean matvec-equivalents vs
    1,993 at stride 16 (interleaved TPU sweeps 2026-08-20,
    scripts/sweep_r4h_mesh128.py: stride 16 = 247.9 solves/s, stride 24 =
    58.9, stride 32 = 53.2; denser stride 8 also loses, 190.1).  The
    collapse tracks the absolute hat support (32x32-cell warped hats at
    contrast boundaries), not the stride/(n+1) ratio — the same failure
    family as the measured third-level divergence (docs/ROADMAP.md r4
    item 5).  Every measured optimum lies in stride [5, 16].
    """
    if 100 <= n < 200:
        return max(2, int(round((n + 1) / 32)))
    return max(2, min(16, int(round((n + 1) / 16))))


def hat_matrix(n: int, stride: int) -> np.ndarray:
    """1D bilinear hat values ``(m1, n)`` on interior fine vertices 1..n
    (0-based array index i holds vertex i+1), nodes at stride, 2*stride, ...

    Hats truncated by the far boundary are kept — any independent subspace
    yields a valid SPD two-level preconditioner; alignment only affects
    quality.
    """
    nodes = np.arange(stride, n + 1, stride)
    coords = np.arange(1, n + 1)
    hats = np.maximum(
        0.0, 1.0 - np.abs(coords[None, :] - nodes[:, None]) / stride
    )
    return hats.astype(np.float32)


class CoarseOperator(NamedTuple):
    """Per-sample Jacobi-normalized coarse 9-point stencil.

    bands: ``(..., 3, 3, m1r, m1c)`` — band ``[dp+1, dq+1]`` holds the
      normalized coupling ``Ghat[(p, q), (p+dp, q+dq)]`` (signed; the
      diagonal band ``[1, 1]`` is identically 1 where the node exists).
    sg: ``(..., m1r, m1c)`` — ``diag(G)^{-1/2}``, the normalization scale
      (coarse-vector side: restrict -> *sg -> solve Ghat -> *sg -> prolong).
    """

    bands: jnp.ndarray
    sg: jnp.ndarray


def _pair_stack(h: np.ndarray, shift: int) -> np.ndarray:
    """Stack ``A[(d, p), i] = h[p, i] * h_shifted[p + d - 1, i + shift]`` for
    d in {0, 1, 2} (i.e. dp in {-1, 0, +1}), zero where out of range.

    ``shift`` moves the *second* hat's evaluation point (the neighbor term
    ``u(i +/- 1, j)`` of the fine stencil).
    """
    m1, n = h.shape
    hs = np.zeros_like(h)
    if shift == 0:
        hs = h
    elif shift == 1:
        hs[:, :-1] = h[:, 1:]  # evaluates at i+1
    else:
        hs[:, 1:] = h[:, :-1]  # evaluates at i-1
    out = np.zeros((3, m1, n), np.float32)
    for d, dp in enumerate((-1, 0, 1)):
        lo, hi = max(0, -dp), min(m1, m1 - dp)
        out[d, lo:hi] = h[lo:hi] * hs[lo + dp : hi + dp]
    return out.reshape(3 * m1, n)


@partial(jax.jit, static_argnames=("stride_r", "stride_c"))
def assemble_coarse_raw(w: st.StencilCoefficients, stride_r: int,
                        stride_c: int) -> jnp.ndarray:
    """UNNORMALIZED coarse Galerkin bands ``G = P^T K P`` for fine stencil
    weights ``w`` (the UNSCALED ``K``; shapes ``(..., nr, nc)``); returns
    ``(..., 3, 3, m1r, m1c)`` signed band values.

    ``G_(pq),(p'q') = sum_ij P_pq(i,j) (K P_p'q')(i,j)`` expands into five
    separable terms (diag + 4 neighbor shifts), each a small
    ``(3 m1r, nr) @ (nr, nc) @ (nc, 3 m1c)`` matmul chain per sample.
    """
    nr, nc = w.diag.shape[-2:]
    hr = hat_matrix(nr, stride_r)
    hc = hat_matrix(nc, stride_c)
    m1r, m1c = hr.shape[0], hc.shape[0]

    R0 = jnp.asarray(_pair_stack(hr, 0))
    RS = jnp.asarray(_pair_stack(hr, 1))   # second hat at i+1 (wS term)
    RN = jnp.asarray(_pair_stack(hr, -1))  # second hat at i-1 (wN term)
    C0 = jnp.asarray(_pair_stack(hc, 0))
    CE = jnp.asarray(_pair_stack(hc, 1))   # second hat at j+1 (wE term)
    CW = jnp.asarray(_pair_stack(hc, -1))  # second hat at j-1 (wW term)

    dt = w.diag.dtype

    def contract(R, field, C):
        t1 = jnp.einsum("Pi,...ij->...Pj", R.astype(dt), field)
        return jnp.einsum("...Pj,Qj->...PQ", t1, C.astype(dt))

    pairs = (
        contract(R0, w.diag, C0)
        - contract(R0, w.wE, CE)
        - contract(R0, w.wW, CW)
        - contract(RS, w.wS, C0)
        - contract(RN, w.wN, C0)
    )
    # (..., 3*m1r, 3*m1c) -> (..., 3, m1r, 3, m1c) -> (..., 3, 3, m1r, m1c)
    batch = pairs.shape[:-2]
    return jnp.moveaxis(pairs.reshape(batch + (3, m1r, 3, m1c)), -2, -3)


def normalize_bands(bands: jnp.ndarray) -> CoarseOperator:
    """Jacobi-normalize raw 9-point bands ``(..., 3, 3, m, m)`` into a
    :class:`CoarseOperator` (unit diagonal, ``sg = diag^{-1/2}``)."""
    diag = bands[..., 1, 1, :, :]
    sg = jax.lax.rsqrt(jnp.where(diag > 0, diag, 1.0))
    sgE = {}
    for dp in (-1, 0, 1):
        for dq in (-1, 0, 1):
            sgE[(dp, dq)] = _shift2(sg, dp, dq)
    norm = jnp.stack(
        [
            jnp.stack(
                [bands[..., dp + 1, dq + 1, :, :] * sg * sgE[(dp, dq)]
                 for dq in (-1, 0, 1)],
                axis=-3,
            )
            for dp in (-1, 0, 1)
        ],
        axis=-4,
    )
    return CoarseOperator(bands=norm, sg=sg)


@partial(jax.jit, static_argnames=("stride_r", "stride_c"))
def assemble_coarse(w: st.StencilCoefficients, stride_r: int, stride_c: int
                    ) -> CoarseOperator:
    """Assemble the normalized coarse operator for fine stencil weights ``w``
    (the UNSCALED ``K``; shapes ``(..., nr, nc)``)."""
    return normalize_bands(assemble_coarse_raw(w, stride_r, stride_c))


@partial(jax.jit, static_argnames=("stride_r", "stride_c"))
def coarsen_bands(bands: jnp.ndarray, stride_r: int, stride_c: int
                  ) -> jnp.ndarray:
    """Galerkin-coarsen raw 9-point bands: ``G2 = P2^T G P2`` with bilinear
    hats of ``stride`` on the COARSE INDEX grid; returns raw level-2 bands
    ``(..., 3, 3, m2r, m2c)``.

    The recursion mirrors level 1 exactly: the normalized ``Ghat = Sg G Sg``
    has unit diagonal and its low modes are ``Sg^{-1} (smooth coarse
    vectors)``, so the warped level-2 space is ``W2 = Sg^{-1} P2 Sg2`` and
    ``W2^T Ghat W2 = Sg2 (P2^T G P2) Sg2`` — the normalized Galerkin
    coarsening of the UNNORMALIZED ``G``.  That is what makes a third level
    a pure repeat of the second (see pallas_cg_2l's kernel).
    """
    m1r, m1c = bands.shape[-2:]
    hr2 = hat_matrix(m1r, stride_r)
    hc2 = hat_matrix(m1c, stride_c)
    m2r, m2c = hr2.shape[0], hc2.shape[0]
    dt = bands.dtype
    pairs = None
    for dp in (-1, 0, 1):
        R = jnp.asarray(_pair_stack(hr2, dp)).astype(dt)  # (3 m2r, m1r)
        for dq in (-1, 0, 1):
            C = jnp.asarray(_pair_stack(hc2, dq)).astype(dt)
            band = bands[..., dp + 1, dq + 1, :, :]
            t1 = jnp.einsum("Pp,...pq->...Pq", R, band)
            term = jnp.einsum("...Pq,Qq->...PQ", t1, C)
            pairs = term if pairs is None else pairs + term
    batch = pairs.shape[:-2]
    return jnp.moveaxis(pairs.reshape(batch + (3, m2r, 3, m2c)), -2, -3)


def _shift2(x: jnp.ndarray, dp: int, dq: int) -> jnp.ndarray:
    """Zero-fill shift: result[p, q] = x[p + dp, q + dq] (0 outside)."""
    out = x
    if dp:
        out = st._shift(out, -2, -1 if dp > 0 else 1)
    if dq:
        out = st._shift(out, -1, -1 if dq > 0 else 1)
    return out


def coarse_gram_dense(w: st.StencilCoefficients, stride_r: int, stride_c: int
                      ) -> jnp.ndarray:
    """Dense ``G = P^T K P`` (oracle/testing; ``(..., m, m)``)."""
    nr, nc = w.diag.shape[-2:]
    hr = hat_matrix(nr, stride_r)
    hc = hat_matrix(nc, stride_c)
    P = jnp.asarray(
        np.einsum("pi,qj->pqij", hr, hc).reshape(-1, nr, nc), w.diag.dtype
    )
    KP = st.apply_operator(
        st.StencilCoefficients(*(x[..., None, :, :] for x in w)), P
    )
    return jnp.einsum("kij,...lij->...kl", P, KP)

"""Stiff-cluster coarse space: the contrast-induced near-null modes.

For a connected component C of high-contrast blocks that does NOT touch the
Dirichlet boundary, the vector ``1_C`` (one on every vertex of the closed
region, zero elsewhere) has energy ``1_C^T K 1_C = O(perimeter)`` (only the
O(1)-weight edges leaving the region contribute) while its diagonal-weighted
norm is ``O(contrast * area)`` — a generalized eigenvalue ``~ 1/contrast``
of the Jacobi-symmetrized operator (measured: lambda_min ~ 1e-12 at contrast
1e10).  float32 cannot resolve such modes, so the mixed-precision solver must
handle them exactly: a rank-k coarse solve over the cluster indicators in the
float64 refinement loop (ops.solvers.solve_pcg_mixed) removes precisely the
components the f32 inner CG amplifies by 1/lambda.

Labels are computed on host (the coefficients are concrete at solve() time);
the device-side operators are one scatter-add / gather per application.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

#: coefficients >= STIFF_THRESHOLD are "stiff" for preconditioning purposes
#: (modes with lambda ~ 1/a matter once 1/a is below the f32 resolution; the
#: classification only affects preconditioning quality, never correctness)
STIFF_THRESHOLD = 1e5


def cluster_labels(a: jnp.ndarray, N: int, threshold: float = STIFF_THRESHOLD
                   ) -> jnp.ndarray:
    """Per-sample vertex labels of connected stiff-block components.

    Pure-jnp (traceable: works inside jit with data-dependent coefficients).
    Component labeling by max-label propagation over the tiny (nrb, ncb)
    block grid — nrb*ncb sweeps guarantee convergence.  Labels are NOT
    compacted (values are arbitrary in 1..nrb*ncb); the coarse-space code
    uses the static ``k = nrb*ncb`` bin count, and empty bins get identity
    rows in the Gram.

    Args:
      a: block coefficients ``(b, nrb, ncb)``.
      N: cells per block per dimension.

    Returns ``labels (b, nri, nci)`` int32, 0 = no cluster; a vertex belongs
    to a cluster if ANY of its four incident cells does.
    """
    a = jnp.asarray(a)
    b, nrb, ncb = a.shape
    stiff = a >= threshold
    Q = nrb * ncb
    seed = jnp.arange(1, Q + 1, dtype=jnp.int32).reshape(nrb, ncb)
    lab = jnp.where(stiff, seed, 0)

    def sweep(_, lab):
        p = jnp.pad(lab, ((0, 0), (1, 1), (1, 1)))
        nb = jnp.maximum(
            jnp.maximum(p[:, :-2, 1:-1], p[:, 2:, 1:-1]),
            jnp.maximum(p[:, 1:-1, :-2], p[:, 1:-1, 2:]),
        )
        return jnp.where(stiff, jnp.maximum(lab, nb), 0)

    lab = jax.lax.fori_loop(0, Q, sweep, lab)
    # drop components touching the domain boundary: their cluster mode is
    # killed by the Dirichlet condition (lambda stays O(1), measured), so
    # treating them would only waste coarse-space bins
    edge = jnp.zeros((nrb, ncb), bool).at[0, :].set(True).at[-1, :].set(True)
    edge = edge.at[:, 0].set(True).at[:, -1].set(True)
    lab_edge = jnp.where(edge, lab, 0)
    bi = jnp.broadcast_to(jnp.arange(b)[:, None, None], lab.shape)
    boundary_flag = (
        jnp.zeros((b, Q + 1), jnp.int32).at[bi, lab_edge].set(1)
    )
    lab = jnp.where(boundary_flag[bi, lab] > 0, 0, lab)
    # block labels -> cell labels -> vertex labels (max of incident cells)
    cell = jnp.repeat(jnp.repeat(lab, N, axis=-2), N, axis=-1)
    v = jnp.maximum(
        jnp.maximum(cell[:, :-1, :-1], cell[:, 1:, :-1]),
        jnp.maximum(cell[:, :-1, 1:], cell[:, 1:, 1:]),
    )
    return v.astype(jnp.int32)


def cluster_labels_host(a, N: int, threshold: float = STIFF_THRESHOLD):
    """Host-side (scipy) variant of :func:`cluster_labels` with COMPACT label
    values: returns ``(labels (b, nri, nci) int32, k_max)`` where labels take
    values ``1..k_max`` per sample and boundary-touching components are
    dropped.  Compact values let the solver run ``k_max`` masked passes
    (typically 1-4) instead of the static ``nrb*ncb`` bound."""
    import numpy as np
    from scipy import ndimage

    a = np.asarray(a)
    a = a.reshape((-1,) + a.shape[-2:])
    b, nrb, ncb = a.shape
    nri, nci = nrb * N - 1, ncb * N - 1
    labels = np.zeros((b, nri, nci), np.int32)
    kmax = 0
    for i in range(b):
        stiff = a[i] >= threshold
        lab, ncomp = ndimage.label(stiff)
        nxt = 0
        out = np.zeros_like(lab)
        for c in range(1, ncomp + 1):
            comp = lab == c
            touches = (
                comp[0, :].any() or comp[-1, :].any()
                or comp[:, 0].any() or comp[:, -1].any()
            )
            if not touches:
                nxt += 1
                out[comp] = nxt
        kmax = max(kmax, nxt)
        if nxt == 0:
            continue
        cell = np.kron(out, np.ones((N, N), np.int32))
        labels[i] = np.maximum(
            np.maximum(cell[:-1, :-1], cell[1:, :-1]),
            np.maximum(cell[:-1, 1:], cell[1:, 1:]),
        )
    return labels, kmax


def has_interior_cluster(a, threshold: float = STIFF_THRESHOLD):
    """Host-side check: which samples have a stiff component that does not
    touch the domain boundary?  (Routing hint: such samples need the deflated
    solver path.)  Raises if ``a`` is traced — callers treat that as
    'unknown' and take the safe path.

    Returns a per-sample bool array ``(b,)``; use ``.any()`` for the batch
    verdict (the array is falsy-compatible only through ``any``, so callers
    doing ``if has_interior_cluster(a):`` keep working for one sample).

    Fully vectorised over the batch (boundary-seeded dilation inside the
    stiff mask on the tiny block grid) — the earlier per-sample
    ``scipy.ndimage`` loop cost ~30 ms per 1000 samples on this host's
    single core, a measurable slice of a batch solve."""
    import numpy as np

    a = np.asarray(a)  # raises TracerArrayConversionError under tracing
    a = a.reshape((-1,) + a.shape[-2:])
    b, nrb, ncb = a.shape
    stiff = a >= threshold
    if not stiff.any():
        return np.zeros(b, bool)
    # cells reachable from the boundary ring without leaving the stiff mask
    reach = stiff.copy()
    reach[:, 1:-1, 1:-1] = False
    for _ in range(nrb * ncb):  # graph diameter bound
        grown = reach.copy()
        grown[:, 1:, :] |= reach[:, :-1, :]
        grown[:, :-1, :] |= reach[:, 1:, :]
        grown[:, :, 1:] |= reach[:, :, :-1]
        grown[:, :, :-1] |= reach[:, :, 1:]
        grown &= stiff
        if (grown == reach).all():
            break
        reach = grown
    return (stiff & ~reach).reshape(b, -1).any(axis=1)


def harmonic_deflation_basis(w, labels: jnp.ndarray, k: int,
                             tol: float = 1e-12, maxiter: int = 4000):
    """Harmonic-extension-enriched deflation vectors, ``X (b, k, nr, nc)``.

    The true contrast-induced near-null mode of cluster C is NOT the flat
    indicator ``1_C`` (which jumps to zero across the interface) but its
    discrete harmonic extension: 1 on C, K-harmonic on the complement, 0 on
    the Dirichlet boundary — the minimizer of ``u^T K u`` subject to
    ``u|_C = 1``.  The indicator approximates that eigenvector only to O(1)
    in the exterior, which leaves a residual near-null component whose
    1/lambda amplification sets the deflated solver's emulated-f64 accuracy
    floor (~1e-3 true relative residual on TPU, measured round 3).  The
    harmonic extension matches the eigenvector to O(1/contrast), so the
    deflated operator's effective condition number collapses to the
    Jacobi-PCG class.

    Construction (per cluster c): solve the exterior Dirichlet problem

        K_FF v = K_FC 1_c   on free vertices,  u_c = 1_c + v

    with the SAME 5-point stencil machinery: cluster rows become identity
    rows, edges into any cluster vertex are dropped from the free rows (they
    move to the rhs), boundary-touching stiff blocks stay in K_FF where
    plain Jacobi-PCG is contrast-robust (every stiff component of K_FF
    touches a Dirichlet surface — the domain boundary or the cluster).

    Returns the stacked basis; empty label bins yield exact zero vectors
    (handled by the Gram's identity fill downstream).
    """
    from romhighcontrast_tpu.ops import solvers
    from romhighcontrast_tpu.ops import stencil as st

    dt = w.diag.dtype
    m = (labels > 0).astype(dt)
    free = 1.0 - m
    # mask value at each neighbor (zero-fill: the domain boundary is not a
    # cluster, so its edges keep their weights — Dirichlet is already built
    # into the stencil)
    mE = st._shift(m, -1, -1)
    mW = st._shift(m, -1, +1)
    mS = st._shift(m, -2, -1)
    mN = st._shift(m, -2, +1)
    wext = st.StencilCoefficients(
        wE=w.wE * free * (1.0 - mE),
        wW=w.wW * free * (1.0 - mW),
        wS=w.wS * free * (1.0 - mS),
        wN=w.wN * free * (1.0 - mN),
        # free rows keep the ORIGINAL diagonal (the dropped cluster edges
        # act as Dirichlet terms); cluster rows become identity
        diag=jnp.where(m > 0, jnp.ones_like(w.diag), w.diag),
    )
    cols = []
    for c in range(1, k + 1):
        ind = (labels == c).astype(dt)
        rhs = free * (
            w.wE * st._shift(ind, -1, -1) + w.wW * st._shift(ind, -1, +1)
            + w.wS * st._shift(ind, -2, -1) + w.wN * st._shift(ind, -2, +1)
        ) + ind
        u, _ = solvers.solve_pcg(wext, rhs, tol=tol, maxiter=maxiter)
        cols.append(u)
    return jnp.stack(cols, axis=-3)


def segment_sum(labels: jnp.ndarray, r: jnp.ndarray, k: int) -> jnp.ndarray:
    """``X^T r``: per-cluster sums, ``(b, k)`` (cluster c = label c+1).

    Implemented as k fused masked reductions.  Neither a batched scatter-add
    nor a 4D one-hot einsum survives on the TPU at the paper scale in
    emulated f64 (both measured to fault the runtime with
    ``UNAVAILABLE: TPU device error``); per-cluster masked sums keep every
    intermediate at the (b, nr, nc) working-set size."""
    cols = [
        jnp.sum(jnp.where(labels == c, r, 0.0), axis=(-2, -1))
        for c in range(1, k + 1)
    ]
    return jnp.stack(cols, axis=-1)


def expand(labels: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """``X y``: per-cluster values back onto the grid, ``(b, nr, nc)``
    (k masked accumulations; see segment_sum for why not gather/one-hot)."""
    k = y.shape[-1]
    out = jnp.zeros(labels.shape, y.dtype)
    for c in range(1, k + 1):
        out = out + jnp.where(labels == c, y[..., c - 1, None, None], 0.0)
    return out


def cluster_gram_chol(w, labels: jnp.ndarray, k: int):
    """Cholesky factor of ``G = X^T K X`` (b, k, k), with identity fill for
    empty clusters (their corrections are forced to zero by the zero rhs)."""
    from romhighcontrast_tpu.ops import stencil as st

    cols = []
    for c in range(k):
        ind = (labels == c + 1).astype(w.diag.dtype)
        Kc = st.apply_operator(w, ind)
        cols.append(segment_sum(labels, Kc, k))  # (b, k)
    G = jnp.stack(cols, axis=-1)  # (b, k_row, k_col)
    G = 0.5 * (G + jnp.swapaxes(G, -1, -2))
    counts = segment_sum(labels, jnp.ones_like(w.diag), k)  # (b, k)
    has = (counts > 0).astype(G.dtype)
    act = has[:, :, None] * has[:, None, :]
    eye = jnp.eye(k, dtype=G.dtype)
    G = G * act
    diag = jnp.where(has > 0, jnp.diagonal(G, axis1=-2, axis2=-1), 1.0)
    G = G * (1.0 - eye) + diag[:, :, None] * eye
    return jnp.linalg.cholesky(G)


def coarse_correct(w, labels: jnp.ndarray, Gchol: jnp.ndarray, r: jnp.ndarray
                   ) -> jnp.ndarray:
    """Exact rank-k correction ``X G^{-1} X^T r`` (b, nr, nc)."""
    rhs = segment_sum(labels, r, Gchol.shape[-1])  # (b, k)
    y = jax.scipy.linalg.cho_solve((Gchol, True), rhs[..., None])[..., 0]
    return expand(labels, y)

"""Batched SPD solvers for the FOM and reduced systems.

The reference solves one system per parameter point through LAPACK
``linalg.solve(assume_a='pos')`` or SuperLU ``spsolve`` inside a (process-)map
(reference: SolutionsManagers.py:17-40,64-68).  Here the whole parameter batch
is one tensor program:

* ``solve_pcg`` — the TPU performance path.  Preconditioned conjugate
  gradients on the 5-point stencil; the matvec is a fused elementwise program
  batched over all parameter points at once.  Preconditioner: Jacobi
  (diagonal) — for *stiff* inclusions (a >= 1 everywhere, contrast up), the
  Jacobi-scaled spectrum is bounded independently of the contrast — optionally
  augmented with an additive coarse correction over the high-contrast block
  indicator space (two-level method) to kill the handful of contrast-induced
  low modes.

* ``solve_cholesky`` — batched dense Cholesky (``jnp.linalg.cholesky`` +
  triangular solves).  Bitwise-robust parity path for small/medium dims.

* ``solve_small_spd`` — batched dense solve for the n x n reduced (online)
  systems, n ~ O(10).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from romhighcontrast_tpu.ops import stencil as st


class PCGInfo(NamedTuple):
    """Solver diagnostics.

    iterations: per-sample ``(batch...,)`` **int32 fine matvec-equivalents**
      — ONE format on every path (unified round 4; the scalar-total and
      ``-1``-sentinel variants are gone):

      * kernel paths (``pallas_v2`` / ``pallas_2l`` / legacy ``pallas``):
        real per-sample kernel iteration counts scaled by the fine matvecs
        each iteration costs (13 for the deg-12 single-level kernel,
        ``deg + 1`` for the two-level kernel, 1 for the legacy plain-CG
        kernel).  Coarse-sweep work (6 sweeps/outer on the two-level path,
        at ~27 ns vs ~49 ns per fine matvec) is *not* included.
      * XLA while-loop paths (``solve_pcg``, the xla mixed inner): active
        iterations counted per sample (1 matvec each; ``solve_pcg_deflated``
        counts 3 per iteration — the balancing preconditioner applies the
        operator twice more).
      * direct paths (Cholesky): zeros.
    relative_residual: (batch,) final ``||b - K x|| / ||b||``.
    """

    iterations: jnp.ndarray  # (batch...,) int32 matvec-equivalents
    relative_residual: jnp.ndarray  # (batch,) final ||b - K x|| / ||b||


def _coarse_setup(w: st.StencilCoefficients, W: jnp.ndarray):
    """Precompute the coarse Gram ``G = W K(a) W^T`` per batch element.

    W: (k, nr, nc) coarse basis on the interior grid (e.g. high-contrast block
    indicators).  Returns Cholesky factors of G, shape (..., k, k).
    """
    # KW[..., k, nr, nc]: apply operator to each coarse vector under each sample
    KW = st.apply_operator(
        st.StencilCoefficients(*(x[..., None, :, :] for x in w)), W
    )
    G = jnp.einsum("kij,...lij->...kl", W, KW)
    return jnp.linalg.cholesky(G)


def _coarse_apply(W: jnp.ndarray, Gchol: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Additive coarse correction ``W^T G^{-1} W r`` (batched)."""
    Wr = jnp.einsum("kij,...ij->...k", W, r)
    y = jax.scipy.linalg.cho_solve((Gchol, True), Wr[..., None])[..., 0]
    return jnp.einsum("...k,kij->...ij", y, W)


def _geo_coarse_setup(w: st.StencilCoefficients, cluster_labels):
    """Explicit inverse of the (masked, normalized) geometric coarse Gram
    for the two-level smoother enrichment of the f64 deflated solver.

    Coarse nodes whose hat support overlaps an interior stiff cluster are
    REMOVED (identity rows/cols, zeroed scale): their directions belong to
    the exact cluster deflation Q, and keeping them makes ``kappa(Ghat)``
    contrast-sized — unfactorable on TPU (no f64 LU; f64 triangular solves
    are ~m sequential steps and measured 60x slower per iteration than a
    dense matvec).  The masked Gram has modest kappa, so: invert in f32
    (supported) and polish with ONE f64 Newton step ``X(2I - GX)`` (dense
    matmuls emulate fine).  Returns ``(hr, hc, sg_masked, Ginv)``.
    """
    from romhighcontrast_tpu.ops import twolevel as tl

    nr, nc = w.diag.shape[-2:]
    sr, sc = tl.coarse_stride(nr), tl.coarse_stride(nc)
    op = tl.assemble_coarse(w, sr, sc)
    m1r, m1c = op.sg.shape[-2:]
    batch = op.sg.shape[:-2]
    dt = w.diag.dtype
    hr = jnp.asarray(tl.hat_matrix(nr, sr), dt)
    hc = jnp.asarray(tl.hat_matrix(nc, sc), dt)

    # node mask: support overlap with cluster vertices (labels > 0)
    lab = (cluster_labels > 0).astype(dt)
    ov = jnp.einsum("pi,...ij,qj->...pq", hr, lab, hc)
    keep = (ov == 0).astype(dt)  # (..., m1r, m1c)
    sg_m = op.sg * keep

    # embed the 9 bands into the dense (m, m) matrix with shift matrices:
    # Gd[.., p, q, p+dp, q+dq] = band[dp, dq][p, q]
    Gd = jnp.zeros(batch + (m1r, m1c, m1r, m1c), dt)
    for dp in (-1, 0, 1):
        for dq in (-1, 0, 1):
            # shift matrices S[p, r] = 1 iff r = p + dp
            Sr = (jnp.arange(m1r)[:, None] + dp
                  == jnp.arange(m1r)[None, :]).astype(dt)
            Sc = (jnp.arange(m1c)[:, None] + dq
                  == jnp.arange(m1c)[None, :]).astype(dt)
            Gd = Gd + jnp.einsum(
                "...pq,pr,qs->...pqrs",
                op.bands[..., dp + 1, dq + 1, :, :], Sr, Sc,
            )
    m = m1r * m1c
    G = Gd.reshape(batch + (m, m))
    kf = keep.reshape(batch + (m,))
    act = kf[..., :, None] * kf[..., None, :]
    eye = jnp.eye(m, dtype=dt)
    G = G * act + eye * (1.0 - act)
    X = jnp.linalg.inv(G.astype(jnp.float32)).astype(dt)
    Ginv = X @ (2.0 * eye - G @ X)  # one Newton polish in f64
    return hr, hc, sg_m, Ginv


def _geo_coarse_apply(hr, hc, sg, Ginv, r):
    """Additive geometric coarse correction ``P G^{-1} P^T r`` (batched,
    separable restriction/prolongation).  A Galerkin projection in the
    K-inner product — spectrum of ``C K`` is {0, 1}, so the enrichment can
    never amplify (no interaction with the cluster deflation needed)."""
    m1r, m1c = sg.shape[-2:]
    batch = r.shape[:-2]
    c1 = jnp.einsum("pi,...ij->...pj", hr, r)
    c = jnp.einsum("...pj,qj->...pq", c1, hc)
    ch = (sg * c).reshape(batch + (m1r * m1c,))
    y = jnp.einsum("...kl,...l->...k", Ginv, ch)
    y2 = sg * y.reshape(batch + (m1r, m1c))
    z1 = jnp.einsum("pi,...pq->...iq", hr, y2)
    return jnp.einsum("...iq,qj->...ij", z1, hc)


@partial(jax.jit, static_argnames=("tol", "maxiter", "n_clusters",
                                   "geo_coarse"))
def solve_pcg_deflated(
    w: st.StencilCoefficients,
    rhs: jnp.ndarray,
    cluster_labels: jnp.ndarray,
    n_clusters: int,
    tol: float = 1e-11,
    maxiter: int = 10_000,
    geo_coarse: bool = False,
    deflation_basis: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, PCGInfo]:
    """float64 Balancing-preconditioned (BNN) Jacobi-PCG for batches with
    interior stiff clusters.

    Interior stiff-block components carry 1/contrast near-null modes spanned
    (to leading order) by their closed-region indicators X.  Standard PCG on
    K with the balancing preconditioner

        M^{-1} r = Q r + P^T M~^{-1} P r,   Q = X G^{-1} X^T,  P = I - K Q

    is the robust deflation variant (the plain DEF1 projector was measured
    to diverge under rounding here).  Forward accuracy is eps64 * kappa —
    the same class as the reference's direct LU at contrast 1e10.

    ``geo_coarse`` (EXPERIMENTAL, default off — measured net-negative on
    TPU) enriches the smoother ``M~^{-1} = D^{-1} + P_g Gg^{-1} P_g^T``
    with the cluster-masked geometric bilinear coarse space (ops.twolevel).
    Measurements at the NotGeom-D1 config (256 samples, mesh 20):
    iterations 274 -> 161, but wall-clock 303 -> 81 solves/s — the masked
    space is weak for diagonal-cluster patterns (the interesting nodes are
    exactly the masked ones) and the per-iteration f64 restriction/
    prolongation einsums cost ~6x the rest of the iteration.  An UNMASKED
    exact inverse reached 69 iterations but needs an f64 factorization the
    TPU cannot do efficiently (no f64 LU; batched triangular solves are
    ~m sequential steps, measured 5 solves/s).
    """
    from romhighcontrast_tpu.ops import clusters as cl

    diag = w.diag
    b = jnp.broadcast_to(rhs, diag.shape)
    use_geo = geo_coarse and min(diag.shape[-2:]) >= 5
    if use_geo:
        ghr, ghc, gsg, ggi = _geo_coarse_setup(w, cluster_labels)

    if deflation_basis is not None:
        # Dense enriched coarse space X (b, k, nr, nc) — e.g. the harmonic
        # extensions from clusters.harmonic_deflation_basis.  Zero columns
        # (empty label bins) get identity Gram rows; their corrections are
        # forced to zero by the zero X^T r entries.
        X = deflation_basis
        KX = st.apply_operator(
            st.StencilCoefficients(*(p[..., None, :, :] for p in w)), X
        )
        G = jnp.einsum("...kij,...lij->...kl", X, KX)
        G = 0.5 * (G + jnp.swapaxes(G, -1, -2))
        has = (jnp.sum(X * X, axis=(-2, -1)) > 0).astype(G.dtype)  # (b, k)
        act = has[..., :, None] * has[..., None, :]
        k = X.shape[-3]
        eye = jnp.eye(k, dtype=G.dtype)
        gdiag = jnp.where(has > 0, jnp.diagonal(G, axis1=-2, axis2=-1), 1.0)
        G = G * act * (1.0 - eye) + gdiag[..., :, None] * eye
        Gchol = jnp.linalg.cholesky(G)

        def Q(y):
            cr = jnp.einsum("...kij,...ij->...k", X, y)
            yk = jax.scipy.linalg.cho_solve((Gchol, True), cr[..., None])[..., 0]
            return jnp.einsum("...k,...kij->...ij", yk, X)
    else:
        Gchol = cl.cluster_gram_chol(w, cluster_labels, n_clusters)

        def Q(y):
            return cl.coarse_correct(w, cluster_labels, Gchol, y)

    def precond(r):
        Pr = r - st.apply_operator(w, Q(r))
        y = Pr / diag
        if use_geo:
            y = y + _geo_coarse_apply(ghr, ghc, gsg, ggi, Pr)
        return Q(r) + y - Q(st.apply_operator(w, y))

    bnorm2 = jnp.sum(b * b, axis=(-2, -1))
    safe_b = jnp.where(bnorm2 == 0, 1.0, bnorm2)
    tol2 = (tol * tol) * safe_b

    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z, axis=(-2, -1))
    rr = jnp.sum(r * r, axis=(-2, -1))

    # per-sample matvec-equivalents: 3 operator applications per active
    # iteration (Kp + the balancing preconditioner's two applies)
    its = jnp.zeros(rr.shape, jnp.int32)

    def cond(state):
        rr, it = state[4], state[5]
        return jnp.logical_and(jnp.any(rr > tol2), it < maxiter)

    def body(state):
        x, r, p, rz, rr, it, its = state
        active = (rr > tol2)[..., None, None]
        Kp = st.apply_operator(w, p)
        pKp = jnp.sum(p * Kp, axis=(-2, -1))
        alpha = jnp.where(pKp > 0, rz / jnp.where(pKp > 0, pKp, 1.0), 0.0)
        alpha_ = alpha[..., None, None]
        x = jnp.where(active, x + alpha_ * p, x)
        r = jnp.where(active, r - alpha_ * Kp, r)
        z = precond(r)
        rz_new = jnp.sum(r * z, axis=(-2, -1))
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = jnp.where(active, z + beta[..., None, None] * p, p)
        its = its + 3 * (rr > tol2).astype(jnp.int32)
        rr = jnp.sum(r * r, axis=(-2, -1))
        rr = jnp.where(jnp.isfinite(rr), rr, 0.0)
        return x, r, p, rz_new, rr, it + 1, its

    state = (x, r, p, rz, rr, jnp.int32(0), its)
    x, r, p, rz, rr, it, its = lax.while_loop(cond, body, state)
    r_true = b - st.apply_operator(w, x)
    rr = jnp.sum(r_true * r_true, axis=(-2, -1))
    return x, PCGInfo(iterations=its, relative_residual=jnp.sqrt(rr / safe_b))


@partial(jax.jit, static_argnames=("tol", "maxiter", "use_coarse"))
def solve_pcg(
    w: st.StencilCoefficients,
    rhs: jnp.ndarray,
    tol: float = 1e-11,
    maxiter: int = 10_000,
    coarse_basis: jnp.ndarray | None = None,
    use_coarse: bool = False,
    x0: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, PCGInfo]:
    """Solve ``K(a) x = rhs`` for a batch of coefficient fields.

    Args:
      w: stencil weights with shape ``(batch..., nr, nc)``.
      rhs: ``(nr, nc)`` or ``(batch..., nr, nc)`` right-hand side(s) on the
        interior grid.
      tol: relative residual target.  Do not go below ~1e-11: the f64
        recursive residual stalls at the roundoff floor at contrast 1e10
        (measured) and the loop burns maxiter.
      coarse_basis: optional ``(k, nr, nc)`` coarse space for the two-level
        preconditioner (pass ``use_coarse=True`` to enable).

    Returns: ``(x, info)`` with ``x`` of shape ``(batch..., nr, nc)``.
    """
    diag = w.diag
    b = jnp.broadcast_to(rhs, diag.shape)
    if use_coarse:
        assert coarse_basis is not None
        Gchol = _coarse_setup(w, coarse_basis)

    def precond(r):
        z = r / diag
        if use_coarse:
            z = z + _coarse_apply(coarse_basis, Gchol, r)
        return z

    bnorm2 = jnp.sum(b * b, axis=(-2, -1))
    bnorm2 = jnp.where(bnorm2 == 0, 1.0, bnorm2)
    tol2 = (tol * tol) * bnorm2

    x = jnp.zeros_like(b) if x0 is None else jnp.broadcast_to(x0, diag.shape)
    r = b - (st.apply_operator(w, x) if x0 is not None else 0.0 * b)
    z = precond(r)
    p = z
    rz = jnp.sum(r * z, axis=(-2, -1))
    rr = jnp.sum(r * r, axis=(-2, -1))

    its = jnp.zeros(rr.shape, jnp.int32)  # per-sample matvec-equivalents

    def cond(state):
        rr, it = state[4], state[5]
        return jnp.logical_and(jnp.any(rr > tol2), it < maxiter)

    def body(state):
        x, r, p, rz, rr, it, its = state
        active = (rr > tol2)[..., None, None]
        Kp = st.apply_operator(w, p)
        pKp = jnp.sum(p * Kp, axis=(-2, -1))
        # guarded divisions: frozen/roundoff-floor systems yield exact zeros
        # instead of 0/0 or overflow-driven NaNs
        alpha = jnp.where(pKp > 0, rz / jnp.where(pKp > 0, pKp, 1.0), 0.0)
        alpha_ = alpha[..., None, None]
        x = jnp.where(active, x + alpha_ * p, x)
        r = jnp.where(active, r - alpha_ * Kp, r)
        z = precond(r)
        rz_new = jnp.sum(r * z, axis=(-2, -1))
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = jnp.where(active, z + beta[..., None, None] * p, p)
        its = its + (rr > tol2).astype(jnp.int32)
        rr = jnp.sum(r * r, axis=(-2, -1))
        rr = jnp.where(jnp.isfinite(rr), rr, 0.0)  # freeze diverged-by-roundoff
        return x, r, p, rz_new, rr, it + 1, its

    x, r, p, rz, rr, it, its = lax.while_loop(
        cond, body, (x, r, p, rz, rr, jnp.int32(0), its))
    info = PCGInfo(iterations=its, relative_residual=jnp.sqrt(rr / bnorm2))
    return x, info


def _cg_unit_diag(wt, b, tol, maxiter, stag_window=1_000_000):
    """Plain CG on the Jacobi-symmetrized system (unit diagonal, so no
    preconditioner needed).  Same masked-batch structure as solve_pcg.
    dtype follows the inputs (float32 on the mixed-precision path).
    Optional per-sample stagnation freezing (disabled by default: the CG
    two-norm residual oscillates, so short windows exit prematurely —
    measured to break convergence at the paper config).

    Do NOT add f32 deflation over scaled cluster vectors here: the scaled
    indicators have 1e5-magnitude entries whose cancellation noise makes the
    projector useless in f32 (measured divergence to 1e18) — interior
    stiff-cluster batches are routed to solve_pcg_deflated (f64 BNN)
    instead."""
    bnorm2 = jnp.sum(b * b, axis=(-2, -1))
    safe_b = jnp.where(bnorm2 == 0, 1.0, bnorm2)
    tol2 = jnp.asarray(tol * tol, b.dtype) * safe_b

    x = jnp.zeros_like(b)
    r = b
    p = r
    rz = bnorm2
    rr = bnorm2
    best = bnorm2
    since = jnp.zeros(bnorm2.shape, jnp.int32)
    its = jnp.zeros(bnorm2.shape, jnp.int32)  # per-sample matvec-equivalents

    def active_mask(rr, since):
        return jnp.logical_and(rr > tol2, since < stag_window)

    def cond(state):
        rr, it, since = state[4], state[5], state[7]
        return jnp.logical_and(jnp.any(active_mask(rr, since)), it < maxiter)

    def body(state):
        x, r, p, rz, rr, it, best, since, its = state
        amask = active_mask(rr, since)
        active = amask[..., None, None]
        Kp = st.apply_operator(wt, p)
        pKp = jnp.sum(p * Kp, axis=(-2, -1))
        alpha = jnp.where(pKp > 0, rz / jnp.where(pKp > 0, pKp, 1.0), 0.0)
        alpha_ = alpha[..., None, None]
        x = jnp.where(active, x + alpha_ * p, x)
        r = jnp.where(active, r - alpha_ * Kp, r)
        rz_new = jnp.sum(r * r, axis=(-2, -1))
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = jnp.where(active, r + beta[..., None, None] * p, p)
        rr = jnp.where(jnp.isfinite(rz_new), rz_new, 0.0)
        improved = rr < 0.99 * best
        best = jnp.minimum(best, rr)
        since = jnp.where(improved, 0, since + 1)
        its = its + amask.astype(jnp.int32)
        return x, r, p, rz_new, rr, it + 1, best, since, its

    state = (x, r, p, rz, rr, jnp.int32(0), best, since, its)
    out = lax.while_loop(cond, body, state)
    return out[0], out[8]


def _cheb_apply(apply_op, deg, lo, hi):
    """Chebyshev polynomial application closure (same recurrence as the
    Pallas kernels' _make_cheb, XLA arrays)."""
    f32 = jnp.float32
    theta = f32((hi + lo) / 2.0)
    delta = f32((hi - lo) / 2.0)
    sigma = float((hi + lo) / (hi - lo))

    def cheb(r):
        rho = f32(1.0 / sigma)
        d = r / theta
        z = d
        for _ in range(deg - 1):
            rho_new = f32(1.0) / (f32(2.0 * sigma) - rho)
            d = (rho_new * rho) * d + (f32(2.0) * rho_new / delta) * (
                r - apply_op(z)
            )
            z = z + d
            rho = rho_new
        return z

    return cheb


def _cg_2l_xla(wt, dh, coarse, hr, hc, b, rtol2, maxiter,
               deg=3, lmin=0.116, lmax=2.0, dc=8, clmin=0.03, clmax=2.05):
    """Two-level (Chebyshev + warped-coarse) preconditioned CG in pure
    XLA — the same algorithm as the fused Pallas kernel
    (ops/pallas_cg_2l._pcg_2l_kernel), for grids past the kernels' VMEM
    reach (> (1023, 1023) vertices; r5).  Replaces the plain Jacobi-CG
    fallback whose iteration counts grow ~linearly with the grid side.

    wt: unit-diagonal symmetrized stencil weights (B, nr, nc), f32.
    dh: sqrt(diag K) (B, nr, nc) — the warp.
    coarse: twolevel.CoarseOperator (normalized 9-point bands + sg).
    hr/hc: (m1r, nr) / (m1c, nc) bilinear hat matrices.
    rtol2: (B,) per-sample squared relative tolerance.
    Returns (x, its) with per-sample matvec-equivalents (deg + 1 per
    active iteration — the kernel convention)."""
    f32 = jnp.float32
    bands, sg = coarse.bands, coarse.sg

    def cmatvec(y):
        # 9-point normalized coarse stencil; rolls wrap, but edge bands
        # are zero by construction (normalize_bands zero-fills the
        # shifted sg), annihilating the wrap — same induction as the
        # fine stencil
        out = y
        for dp in (-1, 0, 1):
            for dq in (-1, 0, 1):
                if dp == 0 and dq == 0:
                    continue
                t = jnp.roll(y, (-dp, -dq), axis=(-2, -1))
                out = out + bands[..., dp + 1, dq + 1, :, :] * t
        return out

    fine_cheb = _cheb_apply(lambda u: st.apply_operator(wt, u), deg,
                            lmin, lmax)
    coarse_cheb = _cheb_apply(cmatvec, dc, clmin, clmax)

    def precond(r):
        t = dh * r
        c = jnp.einsum("pi,bij,qj->bpq", hr, t, hc)
        y = sg * coarse_cheb(sg * c)
        zc = dh * jnp.einsum("pi,bpq,qj->bij", hr, y, hc)
        return fine_cheb(r) + zc

    bb = jnp.sum(b * b, axis=(-2, -1))
    safe_b = jnp.where(bb == 0, 1.0, bb)
    tol2 = rtol2.astype(f32) * safe_b
    div2 = f32(1e12) * safe_b

    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z, axis=(-2, -1))
    rr = bb
    its = jnp.zeros(bb.shape, jnp.int32)

    def active_mask(rr):
        return jnp.logical_and(rr > tol2, rr < div2)

    def cond(state):
        rr, it = state[4], state[5]
        return jnp.logical_and(jnp.any(active_mask(rr)), it < maxiter)

    def body(state):
        x, r, p, rz, rr, it, its = state
        amask = active_mask(rr)
        active = amask[..., None, None]
        Kp = st.apply_operator(wt, p)
        pKp = jnp.sum(p * Kp, axis=(-2, -1))
        alpha = jnp.where(amask & (pKp > 0),
                          rz / jnp.where(pKp > 0, pKp, 1.0), 0.0)
        alpha_ = alpha[..., None, None]
        x = jnp.where(active, x + alpha_ * p, x)
        r = jnp.where(active, r - alpha_ * Kp, r)
        z = precond(r)
        rz_new = jnp.sum(r * z, axis=(-2, -1))
        rr_new = jnp.sum(r * r, axis=(-2, -1))
        rr_new = jnp.where(jnp.isfinite(rr_new), rr_new, f32(2.0) * div2)
        beta = jnp.where(amask & (rz != 0),
                         rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = jnp.where(active, z + beta[..., None, None] * p, p)
        rr = jnp.where(amask, rr_new, rr)
        rz = jnp.where(amask, rz_new, rz)
        its = its + (deg + 1) * amask.astype(jnp.int32)
        return x, r, p, rz, rr, it + 1, its

    out = lax.while_loop(cond, body, (x, r, p, rz, rr, jnp.int32(0), its))
    return out[0], out[6]


def _round_rtol2(rounds, tol2, rr, inner_tol, dtype):
    """Adaptive per-round inner tolerance (squared), shared by the phased
    and generic refinement loops: ask each sample for the digits it still
    needs (0.3 margin), floored at 1e-5 in round one (deeper first-round
    asks make floored samples burn the outer cap — measured 9.7k vs 14.8k
    solves/s) and at ``inner_tol`` afterwards."""
    floor = jnp.where(rounds == 0, jnp.maximum(inner_tol, 1e-5), inner_tol)
    return jnp.clip(
        0.09 * tol2 / jnp.maximum(rr, jnp.finfo(dtype).tiny),
        (floor * floor).astype(dtype), 1.0,
    )


def _mixed_2l_phased(w, b, grid_shape, tol, inner_tol,
                     maxiter_inner, max_rounds, inner_opts, interpret,
                     x0=None, a_blocks=None, block_N=None):
    """Phased iterative-refinement driver, double-f32 state end-to-end.

    Round structure (measured on the paper config, 1000 samples):

    * **Phase A** — up to two FULL-BATCH rounds with the two-level inner
      kernel.  With the adaptive tolerance schedule these finish ~99% of
      samples.
    * **Phase B** — remaining rounds on the top-``K`` worst samples only
      (``lax.top_k`` by residual ratio, gathered to a compact subproblem).
      The inner is selectable via ``inner_opts``: ``phase_b_inner="v2"``
      (single-level deg-12 kernel — the historical default, chosen when
      the 2l kernel still had a ~3e-9 TRUE-delivery floor at mesh >= 40)
      or ``"2l"`` (compact two-level subproblem — the r4 retune removed
      that floor, and the single-level dig's iteration count grows with
      mesh, so this wins at fine meshes).
    * **Phase C** — full-batch safety loop (single-level inner); its cond
      is false unless more than ``K`` samples survived phase A
      (pathological batches), so it normally costs nothing at runtime.

    Precision architecture (round 3): the refinement state is carried as a
    double-f32 (hi, lo) pair in the Jacobi-symmetrized space, and EVERY
    per-round high-precision step — correction update, true residual,
    norm bookkeeping, rhs masking — is ONE fused Pallas pass
    (ops/pallas_dd_round.py) instead of emulated-f64 XLA passes.  The
    scaled operator itself is built by error-free f32 transforms
    (build_dd_scaled: dd rsqrt + Dekker products, ~2^-48 relative, no f64
    symmetrize).  Round 2 spent ~10-15 us/sample on the f64 glue — the
    dominant non-kernel cost at the paper config; the dd state cuts that
    to ~1 us/sample, with the only remaining f64 arithmetic the final
    ``x = s * (hi + lo)`` combine.  Convergence is still gated on the
    ORIGINAL-space residual (the dd kernel weighs its norm by ``diag``),
    with a measured evaluation floor of ~2e-13 relative — two decades
    under the 1e-11 default target.
    """
    from romhighcontrast_tpu.ops import dd
    from romhighcontrast_tpu.ops import twolevel as tl
    from romhighcontrast_tpu.ops.pallas_cg_2l import (
        Prepared2L, cg_2l_dd_prepared, cg_2l_prepared, coarse_prep,
        dd_kernel_feasible, fine_dims, fine_from_samples, fine_to_samples,
        pack_fine, plan_2l, prepare_2l, unpack_fine,
    )
    from romhighcontrast_tpu.ops.pallas_dd_round import (
        DDOperands, PreparedDD, build_dd_packed, build_dd_scaled,
        build_dd_scaled_from_blocks, dd_dims, dd_round, gather_dd,
        prepare_dd,
    )

    f32 = jnp.float32
    batch = b.shape[:-2]
    nr, nc = grid_shape
    # prep-level knobs ride inner_opts but must not reach the kernel call
    _opts = dict(inner_opts)
    _stride = _opts.pop("stride", None)
    strides = ((_stride, _stride) if _stride
               else (tl.coarse_stride(nr), tl.coarse_stride(nc)))
    # THIRD level (r4): hats of ``stride2`` on the COARSE INDEX grid.
    # 0/None = two-level (the default); the dc2/cl2min/cl2max kernel knobs
    # ride inner_opts straight into cg_2l_prepared.
    _stride2 = _opts.pop("stride2", None)
    stride2 = (_stride2, _stride2) if _stride2 else None
    packed_coarse = bool(_opts.pop("packed_coarse", True))
    # default ON (measured 2026-08-18, interleaved on-TPU A/B at the paper
    # config: 35,995 vs 27,925 solves/s — the stacked layout wastes ~1.6x
    # VPU work on 79 of 128 lanes); the stacked layout remains reachable
    # via inner_opts for A/B and for shapes the packed layout rejects
    packed_fine = bool(_opts.pop("packed_fine", True))
    # operand build: "kernel" (default) is the fused Pallas fine-grid EFT;
    # "xla" the unblocked XLA EFT pipeline; "piecewise" compresses the EFT
    # to the O(blocks) class grid + exact one-hot expansion matmuls.
    # Interleaved TPU sweep 2026-08-18 (paper config, 4 passes): kernel
    # 36.4k, xla 36.0k, piecewise 34.0k solves/s — the expansion's 13
    # Precision.HIGHEST matmuls + layout passes cost MORE than the
    # fine-grid EFT compute they remove (do-not-retry; the EFT is only
    # ~20% of the solve and kernel/xla already overlap it).
    build = str(_opts.pop("build", "kernel"))
    block_size = _opts.pop("block_size", None)
    # phase-B inner: "v2" (single-level deg-12 straggler dig — the round-3
    # default), "2l" (compact TWO-LEVEL subproblem over the gathered
    # stragglers), or "dd" (ONE dd-state kernel launch over the compact
    # subproblem with in-kernel restart-at-replacement rounds; packed-fine
    # layouts only, falls back to "2l" otherwise).  The v2 choice dated from the 2l kernel's ~3e-9 TRUE-
    # delivery floor at mesh >= 40, which the r4 retune removed
    # (scripts/probe_2l_floor_tpu.py) — and the single-level dig's
    # iteration count grows with mesh (its Chebyshev window narrows as
    # 1/n^2), so at fine meshes phase B dominates wall-clock.  The phased
    # asks (floor inner_tol = 3e-6) stay far above the measured mesh-64
    # deep-ask instability (~1e-11), so the 2l inner is safe here.
    phase_b_inner = str(_opts.pop("phase_b_inner", "v2"))
    # phase-A engine: "rounds" (restart-based refinement rounds — the
    # historical default) or "dd" (ONE two-level kernel carrying dd x/r
    # state with in-kernel residual replacement, ops/pallas_cg_2l.
    # _pcg_2l_dd_kernel).  The restart scheme's per-round TRUE contraction
    # floors at ~eps32*kappa (grows ~mesh^2: extra rounds at fine meshes);
    # the dd kernel has no such floor and converges at ideal-CG iteration
    # counts (numpy prototype scripts/proto_dd_rr.py: mesh 64 1262 its vs
    # 2958 for the restart scheme).  Requires the packed-fine layout and
    # no third level; falls back to "rounds" where unsupported.
    phase_a = str(_opts.pop("phase_a", "rounds"))
    dd_maxiter = int(_opts.pop("dd_maxiter", 256))
    # phase-A dd outer budget: the full-batch dd pass has no "until_few"
    # hand-off (blocks are independent), so its maxiter IS the hand-off to
    # the compact phases — keep it separate from the compact dig's budget
    dd_maxiter_a = int(_opts.pop("dd_maxiter_a", dd_maxiter))
    rep_drop = float(_opts.pop("rep_drop", 0.03))
    # restart the dd kernel's CG direction at replacement points: in-kernel
    # refinement-round boundaries.  Measured necessary for the straggler
    # tail (keep-beta dd plateaus on high-kappa samples: mesh 40 max 3052
    # mv vs 716 under restart rounds, sweep_r4e) — default ON; the
    # keep-beta ideal-CG variant stays as a sweepable knob.
    rep_restart = bool(_opts.pop("rep_restart", True))
    if "dd" in (phase_a, phase_b_inner) and not dd_kernel_feasible(
            grid_shape):
        # the dd-state kernel's ~80-buffer live set exceeds scoped VMEM
        # even at BS=1 on this grid (the plain fused kernels still fit):
        # downgrade to the documented fallbacks instead of letting Mosaic
        # hard-fail the compile.  Applied on every backend (interpret mode
        # has no VMEM wall) so CPU runs stay representative of TPU.
        if phase_a == "dd":
            phase_a = "rounds"
        if phase_b_inner == "dd":
            phase_b_inner = "2l"
    # compact-phase hand-off size.  128 is the measured optimum at the
    # paper config (256/384 ran 8-14% slower — top-k gather and compact
    # prep grow with K while masked full-batch rounds already exit at
    # iteration zero); exposed for tests and sweeps.
    phase_b_k = int(_opts.pop("phase_b_k", 128))
    # dynamic straggler RE-BINNING (r5, VERDICT r4 #5): a CASCADE of
    # compact phases, e.g. (256, 128) — phase A hands off as soon as
    # <= 256 samples are unconverged; those are compacted across block
    # boundaries into fresh dense blocks (a shape-stable top-K gather, the
    # same machinery as phase B), run until <= 128 survive, re-compacted,
    # and so on.  Today's fixed blocks keep their initial membership, so
    # the tail is a few samples per block padding whole blocks; each
    # cascade stage re-bins them.  Default: the single measured-optimal
    # K=128 stage.
    cascade = _opts.pop("phase_b_cascade", None)
    phase_b_ks = (tuple(int(k) for k in cascade) if cascade
                  else (phase_b_k,))
    inner_opts = tuple(_opts.items())

    def flat(v):
        return jnp.broadcast_to(v, batch + grid_shape).reshape(
            (-1,) + grid_shape
        )

    b3 = flat(b)
    # w is None on the a_blocks path (the fused/EFT builds work straight
    # from block coefficients); only the legacy weights-only entry needs it
    w3 = (st.StencilCoefficients(*(flat(v) for v in w))
          if w is not None else None)
    if w3 is None and a_blocks is None:
        raise ValueError("_mixed_2l_phased needs stencil weights or "
                         "a_blocks")
    B = b3.shape[0]

    bnorm2 = jnp.sum(b3 * b3, axis=(-2, -1))
    safe_b = jnp.where(bnorm2 == 0, 1.0, bnorm2)
    tol2bb = ((tol * tol) * safe_b).astype(f32)

    def hi_weights(o):
        return st.StencilCoefficients(
            wE=o.wE[0], wW=o.wW[0], wS=o.wS[0], wN=o.wN[0],
            diag=jnp.ones_like(o.diag),
        )

    a3 = (jnp.asarray(a_blocks).reshape((-1,) + a_blocks.shape[-2:])
          if a_blocks is not None else None)
    fused = a3 is not None and packed_fine and build != "xla"
    if fused:
        m1r = tl.hat_matrix(nr, strides[0]).shape[0]
        m1c = tl.hat_matrix(nc, strides[1]).shape[0]
        dims0 = plan_2l(B, nr, nc, m1r, m1c, block_size=block_size,
                        packed_fine=True, dd_cg=phase_a == "dd")
        fused = bool(dims0[10])  # plan may fall back to the stacked layout

    # NO global difficulty sort: full-batch rounds keep every block active
    # regardless of order (round-2 measured fixed-vs-sorted full rounds a
    # +-5% wash), and dropping it removes the gather of ~26 operand arrays
    # (~5 ms/1000 samples of pure HBM copies).  The compact straggler
    # phase keeps its per-round REAL-count sort — there packing is the
    # point.
    if fused:
        # Blocked operands built straight from the block coefficients, in
        # one of two equivalent ways (bit-identical hi parts, tested):
        # "kernel" (default) runs the full fine-grid EFT in one fused
        # Pallas pass; "piecewise" runs it on the tiny O(blocks) class
        # grid and expands by exact one-hot matmuls (ops/piecewise.py —
        # measured 6% slower, kept for A/B).  Only the coarse operator
        # still assembles in XLA, from plain-f32 stencil weights (~1 ulp
        # from the EFT hi parts; preconditioner-side only).
        if build == "piecewise":
            from romhighcontrast_tpu.ops.piecewise import (
                build_dd_small, expand_packed_operands, expand_raw,
            )

            small = build_dd_small(a3, block_N, nr, nc)
            Kb = expand_packed_operands(small, b3, block_N, dims0)
            w32f = expand_raw(small)
        else:
            Kb = build_dd_packed(a3, block_N, b3, dims0,
                                 interpret=interpret)
            w32f = st.stencil_weights(st.cell_grid(a3.astype(f32),
                                                   block_N))
        raw1 = tl.assemble_coarse_raw(w32f, *strides)
        coarse = tl.normalize_bands(raw1)
        sg_p, cbands, xfer = coarse_prep(coarse, strides, dims0)
        l2 = {}
        if stride2 is not None:
            from romhighcontrast_tpu.ops.pallas_cg_2l import coarse2_prep

            coarse2 = tl.normalize_bands(tl.coarsen_bands(raw1, *stride2))
            m1r1, m1c1 = coarse.sg.shape[-2:]
            sg2_p, cbands2, xfer2 = coarse2_prep(coarse2, stride2, m1r1,
                                                 m1c1, dims0)
            l2 = dict(sg2=sg2_p, cbands2=cbands2, Rrow2=xfer2[0],
                      Rrow2T=xfer2[1], Ccol2=xfer2[2], Ccol2T=xfer2[3])
        prep2l0 = Prepared2L(
            wE=Kb.wEh, wW=Kb.wWh, wS=Kb.wSh, wN=Kb.wNh, dh=Kb.dh,
            sg=sg_p, cbands=cbands,
            Rrow=xfer[0], RrowT=xfer[1], Ccol=xfer[2], CcolT=xfer[3], **l2,
        )
        prepdd0 = PreparedDD(
            wEh=Kb.wEh, wEl=Kb.wEl, wWh=Kb.wWh, wWl=Kb.wWl,
            wSh=Kb.wSh, wSl=Kb.wSl, wNh=Kb.wNh, wNl=Kb.wNl,
            bth=Kb.bth, btl=Kb.btl, diag=Kb.diag,
        )
        ops_s = None
        wt_s = None  # phase C unpacks the hi planes lazily inside its body
    else:
        Kb = None
        if a3 is not None:
            # EFT pipeline straight from the block coefficients — the f64
            # stencil-weight arrays are never materialized (XLA dead-code
            # eliminates the caller's build), saving ~5 full-grid f64 passes
            ops, w32 = build_dd_scaled_from_blocks(a3, block_N, b3)
        else:
            ops = build_dd_scaled(w3, b3)
            # coarse operator / warp for the two-level inner: plain f32
            # precision suffices (preconditioner-side only)
            w32 = st.StencilCoefficients(*(v.astype(f32) for v in w3))
        dh3 = jnp.sqrt(w32.diag)
        raw1 = tl.assemble_coarse_raw(w32, *strides)
        coarse = tl.normalize_bands(raw1)
        coarse2 = (tl.normalize_bands(tl.coarsen_bands(raw1, *stride2))
                   if stride2 is not None else None)
        ops_s = ops
        wt_s = hi_weights(ops_s)
        prep2l0, dims0 = prepare_2l(wt_s, dh3, coarse, strides,
                                    coarse2=coarse2, stride2=stride2,
                                    block_size=block_size,
                                    packed_coarse=packed_coarse,
                                    packed_fine=packed_fine,
                                    dd_cg=phase_a == "dd")
        prepdd0 = prepare_dd(ops_s, dims0)
    if "deg" not in dict(inner_opts):
        if len(dims0) > 10 and dims0[10]:
            # Lane-PACKED fine layout (interleaved TPU sweeps 2026-08-18,
            # per-BS optima): BS=8 (mesh 20) deg-3 36.3k vs deg-4 35.5k;
            # BS=2 (mesh 40) deg-5 3,852 vs deg-4 3,727 vs deg-3 3,476;
            # BS=1 (mesh 64) deg-3 1,800 vs deg-5 1,653 vs deg-4 1,626.
            # Non-monotone in BS — a measured lookup, not a theory.
            # Re-swept 2026-08-19 at the VMEM-freed sizes: deg-3 confirmed
            # at BS=16 (mesh 20: 27.7k vs deg-4 26.1k) and at BS=8 for
            # mesh 40 (6,508 vs deg-4 6,357 / deg-5 6,030) and mesh 64
            # (1,866 vs deg-4 1,623).
            deg = {8: 3, 4: 4, 2: 5}.get(dims0[3], 3)
        else:
            # stacked layout (sweeps 2026-08-17): deg-4 beats deg-3 at
            # BS>=2 but loses ~20% at BS=1 — with multiple samples per
            # block fewer outers also shrink run-to-block-max sync waste
            deg = 4 if dims0[3] >= 2 else 3
        inner_opts = inner_opts + (("deg", deg),)
    if prep2l0.sg2 is None:
        # no level-2 operands prepared (stride2 unset, or the layout fell
        # back to stacked): the kernel knobs must not ask for one
        inner_opts = tuple((k, v) for k, v in inner_opts
                           if k not in ("dc2", "cl2min", "cl2max"))
    elif "dc2" not in dict(inner_opts):
        inner_opts = inner_opts + (("dc2", 8),)
    mv2l = int(dict(inner_opts).get("deg", 3)) + 1
    t2s = tol2bb

    def round_cond(t2, budget, until_few: int = 0):
        """Keep iterating while someone is unconverged AND someone is still
        improving (0.5 contraction — near the dd floor stragglers contract
        slowly but genuinely) AND the phase budget allows; ``until_few``
        hands off to the compact phase once few samples remain."""

        def c(state):
            rr, rounds, prev_rr = state[3], state[4], state[7]
            unconv = rr > t2
            improving = jnp.any(jnp.logical_and(unconv, rr < 0.5 * prev_rr))
            keep = jnp.logical_and(
                jnp.logical_and(jnp.any(unconv), improving), rounds < budget
            )
            if until_few:
                keep = jnp.logical_and(
                    keep,
                    jnp.logical_or(rounds < 2,
                                   jnp.sum(unconv) > until_few),
                )
            return keep

        return c

    def make_body(use_v2, wtX, prepddX, dimsX, t2X, prep2lX=None,
                  blocked=False):
        def body(state):
            xh, xl, rt, rr, rounds, iters, key, _ = state
            rtol2 = _round_rtol2(rounds, t2X, rr, inner_tol, f32)
            if use_v2:
                from romhighcontrast_tpu.ops.pallas_cg_v2 import (
                    cg_symmetrized_pallas_v2,
                )

                # per-round difficulty sort: late rounds have few active
                # samples, and packing them into few blocks is the point
                rt_s = unpack_fine(rt, dimsX) if blocked else rt
                order = jnp.argsort(key)
                inv = jnp.argsort(order)
                if wtX is None:
                    # fused path: unpack the hi planes lazily INSIDE the
                    # body so the (normally zero-trip) safety loop does not
                    # pay 4 full-array unpacks on every solve
                    wt_l = st.StencilCoefficients(
                        wE=unpack_fine(prepddX.wEh, dimsX),
                        wW=unpack_fine(prepddX.wWh, dimsX),
                        wS=unpack_fine(prepddX.wSh, dimsX),
                        wN=unpack_fine(prepddX.wNh, dimsX),
                        diag=jnp.ones((dimsX[0],) + tuple(dimsX[1:3]), f32),
                    )
                else:
                    wt_l = wtX
                wts = st.StencilCoefficients(*(v[order] for v in wt_l))
                x3, its = cg_symmetrized_pallas_v2(
                    wts, rt_s[order], tol=1e-4, maxiter=maxiter_inner,
                    interpret=interpret,
                )
                d, its, mv = x3[inv], its[inv], 13
                d_blocked = False
            else:
                opts_x = dict(inner_opts)
                if prep2lX.sg2 is None:
                    # this prep carries no level-2 operands (e.g. the
                    # compact phase-B prep): the kernel knobs must not ask
                    # for one
                    for k2 in ("dc2", "cl2min", "cl2max"):
                        opts_x.pop(k2, None)
                d, its = cg_2l_prepared(
                    prep2lX, dimsX, rt, rtol2,
                    # cap outer iterations: healthy samples need <= ~21 to
                    # the 3e-6 floor; a floored sample must not drag its
                    # block for the full budget
                    maxiter=min(maxiter_inner, 64), interpret=interpret,
                    strides=strides, blocked_io=blocked,
                    **opts_x,
                )
                mv = mv2l
                d_blocked = blocked
            xh, xl, rt, rr_new = dd_round(prepddX, dimsX, xh, xl, d, t2X,
                                          interpret=interpret,
                                          blocked_state=blocked,
                                          d_blocked=d_blocked)
            iters = iters + mv * its.astype(jnp.int32)
            return (xh, xl, rt, rr_new, rounds + 1, iters,
                    its.astype(f32), rr)

        return body

    # phases A and C carry the state in the BLOCKED kernel layout — the
    # per-round pad/unpad copies (7 x ~70 MB at the paper config) are pure
    # HBM traffic; only the compact phase B (K samples) and the final
    # combine touch per-sample shapes
    B0, nr0, nc0, BS0, H0, W0 = dims0[:6]
    BP0 = dims0[8]
    rows0, lanes0, _Wf0 = fine_dims(dims0)

    def pad_block(x):
        return pack_fine(x, dims0)

    def to_samples(xb):
        return unpack_fine(xb, dims0)

    zero_b = jnp.zeros((BP0 // BS0, rows0, lanes0), f32)
    if x0 is None:
        xh0, xl0 = zero_b, zero_b
        rt0 = prepdd0.bth  # blocked bt hi — free (reused from the prep)
        rr0 = bnorm2.astype(f32)
    else:
        # warm start: one dd pass initializes the residual state from x0
        x0_3 = jnp.asarray(x0, b3.dtype).reshape((-1,) + grid_shape)
        if fused:
            # divide by s in the blocked layout (s lives packed); the
            # dtype-preserving pack keeps x0 in f64 through the division
            pad = ((0, BP0 - B), (0, H0 - nr0), (0, _Wf0 - nc0))
            x0_b = fine_from_samples(jnp.pad(x0_3, pad), dims0)
            xt0 = x0_b / dd.dd_to_f64(Kb.sh, Kb.sl)
            hh_b, ll_b = dd.dd_from_f64(xt0)
            xh0, xl0 = hh_b.astype(f32), ll_b.astype(f32)
        else:
            xt0 = x0_3 / dd.dd_to_f64(*ops_s.s)
            hh, ll = dd.dd_from_f64(xt0)
            xh0, xl0 = pad_block(hh), pad_block(ll)
        xh0, xl0, rt0, rr0 = dd_round(prepdd0, dims0, xh0, xl0, zero_b,
                                      t2s, interpret=interpret,
                                      blocked_state=True, d_blocked=True)

    # drop cascade stages the batch cannot feed (top-K needs K << B)
    phase_b_ks = tuple(k for k in phase_b_ks if 2 * k <= B)
    K = phase_b_ks[0] if phase_b_ks else phase_b_k
    phase_b = bool(phase_b_ks) and max_rounds > 2
    if phase_a == "dd" and bool(dims0[10]) and prep2l0.sg2 is None:
        # ONE dd-state kernel to the final tolerance: no restart rounds,
        # no per-round dd passes; phases B/C below stay as mop-up for
        # samples the divergence guard froze or maxiter cut off
        opts_a = dict(inner_opts)
        kd = {k: opts_a[k] for k in ("deg", "lmin", "lmax", "dc", "clmin",
                                     "clmax") if k in opts_a}
        xh, xl, rt, rr, its_a = cg_2l_dd_prepared(
            prep2l0, prepdd0, dims0, t2s, xh0, xl0, maxiter=dd_maxiter_a,
            interpret=interpret, strides=strides, rep_drop=rep_drop,
            rep_restart=rep_restart, **kd)
        # per-sample matvec-equivalents (replacements, ~15 mv-equiv each
        # and ~log(1/rep_drop)-decades apart, ride the same estimate
        # class as the rounds path's uncounted dd_round passes)
        iters = mv2l * its_a
        rounds = jnp.int32(1)
        key = its_a.astype(f32)
        prev_rr = rr0
    else:
        state = (xh0, xl0, rt0, rr0, jnp.int32(0),
                 jnp.zeros((B,), jnp.int32), jnp.zeros((B,), f32),
                 jnp.full((B,), jnp.inf, f32))
        bodyA = make_body(False, wt_s, prepdd0, dims0, t2s, prep2lX=prep2l0,
                          blocked=True)
        state = lax.while_loop(
            round_cond(t2s, max_rounds, until_few=K if phase_b else 0),
            bodyA, state,
        )
        xh, xl, rt, rr, rounds, iters, key, prev_rr = state

    for _j, K in enumerate(phase_b_ks if phase_b else ()):
        # cascade hand-off: run this compact stage only until the NEXT
        # (smaller) stage can absorb the survivors
        _next_k = phase_b_ks[_j + 1] if _j + 1 < len(phase_b_ks) else 0
        _, idx = lax.top_k(rr / t2s, K)
        if fused:
            # gather the compact subproblem's operands from the packed
            # arrays (XLA fuses the slice/transpose/gather into one copy of
            # (K, nr, nc) per array — no full unblocked materialization)
            def gp(xb):
                return fine_to_samples(xb, dims0)[idx, :nr0, :nc0]

            opsK = DDOperands(
                wE=(gp(Kb.wEh), gp(Kb.wEl)), wW=(gp(Kb.wWh), gp(Kb.wWl)),
                wS=(gp(Kb.wSh), gp(Kb.wSl)), wN=(gp(Kb.wNh), gp(Kb.wNl)),
                bt=(gp(Kb.bth), gp(Kb.btl)), diag=gp(Kb.diag),
                s=(gp(Kb.sh), gp(Kb.sl)),
            )
        else:
            opsK = gather_dd(ops_s, idx)
        if phase_b_inner in ("2l", "dd"):
            # compact TWO-LEVEL subproblem: re-prep the gathered samples
            # for the 2l kernel (the coarse operands are already assembled
            # for the full batch — normalize-then-gather == gather-then-
            # normalize since both are per-sample).  One dims plan serves
            # the inner kernel and the dd round (shared layout contract).
            # The dd variant sizes blocks for the dd CG kernel's ~2x live
            # state (dd_cg).
            dhK = gp(Kb.dh) if fused else dh3[idx]
            coarseK = tl.CoarseOperator(bands=coarse.bands[idx],
                                        sg=coarse.sg[idx])
            prep2lK, dimsK = prepare_2l(
                hi_weights(opsK), dhK, coarseK, strides,
                block_size=block_size, packed_coarse=packed_coarse,
                packed_fine=packed_fine, dd_cg=phase_b_inner == "dd",
            )
        else:
            prep2lK = None
            dimsK = dd_dims(K, nr, nc)
        prepddK = prepare_dd(opsK, dimsK)
        t2K = t2s[idx]

        def gather_block(xb):
            return fine_to_samples(xb, dims0)[idx, :nr0, :nc0]

        # per-phase budget + reset improvement baseline: a sample that
        # stalled under the previous phase's kernel may still improve here
        stK = (gather_block(xh), gather_block(xl), gather_block(rt),
               rr[idx], rounds, iters[idx], key[idx],
               jnp.full((K,), jnp.inf, f32))
        if phase_b_inner == "dd" and bool(dimsK[10]):
            # compact dd-state dig: ONE kernel launch to the final
            # tolerance, with in-kernel restart-at-replacement round
            # boundaries (rep_restart) — spends the restart scheme's
            # per-round dd_round pass (~15 mv/sample) and kernel relaunch
            # exactly where rounds are many (the f32 round-contraction
            # floor grows ~mesh^2, so the compact stragglers at fine
            # meshes pay the most rounds — ROADMAP r4 item 7)
            BPK, HK, WfK = dimsK[8], dimsK[4], dimsK[10]
            padK = ((0, BPK - K), (0, HK - nr0), (0, WfK - nc0))

            def pack_K(xs):
                return fine_from_samples(jnp.pad(xs, padK), dimsK)

            opts_b = dict(inner_opts)
            kd = {k: opts_b[k] for k in ("deg", "lmin", "lmax", "dc",
                                         "clmin", "clmax") if k in opts_b}
            xhK, xlK, rtK, rrK, itsK = cg_2l_dd_prepared(
                prep2lK, prepddK, dimsK, t2K, pack_K(stK[0]),
                pack_K(stK[1]), maxiter=dd_maxiter, interpret=interpret,
                strides=strides, rep_drop=rep_drop,
                rep_restart=rep_restart, **kd)

            def unpack_K(xb):
                return fine_to_samples(xb, dimsK)[:K, :nr0, :nc0]

            stK = (unpack_K(xhK), unpack_K(xlK), unpack_K(rtK), rrK,
                   rounds + jnp.int32(1), stK[5] + mv2l * itsK,
                   itsK.astype(f32))
        else:
            if phase_b_inner in ("2l", "dd"):
                # dd falls back to the restart-rounds compact 2l dig when
                # the layout fell back to stacked (the dd kernel is
                # packed-fine only)
                bodyK = make_body(False, None, prepddK, dimsK, t2K,
                                  prep2lX=prep2lK)
            else:
                bodyK = make_body(True, hi_weights(opsK), prepddK, dimsK,
                                  t2K)
            stK = lax.while_loop(
                round_cond(t2K, rounds + max_rounds, until_few=_next_k),
                bodyK, stK)

        def scatter_block(xb, xs):
            flat = fine_to_samples(xb, dims0)
            return fine_from_samples(flat.at[idx, :nr0, :nc0].set(xs),
                                     dims0)

        xh = scatter_block(xh, stK[0])
        xl = scatter_block(xl, stK[1])
        rt = scatter_block(rt, stK[2])
        rr = rr.at[idx].set(stK[3])
        rounds = stK[4]
        iters = iters.at[idx].set(stK[5])
        key = key.at[idx].set(stK[6])
    # safety loop: runs only if > K samples (or, without a phase B, any)
    # are still unconverged-and-improving; single-level inner so batches
    # where more than K samples sit at the two-level kernel's f32 floor
    # still reach the asked tolerance.  At the phased driver's largest
    # grids (mesh 192, n=767) this phase is expensive (its 1/n^2-narrow
    # Chebyshev window drives the suite-population mv mean to ~3,809) but
    # MEASURED NECESSARY: disabling it moved the corner-sample delivery
    # floor from 1.87e-9 to 1.37e-8 (2026-08-20 suite captures) — the
    # slow single-level digs are what grind out the last decade there.
    bodyC = make_body(True, wt_s, prepdd0, dims0, t2s, blocked=True)
    state = (xh, xl, rt, rr, rounds, iters, key,
             jnp.full((B,), jnp.inf, f32))
    state = lax.while_loop(round_cond(t2s, rounds + max_rounds), bodyC,
                           state)
    xh, xl, rr = state[0], state[1], state[3]
    iters = state[5]

    # the ONLY f64 arithmetic of the whole solve: x = s * (hi + lo)
    if fused:
        # combine in the blocked layout (s lives packed); padded regions
        # hold x = 0 so their masked-1 scale is inert
        xsh, xsl = dd.dd_mul(xh, xl, Kb.sh, Kb.sl)
        x = unpack_fine(dd.dd_to_f64(xsh, xsl), dims0)
    else:
        xsh, xsl = dd.dd_mul(to_samples(xh), to_samples(xl), *ops_s.s)
        x = dd.dd_to_f64(xsh, xsl)
    rel = jnp.sqrt(rr.astype(b3.dtype) / safe_b)
    return (
        x.reshape(batch + grid_shape),
        PCGInfo(iterations=iters.reshape(batch),
                relative_residual=rel.reshape(batch)),
    )


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter_inner",
                                   "max_rounds", "inner_dtype", "inner",
                                   "stag_window", "n_clusters", "inner_opts",
                                   "block_N"))
def solve_pcg_mixed(
    w: st.StencilCoefficients,
    rhs: jnp.ndarray,
    tol: float = 1e-11,
    inner_tol: float | None = None,
    maxiter_inner: int = 900,
    max_rounds: int = 12,
    inner_dtype=jnp.float32,
    inner: str = "xla",
    stag_window: int = 1_000_000,
    x0: jnp.ndarray | None = None,
    cluster_labels: jnp.ndarray | None = None,
    n_clusters: int = 0,
    inner_opts: tuple = (),
    a_blocks: jnp.ndarray | None = None,
    block_N: int | None = None,
) -> tuple[jnp.ndarray, PCGInfo]:
    """Mixed-precision solve: float32 CG on the Jacobi-symmetrized system
    inside float64 iterative refinement.

    ``inner`` selects the f32 CG implementation:

    * ``"pallas_2l"`` — the fused multi-sample kernel with the two-level
      (Chebyshev + warped-coarse) preconditioner (fastest; ~4x fewer fine
      matvecs than ``pallas_v2`` — see ops/twolevel.py).  Falls back to
      ``pallas_v2`` on grids too small to carry a coarse space.  Its deeper
      default ``inner_tol`` (1e-5 vs 1e-4) buys a whole refinement round.
    * ``"pallas_v2"`` — the fused multi-sample single-level kernel
      (deg-12 Chebyshev; emits real per-sample iteration counts, which also
      drive difficulty-sorted block packing between rounds).
    * ``"pallas"`` — the legacy single-sample fused kernel.
    * ``"xla"`` — plain XLA while_loop (portable reference).

    Why it is exact enough: ``K~ = D^{-1/2} K D^{-1/2}`` has unit diagonal
    and O(1) entries for any contrast, so its f32 matvec is accurate to
    ~1e-7 relative and each refinement round gains ``inner_tol`` digits on
    the *f64 true residual* ``b - K x``.

    Tuning note (measured on TPU v5e): the f32 attainable relative residual
    is ~eps32 * kappa(K~) (~1e-4..1e-6 depending on mesh/sample), so a fixed
    inner tolerance either stalls below the floor (burning maxiter) or exits
    early (extra rounds).  The inner solvers therefore use per-sample
    stagnation detection and run to whichever comes first: ``inner_tol`` or
    the attainable floor.  Each f32 iteration is ~12x cheaper than
    emulated-f64.

    ``inner_opts``: static ``((key, value), ...)`` pairs forwarded to the
    ``pallas_2l`` kernel (``deg``, ``dc``, ``lmin``, ``clmin``, ...) for
    tuning sweeps without new plumbing.

    Stiff-cluster handling (REQUIRED for high-contrast blocks that do not
    touch the Dirichlet boundary): such clusters carry near-null modes with
    lambda ~ 1/contrast, unresolvable in f32 — without treatment the solver
    silently returns garbage (measured: relative residual ~1e2 at contrast
    1e10).  Pass ``cluster_labels`` (ops.clusters.cluster_labels) and the
    static ``n_clusters`` bound: each refinement round then performs the
    exact rank-k coarse solve over the cluster indicators in f64, which
    removes precisely the components the f32 inner CG amplifies by
    1/lambda.
    """
    if inner not in ("pallas_2l", "pallas_v2", "pallas", "xla", "xla_2l"):
        raise ValueError(
            f"Unknown inner solver {inner!r}; expected one of "
            "['pallas_2l', 'pallas_v2', 'pallas', 'xla', 'xla_2l']"
        )
    if w is None and a_blocks is None:
        raise ValueError("solve_pcg_mixed needs stencil weights w or "
                         "a_blocks")
    grid_shape = (rhs.shape[-2:] if w is None else w.diag.shape[-2:])
    interpret = jax.default_backend() == "cpu"

    if min(grid_shape) < 5:
        # no room for a coarse grid; the single-level kernel is optimal at
        # these sizes anyway
        if inner == "pallas_2l":
            inner = "pallas_v2"
        elif inner == "xla_2l":
            inner = "xla"
    phased_ok = True
    if inner.startswith("pallas"):
        from romhighcontrast_tpu.ops.pallas_cg_2l import (
            fused_kernels_feasible, phased_driver_feasible)

        # applied on every backend (interpret mode has no VMEM wall, but
        # routing identically keeps CPU behavior representative of TPU)
        if not fused_kernels_feasible(grid_shape):
            # past ~(1023, 1023) vertices even the plain 2l kernel's BS=1
            # block set exceeds physical VMEM and the Mosaic compile
            # hard-fails; serve the solve through the pure-XLA TWO-LEVEL
            # inner (r5: same Chebyshev + warped-coarse algorithm, XLA
            # arrays — outer-iteration counts stay mesh-independent-ish
            # instead of the plain Jacobi-CG fallback's ~8(n+1))
            inner = "xla_2l"
        else:
            # the dd-round kernel (the phased driver's per-round pass) has
            # a ~40-buffer live set vs the plain kernel's ~30: between
            # mesh ~224 and 256 the solve stays IN-KERNEL through the
            # generic refinement loop (XLA f64 glue) with the plain 2l
            # inner (r5; measured compile bracket in
            # scripts/probe_mesh256_kernel.py)
            phased_ok = phased_driver_feasible(grid_shape)
    if inner_tol is None:
        # For the two-level inner, inner_tol is the FLOOR of the adaptive
        # per-round tolerance schedule (each round asks each sample for the
        # digits it still needs, times a 0.3 margin); 3e-6 is reachable for
        # most samples (measured: +3 outer iterations vs 1e-5) and lets
        # tol=1e-10 finish in two rounds.  The single-level kernels use a
        # fixed 1e-4 (they floor too often below that).
        inner_tol = 3e-6 if inner in ("pallas_2l", "xla_2l") else 1e-4

    if (inner == "pallas_2l" and inner_dtype == jnp.float32 and phased_ok
            and not (cluster_labels is not None and n_clusters > 0)):
        # hot path: phased driver (full-batch rounds, then compact
        # straggler rounds) — see _mixed_2l_phased.  Warm starts (x0) take
        # the same route: the phased driver's single-level mop-up phases
        # are what guarantee the TRUE-delivery floor at fine meshes (the 2l
        # kernel alone floors at ~3e-9 at mesh >= 40).
        # Dispatched BEFORE any weight-derived graph is traced: with
        # a_blocks the fused build needs no ``w`` at all (callers pass
        # w=None), and the f64 symmetrize below must not ride on
        # shape-dependent dead-code elimination (measured 2026-08-19: a
        # 250-sample program kept ~21 ms/batch of dead weight-build work
        # that the 1000-sample compile eliminated).
        b = (jnp.broadcast_to(rhs, a_blocks.shape[:-2] + grid_shape)
             if w is None else jnp.broadcast_to(rhs, w.diag.shape))
        return _mixed_2l_phased(w, b, grid_shape, tol, inner_tol,
                                maxiter_inner, max_rounds, inner_opts,
                                interpret, x0=x0, a_blocks=a_blocks,
                                block_N=block_N)

    if w is None:
        # non-phased paths (xla/v2/legacy inners) operate on explicit
        # stencil weights: build them from the block coefficients (same
        # construction the callers used before w became lazy)
        w = (st.stencil_weights_split(a_blocks, block_N)
             if a_blocks.dtype == jnp.float64
             else st.stencil_weights(st.cell_grid(a_blocks, block_N)))
    diag = w.diag
    b = jnp.broadcast_to(rhs, diag.shape)
    wt, s = st.symmetrized_weights(w)
    wt32 = st.StencilCoefficients(*(x.astype(inner_dtype) for x in wt))

    bnorm2 = jnp.sum(b * b, axis=(-2, -1))
    safe_b = jnp.where(bnorm2 == 0, 1.0, bnorm2)
    tol2 = (tol * tol) * safe_b

    def true_resid(x):
        return b - st.apply_operator(w, x)

    # Stall detection (all paths): a refinement round that fails to improve
    # any still-unconverged sample's residual energy by at least 4x means
    # those samples sit at their precision floor (f64 roundoff, or eps*kappa
    # for near-singular systems) — further rounds are pure waste.  Measured:
    # at tol=1e-11 a ~10% straggler tail floors at ~1.6e-11 and previously
    # burned every remaining round of the max_rounds budget.
    def cond(state):
        _, r, rounds, _, _, prev_rr = state
        rr = jnp.sum(r * r, axis=(-2, -1))
        unconv = rr > tol2
        improving = jnp.any(jnp.logical_and(unconv, rr < 0.25 * prev_rr))
        return jnp.logical_and(
            jnp.logical_and(jnp.any(unconv), improving), rounds < max_rounds
        )

    batch = diag.shape[:-2]

    if inner == "pallas_2l":
        from romhighcontrast_tpu.ops import twolevel as tl
        from romhighcontrast_tpu.ops.pallas_cg_2l import (
            cg_2l_prepared, prepare_2l,
        )

        strides = (tl.coarse_stride(grid_shape[0]),
                   tl.coarse_stride(grid_shape[1]))
        _opts = dict(inner_opts)
        _packed = bool(_opts.pop("packed_coarse", True))
        # packed-fine default: ON for the huge-grid route (the measured
        # mesh-256 compile bracket is for the packed layout; the stacked
        # BS=1 layout was never probed there), historical OFF otherwise
        _packed_f = bool(_opts.pop("packed_fine", not phased_ok))
        inner_opts = tuple(_opts.items())
        wt3 = st.StencilCoefficients(
            *(jnp.broadcast_to(v, batch + grid_shape)
              .reshape((-1,) + grid_shape) for v in wt32)
        )
        w3u = st.StencilCoefficients(
            *(jnp.broadcast_to(v, batch + grid_shape)
              .reshape((-1,) + grid_shape).astype(inner_dtype) for v in w)
        )
        coarse = tl.assemble_coarse(w3u, *strides)
        dh3 = jnp.sqrt(
            jnp.broadcast_to(diag, batch + grid_shape)
        ).reshape((-1,) + grid_shape).astype(inner_dtype)

        def inner_solve(rt, sort_key, rtol2):
            # Per-round difficulty sort (real counts after round one): late
            # rounds have few active samples, and packing them into few
            # blocks beats reusing a fixed-order prepared operand set
            # (measured 16.3k vs 15.4k solves/s — the per-round re-gather
            # of the operands costs less than spread-straggler blocks).
            order = jnp.argsort(sort_key)
            inv = jnp.argsort(order)
            rt3 = rt.reshape((-1,) + grid_shape)[order]
            wts = st.StencilCoefficients(*(v[order] for v in wt3))
            co = tl.CoarseOperator(bands=coarse.bands[order],
                                   sg=coarse.sg[order])
            prep2l, dims2l = prepare_2l(wts, dh3[order], co, strides,
                                        packed_coarse=_packed,
                                        packed_fine=_packed_f)
            x3, its = cg_2l_prepared(
                prep2l, dims2l, rt3, rtol2.reshape(-1)[order],
                # cap outer iterations: healthy samples need <= ~21 to the
                # 3e-6 floor (measured); a sample flooring ABOVE its asked
                # tolerance must not drag its block for the full budget
                maxiter=min(maxiter_inner, 64), interpret=interpret,
                strides=strides,
                # huge-grid route: one grid-(1,) launch per block — the
                # multi-block grid's input double-buffering OOMs VMEM at
                # mesh 256 (measured 137.31M vs the 128M limit)
                serial=not phased_ok, **dict(inner_opts),
            )
            return (x3[inv].reshape(batch + grid_shape),
                    its[inv].reshape(batch))

    elif inner == "xla_2l":
        from romhighcontrast_tpu.ops import twolevel as tl
        from romhighcontrast_tpu.ops.pallas_cg_2l import default_fine_window

        strides = (tl.coarse_stride(grid_shape[0]),
                   tl.coarse_stride(grid_shape[1]))
        f32_ = jnp.float32
        wt3 = st.StencilCoefficients(
            *(jnp.broadcast_to(v, batch + grid_shape)
              .reshape((-1,) + grid_shape).astype(f32_) for v in wt)
        )
        w3u = st.StencilCoefficients(
            *(jnp.broadcast_to(v, batch + grid_shape)
              .reshape((-1,) + grid_shape).astype(f32_) for v in w)
        )
        coarse3 = tl.assemble_coarse(w3u, *strides)
        dh3 = jnp.sqrt(
            jnp.broadcast_to(diag, batch + grid_shape)
        ).reshape((-1,) + grid_shape).astype(f32_)
        hr3 = jnp.asarray(tl.hat_matrix(grid_shape[0], strides[0]), f32_)
        hc3 = jnp.asarray(tl.hat_matrix(grid_shape[1], strides[1]), f32_)
        _o = dict(inner_opts)
        lmin3 = float(_o.get("lmin",
                             default_fine_window(grid_shape, strides)[0]))

        def inner_solve(rt, sort_key, rtol2):
            rt3 = rt.reshape((-1,) + grid_shape).astype(f32_)
            x3, its = _cg_2l_xla(
                wt3, dh3, coarse3, hr3, hc3, rt3,
                jnp.broadcast_to(rtol2, batch).reshape(-1),
                maxiter=min(maxiter_inner, 64),
                deg=int(_o.get("deg", 3)), lmin=lmin3,
                lmax=float(_o.get("lmax", 2.0)), dc=int(_o.get("dc", 8)),
                clmin=float(_o.get("clmin", 0.03)),
                clmax=float(_o.get("clmax", 2.05)),
            )
            return x3.reshape(batch + grid_shape), its.reshape(batch)

    elif inner == "pallas_v2":
        from romhighcontrast_tpu.ops.pallas_cg_v2 import cg_symmetrized_pallas_v2

        wt3 = st.StencilCoefficients(
            *(jnp.broadcast_to(v, batch + grid_shape)
              .reshape((-1,) + grid_shape) for v in wt32)
        )

        def inner_solve(rt, sort_key, rtol2):
            # The fused kernel runs blocks of samples to the max iteration
            # count of the block; order samples by difficulty so blocks are
            # homogeneous (keys: static conditioning proxy on round one,
            # the previous round's real per-sample counts afterwards).
            order = jnp.argsort(sort_key)
            inv = jnp.argsort(order)
            rt3 = rt.reshape((-1,) + grid_shape)[order]
            wts = st.StencilCoefficients(*(v[order] for v in wt3))
            x3, its = cg_symmetrized_pallas_v2(
                wts, rt3, tol=inner_tol, maxiter=maxiter_inner,
                interpret=interpret,
            )
            return (x3[inv].reshape(batch + grid_shape),
                    its[inv].reshape(batch))

    elif inner == "pallas":
        from romhighcontrast_tpu.ops.pallas_cg import cg_symmetrized_pallas

        def inner_solve(rt, sort_key, rtol2):
            wt3 = st.StencilCoefficients(
                *(v.reshape((-1,) + grid_shape) for v in wt32)
            )
            rt3 = rt.reshape((-1,) + grid_shape)
            x3, its = cg_symmetrized_pallas(
                wt3, rt3, tol=inner_tol, maxiter=maxiter_inner,
                interpret=interpret, stag_window=stag_window,
            )
            return x3.reshape(batch + grid_shape), its.reshape(batch)

    else:

        def inner_solve(rt, sort_key, rtol2):
            x, it = _cg_unit_diag(wt32, rt, inner_tol, maxiter_inner,
                                  stag_window)
            return x, it

    use_clusters = cluster_labels is not None and n_clusters > 0
    if use_clusters:
        from romhighcontrast_tpu.ops import clusters as cl

        Gchol = cl.cluster_gram_chol(w, cluster_labels, n_clusters)

    def body(state):
        x, r, rounds, iters, sort_key, _ = state
        prev_rr = jnp.sum(r * r, axis=(-2, -1))
        if use_clusters:
            # exact f64 rank-k solve over the stiff-cluster indicators: the
            # f32 inner CG's error in these near-null modes is amplified by
            # 1/lambda ~ contrast; correcting them exactly each round keeps
            # the refinement contraction intact
            x = x + cl.coarse_correct(w, cluster_labels, Gchol, r)
            r = true_resid(x)
        # zero the scaled rhs of already-converged samples: their inner CG
        # then exits immediately (bb = 0), so refinement rounds only cost
        # work for the stragglers that still need digits
        rr = jnp.sum(r * r, axis=(-2, -1))
        unconverged = (rr > tol2)[..., None, None]
        rt = jnp.where(unconverged, s * r, 0.0).astype(inner_dtype)
        rtol2_s = _round_rtol2(rounds, tol2, rr, inner_tol,
                               b.dtype).astype(inner_dtype)
        dt, it = inner_solve(rt, sort_key, rtol2_s)
        x = x + s * dt.astype(b.dtype)
        r = true_resid(x)
        if use_clusters:
            # trailing correction so the residual check (and the returned x)
            # reflect the cluster modes cleaned after the last inner solve
            x = x + cl.coarse_correct(w, cluster_labels, Gchol, r)
            r = true_resid(x)
        if inner in ("pallas_v2", "pallas_2l"):
            # fine matvec-equivalents (deg + 1 per kernel iteration); see
            # the PCGInfo docstring
            mv = (int(dict(inner_opts).get("deg", 3)) + 1
                  if inner == "pallas_2l" else 13)
            iters = iters + mv * it.astype(jnp.int32)
            # real counts from this round are the best difficulty predictor
            # for the next round's block packing
            sort_key = it.astype(jnp.float32).reshape(-1)
        else:
            # xla / legacy pallas inners: per-sample counts, 1 matvec each
            iters = iters + it.astype(jnp.int32)
        return x, r, rounds + 1, iters, sort_key, prev_rr

    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        # warm start (e.g. a reduced-basis Galerkin prediction — "use the
        # ROM to accelerate the FOM"): rounds start from its residual
        x = jnp.broadcast_to(jnp.asarray(x0, b.dtype), b.shape)
        r = true_resid(x)
    iters0 = jnp.zeros(batch, jnp.int32)
    if inner in ("pallas_v2", "pallas_2l"):
        # round-one difficulty proxy: iteration counts anti-correlate with
        # the mean log diagonal (measured corr -0.7 on the bench grid)
        key0 = (-jnp.mean(jnp.log(diag), axis=(-2, -1))
                .reshape(-1).astype(jnp.float32))
    else:
        key0 = jnp.float32(0)
    prev_rr0 = jnp.full(batch, jnp.inf, b.dtype)
    x, r, rounds, iters, _, _ = lax.while_loop(
        cond, body, (x, r, jnp.int32(0), iters0, key0, prev_rr0)
    )
    rr = jnp.sum(r * r, axis=(-2, -1))
    return x, PCGInfo(iterations=iters, relative_residual=jnp.sqrt(rr / safe_b))


@jax.jit
def solve_cholesky(K: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Batched dense SPD solve ``K x = rhs``.

    K: ``(..., dim, dim)``; rhs: ``(dim,)`` or ``(..., dim)``.
    """
    L = jnp.linalg.cholesky(K)
    rhs = jnp.broadcast_to(rhs, K.shape[:-1])
    return jax.scipy.linalg.cho_solve((L, True), rhs[..., None])[..., 0]


@jax.jit
def _solve_small_spd_chol(K: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    L = jnp.linalg.cholesky(K)
    rhs = jnp.broadcast_to(rhs, K.shape[:-1])
    return jax.scipy.linalg.cho_solve((L, True), rhs[..., None])[..., 0]


def solve_small_spd(K: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Batched solve for small reduced systems, backend-adaptive.

    * CPU: batched f64 Cholesky (real f64 hardware — fastest and exact
      there; the dd elimination is ALSO measured numerically broken under
      XLA:CPU jit, whose optimizer evaluates parts of the f32 EFT chains
      in excess precision, silently zeroing the compensation terms).
    * TPU (and other f64-emulating backends): unrolled double-f32 Gaussian
      elimination — measured BOTH ~20x faster (the emulated-f64 Cholesky
      costs 36 ms + 17 ms triangular solves at (1000, 15, 15) — the whole
      online-ROM bottleneck) and ~50x more accurate (3e-9 vs 1.7e-7 max
      rel residual at reduced-system kappa ~3e8: emulated f64 carries
      eps_eff ~ 1e-14 through a sequential factorization; the dd solve
      is backward-stable at 2^-48 + one refinement round).
    """
    if jax.default_backend() == "cpu":
        return _solve_small_spd_chol(K, rhs)
    return solve_small_spd_dd(K, rhs)


@jax.jit
def solve_small_spd_mixed(K: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Batched small-SPD solve: f32 Cholesky on the Jacobi-scaled system
    inside f64 iterative refinement.

    The emulated-f64 batched Cholesky + triangular solves dominate the
    online reduced path on TPU (measured: they are the difference between
    ~17k and >100k online solves/s at n=15, batch 1000).  The reduced
    Galerkin matrix ``A = sum_q a_q V K_q V^T`` has contrast-sized entries,
    but its Jacobi-scaled version is O(1) and modestly conditioned (same
    physics as the FOM path), so an f32 factorisation plus three f64
    residual-refinement rounds recovers ~1e-13 relative accuracy; each
    refinement round is one cheap batched matvec + two triangular
    re-solves in f32.
    """
    d = jnp.diagonal(K, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(jnp.where(d > 0, d, 1.0))
    Ks = (K * s[..., :, None] * s[..., None, :]).astype(jnp.float32)
    L = jnp.linalg.cholesky(Ks)

    rhs = jnp.broadcast_to(rhs, K.shape[:-1])

    def solve_scaled(r):
        rt = (s * r).astype(jnp.float32)
        y = jax.scipy.linalg.cho_solve((L, True), rt[..., None])[..., 0]
        return s * y.astype(K.dtype)

    x = solve_scaled(rhs)
    for _ in range(3):
        r = rhs - jnp.einsum("...kl,...l->...k", K, x)
        x = x + solve_scaled(r)
    return x


def _dd_factor(Ah, Al, n: int):
    """Unrolled batched Gaussian elimination in double-f32 (no pivoting —
    SPD).  Returns the upper triangle (in-place in Ah/Al), the column
    multipliers, and the dd pivot reciprocals."""
    from romhighcontrast_tpu.ops import dd

    mults, pinvs = [], []
    for k in range(n):
        ph, pl = dd.dd_recip(Ah[..., k, k], Al[..., k, k])
        pinvs.append((ph, pl))
        if k + 1 < n:
            mh, ml = dd.dd_mul(Ah[..., k + 1:, k], Al[..., k + 1:, k],
                               ph[..., None], pl[..., None])
            th, tl = dd.dd_mul(mh[..., :, None], ml[..., :, None],
                               Ah[..., None, k, k + 1:],
                               Al[..., None, k, k + 1:])
            sh, sl = dd.dd_add(Ah[..., k + 1:, k + 1:],
                               Al[..., k + 1:, k + 1:], -th, -tl)
            Ah = Ah.at[..., k + 1:, k + 1:].set(sh)
            Al = Al.at[..., k + 1:, k + 1:].set(sl)
            mults.append((mh, ml))
    return Ah, Al, mults, pinvs


def _dd_factor_solve(Ah, Al, mults, pinvs, yh, yl, n: int):
    """Forward-eliminate + back-substitute one dd rhs against stored
    factors; returns the dd solution ``(xh, xl)`` of shape (..., n)."""
    from romhighcontrast_tpu.ops import dd

    for k in range(n - 1):
        mh, ml = mults[k]
        th, tl = dd.dd_mul(mh, ml, yh[..., k, None], yl[..., k, None])
        sh, sl = dd.dd_add(yh[..., k + 1:], yl[..., k + 1:], -th, -tl)
        yh = yh.at[..., k + 1:].set(sh)
        yl = yl.at[..., k + 1:].set(sl)
    xh = jnp.zeros_like(yh)
    xl = jnp.zeros_like(yl)
    for k in reversed(range(n)):
        ah, al = yh[..., k], yl[..., k]
        for j in range(k + 1, n):
            th, tl = dd.dd_mul(Ah[..., k, j], Al[..., k, j],
                               xh[..., j], xl[..., j])
            ah, al = dd.dd_add(ah, al, -th, -tl)
        ph, pl = pinvs[k]
        vh, vl = dd.dd_mul(ah, al, ph, pl)
        xh = xh.at[..., k].set(vh)
        xl = xl.at[..., k].set(vl)
    return xh, xl


@jax.jit
def _solve_small_spd_dd_impl(K: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Batched small-SPD solve in double-f32 Gaussian elimination.

    The TPU's emulated-f64 batched Cholesky costs ~36 ms for (1000, 15, 15)
    (plus ~17 ms of triangular solves) — it is THE online-ROM bottleneck
    (measured: 58 ms/call -> ~17k online solves/s).  Unrolled elimination
    in (hi, lo) f32 pairs (ops/dd.py) is backward-stable at ~2^-48 — the
    same effective precision as the TPU's emulated f64 (eps_eff ~ 1e-14,
    CLAUDE.md) — with every operation a plain f32 elementwise op.  One
    f64-residual refinement round (a single cheap batched matvec) restores
    the forward error to the (eps * kappa)^2 class on real-f64 hosts.

    n is static (unrolled); intended for reduced systems n <= ~32.
    """
    from romhighcontrast_tpu.ops import dd

    n = K.shape[-1]
    rhs = jnp.broadcast_to(rhs, K.shape[:-1])
    Ah, Al = dd.dd_from_f64(K)
    Uh, Ul, mults, pinvs = _dd_factor(Ah, Al, n)

    def solve_one(r64):
        yh, yl = dd.dd_from_f64(r64)
        xh, xl = _dd_factor_solve(Uh, Ul, mults, pinvs, yh, yl, n)
        return dd.dd_to_f64(xh, xl)

    x = solve_one(rhs)
    r = rhs - jnp.einsum("...kl,...l->...k", K, x)
    return x + solve_one(r)


def solve_small_spd_dd(K: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """See _solve_small_spd_dd_impl; traced under dd.with_barriers (the
    HLO simplifier is measured to collapse the elimination's EFT chains
    without them — the tiny (b, n, n) arrays make the fusion cost moot)."""
    from romhighcontrast_tpu.ops import dd

    with dd.with_barriers():
        return _solve_small_spd_dd_impl(K, rhs)


@jax.jit
def solve_spd_shared(K: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve one SPD system ``K (n, n)`` against many right-hand sides
    ``B (b, n)``; returns ``(b, n)``."""
    L = jnp.linalg.cholesky(K)
    return jax.scipy.linalg.cho_solve((L, True), B.T).T

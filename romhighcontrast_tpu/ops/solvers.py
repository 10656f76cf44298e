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

    iterations: solve work counts.

      * ``pallas_v2`` / ``pallas_2l`` paths: per-sample ``(batch,)`` i32 in
        **fine matvec-equivalents** — kernel iteration counts scaled by the
        matvecs each costs (``deg + 1``: 13 for the deg-12 single-level
        kernel, 4 for the default deg-3 two-level kernel), so counts are
        comparable across kernels and across the phased driver's mixed
        phases.  Coarse-sweep work (6 sweeps/outer on the two-level path, at
        ~27 ns vs ~49 ns per fine matvec) is *not* included.
      * XLA paths: a scalar total of while-loop iterations (1 matvec each).
      * legacy single-sample pallas path: the scalar sentinel ``-1`` (its
        per-sample counts stay in-kernel).
    relative_residual: (batch,) final ``||b - K x|| / ||b||``.
    """

    iterations: jnp.ndarray
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
    Gchol = cl.cluster_gram_chol(w, cluster_labels, n_clusters)
    use_geo = geo_coarse and min(diag.shape[-2:]) >= 5
    if use_geo:
        ghr, ghc, gsg, ggi = _geo_coarse_setup(w, cluster_labels)

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

    def cond(state):
        rr, it = state[4], state[5]
        return jnp.logical_and(jnp.any(rr > tol2), it < maxiter)

    def body(state):
        x, r, p, rz, rr, it = state
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
        rr = jnp.sum(r * r, axis=(-2, -1))
        rr = jnp.where(jnp.isfinite(rr), rr, 0.0)
        return x, r, p, rz_new, rr, it + 1

    state = (x, r, p, rz, rr, jnp.int32(0))
    x, r, p, rz, rr, it = lax.while_loop(cond, body, state)
    r_true = b - st.apply_operator(w, x)
    rr = jnp.sum(r_true * r_true, axis=(-2, -1))
    return x, PCGInfo(iterations=it, relative_residual=jnp.sqrt(rr / safe_b))


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

    def cond(state):
        _, r, _, _, rr, it = state[0], state[1], state[2], state[3], state[4], state[5]
        return jnp.logical_and(jnp.any(rr > tol2), it < maxiter)

    def body(state):
        x, r, p, rz, rr, it = state
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
        rr = jnp.sum(r * r, axis=(-2, -1))
        rr = jnp.where(jnp.isfinite(rr), rr, 0.0)  # freeze diverged-by-roundoff
        return x, r, p, rz_new, rr, it + 1

    x, r, p, rz, rr, it = lax.while_loop(cond, body, (x, r, p, rz, rr, jnp.int32(0)))
    info = PCGInfo(iterations=it, relative_residual=jnp.sqrt(rr / bnorm2))
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

    def active_mask(rr, since):
        return jnp.logical_and(rr > tol2, since < stag_window)

    def cond(state):
        rr, it, since = state[4], state[5], state[7]
        return jnp.logical_and(jnp.any(active_mask(rr, since)), it < maxiter)

    def body(state):
        x, r, p, rz, rr, it, best, since = state
        active = active_mask(rr, since)[..., None, None]
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
        return x, r, p, rz_new, rr, it + 1, best, since

    state = (x, r, p, rz, rr, jnp.int32(0), best, since)
    out = lax.while_loop(cond, body, state)
    return out[0], out[5]


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
                     x0=None):
    """Phased iterative-refinement driver for the two-level kernel.

    Round structure (measured on the paper config, 1000 samples):

    * **Phase A** — up to two FULL-BATCH rounds.  With the adaptive
      tolerance schedule these finish ~99% of samples.
    * **Phase B** — remaining rounds on the top-``K`` worst samples only
      (``lax.top_k`` by residual ratio, gathered to a compact subproblem).
      A full-batch round costs ~7 us/sample of glue (f64 residual passes +
      operand re-prep) even when only a handful of divergence-frozen
      stragglers still need digits; the compact round costs 1/8 of that.
    * **Phase C** — full-batch safety loop; its cond is false unless more
      than ``K`` samples survived phase A (pathological batches), so it
      normally costs nothing at runtime.
    """
    from romhighcontrast_tpu.ops import twolevel as tl
    from romhighcontrast_tpu.ops.pallas_cg_2l import (
        cg_2l_prepared, prepare_2l,
    )

    batch = b.shape[:-2]
    strides = (tl.coarse_stride(grid_shape[0]),
               tl.coarse_stride(grid_shape[1]))

    def flat(v):
        return jnp.broadcast_to(v, batch + grid_shape).reshape(
            (-1,) + grid_shape
        )

    b3 = flat(b)
    w3 = st.StencilCoefficients(*(flat(v) for v in w))
    # symmetrize in f32 from cast weights: the f64 rsqrt + 4 multiplies on
    # the expanded grid cost ~3-4 ms/1000 samples and buy nothing — any
    # consistently-used scaling yields a valid nearby SPD inner system, and
    # the f64 true residual keeps ultimate accuracy
    w32 = st.StencilCoefficients(*(v.astype(jnp.float32) for v in w3))
    wt3, _ = st.symmetrized_weights(w32)
    dh3 = jnp.sqrt(w32.diag)
    coarse = tl.assemble_coarse(w32, *strides)
    # f64 scale for the CORRECTION update only: noise injected into x AFTER
    # the symmetrizing scale is amplified by K's stiff rows (up to the
    # contrast) in the next true residual — an f32 product here floors
    # mesh-40 solves at 2.9e-9 vs 8.7e-11 (measured); one f64 pass per
    # solve is cheap, per ROUND would not be
    s64 = jax.lax.rsqrt(w3.diag)
    B = b3.shape[0]

    bnorm2 = jnp.sum(b3 * b3, axis=(-2, -1))
    safe_b = jnp.where(bnorm2 == 0, 1.0, bnorm2)
    tol2 = (tol * tol) * safe_b

    def make_round(wf, bf, sf, tol2f, wtf, dhf, cof, fixed_key=None,
                   outer_cap=64, use_v2=False):
        """Round body/cond for one (sub)batch; same logic as the generic
        solve_pcg_mixed loop, specialised to the two-level kernel.

        f64 pass economics (each full-grid f64-emulated pass costs ~0.5-1
        ms/1000 samples): ``rr`` is carried in the state so the loop cond
        never recomputes it, and the inner-RHS scaling runs in f32 (its
        1e-7 error lives in the scaled space, where the s-map back to x
        compensates K's stiff-row amplification).  The CORRECTION update
        must scale in f64 — see the s64 note at the call site.

        fixed_key: when given, samples are difficulty-sorted ONCE by this
        static key and the padded kernel operands are built once outside
        the loop — full-batch rounds keep every block active anyway, so the
        looser packing costs less than re-gathering ~150 MB of operands per
        round.  (The compact straggler phase keeps per-round real-count
        sorting: there, block packing is the whole point.)"""
        s32 = sf.astype(jnp.float32)
        if fixed_key is not None:
            order0 = jnp.argsort(fixed_key)
            inv0 = jnp.argsort(order0)
            wts0 = st.StencilCoefficients(*(v[order0] for v in wtf))
            co0 = tl.CoarseOperator(bands=cof.bands[order0],
                                    sg=cof.sg[order0])
            prep0, dims0 = prepare_2l(wts0, dhf[order0], co0, strides)

        def true_resid(x):
            return bf - st.apply_operator(wf, x)

        def body(state):
            x, r, rr, rounds, iters, key, _ = state
            unconverged = (rr > tol2f)[..., None, None]
            rt = jnp.where(unconverged, r, 0.0).astype(jnp.float32) * s32
            rtol2 = _round_rtol2(rounds, tol2f, rr, inner_tol,
                                 bf.dtype).astype(jnp.float32)
            if use_v2:
                # single-level kernel for the deep/straggler rounds: the
                # two-level kernel's warped coarse roundtrip sums
                # 1e5-scaled mixed-sign f32 values, which floors its TRUE
                # delivery at ~2e-9 at mesh 40 (measured; the single-level
                # kernel reaches 8.7e-11).  Speed where it matters (bulk
                # rounds), floor where it matters (straggler digs).
                from romhighcontrast_tpu.ops.pallas_cg_v2 import (
                    cg_symmetrized_pallas_v2,
                )

                order = jnp.argsort(key)
                inv = jnp.argsort(order)
                wts = st.StencilCoefficients(*(v[order] for v in wtf))
                x3, its = cg_symmetrized_pallas_v2(
                    wts, rt[order], tol=1e-4, maxiter=maxiter_inner,
                    interpret=interpret,
                )
            else:
                if fixed_key is not None:
                    order, inv = order0, inv0
                    prep, dims = prep0, dims0
                else:
                    order = jnp.argsort(key)
                    inv = jnp.argsort(order)
                    wts = st.StencilCoefficients(*(v[order] for v in wtf))
                    co = tl.CoarseOperator(bands=cof.bands[order],
                                           sg=cof.sg[order])
                    prep, dims = prepare_2l(wts, dhf[order], co, strides)
                x3, its = cg_2l_prepared(
                    prep, dims, rt[order], rtol2[order],
                    maxiter=min(maxiter_inner, outer_cap),
                    interpret=interpret, strides=strides,
                    **dict(inner_opts),
                )
            x = x + sf * x3[inv].astype(bf.dtype)
            r = true_resid(x)
            rr_new = jnp.sum(r * r, axis=(-2, -1))
            # normalize to fine matvec-equivalents (deg + 1 per kernel
            # iteration) so counts are comparable across the mixed phases
            mv = 13 if use_v2 else int(dict(inner_opts).get("deg", 3)) + 1
            iters = iters + mv * its[inv].astype(jnp.int32)
            return (x, r, rr_new, rounds + 1, iters,
                    its[inv].astype(jnp.float32), rr)

        def cond(budget, until_few: int = 0):
            """until_few > 0: keep full-batch rounds only while MORE than
            that many samples are unconverged (the compact phase B mops up
            the rest); the first two rounds always run full-batch."""

            def c(state):
                _, _, rr, rounds, _, _, prev_rr = state
                unconv = rr > tol2f
                # 0.5 (not the generic loop's 0.25): near the emulated-f64
                # floor at finer meshes stragglers contract slowly but
                # genuinely (measured: mesh 40 stalls at 2.9e-9 > the 1e-9
                # gate under 0.25); slow rounds are cheap in the compact
                # straggler phase
                improving = jnp.any(
                    jnp.logical_and(unconv, rr < 0.5 * prev_rr)
                )
                keep = jnp.logical_and(
                    jnp.logical_and(jnp.any(unconv), improving),
                    rounds < budget,
                )
                if until_few:
                    keep = jnp.logical_and(
                        keep,
                        jnp.logical_or(rounds < 2,
                                       jnp.sum(unconv) > until_few),
                    )
                return keep

            return c

        return body, cond

    key0 = (-jnp.mean(jnp.log(w3.diag), axis=(-2, -1))
            .astype(jnp.float32))
    body, cond = make_round(w3, b3, s64, tol2, wt3, dh3, coarse,
                            fixed_key=key0)
    if x0 is None:
        x_init, r_init, rr_init = jnp.zeros_like(b3), b3, bnorm2
    else:
        # warm start (e.g. a reduced-basis Galerkin prediction): refinement
        # rounds start from its true residual
        x_init = flat(jnp.asarray(x0, b3.dtype))
        r_init = b3 - st.apply_operator(w3, x_init)
        rr_init = jnp.sum(r_init * r_init, axis=(-2, -1))
    state = (x_init, r_init, rr_init, jnp.int32(0),
             jnp.zeros((B,), jnp.int32), key0,
             jnp.full((B,), jnp.inf, b3.dtype))
    K = 128
    phase_b = B >= 2 * K and max_rounds > 2
    state = lax.while_loop(
        cond(max_rounds, until_few=K if phase_b else 0), body, state
    )
    x, r, rr, rounds, iters, key, prev_rr = state

    if phase_b:
        _, idx = lax.top_k(rr / tol2, K)
        wK = st.StencilCoefficients(*(v[idx] for v in w3))
        coK = tl.CoarseOperator(bands=coarse.bands[idx], sg=coarse.sg[idx])
        # compact straggler digs use the single-level kernel (clean f32
        # floor); slow-but-sure rounds are cheap at 1/8 batch width
        bodyK, condK = make_round(wK, b3[idx], s64[idx], tol2[idx],
                                  st.StencilCoefficients(*(v[idx]
                                                           for v in wt3)),
                                  dh3[idx], coK, use_v2=True)
        # a sample that STALLED under the previous phase's kernel may still
        # improve under this one — reset its improvement baseline so the
        # phase gets at least one attempt
        # per-phase budget: at fine meshes phase A legitimately consumes
        # many rounds before its floor, and the digging phases must still
        # get their own max_rounds allowance (measured: mesh 64 tail stuck
        # at 3.4e-9 with a shared budget, 1.6e-10 with per-phase budgets)
        stK = (x[idx], r[idx], rr[idx], rounds, iters[idx], key[idx],
               jnp.full((K,), jnp.inf, b3.dtype))
        stK = lax.while_loop(condK(rounds + max_rounds), bodyK, stK)
        x = x.at[idx].set(stK[0])
        r = r.at[idx].set(stK[1])
        rr = rr.at[idx].set(stK[2])
        iters = iters.at[idx].set(stK[4])
        prev_rr = prev_rr.at[idx].set(stK[6])
        state = (x, r, rr, stK[3], iters, key, prev_rr)
    # safety loop: runs only if > K samples (or, without a phase B, any)
    # are still unconverged-and-improving; single-level inner so batches
    # where more than K samples sit at the two-level kernel's f32 floor
    # still reach the asked tolerance
    bodyC, condC = make_round(w3, b3, s64, tol2, wt3, dh3, coarse,
                              use_v2=True)
    x, r, rr, rounds, iters, key, _ = state
    state = (x, r, rr, rounds, iters, key,
             jnp.full((B,), jnp.inf, b3.dtype))
    state = lax.while_loop(condC(rounds + max_rounds), bodyC, state)
    x, r, rr, rounds, iters, _, _ = state
    return (
        x.reshape(batch + grid_shape),
        PCGInfo(iterations=iters.reshape(batch),
                relative_residual=jnp.sqrt(rr / safe_b).reshape(batch)),
    )


@partial(jax.jit, static_argnames=("tol", "inner_tol", "maxiter_inner",
                                   "max_rounds", "inner_dtype", "inner",
                                   "stag_window", "n_clusters", "inner_opts"))
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

    if inner not in ("pallas_2l", "pallas_v2", "pallas", "xla"):
        raise ValueError(
            f"Unknown inner solver {inner!r}; expected one of "
            "['pallas_2l', 'pallas_v2', 'pallas', 'xla']"
        )
    batch = diag.shape[:-2]
    grid_shape = diag.shape[-2:]
    interpret = jax.default_backend() == "cpu"

    if inner == "pallas_2l" and min(grid_shape) < 5:
        # no room for a coarse grid; the single-level kernel is optimal at
        # these sizes anyway
        inner = "pallas_v2"
    if inner_tol is None:
        # For the two-level inner, inner_tol is the FLOOR of the adaptive
        # per-round tolerance schedule (each round asks each sample for the
        # digits it still needs, times a 0.3 margin); 3e-6 is reachable for
        # most samples (measured: +3 outer iterations vs 1e-5) and lets
        # tol=1e-10 finish in two rounds.  The single-level kernels use a
        # fixed 1e-4 (they floor too often below that).
        inner_tol = 3e-6 if inner == "pallas_2l" else 1e-4

    if (inner == "pallas_2l" and inner_dtype == jnp.float32
            and not (cluster_labels is not None and n_clusters > 0)):
        # hot path: phased driver (full-batch rounds, then compact
        # straggler rounds) — see _mixed_2l_phased.  Warm starts (x0) take
        # the same route: the phased driver's single-level mop-up phases
        # are what guarantee the TRUE-delivery floor at fine meshes (the 2l
        # kernel alone floors at ~3e-9 at mesh >= 40).
        return _mixed_2l_phased(w, b, grid_shape, tol, inner_tol,
                                maxiter_inner, max_rounds, inner_opts,
                                interpret, x0=x0)

    if inner == "pallas_2l":
        from romhighcontrast_tpu.ops import twolevel as tl
        from romhighcontrast_tpu.ops.pallas_cg_2l import (
            cg_2l_prepared, prepare_2l,
        )

        strides = (tl.coarse_stride(grid_shape[0]),
                   tl.coarse_stride(grid_shape[1]))
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
            prep2l, dims2l = prepare_2l(wts, dh3[order], co, strides)
            x3, its = cg_2l_prepared(
                prep2l, dims2l, rt3, rtol2.reshape(-1)[order],
                # cap outer iterations: healthy samples need <= ~21 to the
                # 3e-6 floor (measured); a sample flooring ABOVE its asked
                # tolerance must not drag its block for the full budget
                maxiter=min(maxiter_inner, 64), interpret=interpret,
                strides=strides, **dict(inner_opts),
            )
            return (x3[inv].reshape(batch + grid_shape),
                    its[inv].reshape(batch))

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
            x3 = cg_symmetrized_pallas(
                wt3, rt3, tol=inner_tol, maxiter=maxiter_inner,
                interpret=interpret, stag_window=stag_window,
            )
            # per-sample iteration counts stay on-chip in this kernel
            return x3.reshape(batch + grid_shape), None

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
        elif it is not None:
            iters = iters + it
        return x, r, rounds + 1, iters, sort_key, prev_rr

    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        # warm start (e.g. a reduced-basis Galerkin prediction — "use the
        # ROM to accelerate the FOM"): rounds start from its residual
        x = jnp.broadcast_to(jnp.asarray(x0, b.dtype), b.shape)
        r = true_resid(x)
    if inner in ("pallas_v2", "pallas_2l"):
        iters0 = jnp.zeros(batch, jnp.int32)
        # round-one difficulty proxy: iteration counts anti-correlate with
        # the mean log diagonal (measured corr -0.7 on the bench grid)
        key0 = (-jnp.mean(jnp.log(diag), axis=(-2, -1))
                .reshape(-1).astype(jnp.float32))
    elif inner == "pallas":
        iters0 = jnp.int32(-1)  # sentinel: counts stay in-kernel
        key0 = jnp.float32(0)
    else:
        iters0 = jnp.int32(0)
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
def solve_small_spd(K: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Batched solve for small reduced systems; same contract as
    ``solve_cholesky`` but kept separate so the reduced path can switch to a
    different factorisation without touching the FOM path."""
    L = jnp.linalg.cholesky(K)
    rhs = jnp.broadcast_to(rhs, K.shape[:-1])
    return jax.scipy.linalg.cho_solve((L, True), rhs[..., None])[..., 0]


@jax.jit
def solve_spd_shared(K: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve one SPD system ``K (n, n)`` against many right-hand sides
    ``B (b, n)``; returns ``(b, n)``."""
    L = jnp.linalg.cholesky(K)
    return jax.scipy.linalg.cho_solve((L, True), B.T).T

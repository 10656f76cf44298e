"""Fused double-f32 refinement-round update kernel.

One round of mixed-precision iterative refinement needs, besides the f32
inner CG solve, a handful of high-precision operations that round 2 ran as
emulated-f64 XLA passes (measured ~10-15 us/sample of the ~60 us total at
the paper config — the dominant non-kernel cost):

    x  <- x + d                     (correction update)
    r  <- b - K x                   (true residual)
    rr <- ||r||^2                   (convergence bookkeeping)
    rt <- mask(r)                   (next round's inner rhs)

This kernel fuses all four into ONE Pallas pass over the stacked sample
blocks, carrying the scaled-space solution as an unevaluated double-f32
(hi, lo) pair (ops/dd.py) and evaluating the residual with a compensated
5-point stencil (Dekker two-products): ~2^-48 effective precision, ~15 f32
matvec-equivalents of work instead of ~10-20x-emulated f64 arithmetic.

Space/accuracy contract: everything lives in the Jacobi-symmetrized space
``Kt = D^-1/2 K D^-1/2`` (unit diagonal EXACTLY by construction, so the
diagonal term of the compensated matvec is just ``x`` itself).  On the fast
(boundary-touching) solve path all scaled quantities are O(1)-bounded, so
the dd evaluation reaches ~1e-14 relative — the interior-cluster cases
where scaled-space evaluation breaks are routed to the f64 deflated solver
long before this kernel (models/fem.py).  Convergence is still gated on the
ORIGINAL-space residual norm: the kernel weighs the dot with ``diag`` so
``rr = sum(D r_t^2) = ||r_orig||^2``.

The final f64 certification pass (one per SOLVE, not per round) stays in
the driver (ops/solvers.py:_mixed_2l_phased).

Reference equivalent: the reference needs none of this — it solves in
native f64 LAPACK (/root/reference/src/lib/SolutionsManagers.py:17-40).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from romhighcontrast_tpu.ops import dd
from romhighcontrast_tpu.ops import stencil as st
from romhighcontrast_tpu.ops.pallas_cg import (
    _neighbor, _round_up, tpu_compiler_params,
)


def _dd_round_kernel(wEh_ref, wEl_ref, wWh_ref, wWl_ref, wSh_ref, wSl_ref,
                     wNh_ref, wNl_ref, bth_ref, btl_ref, diag_ref,
                     xh_ref, xl_ref, d_ref, tol2bb_ref,
                     xh_out, xl_out, rt_out, rr_out, *, BS: int, H: int,
                     Wf: int = 0):
    # NOTE: barriers are globally off by default (dd.with_barriers) — and
    # Mosaic could not lower them anyway
    f32 = jnp.float32
    wE = (wEh_ref[0], wEl_ref[0])
    wW = (wWh_ref[0], wWl_ref[0])
    wS = (wSh_ref[0], wSl_ref[0])
    wN = (wNh_ref[0], wNl_ref[0])
    bth, btl = bth_ref[0], btl_ref[0]
    diag = diag_ref[0]
    xh, xl = xh_ref[0], xl_ref[0]
    d = d_ref[0]
    tol2bb = tol2bb_ref[0]  # (BS, 1) absolute squared threshold
    rows = wE[0].shape[0]  # BS * H

    # inner-kernel divergence leaks NaN/inf through d for frozen
    # samples; a zero correction keeps the carried state intact
    d = jnp.where(jnp.isfinite(d), d, f32(0.0))

    # x <- x + d, exactly (two-sum accumulate)
    xh, xl = dd.dd_add_f32(xh, xl, d)

    # r = (bt - x) + sum_dir w (x) x_nbr  (unit diagonal: the x term
    # is exact; each neighbor product is a Dekker two-product)
    ah, al = dd.dd_sub(bth, btl, xh, xl)
    for (wh, wl), axis, shift in ((wE, 1, -1), (wW, 1, 1),
                                  (wS, 0, -1), (wN, 0, 1)):
        nh = _neighbor(xh, axis, shift)
        nl = _neighbor(xl, axis, shift)
        ph, pe = dd.dd_mul(wh, wl, nh, nl)
        ah, al = dd.dd_add(ah, al, ph, pe)

    # original-space norm: ||r||^2 = sum(D * rt^2) per sample (segment
    # reduction, same layouts as the CG kernels: lane-selection matmul
    # for the packed-fine layout, sublane-selection for the stacked one)
    if Wf:
        lanes = wE[0].shape[1]
        lid = jax.lax.broadcasted_iota(jnp.int32, (lanes, BS), 0) // Wf
        kid = jax.lax.broadcasted_iota(jnp.int32, (lanes, BS), 1)
        Ssel = (lid == kid).astype(f32)  # (Lf, BS)
        part = jnp.sum(diag * ah * ah, axis=0, keepdims=True)
        rr = jnp.dot(part, Ssel, preferred_element_type=f32)  # (1, BS)
        active = (rr > tol2bb).astype(f32)
        rt_out[0] = jnp.dot(active, Ssel.T,
                            preferred_element_type=f32) * ah
    else:
        sid = jax.lax.broadcasted_iota(jnp.int32, (BS, rows), 1) // H
        kid = jax.lax.broadcasted_iota(jnp.int32, (BS, rows), 0)
        S = (sid == kid).astype(f32)
        part = jnp.dot(S, diag * ah * ah, preferred_element_type=f32)
        rr = jnp.sum(part, axis=1, keepdims=True)

        active = (rr > tol2bb).astype(f32)
        rt_out[0] = jnp.dot(S.T, active, preferred_element_type=f32) * ah
    xh_out[0] = xh
    xl_out[0] = xl
    rr_out[0] = rr


def _dd_build_kernel(chih_ref, chil_ref, bh_ref, bl_ref,
                     mI_ref, mE_ref, mW_ref, mS_ref, mN_ref,
                     wEh_o, wEl_o, wWh_o, wWl_o, wSh_o, wSl_o,
                     wNh_o, wNl_o, bth_o, btl_o, diag_o, dh_o, sh_o, sl_o):
    """Fused construction of ALL blocked dd operands from packed cell-
    coefficient grids (lane-packed fine layout only).

    The XLA version of this build (build_dd_scaled_from_blocks + the prep
    packing) measured 4.3-4.9 ms/1000 samples at the paper config — ~20%
    of the whole solve.  This kernel keeps every intermediate in VMEM, but
    measured a WASH against the XLA pipeline (interleaved A/B 2026-08-18:
    4.3 ms kernel-only vs 4.3-4.9 ms XLA): the ~600 f32 EFT ops/element
    make the build VPU-COMPUTE-bound, not HBM-bound.  The piecewise
    class-grid build (ops/piecewise.py) removes the compute instead but
    measured ~6% slower end-to-end (its HIGHEST-precision expansion matmuls
    cost more than the EFT compute they save) — ``build="kernel"`` (this
    kernel) is the DEFAULT (solvers.py); piecewise is the A/B alternative,
    with this kernel as its bit-exactness oracle.

    Boundary semantics are carried by five static 0/1 masks (shared across
    blocks) instead of the XLA build's zero-fill shifts: the circular rolls'
    wrap garbage lands only in masked rows/lanes, and the scaled-plane masks
    reproduce st._shift's zero-filled far edges (wE last col, wW col 0,
    wS last row, wN row 0) exactly.
    """
    f32 = jnp.float32
    chi, clo = chih_ref[0], chil_ref[0]
    bh, bl = bh_ref[0], bl_ref[0]
    mI = mI_ref[...]
    mE, mW, mS, mN = mE_ref[...], mW_ref[...], mS_ref[...], mN_ref[...]

    def corner(dr, dc):
        # cell value at (i + dr, j + dc) via circular rolls; wrap garbage is
        # confined to masked rows/lanes (cells span nr+1 rows <= H and
        # exactly the Wf-lane slot, so in-range reads never cross samples)
        h, l = chi, clo
        if dr:
            h, l = _neighbor(h, 0, -1), _neighbor(l, 0, -1)
        if dc:
            h, l = _neighbor(h, 1, -1), _neighbor(l, 1, -1)
        return h, l

    cSE = corner(1, 1)
    cNE = corner(0, 1)
    cSW = corner(1, 0)
    cNW = (chi, clo)

    def avg(a, b):
        # exact dd edge average 0.5 * (a + b) (two-sum; 0.5 scale is exact)
        s, e = dd.two_sum(a[0], b[0])
        h, l = dd.fast_two_sum(s, e + (a[1] + b[1]))
        return f32(0.5) * h * mI, f32(0.5) * l * mI

    wE = avg(cSE, cNE)
    wW = avg(cSW, cNW)
    wS = avg(cSE, cSW)
    wN = avg(cNE, cNW)
    dgh, dgl = dd.dd_add(*wE, *wW)
    dgh, dgl = dd.dd_add(dgh, dgl, *wS)
    dgh, dgl = dd.dd_add(dgh, dgl, *wN)
    one = f32(1.0)
    # masked rows/lanes AND padded (all-zero) samples get diag 1 so the
    # rsqrt stays finite (0 * inf = NaN would otherwise leak through the
    # masked products)
    safe = (dgh > 0).astype(f32)
    sh, sl = dd.dd_rsqrt(jnp.where(safe > 0, dgh, one), dgl * safe)

    def plane(w, axis, shift, mask):
        th, tl_ = dd.dd_mul(w[0], w[1], sh, sl)
        nh = _neighbor(sh, axis, shift)
        nl = _neighbor(sl, axis, shift)
        ph, pl_ = dd.dd_mul(th, tl_, nh, nl)
        return ph * mask, pl_ * mask

    wEh_o[0], wEl_o[0] = plane(wE, 1, -1, mE)
    wWh_o[0], wWl_o[0] = plane(wW, 1, 1, mW)
    wSh_o[0], wSl_o[0] = plane(wS, 0, -1, mS)
    wNh_o[0], wNl_o[0] = plane(wN, 0, 1, mN)
    th, tl_ = dd.dd_mul(bh, bl, sh, sl)
    bth_o[0], btl_o[0] = th * mI, tl_ * mI
    diag_o[0] = dgh * mI
    dh_o[0] = jnp.sqrt(jnp.maximum(dgh, f32(0.0))) * mI
    sh_o[0] = sh
    sl_o[0] = sl


class PackedOperands(NamedTuple):
    """All blocked (packed-fine layout) per-solve operands emitted by the
    fused build kernel.  The hi weight planes double as the two-level CG
    kernel's (unit-diagonal) symmetrized weights — no second packing pass."""

    wEh: jnp.ndarray
    wEl: jnp.ndarray
    wWh: jnp.ndarray
    wWl: jnp.ndarray
    wSh: jnp.ndarray
    wSl: jnp.ndarray
    wNh: jnp.ndarray
    wNl: jnp.ndarray
    bth: jnp.ndarray
    btl: jnp.ndarray
    diag: jnp.ndarray
    dh: jnp.ndarray
    sh: jnp.ndarray
    sl: jnp.ndarray


def _build_masks(dims):
    import numpy as np

    B, nr, nc, BS, H, W = dims[:6]
    Wf = dims[10]
    m = np.zeros((H, W), np.float32)
    for s in range(BS):
        m[:nr, s * Wf : s * Wf + nc] = 1.0
    mE, mW_, mS, mN = m.copy(), m.copy(), m.copy(), m.copy()
    for s in range(BS):
        mE[:, s * Wf + nc - 1] = 0.0
        mW_[:, s * Wf] = 0.0
    mS[nr - 1, :] = 0.0
    mN[0, :] = 0.0
    return tuple(jnp.asarray(x) for x in (m, mE, mW_, mS, mN))


def build_dd_packed(a: jnp.ndarray, N: int, b3: jnp.ndarray, dims: tuple,
                    interpret: bool = False) -> PackedOperands:
    """Run the fused operand-build kernel: block coefficients ``a``
    ``(B, nrb, ncb)`` (f64) + rhs ``b3`` ``(B, nr, nc)`` (f64, possibly a
    broadcast) -> every blocked operand of the packed-fine solve.  Only the
    tiny coefficient split, the rhs split, and the cell-grid packing run in
    XLA.  Semantics match build_dd_scaled_from_blocks + prepare_dd +
    prepare_2l's weight packing to the last bit (tested)."""
    from romhighcontrast_tpu.ops.pallas_cg_2l import pack_fine

    B, nr, nc, BS, H, W = dims[:6]
    BP = dims[8]
    Wf = dims[10] if len(dims) > 10 else 0
    if not Wf:
        raise ValueError("build_dd_packed requires the packed-fine layout")
    f32 = jnp.float32
    if a.dtype == jnp.float64:
        ah64, al64 = dd.dd_from_f64(a)
    else:
        ah64, al64 = a, jnp.zeros_like(a)
    chi = st.cell_grid(ah64.astype(f32), N)
    clo = st.cell_grid(al64.astype(f32), N)
    cdims = (B, nr + 1, nc + 1) + tuple(dims[3:])
    chip, clop = pack_fine(chi, cdims), pack_fine(clo, cdims)
    if b3.dtype == jnp.float64:
        bh, bl = dd.dd_from_f64(b3)
    else:
        bh, bl = b3.astype(f32), jnp.zeros_like(b3, f32)
    bhp, blp = pack_fine(bh, dims), pack_fine(bl, dims)
    masks = _build_masks(dims)

    fspec = pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def smat(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    out_sds = jax.ShapeDtypeStruct((BP // BS, H, W), f32)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            _dd_build_kernel,
            grid=(BP // BS,),
            in_specs=[fspec] * 4 + [smat(m) for m in masks],
            out_specs=(fspec,) * 14,
            out_shape=(out_sds,) * 14,
            compiler_params=tpu_compiler_params(),
            interpret=interpret,
        )(chip, clop, bhp, blp, *masks)
    return PackedOperands(*outs)


class DDOperands(NamedTuple):
    """Per-sample (hi, lo) f32 pairs of the scaled operator/rhs, unblocked
    ``(B, nr, nc)`` — the gatherable form (the compact straggler phase
    indexes these before blocking)."""

    wE: tuple
    wW: tuple
    wS: tuple
    wN: tuple
    bt: tuple
    diag: jnp.ndarray  # f32 norm weights
    s: tuple           # the scale D^{-1/2} as a dd pair (final combine)


def build_dd_scaled(w3: st.StencilCoefficients, b3: jnp.ndarray
                    ) -> DDOperands:
    """Build the dd scaled operator ``Kt = D^-1/2 K D^-1/2`` and rhs
    ``bt = D^-1/2 b`` from the f64 stencil weights WITHOUT any emulated-f64
    symmetrize pass: the only f64 touches are the initial (hi, lo) splits;
    the rsqrt and all products run as error-free f32 transforms (~2^-48
    relative — validated against the f64 symmetrize in tests)."""
    f32 = jnp.float32
    dh_, dl_ = dd.dd_from_f64(w3.diag)
    sh, sl = dd.dd_rsqrt(dh_, dl_)

    def plane(name, axis, by):
        wh_, wl_ = dd.dd_from_f64(getattr(w3, name))
        th, tl_ = dd.dd_mul(wh_, wl_, sh, sl)
        nh = st._shift(sh, axis, by)
        nl = st._shift(sl, axis, by)
        return dd.dd_mul(th, tl_, nh, nl)

    bh, bl = dd.dd_from_f64(jnp.broadcast_to(b3, w3.diag.shape))
    return DDOperands(
        wE=plane("wE", -1, -1), wW=plane("wW", -1, 1),
        wS=plane("wS", -2, -1), wN=plane("wN", -2, 1),
        bt=dd.dd_mul(bh, bl, sh, sl),
        diag=w3.diag.astype(f32), s=(sh, sl),
    )


def build_dd_scaled_from_blocks(a: jnp.ndarray, N: int, b3: jnp.ndarray):
    """Like :func:`build_dd_scaled`, but starting from the BLOCK
    coefficients ``a (B, nrb, ncb)`` — no f64 full-grid array is ever read
    or written: the only f64 touches are the tiny block-coefficient split
    and the rhs split.  Edge weights are exact dd averages of the cell
    coefficients (two-sum + an exact power-of-two scale), the diagonal
    their dd sum, and the symmetrize runs as dd products — everything
    matches the f64 pipeline to ~2^-48 (tested).

    Returns ``(DDOperands, w32)`` where ``w32`` are the f32 unscaled
    stencil weights (= hi parts + dd diagonal hi), for the coarse-operator
    assembly and the Jacobi warp."""
    f32 = jnp.float32
    ah64, al64 = dd.dd_from_f64(a)
    chi = st.cell_grid(ah64.astype(f32), N)
    clo = st.cell_grid(al64.astype(f32), N)

    def corner(c, dr, dc):
        sl_r = slice(1, None) if dr else slice(None, -1)
        sl_c = slice(1, None) if dc else slice(None, -1)
        return c[..., sl_r, sl_c]

    def avg(r1, c1, r2, c2):
        x1, y1 = corner(chi, r1, c1), corner(clo, r1, c1)
        x2, y2 = corner(chi, r2, c2), corner(clo, r2, c2)
        s, e = dd.two_sum(x1, x2)
        h, l = dd.fast_two_sum(s, e + (y1 + y2))
        return jnp.float32(0.5) * h, jnp.float32(0.5) * l

    wE = avg(1, 1, 0, 1)
    wW = avg(1, 0, 0, 0)
    wS = avg(1, 1, 1, 0)
    wN = avg(0, 1, 0, 0)
    dh_, dl_ = dd.dd_add(*wE, *wW)
    dh_, dl_ = dd.dd_add(dh_, dl_, *wS)
    dh_, dl_ = dd.dd_add(dh_, dl_, *wN)
    sh, sl = dd.dd_rsqrt(dh_, dl_)

    def plane(whl, axis, by):
        th, tl_ = dd.dd_mul(whl[0], whl[1], sh, sl)
        nh = st._shift(sh, axis, by)
        nl = st._shift(sl, axis, by)
        return dd.dd_mul(th, tl_, nh, nl)

    bh, bl = dd.dd_from_f64(jnp.broadcast_to(b3, dh_.shape))
    ops = DDOperands(
        wE=plane(wE, -1, -1), wW=plane(wW, -1, 1),
        wS=plane(wS, -2, -1), wN=plane(wN, -2, 1),
        bt=dd.dd_mul(bh, bl, sh, sl),
        diag=dh_, s=(sh, sl),
    )
    w32 = st.StencilCoefficients(wE=wE[0], wW=wW[0], wS=wS[0], wN=wN[0],
                                 diag=dh_)
    return ops, w32


def gather_dd(ops: DDOperands, idx) -> DDOperands:
    """Index the sample axis (compact straggler phases)."""
    g = lambda p: (p[0][idx], p[1][idx])
    return DDOperands(wE=g(ops.wE), wW=g(ops.wW), wS=g(ops.wS),
                      wN=g(ops.wN), bt=g(ops.bt), diag=ops.diag[idx],
                      s=g(ops.s))


class PreparedDD(NamedTuple):
    """Blocked dd operands for the round-update kernel (same
    (BP//BS, BS*H, W) layout as Prepared2L so the inner kernel and this one
    share sample ordering and padding)."""

    wEh: jnp.ndarray
    wEl: jnp.ndarray
    wWh: jnp.ndarray
    wWl: jnp.ndarray
    wSh: jnp.ndarray
    wSl: jnp.ndarray
    wNh: jnp.ndarray
    wNl: jnp.ndarray
    bth: jnp.ndarray
    btl: jnp.ndarray
    diag: jnp.ndarray


def prepare_dd(ops: DDOperands, dims: tuple) -> PreparedDD:
    """Block/pad the dd operand pairs.  ``dims`` comes from
    pallas_cg_2l.prepare_2l (or dd_dims) so layouts agree with the inner
    kernel's (including the lane-packed fine layout when dims carries a
    nonzero ``Wf``)."""
    from romhighcontrast_tpu.ops.pallas_cg_2l import pack_fine

    def padf(x):
        return pack_fine(x, dims)

    # zero the dead Dirichlet-edge weights (hi AND lo) so the circular lane
    # rolls annihilate cross-sample leakage exactly like the CG kernels
    wEh = padf(ops.wE[0].at[..., -1].set(0.0))
    wEl = padf(ops.wE[1].at[..., -1].set(0.0))
    wWh = padf(ops.wW[0].at[..., 0].set(0.0))
    wWl = padf(ops.wW[1].at[..., 0].set(0.0))
    return PreparedDD(
        wEh=wEh, wEl=wEl, wWh=wWh, wWl=wWl,
        wSh=padf(ops.wS[0]), wSl=padf(ops.wS[1]),
        wNh=padf(ops.wN[0]), wNl=padf(ops.wN[1]),
        bth=padf(ops.bt[0]), btl=padf(ops.bt[1]), diag=padf(ops.diag),
    )


def dd_dims(B: int, nr: int, nc: int) -> tuple:
    """Standalone dims for phases that do not build a two-level prep (the
    straggler phases use the single-level inner kernel); same padding and
    block-size policy as pallas_cg_2l.prepare_2l."""
    from romhighcontrast_tpu.ops.pallas_cg_2l import auto_block_size_2l

    H = _round_up(nr + 1, 8)
    W = _round_up(nc, 128)
    BS = auto_block_size_2l(H, W)
    BP = _round_up(B, BS)
    return (B, nr, nc, BS, H, W, 0, 0, BP, 0)


def dd_round(prep: PreparedDD, dims: tuple, xh: jnp.ndarray, xl: jnp.ndarray,
             d: jnp.ndarray, tol2bb: jnp.ndarray, interpret: bool = False,
             blocked_state: bool = False, d_blocked: bool = False):
    """Apply one refinement-round update.

    xh, xl, d: ``(B, nr, nc)`` f32 in the SAME sample order as ``prep``.
    tol2bb: ``(B,)`` absolute squared original-space thresholds.
    Returns ``(xh', xl', rt_next, rr)`` with rt_next zero-masked for
    converged samples and ``rr = ||b - K x||^2`` in the original space.
    With ``blocked_state=True`` the carried state (xh, xl and the returned
    xh', xl', rt') lives in the blocked ``(BP//BS, BS*H, W)`` layout across
    rounds — the per-round pad/unpad copies (7 x ~70 MB per round at the
    paper config) disappear; only ``rr`` is returned per-sample.  ``d`` may
    be blocked or per-sample (``d_blocked``) — the single-level straggler
    kernel returns per-sample corrections.
    """
    from romhighcontrast_tpu.ops.pallas_cg_2l import (
        fine_dims, pack_fine, unpack_fine,
    )

    B, nr, nc, BS, H, W = dims[:6]
    BP = dims[8]
    rows, lanes, Wf = fine_dims(dims)

    if blocked_state:
        xh_p, xl_p = xh, xl
    else:
        xh_p, xl_p = pack_fine(xh, dims), pack_fine(xl, dims)
    d_p = d if d_blocked else pack_fine(d, dims)
    # padded rows: threshold inf so they always read as converged
    v_shape = (1, 1, BS) if Wf else (1, BS, 1)
    t2 = jnp.pad(tol2bb.astype(jnp.float32), (0, BP - B),
                 constant_values=jnp.inf).reshape((BP // BS,) + v_shape[1:])

    fspec = pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec(v_shape, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        xh2, xl2, rt, rr = pl.pallas_call(
            functools.partial(_dd_round_kernel, BS=BS, H=H, Wf=Wf),
            grid=(BP // BS,),
            in_specs=[fspec] * 11 + [fspec, fspec, fspec, vspec],
            out_specs=(fspec, fspec, fspec, vspec),
            out_shape=(
                jax.ShapeDtypeStruct((BP // BS, rows, lanes), jnp.float32),
                jax.ShapeDtypeStruct((BP // BS, rows, lanes), jnp.float32),
                jax.ShapeDtypeStruct((BP // BS, rows, lanes), jnp.float32),
                jax.ShapeDtypeStruct((BP // BS,) + v_shape[1:], jnp.float32),
            ),
            compiler_params=tpu_compiler_params(),
            interpret=interpret,
        )(prep.wEh, prep.wEl, prep.wWh, prep.wWl, prep.wSh, prep.wSl,
          prep.wNh, prep.wNl, prep.bth, prep.btl, prep.diag,
          xh_p, xl_p, d_p, t2)

    rr_out = rr.reshape(BP)[:B]
    if blocked_state:
        return xh2, xl2, rt, rr_out

    return (unpack_fine(xh2, dims), unpack_fine(xl2, dims),
            unpack_fine(rt, dims), rr_out)

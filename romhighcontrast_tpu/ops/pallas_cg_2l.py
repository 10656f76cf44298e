"""Fused multi-sample Pallas kernel: two-level (Chebyshev + warped-coarse)
preconditioned CG on the Jacobi-symmetrized stencil system.

Extends the round-2 kernel (pallas_cg_v2.py — sublane stacking, scalar-level
convergence freezing, MXU segment reductions, divergence guard) with the
additive two-level preconditioner of ops/twolevel.py:

    z  =  Cheb_deg(K~) r   +   W q_dc(Ghat) W^T r,      W = D^{1/2} P

* The fine Chebyshev runs at LOW degree (3-4) on a window whose lower end
  ``mu ~ (pi * stride * h)^2`` is covered by the coarse space — measured
  (CPU prototype, paper config, contrast 1e10): 18 outer x 13 matvecs
  (deg-12 single-level) -> 11 outer x 4 matvecs.
* The coarse solve is INEXACT: ``dc`` Chebyshev sweeps on the per-sample
  Jacobi-normalized coarse 9-point stencil, entirely in VMEM, in a stacked
  ``(BS*Hc, Wc)`` coarse layout (sublane rolls between samples are
  annihilated by the zero bands at coarse-grid boundaries, the same
  induction as the fine layout).  Measured cost: +1 outer iteration vs the
  exact ``Ghat^{-1}`` (which would need per-sample dense m x m solves —
  unexpressible without Mosaic-hostile relayouts).
* Restriction/prolongation are separable (bilinear = hr x hc): two small
  MXU matmuls each way with static block-diagonal row transfers, plus the
  elementwise ``D^{1/2}`` warp on the fine side and the ``diag(G)^{-1/2}``
  normalization on the coarse side.

Both preconditioner terms are fixed SPD linear operators (the Chebyshev
solution polynomials ``q(lambda) = (1 - p(lambda))/lambda`` are positive on
the spectrum), so standard CG applies.

Reference equivalent being replaced: the per-parameter scipy LU solves at
/root/reference/src/lib/SolutionsManagers.py:17-40,64-68.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from romhighcontrast_tpu.ops import dd
from romhighcontrast_tpu.ops import stencil as st
from romhighcontrast_tpu.ops import twolevel as tl
from romhighcontrast_tpu.ops.pallas_cg import (
    _neighbor, _round_up, tpu_compiler_params,
)


def default_fine_window(grid_shape, strides) -> tuple[float, float]:
    """Fine Chebyshev window [mu, 2]: the coarse space owns modes below
    ``mu ~ 3 (pi * stride / (n+1))^2`` (TPU sweep at the paper grid: 0.12
    beats the prototype's 0.077 by ~4% end-to-end — the coarse level covers
    slightly past its nominal cut, so the fine polynomial can be lazier).

    The ratio floors at 1/16 (the paper grid's stride/(n+1), mu = 0.116):
    denser-than-1/16 coarse grids keep covering well past their nominal cut,
    and dropping the fine edge with them is a measured loser at every fine
    mesh (sweeps 2026-08-19: mesh 40 stride 5, lmin 0.116 = 5,612/s vs auto
    0.029 = 5,277; mesh 64 stride 8, 0.116 = 1,648 vs auto 1,618)."""
    ratio = max(strides[0] / (grid_shape[0] + 1),
                strides[1] / (grid_shape[1] + 1), 1.0 / 16.0)
    return min(0.5, 3.0 * (math.pi * ratio) ** 2), 2.0


def auto_block_size_2l(H: int, W: int) -> int:
    """Samples per kernel block.  Live f32 footprint ~34 fine (BS*H, W)
    buffers (v2's ~26 + D^{1/2} + the preconditioner temporaries) plus the
    static transfer matrices; keep it inside the 16 MB scoped-VMEM budget
    with headroom (a 30-buffer/15 MB estimate compiled to 16.94 MB at
    H=W=256 and OOM'd the scoped allocator — measured at mesh 64)."""
    bs = 8
    while bs > 1 and 34 * bs * H * W * 4 > 14 * 2**20:
        bs //= 2
    return bs


def auto_block_size_packed(H: int, nc: int, m1r: int, m1c: int,
                           dd_cg: bool = False) -> int:
    """Samples per block for the LANE-PACKED fine layout: all BS samples
    share one ``(H, Lf)`` array at lane pitch ``Wf = nc + 1``.

    With the VMEM wall lifted (pallas_cg.VMEM_LIMIT_BYTES — the 16 MB
    "scoped limit" rounds 1-3 sized against was only Mosaic's default; the
    chip has 128 MB), block size is picked by LANE ECONOMICS, measured
    2026-08-19 (interleaved TPU sweeps, scripts/sweep_r4_stride.py main4):

    * lane-padding waste dominates: mesh 40 BS=2 pads ``round_up(320, 128)
      = 384`` (17% dead lanes) and runs 5,488/s; BS=8 packs 1280 exactly
      and runs 6,584/s (+20%).  Prefer the BS with the smallest padding
      fraction.
    * at equal padding, bigger blocks win slightly (mesh 20 BS=16 27,999
      vs BS=8 27,407; mesh 64 BS=8 1,871 ~ BS=1 1,868) — fewer grid steps
      amortize per-block fixed work; ties break toward the larger BS.
    * too-wide blocks lose: mesh 20 BS=32 (Lf=2560) 27,258 (-3%), mesh 40
      BS=16 (Lf=2560) 6,451 (-2%) — cap ``Lf <= 2048``.

    The VMEM budget still bounds the candidate set (the dd round-update
    kernel's compensated-stencil temporaries peak at ~40 fine buffers;
    the transfer matrices scale with BS^2), now against
    ``VMEM_BUDGET_BYTES`` with headroom below the raised limit."""
    from romhighcontrast_tpu.ops.pallas_cg import VMEM_BUDGET_BYTES

    Hc = _round_up(m1r + 1, 8)
    Wf = nc + 1
    best, best_frac = 1, 1.0
    for bs in (16, 8, 4, 2, 1):
        Lf = _round_up(bs * Wf, 128)
        Lc = _round_up(bs * (m1c + 1), 128)
        est = (34 * H * Lf + 2 * Lf * Lc + 14 * Hc * Lc + 2 * Hc * H) * 4
        est_dd = 40 * H * Lf * 4
        if dd_cg:
            # the dd-STATE CG kernel (_pcg_2l_dd_kernel) carries x/r as
            # (hi, lo) pairs plus 12 double-buffered dd operand windows:
            # measured 159.28 MB scoped VMEM (~76 H x Lf buffers, 88.99 MB
            # of it register-allocator spill) at H=256, Lf=2048 on v5e —
            # model it at 80 buffers
            est_dd = max(est_dd, 80 * H * Lf * 4)
        if max(est, est_dd) > VMEM_BUDGET_BYTES or Lf > 2048:
            continue
        frac = (Lf - bs * Wf) / Lf
        if frac < best_frac - 1e-9:
            best, best_frac = bs, frac
    return best


def fused_kernels_feasible(grid_shape: tuple[int, int]) -> bool:
    """Whether the PLAIN fused 2l CG kernel fits VMEM at block size 1 —
    the outer bound for serving a grid in-kernel at all.

    Measured on v5e (2026-08-20, scripts/probe_mesh256_kernel.py): the
    plain kernel COMPILES AND RUNS at (1023, 1023) = mesh 256 on (4,4)
    blocks (dim 1.05M; H = Lf = 1024, 4 MB/buffer) and hard-fails the
    Mosaic compile at (1151, 1151) — bracketing the true live set at
    ~26-32 fine buffers.  Modeled at 30 buffers against the 128 MB
    physical limit (mesh 256 -> 125.8 MB: in; mesh 288 -> 159 MB: out).
    Callers downgrade to the XLA inner past this bound instead of letting
    the compile die.  The PHASED driver's dd-round kernel has a larger
    live set — see :func:`phased_driver_feasible`."""
    from romhighcontrast_tpu.ops.pallas_cg import VMEM_LIMIT_BYTES

    nr, nc = grid_shape
    H = _round_up(nr + 1, 8)
    Lf = _round_up(nc + 1, 128)
    return 30 * H * Lf * 4 <= VMEM_LIMIT_BYTES


def phased_driver_feasible(grid_shape: tuple[int, int]) -> bool:
    """Whether the PHASED dd-state driver can run on this grid: its
    binding kernel is the dd round update (~40 live fine buffers,
    ops/pallas_dd_round.py), infeasible past ~(895, 895) interior vertices
    (mesh 224 on a (4,4) geometry — measured 159.28 MB OOM, ROADMAP r4
    item 9).  Between this bound and :func:`fused_kernels_feasible` the
    solve serves through the GENERIC refinement loop (XLA f64 glue) with
    the plain 2l kernel as its inner — in-kernel up to dim ~1.05M."""
    from romhighcontrast_tpu.ops.pallas_cg import VMEM_BUDGET_BYTES

    nr, nc = grid_shape
    H = _round_up(nr + 1, 8)
    Lf = _round_up(nc + 1, 128)
    return 40 * H * Lf * 4 <= VMEM_BUDGET_BYTES


def dd_kernel_feasible(grid_shape: tuple[int, int]) -> bool:
    """Whether the dd-STATE CG kernel (``_pcg_2l_dd_kernel``) fits scoped
    VMEM at block size 1 on this grid.

    Its live set is ~2x the plain kernels' (x/r as (hi, lo) pairs plus 12
    double-buffered dd operand windows — the same 80-buffer model
    ``auto_block_size_packed`` budgets with ``dd_cg=True``), so there is a
    grid window where the plain fused kernels fit but the dd kernel does
    not even at BS=1 (e.g. mesh 160 on a (4,4) geometry: H = Lf = 640).
    ``auto_block_size_packed`` silently returns its fallback BS=1 there;
    without this gate the phased driver would hand Mosaic an over-budget
    compile that hard-fails instead of falling back to the documented
    rounds/2l paths."""
    from romhighcontrast_tpu.ops.pallas_cg import VMEM_BUDGET_BYTES

    nr, nc = grid_shape
    H = _round_up(nr + 1, 8)
    Lf = _round_up(nc + 1, 128)
    return 80 * H * Lf * 4 <= VMEM_BUDGET_BYTES


def fine_dims(dims) -> tuple[int, int, int]:
    """``(rows, lanes, Wf)`` of one fine kernel block.  ``Wf = 0`` marks the
    stacked layout (samples along sublanes, block ``(BS*H, W)``); ``Wf > 0``
    the lane-packed layout (block ``(H, W)`` with samples at lane pitch
    ``Wf``)."""
    BS, H, W = dims[3], dims[4], dims[5]
    Wf = dims[10] if len(dims) > 10 else 0
    return ((H, W, Wf) if Wf else (BS * H, W, 0))


def fine_to_samples(xb: jnp.ndarray, dims) -> jnp.ndarray:
    """Blocked fine array -> padded per-sample view ``(BP, H, Wp)`` (``Wp``
    = ``Wf`` packed / ``W`` stacked)."""
    B, nr, nc, BS, H, W = dims[:6]
    BP = dims[8]
    rows, lanes, Wf = fine_dims(dims)
    if Wf:
        v = xb[:, :, : BS * Wf].reshape(BP // BS, H, BS, Wf)
        return v.transpose(0, 2, 1, 3).reshape(BP, H, Wf)
    return xb.reshape(BP, H, W)


def fine_from_samples(v: jnp.ndarray, dims) -> jnp.ndarray:
    """Inverse of :func:`fine_to_samples` (re-zeroes the packed guard
    lanes, which hold exact zeros by the kernel induction)."""
    B, nr, nc, BS, H, W = dims[:6]
    BP = dims[8]
    rows, lanes, Wf = fine_dims(dims)
    if Wf:
        x = v.reshape(BP // BS, BS, H, Wf).transpose(0, 2, 1, 3)
        x = x.reshape(BP // BS, H, BS * Wf)
        return jnp.pad(x, ((0, 0), (0, 0), (0, W - BS * Wf)))
    return v.reshape(BP // BS, BS * H, W)


def pack_fine(x: jnp.ndarray, dims) -> jnp.ndarray:
    """Pad/block a per-sample batch ``(B, nr, nc)`` into the fine kernel
    layout selected by ``dims``."""
    B, nr, nc, BS, H, W = dims[:6]
    BP = dims[8]
    rows, lanes, Wf = fine_dims(dims)
    Wp = Wf if Wf else W
    x = jnp.pad(x.astype(jnp.float32),
                ((0, BP - x.shape[0]), (0, H - nr), (0, Wp - nc)))
    return fine_from_samples(x, dims)


def unpack_fine(xb: jnp.ndarray, dims) -> jnp.ndarray:
    """Blocked fine array -> unpadded per-sample batch ``(B, nr, nc)``."""
    B, nr, nc = dims[:3]
    return fine_to_samples(xb, dims)[:B, :nr, :nc]


def _transfer_mats(hr, hc, BS, H, W, Hc, Wc):
    """Static restriction/prolongation operands for the stacked layouts.

    Rrow  (BS*Hc, BS*H): block-diag rows,  Rrow[s*Hc+p, s*H+i] = hr[p, i]
    Ccol  (W, Wc):                         Ccol[j, q]          = hc[q, j]
    """
    m1r, nr = hr.shape
    m1c, nc = hc.shape
    Rrow = np.zeros((BS * Hc, BS * H), np.float32)
    for s in range(BS):
        Rrow[s * Hc : s * Hc + m1r, s * H : s * H + nr] = hr
    Ccol = np.zeros((W, Wc), np.float32)
    Ccol[:nc, :m1c] = hc.T
    return (jnp.asarray(Rrow), jnp.asarray(Rrow.T),
            jnp.asarray(Ccol), jnp.asarray(Ccol.T))


def _make_cmatvec(bands):
    # normalized coarse 9-point stencil; unit diagonal by construction,
    # signed off-diagonal bands (no negation here)
    def cmatvec(y):
        out = y
        for (dp, dq), wgt in bands.items():
            t = y
            if dp:
                t = _neighbor(t, 0, -dp)
            if dq:
                t = _neighbor(t, 1, -dq)
            out = out + wgt * t
        return out

    return cmatvec


def _make_cheb(apply_op, deg_, lo, hi):
    f32 = jnp.float32
    theta = f32((hi + lo) / 2.0)
    delta = f32((hi - lo) / 2.0)
    sigma = float((hi + lo) / (hi - lo))

    def cheb(r):
        rho = f32(1.0 / sigma)
        d = r / theta
        z = d
        for _ in range(deg_ - 1):
            rho_new = f32(1.0) / (f32(2.0 * sigma) - rho)
            d = (rho_new * rho) * d + (f32(2.0) * rho_new / delta) * (
                r - apply_op(z)
            )
            z = z + d
            rho = rho_new
        return z

    return cheb


def _lane_helpers(lanes: int, BS: int, Wf: int):
    """Per-sample scalar machinery for the LANE-PACKED fine layout: the
    ``(Lf, BS)`` lane-selection matrix plus the (pair-)dot and row-broadcast
    closures built on it (shared by the CG kernels)."""
    f32 = jnp.float32
    lid = jax.lax.broadcasted_iota(jnp.int32, (lanes, BS), 0) // Wf
    kid = jax.lax.broadcasted_iota(jnp.int32, (lanes, BS), 1)
    Ssel = (lid == kid).astype(f32)  # (Lf, BS); padded lanes match none

    def dots(u, v):
        part = jnp.sum(u * v, axis=0, keepdims=True)  # (1, Lf)
        return jnp.dot(part, Ssel, preferred_element_type=f32)

    def dots2(u, v, w):
        # (u.v, u.w) through ONE lane-selection matmul: the two (1, Lf)
        # partials stack on the sublane axis, so the pair costs one
        # (2, Lf) x (Lf, BS) MXU pass instead of two
        parts = jnp.concatenate(
            [jnp.sum(u * v, axis=0, keepdims=True),
             jnp.sum(u * w, axis=0, keepdims=True)], axis=0)
        res = jnp.dot(parts, Ssel, preferred_element_type=f32)
        return res[0:1, :], res[1:2, :]

    def to_rows(c):  # (1, BS) -> (1, Lf), row-broadcast at use sites
        return jnp.dot(c, Ssel.T, preferred_element_type=f32)

    return dots, dots2, to_rows


def _pcg_2l_kernel(wE_ref, wW_ref, wS_ref, wN_ref, b_ref, dh_ref, sg_ref,
                   cnn_ref, cn0_ref, cnp_ref, c0n_ref, c0p_ref, cpn_ref,
                   cp0_ref, cpp_ref, rtol2_ref, Rrow_ref, RrowT_ref, Ccol_ref,
                   CcolT_ref, *rest, maxiter: int, BS: int,
                   H: int, deg: int, lmin: float, lmax: float, dc: int,
                   clmin: float, clmax: float, xfer_bf16: bool = False,
                   Wcp: int = 0, Wf: int = 0, fuse_dots: bool = False,
                   dc2: int = 0, cl2min: float = 0.12, cl2max: float = 2.05,
                   hi_xfer: bool = False):
    f32 = jnp.float32
    wE, wW, wS, wN = wE_ref[0], wW_ref[0], wS_ref[0], wN_ref[0]
    b = b_ref[0]
    dh = dh_ref[0]
    sg = sg_ref[0]
    rtol2 = rtol2_ref[0]  # (BS, 1) per-sample relative tolerance, squared
    cb = {(-1, -1): cnn_ref[0], (-1, 0): cn0_ref[0], (-1, 1): cnp_ref[0],
          (0, -1): c0n_ref[0], (0, 1): c0p_ref[0], (1, -1): cpn_ref[0],
          (1, 0): cp0_ref[0], (1, 1): cpp_ref[0]}
    Rrow, RrowT, Ccol, CcolT = (Rrow_ref[...], RrowT_ref[...], Ccol_ref[...],
                                CcolT_ref[...])
    if dc2:
        # THIRD LEVEL (packed-fine layout only): 13 extra operand refs —
        # sg2, 8 level-2 bands, and the coarse->coarse2 transfers
        (sg2_ref, c2nn, c2n0, c2np, c20n, c20p, c2pn, c2p0, c2pp,
         Rrow2_ref, Rrow2T_ref, Ccol2_ref, Ccol2T_ref) = rest[:13]
        rest = rest[13:]
        sg2 = sg2_ref[0]
        cb2 = {(-1, -1): c2nn[0], (-1, 0): c2n0[0], (-1, 1): c2np[0],
               (0, -1): c20n[0], (0, 1): c20p[0], (1, -1): c2pn[0],
               (1, 0): c2p0[0], (1, 1): c2pp[0]}
        Rrow2, Rrow2T, Ccol2, Ccol2T = (
            Rrow2_ref[...], Rrow2T_ref[...], Ccol2_ref[...], Ccol2T_ref[...])
        # sg is zero on padded/guard coarse entries; its safe reciprocal
        # confines the level-2 lift to live nodes (W2 = Sg^{-1} P2 Sg2)
        sg_inv = jnp.where(sg > 0, f32(1.0) / jnp.where(sg > 0, sg, f32(1.0)),
                           f32(0.0))
    x_ref, it_ref = rest

    def matvec(u):
        return (
            u
            - wE * _neighbor(u, 1, -1)
            - wW * _neighbor(u, 1, 1)
            - wS * _neighbor(u, 0, -1)
            - wN * _neighbor(u, 0, 1)
        )

    if Wf:
        # LANE-PACKED fine layout: samples along lanes at pitch Wf; the
        # per-sample scalars live as (1, BS) lane vectors, the segment
        # reductions as a sublane sum + one tiny lane-selection matmul
        dots, dots2, to_rows = _lane_helpers(wE.shape[1], BS, Wf)
    else:
        rows = wE.shape[0]  # BS * H

        sid = jax.lax.broadcasted_iota(jnp.int32, (BS, rows), 1) // H
        kid = jax.lax.broadcasted_iota(jnp.int32, (BS, rows), 0)
        S = (sid == kid).astype(f32)

        def dots(u, v):
            part = jnp.dot(S, u * v, preferred_element_type=f32)
            return jnp.sum(part, axis=1, keepdims=True)

        def dots2(u, v, w):
            # both products through ONE (BS, rows) x (rows, 2W) matmul
            part = jnp.dot(S, jnp.concatenate([u * v, u * w], axis=1),
                           preferred_element_type=f32)
            W_ = u.shape[1]
            return (jnp.sum(part[:, :W_], axis=1, keepdims=True),
                    jnp.sum(part[:, W_:], axis=1, keepdims=True))

        def to_rows(c):
            return jnp.dot(S.T, c, preferred_element_type=f32)

    cmatvec = _make_cmatvec(cb)

    fine_cheb = _make_cheb(matvec, deg, lmin, lmax)
    coarse_cheb = _make_cheb(cmatvec, dc, clmin, clmax)
    if dc2:
        coarse2_cheb = _make_cheb(_make_cmatvec(cb2), dc2, cl2min, cl2max)

        def coarse_solve(craw):
            # additive two-level solve of Ghat y = sg*craw: Chebyshev on the
            # level-1 window + the warped level-2 correction
            #   W2 Sg2 q2(G2hat) Sg2 W2^T (sg*craw),  W2 = Sg^{-1} P2
            # (the Sg^{-1} on the restriction side cancels the sg: the
            # level-2 restriction reads the RAW, pre-normalization vector)
            y = coarse_cheb(sg * craw)
            t2 = jnp.dot(Rrow2, craw, preferred_element_type=f32)
            c2 = sg2 * jnp.dot(t2, Ccol2, preferred_element_type=f32)
            y2 = sg2 * coarse2_cheb(c2)
            u2 = jnp.dot(y2, Ccol2T, preferred_element_type=f32)
            return y + sg_inv * jnp.dot(Rrow2T, u2,
                                        preferred_element_type=f32)
    else:
        def coarse_solve(craw):
            return coarse_cheb(sg * craw)

    if xfer_bf16:
        # The block-diagonal row transfers are the kernel's largest matmuls
        # (~10.5 MMAC each at the paper config); bf16 operands quadruple MXU
        # throughput.  Precision loss (~4e-3 relative on the coarse
        # correction) only perturbs the preconditioner.
        bf16 = jnp.bfloat16
        Rrow_x, RrowT_x = Rrow.astype(bf16), RrowT.astype(bf16)
    else:
        Rrow_x, RrowT_x = Rrow, RrowT

    if Wf:
        # Packed fine + packed coarse: both stages share the lane-packed
        # sample pitch, so the transfers need NO per-sample loops or rolls —
        # the row restriction is ONE shared (Hc, H) x (H, Lf) matmul over
        # all samples at once, and the lane restriction one block-diagonal
        # (Lf, Lc) matmul (hc.T per sample at offsets (s*Wf, s*Wcp)).
        # hi_xfer: run the four warped-transfer matmuls at HIGHEST matmul
        # precision (Mosaic accepts precision=HIGHEST in-kernel).  Probed on
        # hardware 2026-08-19 (scripts/probe_2l_floor_tpu.py): NEUTRAL —
        # at the retuned defaults mesh 40 refines to ~2e-12 either way (the
        # old ~3e-9 floor is gone), and the mesh-64 deep-ask instability is
        # an f32 CG divergence past its floor, not transfer rounding.
        # Kept as a tested A/B knob; default off.
        xp = jax.lax.Precision.HIGHEST if hi_xfer else None

        def precond(r):
            # xfer_bf16 is honored here too (Rrow_x/RrowT_x): measured
            # exactly neutral, kept for semantic consistency with the
            # stacked branches.
            t = dh * r                                        # (H, Lf)
            c1 = jnp.dot(Rrow_x, t, preferred_element_type=f32,
                         precision=xp)                        # (Hc, Lf)
            craw = jnp.dot(c1, Ccol, preferred_element_type=f32,
                           precision=xp)                      # (Hc, Lc)
            y = sg * coarse_solve(craw)                       # (Hc, Lc)
            u = jnp.dot(y, CcolT, preferred_element_type=f32,
                        precision=xp)                         # (Hc, Lf)
            zc = dh * jnp.dot(RrowT_x, u, preferred_element_type=f32,
                              precision=xp)
            return fine_cheb(r) + zc
    elif Wcp:
        # LANE-PACKED coarse stage: all BS samples share one (Hcp, L) array
        # at lane pitch ``Wcp`` (L = round_up(BS*Wcp, 128)).  The standard
        # stacked layout uses ~15% of its 128 lanes at the paper config
        # (m1c = 19), so every coarse Chebyshev sweep wastes ~6x VPU work;
        # packing cuts the coarse arrays 4x.  Transfers exploit the block
        # structure: per-sample (Hcp, H) x (H, W) restrictions (8x fewer
        # MMACs than the block-diagonal (BS*Hc, BS*H) operand), lane-rolled
        # into place; hat-matrix zero columns beyond m1c annihilate the
        # cross-sample lanes on the way back (Wcp = m1c + 1 guard).
        L = sg.shape[1]
        Wc_piece = Ccol.shape[1]

        def precond(r):
            t = dh * r
            cp = None
            for s in range(BS):
                t_s = t[s * H:(s + 1) * H, :]
                c1_s = jnp.dot(Rrow, t_s, preferred_element_type=f32)
                piece = jnp.dot(c1_s, Ccol, preferred_element_type=f32)
                if L > Wc_piece:
                    piece = jnp.concatenate(
                        [piece, jnp.zeros((piece.shape[0], L - Wc_piece),
                                          f32)], axis=1)
                if s:
                    piece = pltpu.roll(piece, shift=jnp.int32(s * Wcp),
                                       axis=1)
                cp = piece if cp is None else cp + piece
            c = sg * cp
            y = sg * coarse_cheb(c)
            outs = []
            for s in range(BS):
                ys = (pltpu.roll(y, shift=jnp.int32(L - s * Wcp), axis=1)
                      if s else y)
                u_s = jnp.dot(ys[:, :Wc_piece], CcolT,
                              preferred_element_type=f32)
                outs.append(jnp.dot(RrowT, u_s, preferred_element_type=f32))
            zc = dh * jnp.concatenate(outs, axis=0)
            return fine_cheb(r) + zc
    else:
        def precond(r):
            t = dh * r
            if xfer_bf16:
                t = t.astype(jnp.bfloat16)
            c1 = jnp.dot(Rrow_x, t, preferred_element_type=f32)
            c = sg * jnp.dot(c1, Ccol, preferred_element_type=f32)
            y = sg * coarse_cheb(c)
            if xfer_bf16:
                y = y.astype(jnp.bfloat16)
            t1 = jnp.dot(RrowT_x, y, preferred_element_type=f32)
            zc = dh * jnp.dot(t1, CcolT, preferred_element_type=f32)
            return fine_cheb(r) + zc

    one = f32(1.0)
    zero = f32(0.0)
    bb = dots(b, b)
    tol2bb = rtol2 * jnp.where(bb == 0, one, bb)
    div2bb = f32(1e12) * jnp.where(bb == 0, one, bb)

    def is_active(rr):
        return jnp.logical_and(rr > tol2bb, rr < div2bb).astype(f32)

    def cond(state):
        rr, it = state[4], state[5]
        keep = jnp.max(is_active(rr)) > zero
        return jnp.logical_and(keep, it < maxiter)

    def body(state):
        x, r, p, rz, rr, it, counts = state
        active = is_active(rr)
        Kp = matvec(p)
        pKp = dots(p, Kp)
        alpha = active * jnp.where(pKp > 0, rz / jnp.where(pKp > 0, pKp, one),
                                   zero)
        ok = (alpha * rz < div2bb).astype(f32)
        alpha = alpha * ok
        ar = to_rows(alpha)
        x = x + ar * p
        r = r - ar * Kp
        z = precond(r)
        if fuse_dots:
            rz_new, rr_new = dots2(r, z, r)
        else:
            rz_new, rr_new = dots(r, z), dots(r, r)
        rr_new = jnp.where(jnp.isfinite(rr_new), rr_new, f32(2.0) * div2bb)
        rr_new = jnp.where(ok > 0, rr_new, f32(2.0) * div2bb)
        beta = active * jnp.where(rz != 0,
                                  rz_new / jnp.where(rz != 0, rz, one), zero)
        beta = beta * ok * jnp.isfinite(beta).astype(f32)
        br = to_rows(beta)
        p = z + br * p
        rr = jnp.where(active > 0, rr_new, rr)
        rz = jnp.where(active > 0, rz_new, rz)
        return x, r, p, rz, rr, it + 1, counts + active

    x0 = jnp.zeros_like(b)
    z0 = precond(b)
    state = (x0, b, z0, dots(b, z0), bb, jnp.int32(0),
             jnp.zeros((1, BS) if Wf else (BS, 1), f32))
    out = jax.lax.while_loop(cond, body, state)
    x_ref[0] = out[0]
    it_ref[0] = out[6].astype(jnp.int32)


def _pcg_2l_dd_kernel(wEh_ref, wEl_ref, wWh_ref, wWl_ref, wSh_ref, wSl_ref,
                      wNh_ref, wNl_ref, bth_ref, btl_ref, diag_ref,
                      dh_ref, sg_ref,
                      cnn_ref, cn0_ref, cnp_ref, c0n_ref, c0p_ref, cpn_ref,
                      cp0_ref, cpp_ref, t2_ref, Rrow_ref, RrowT_ref,
                      Ccol_ref, CcolT_ref, xh0_ref, xl0_ref,
                      xh_out, xl_out, rt_out, rr_out, it_ref, *,
                      maxiter: int, BS: int, H: int, deg: int, lmin: float,
                      lmax: float, dc: int, clmin: float, clmax: float,
                      Wf: int, rep_drop2: float, rep_restart: bool):
    """Two-level PCG with DOUBLE-F32 solution/residual state and in-kernel
    residual REPLACEMENT (van der Vorst & Ye 2000 reliable updates).

    Motivation (measured, docs/ROADMAP.md r4): the restart-based refinement
    loop's per-round TRUE-residual contraction floors at ~eps32 * kappa
    (the recurrence residual drifts from the true one by ~eps32*|K||p| per
    iteration), which grows ~mesh^2 — at mesh 64 every sample pays extra
    rounds and the straggler tail dominates.  Carrying x and r as (hi, lo)
    f32 pairs and periodically REPLACING the recurrence residual with the
    compensated true residual ``bt - K x`` (the same Dekker two-product
    stencil as ops/pallas_dd_round.py) removes the floor: attainable
    accuracy becomes ~eps_dd * kappa (~2^-48 * kappa) in ONE solve, at
    ideal-CG iteration counts (numpy prototype, scripts/proto_dd_rr.py:
    mesh 20 359 its vs 574 for 3 restart rounds; mesh 64 1262 vs 2958).

    Key details vs the plain kernel (_pcg_2l_kernel):

    * p, the matvec, the preconditioner and all CG dots stay PLAIN f32 —
      direction-side rounding only perturbs the Krylov process, not the
      attainable accuracy.  Only the x/r axpys are compensated
      (dd_add_f32: ~6 VPU ops vs 1) and the periodic replacement runs the
      full dd stencil (~15 matvec-equivalents, ~ln(1/rep_drop)/ln(10)
      decades apart per sample).
    * replacement triggers PER SAMPLE when its recurrence ``rr`` has
      dropped by ``rep_drop2`` since its last replacement; the dd pass is
      guarded by one ``lax.cond`` on the block-level any-trigger, and only
      triggered lanes take the replaced values.  beta is NOT reset at
      replacement (measured: restarting the direction costs ~1.4-1.6x
      iterations; the replaced residual is within ~eps32*kappa/rep_drop of
      the recurrence one, so conjugacy survives).
    * convergence gates on the ORIGINAL-space norm ``sum(diag * r^2)``
      against the ABSOLUTE per-sample threshold ``t2`` (inf on padding) —
      the same contract as the dd round kernel, honest to within the
      last drop window (<~ eps32 * kappa / rep_drop relative).
    * lane-packed fine layout only (the default); two-level only.

    Outputs: final (xh, xl) blocked; ``rt`` = TRUE residual hi masked to
    still-unconverged samples (the compact straggler phase's rhs); ``rr``
    per-sample TRUE original-space squared norms (a final unconditional
    replacement certifies the exit — the loop itself gates on the
    recurrence); per-sample outer-iteration counts.
    """
    f32 = jnp.float32
    whl = ((wEh_ref[0], wEl_ref[0]), (wWh_ref[0], wWl_ref[0]),
           (wSh_ref[0], wSl_ref[0]), (wNh_ref[0], wNl_ref[0]))
    bth, btl = bth_ref[0], btl_ref[0]
    diag = diag_ref[0]
    dh = dh_ref[0]
    sg = sg_ref[0]
    cb = {(-1, -1): cnn_ref[0], (-1, 0): cn0_ref[0], (-1, 1): cnp_ref[0],
          (0, -1): c0n_ref[0], (0, 1): c0p_ref[0], (1, -1): cpn_ref[0],
          (1, 0): cp0_ref[0], (1, 1): cpp_ref[0]}
    Rrow, RrowT, Ccol, CcolT = (Rrow_ref[...], RrowT_ref[...], Ccol_ref[...],
                                CcolT_ref[...])
    t2 = t2_ref[0]  # (1, BS) absolute original-space squared threshold

    def matvec(u):  # hi planes = the unit-diagonal symmetrized operator
        out = u
        for (wh, _), (axis, shift) in zip(whl, ((1, -1), (1, 1),
                                                (0, -1), (0, 1))):
            out = out - wh * _neighbor(u, axis, shift)
        return out

    def dd_resid(xh, xl):
        # r = (bt - x) + sum_dir w x_nbr in compensated arithmetic (unit
        # diagonal makes the x term exact) — same as _dd_round_kernel
        ah, al = dd.dd_sub(bth, btl, xh, xl)
        for (wh, wl), (axis, shift) in zip(whl, ((1, -1), (1, 1),
                                                 (0, -1), (0, 1))):
            nh = _neighbor(xh, axis, shift)
            nl = _neighbor(xl, axis, shift)
            ph, pe = dd.dd_mul(wh, wl, nh, nl)
            ah, al = dd.dd_add(ah, al, ph, pe)
        return ah, al

    dots, _, to_rows = _lane_helpers(bth.shape[1], BS, Wf)

    def norm2(rh):
        return dots(diag * rh, rh)

    fine_cheb = _make_cheb(matvec, deg, lmin, lmax)
    coarse_cheb = _make_cheb(_make_cmatvec(cb), dc, clmin, clmax)

    def precond(r):
        t = dh * r                                        # (H, Lf)
        c1 = jnp.dot(Rrow, t, preferred_element_type=f32)  # (Hc, Lf)
        craw = jnp.dot(c1, Ccol, preferred_element_type=f32)  # (Hc, Lc)
        y = sg * coarse_cheb(sg * craw)
        u = jnp.dot(y, CcolT, preferred_element_type=f32)
        zc = dh * jnp.dot(RrowT, u, preferred_element_type=f32)
        return fine_cheb(r) + zc

    one = f32(1.0)
    zero = f32(0.0)

    xh0, xl0 = xh0_ref[0], xl0_ref[0]
    rh0, rl0 = dd_resid(xh0, xl0)
    rr0 = norm2(rh0)
    div2 = f32(1e12) * jnp.where(rr0 > 0, rr0, one)

    def is_active(rr):
        return jnp.logical_and(rr > t2, rr < div2).astype(f32)

    def cond(state):
        rr, it = state[6], state[8]
        keep = jnp.max(is_active(rr)) > zero
        return jnp.logical_and(keep, it < maxiter)

    def body(state):
        xh, xl, rh, rl, p, rz, rr, rr_rep, it, counts = state
        active = is_active(rr)
        Kp = matvec(p)
        pKp = dots(p, Kp)
        alpha = active * jnp.where(pKp > 0, rz / jnp.where(pKp > 0, pKp, one),
                                   zero)
        ok = (alpha * rz < div2).astype(f32)
        alpha = alpha * ok
        ar = to_rows(alpha)
        xh, xl = dd.dd_add_f32(xh, xl, ar * p)
        rh, rl = dd.dd_add_f32(rh, rl, -(ar * Kp))
        rr_new = norm2(rh)
        rr_new = jnp.where(jnp.isfinite(rr_new), rr_new, f32(2.0) * div2)
        rr_new = jnp.where(ok > 0, rr_new, f32(2.0) * div2)
        trig = active * (rr_new <= f32(rep_drop2) * rr_rep).astype(f32)

        def do_rep(args):
            rh_, rl_, rrn_, rep_ = args
            ah, al = dd_resid(xh, xl)
            tr = to_rows(trig)
            rh2 = jnp.where(tr > 0, ah, rh_)
            rl2 = jnp.where(tr > 0, al, rl_)
            rr2 = norm2(rh2)  # untriggered lanes re-reduce unchanged rh
            rep2 = jnp.where(trig > 0, rr2, rep_)
            return rh2, rl2, rr2, rep2

        rh, rl, rr_new, rr_rep = jax.lax.cond(
            jnp.max(trig) > zero, do_rep, lambda a: a,
            (rh, rl, rr_new, rr_rep))
        z = precond(rh)
        rz_new = dots(rh, z)
        beta = active * jnp.where(rz != 0,
                                  rz_new / jnp.where(rz != 0, rz, one), zero)
        beta = beta * ok * jnp.isfinite(beta).astype(f32)
        if rep_restart:
            # restart the DIRECTION at replacement points (p = z on the
            # triggered lanes): each replacement becomes a refinement-round
            # boundary WITHOUT leaving the kernel — a fresh Krylov process
            # on the compensated residual, curing the f32 conjugacy-loss
            # plateau measured on high-kappa stragglers (mesh 40 max 3052
            # mv vs 716 under restart rounds, sweep_r4e) at the cost of the
            # ideal-CG counts the keep-beta variant gets on easy samples
            beta = beta * (one - trig)
        p = z + to_rows(beta) * p
        rr = jnp.where(active > 0, rr_new, rr)
        rz = jnp.where(active > 0, rz_new, rz)
        return (xh, xl, rh, rl, p, rz, rr, rr_rep, it + 1, counts + active)

    z0 = precond(rh0)
    state = (xh0, xl0, rh0, rl0, z0, dots(rh0, z0), rr0, rr0,
             jnp.int32(0), jnp.zeros((1, BS), f32))
    out = jax.lax.while_loop(cond, body, state)
    xh_f, xl_f = out[0], out[1]
    counts = out[9]
    # one FINAL unconditional replacement: the loop gated on the recurrence
    # residual (drifted by <= ~the last drop window); the exit values are
    # certified against the compensated TRUE residual — same contract as
    # the dd round kernel, one extra dd stencil pass per solve
    ah_f, _ = dd_resid(xh_f, xl_f)
    rr_f = norm2(ah_f)
    xh_out[0] = xh_f
    xl_out[0] = xl_f
    rt_out[0] = to_rows((rr_f > t2).astype(f32)) * ah_f
    rr_out[0] = rr_f
    it_ref[0] = counts.astype(jnp.int32)


class Prepared2L(NamedTuple):
    """Padded, blocked, sample-sorted kernel operands that are invariant
    across refinement rounds — built ONCE per solve.  Re-padding/gathering
    these 15 arrays per round measured ~7 ms/1000 samples, several times the
    kernel's own iteration work.

    The optional level-2 fields (``sg2``/``cbands2``/transfer quartet) carry
    the THIRD-level operands (packed-fine layout only); ``None`` means
    two-level."""

    wE: jnp.ndarray
    wW: jnp.ndarray
    wS: jnp.ndarray
    wN: jnp.ndarray
    dh: jnp.ndarray
    sg: jnp.ndarray
    cbands: tuple
    Rrow: jnp.ndarray
    RrowT: jnp.ndarray
    Ccol: jnp.ndarray
    CcolT: jnp.ndarray
    sg2: jnp.ndarray | None = None
    cbands2: tuple | None = None
    Rrow2: jnp.ndarray | None = None
    Rrow2T: jnp.ndarray | None = None
    Ccol2: jnp.ndarray | None = None
    Ccol2T: jnp.ndarray | None = None


def prepare_2l(wt: st.StencilCoefficients, dh: jnp.ndarray,
               coarse: tl.CoarseOperator, strides: tuple[int, int],
               block_size: int | None = None, packed_coarse: bool = False,
               packed_fine: bool = False,
               coarse2: tl.CoarseOperator | None = None,
               stride2: tuple[int, int] | None = None,
               dd_cg: bool = False):
    """Pad/block the round-invariant operands.  Returns ``(prep, dims)``
    with ``dims = (B, nr, nc, BS, H, W, Hc, Wc, BP, Wcp, Wf)`` (python
    ints — pass them as static arguments to :func:`cg_2l_prepared`).

    ``packed_coarse``: lay the coarse-stage arrays out LANE-PACKED — all
    ``BS`` samples at lane pitch ``Wcp = m1c + 1`` in one ``(Hc, L)`` array
    (see the kernel docstring); requires ``m1c + 1 <= 128`` (falls back to
    the standard stacked layout otherwise).  ``Wcp = 0`` in dims marks the
    standard layout.

    ``packed_fine``: lane-pack the FINE stage too — all ``BS`` samples in
    one ``(H, Lf)`` array at lane pitch ``Wf = nc + 1`` (one zero guard
    lane between samples annihilates the E/W roll wrap, the same induction
    as the zero-padded columns of the stacked layout).  At the paper config
    the stacked layout uses 79 of 128 lanes, so every fine elementwise op
    (the bulk of the kernel: matvecs, axpys, Chebyshev updates) wastes
    ~1.6x VPU work; packing also shrinks the coarse transfers to ONE shared
    row-restriction matmul plus ONE block-diagonal lane matmul (no
    per-sample loops or rolls).  Implies ``packed_coarse``; requires
    ``m1c + 1 <= 128`` (falls back to the stacked fine layout otherwise).
    ``Wf = 0`` in dims marks the stacked layout."""
    B, nr, nc = dh.shape
    m1r, m1c = coarse.sg.shape[-2:]
    dims = plan_2l(B, nr, nc, m1r, m1c, block_size=block_size,
                   packed_coarse=packed_coarse, packed_fine=packed_fine,
                   dd_cg=dd_cg)

    def padf(x):
        return pack_fine(x, dims)

    # dead Dirichlet-edge weights zeroed so the circular lane rolls stay
    # correct when nc is an exact multiple of 128 (no zero guard column);
    # the row axis always has >= 1 guard row (H >= nr + 1)
    wt = st.StencilCoefficients(
        wE=wt.wE.at[..., -1].set(0.0), wW=wt.wW.at[..., 0].set(0.0),
        wS=wt.wS, wN=wt.wN, diag=wt.diag,
    )
    sg_p, cbands, xfer = coarse_prep(coarse, strides, dims)
    l2 = {}
    if coarse2 is not None and dims[10]:
        # third level rides the packed-fine layout only; on a stacked
        # fallback the level-2 operands are dropped (the caller strips the
        # dc2 kernel knob when prep.sg2 is None)
        sg2_p, cbands2, xfer2 = coarse2_prep(coarse2, stride2, m1r, m1c,
                                             dims)
        l2 = dict(sg2=sg2_p, cbands2=cbands2, Rrow2=xfer2[0],
                  Rrow2T=xfer2[1], Ccol2=xfer2[2], Ccol2T=xfer2[3])
    prep = Prepared2L(
        wE=padf(wt.wE), wW=padf(wt.wW), wS=padf(wt.wS), wN=padf(wt.wN),
        dh=padf(dh), sg=sg_p, cbands=cbands,
        Rrow=xfer[0], RrowT=xfer[1], Ccol=xfer[2], CcolT=xfer[3], **l2,
    )
    return prep, dims


def plan_2l(B: int, nr: int, nc: int, m1r: int, m1c: int,
            block_size: int | None = None, packed_coarse: bool = False,
            packed_fine: bool = False, dd_cg: bool = False) -> tuple:
    """Layout planning only (no array work): the dims tuple for the given
    problem/coarse sizes — shared by :func:`prepare_2l` and the fused
    operand-build path (pallas_dd_round.build_dd_packed).

    ``dd_cg``: size blocks for the dd-state CG kernel's ~2x live-state
    footprint (see :func:`auto_block_size_packed`)."""
    H = _round_up(nr + 1, 8)
    Hc = _round_up(m1r + 1, 8)
    Wc = _round_up(m1c + 1, 128)
    if packed_fine and m1c + 1 > 128:
        packed_fine = False
    if packed_fine:
        packed_coarse = True
        Wf = nc + 1
        BS = (auto_block_size_packed(H, nc, m1r, m1c, dd_cg=dd_cg)
              if block_size is None else block_size)
        W = _round_up(BS * Wf, 128)
    else:
        Wf = 0
        W = _round_up(nc, 128)
        BS = auto_block_size_2l(H, W) if block_size is None else block_size
    BP = _round_up(B, BS)
    if packed_coarse and m1c + 1 > 128:
        packed_coarse = False
    Wcp = (m1c + 1) if packed_coarse else 0
    L = _round_up(BS * Wcp, 128) if packed_coarse else Wc
    return (B, nr, nc, BS, H, W, Hc, L, BP, Wcp, Wf)


def coarse_prep(coarse: tl.CoarseOperator, strides: tuple[int, int],
                dims: tuple):
    """Pad/block the coarse operands + build the static transfer matrices
    for the layout in ``dims``.  Returns ``(sg, cbands, (Rrow, RrowT, Ccol,
    CcolT))``."""
    B, nr, nc, BS, H, W, Hc, L, BP, Wcp = dims[:10]
    Wf = dims[10] if len(dims) > 10 else 0
    m1r, m1c = coarse.sg.shape[-2:]
    packed_coarse = Wcp > 0
    Wc = L if packed_coarse else _round_up(m1c + 1, 128)

    def padc(x):
        if packed_coarse:
            x = jnp.pad(
                x.astype(jnp.float32),
                ((0, BP - B), (0, Hc - m1r), (0, Wcp - m1c)),
            )
            x = x.reshape(BP // BS, BS, Hc, Wcp).transpose(0, 2, 1, 3)
            x = x.reshape(BP // BS, Hc, BS * Wcp)
            return jnp.pad(x, ((0, 0), (0, 0), (0, L - BS * Wcp)))
        x = jnp.pad(
            x.astype(jnp.float32),
            ((0, BP - B), (0, Hc - m1r), (0, Wc - m1c)),
        )
        return x.reshape(BP // BS, BS * Hc, Wc)

    cbands = tuple(
        padc(coarse.bands[:, dp + 1, dq + 1])
        for dp in (-1, 0, 1)
        for dq in (-1, 0, 1)
        if (dp, dq) != (0, 0)
    )
    hr = tl.hat_matrix(nr, strides[0])
    hc = tl.hat_matrix(nc, strides[1])
    if Wf:
        hrp = np.zeros((Hc, H), np.float32)
        hrp[:m1r, :nr] = hr
        Ccol = np.zeros((W, L), np.float32)
        for s in range(BS):
            Ccol[s * Wf : s * Wf + nc, s * Wcp : s * Wcp + m1c] = hc.T
        xfer = (jnp.asarray(hrp), jnp.asarray(hrp.T),
                jnp.asarray(Ccol), jnp.asarray(Ccol.T))
    elif packed_coarse:
        hrp = np.zeros((Hc, H), np.float32)
        hrp[:m1r, :nr] = hr
        Ccol = np.zeros((W, 128), np.float32)
        Ccol[:nc, :m1c] = hc.T
        xfer = (jnp.asarray(hrp), jnp.asarray(hrp.T),
                jnp.asarray(Ccol), jnp.asarray(Ccol.T))
    else:
        xfer = _transfer_mats(hr, hc, BS, H, W, Hc, Wc)
    return padc(coarse.sg), cbands, xfer


def coarse2_prep(coarse2: tl.CoarseOperator, stride2: tuple[int, int],
                 m1r: int, m1c: int, dims: tuple):
    """Pad/block the LEVEL-2 operands + the coarse->coarse2 transfer
    matrices (packed-fine layout only).  ``coarse2`` comes from
    ``tl.normalize_bands(tl.coarsen_bands(raw_level1_bands, *stride2))``
    with ``stride2`` hats on the COARSE INDEX grid.  Returns
    ``(sg2, cbands2, (Rrow2, Rrow2T, Ccol2, Ccol2T))``."""
    B, nr, nc, BS, H, W, Hc, L, BP, Wcp = dims[:10]
    Wf = dims[10] if len(dims) > 10 else 0
    if not (Wf and Wcp):
        raise ValueError("the third level requires the packed-fine layout")
    m2r, m2c = coarse2.sg.shape[-2:]
    Wcp2 = m2c + 1
    Hc2 = _round_up(m2r + 1, 8)
    Lc2 = _round_up(BS * Wcp2, 128)

    def padc2(x):
        x = jnp.pad(
            x.astype(jnp.float32),
            ((0, BP - B), (0, Hc2 - m2r), (0, Wcp2 - m2c)),
        )
        x = x.reshape(BP // BS, BS, Hc2, Wcp2).transpose(0, 2, 1, 3)
        x = x.reshape(BP // BS, Hc2, BS * Wcp2)
        return jnp.pad(x, ((0, 0), (0, 0), (0, Lc2 - BS * Wcp2)))

    cbands2 = tuple(
        padc2(coarse2.bands[:, dp + 1, dq + 1])
        for dp in (-1, 0, 1)
        for dq in (-1, 0, 1)
        if (dp, dq) != (0, 0)
    )
    hr2 = tl.hat_matrix(m1r, stride2[0])
    hc2 = tl.hat_matrix(m1c, stride2[1])
    Rrow2 = np.zeros((Hc2, Hc), np.float32)
    Rrow2[:m2r, :m1r] = hr2
    Ccol2 = np.zeros((L, Lc2), np.float32)
    for s in range(BS):
        Ccol2[s * Wcp : s * Wcp + m1c, s * Wcp2 : s * Wcp2 + m2c] = hc2.T
    xfer2 = (jnp.asarray(Rrow2), jnp.asarray(Rrow2.T),
             jnp.asarray(Ccol2), jnp.asarray(Ccol2.T))
    return padc2(coarse2.sg), cbands2, xfer2


def cg_2l_prepared(
    prep: Prepared2L,
    dims: tuple,
    b: jnp.ndarray,
    rtol2: jnp.ndarray,
    maxiter: int = 200,
    interpret: bool = False,
    deg: int = 3,
    lmin: float | None = None,
    lmax: float = 2.0,
    dc: int = 8,
    clmin: float = 0.03,
    clmax: float = 2.05,
    strides: tuple[int, int] | None = None,
    xfer_bf16: bool = False,
    blocked_io: bool = False,
    fuse_dots: bool = False,
    dc2: int = 0,
    cl2min: float = 0.12,
    cl2max: float = 2.05,
    hi_xfer: bool = False,
    serial: bool = False,
):
    """Run the kernel against prepared operands.  ``b`` ``(B, nr, nc)`` and
    ``rtol2`` ``(B,)`` must be in the SAME sample order as the prepared
    arrays.  Returns ``(x, iterations)`` unpadded, in that order.

    ``serial``: launch one grid-step-(1,) kernel per sample block via
    ``lax.map`` instead of a single multi-block grid.  A multi-block grid
    double-buffers the 6 fine input refs across grid steps (~24 MB extra
    at mesh 256), pushing the near-VMEM-capacity huge-grid route over the
    128 MB limit (measured: 137.31M requested at (1023, 1023) with
    grid=(2,), while grid=(1,) compiles).  Used by the huge-grid serving
    path; costs one kernel relaunch per block — noise next to the
    hundreds of outers each block runs.

    ``blocked_io=True``: ``b`` arrives and ``x`` is returned in the blocked
    ``(BP//BS, BS*H, W)`` layout (the dd refinement driver keeps its state
    blocked across rounds; the per-round pad/unpad copies are pure HBM
    traffic).

    ``hi_xfer``: HIGHEST-precision warped-transfer matmuls; honored in the
    packed-fine branch only (the default layout), a documented no-op in
    the stacked/packed-coarse branches.  Measured perf- and accuracy-
    neutral on hardware (docs/ROADMAP.md r4 item 7)."""
    B, nr, nc, BS, H, W, Hc, Wc, BP = dims[:9]
    Wcp = dims[9] if len(dims) > 9 else 0
    Wf = dims[10] if len(dims) > 10 else 0
    if lmin is None:
        if strides is None:
            raise ValueError(
                "cg_2l_prepared needs `strides` (to derive the default fine "
                "window) or an explicit `lmin`"
            )
        lmin = default_fine_window((nr, nc), strides)[0]
    bp = b if blocked_io else pack_fine(b, dims)
    rt2 = jnp.pad(rtol2.astype(jnp.float32), (0, BP - B),
                  constant_values=1.0)
    it_shape = (1, 1, BS) if Wf else (1, BS, 1)
    rt2 = rt2.reshape((BP // BS,) + it_shape[1:])

    fshape = (1, H, W) if Wf else (1, BS * H, W)
    fspec = pl.BlockSpec(fshape, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    cshape = (1, Hc, Wc) if Wcp else (1, BS * Hc, Wc)
    cspec = pl.BlockSpec(cshape, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    it_spec = pl.BlockSpec(it_shape, lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    def smat(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    three_level = dc2 > 0 and prep.sg2 is not None
    if dc2 > 0 and prep.sg2 is None:
        raise ValueError("dc2 > 0 needs level-2 operands in the prep "
                         "(prepare_2l(..., coarse2=..., stride2=...))")
    extra_ops, extra_specs = (), []
    if three_level:
        cspec2 = pl.BlockSpec((1,) + prep.sg2.shape[1:],
                              lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        extra_ops = ((prep.sg2,) + tuple(prep.cbands2)
                     + (prep.Rrow2, prep.Rrow2T, prep.Ccol2, prep.Ccol2T))
        extra_specs = [cspec2] * 9 + [smat(prep.Rrow2), smat(prep.Rrow2T),
                                      smat(prep.Ccol2), smat(prep.Ccol2T)]

    kernel_fn = functools.partial(
        _pcg_2l_kernel, maxiter=maxiter, BS=BS, H=H,
        deg=deg, lmin=float(lmin), lmax=float(lmax), dc=dc,
        clmin=float(clmin), clmax=float(clmax),
        xfer_bf16=xfer_bf16, Wcp=Wcp, Wf=Wf,
        fuse_dots=fuse_dots,
        dc2=(dc2 if three_level else 0),
        cl2min=float(cl2min), cl2max=float(cl2max),
        hi_xfer=hi_xfer,
    )
    shared_specs = [smat(prep.Rrow), smat(prep.RrowT), smat(prep.Ccol),
                    smat(prep.CcolT)] + extra_specs
    blocked_ops = (prep.wE, prep.wW, prep.wS, prep.wN, bp, prep.dh,
                   prep.sg) + tuple(prep.cbands) + (rt2,)
    shared_ops = (prep.Rrow, prep.RrowT, prep.Ccol,
                  prep.CcolT) + extra_ops

    def call(ops, nblocks):
        return pl.pallas_call(
            kernel_fn,
            grid=(nblocks,),
            in_specs=[fspec] * 6 + [cspec] * 9 + [it_spec] + shared_specs,
            out_specs=(fspec, it_spec),
            out_shape=(
                jax.ShapeDtypeStruct((nblocks,) + fshape[1:], jnp.float32),
                jax.ShapeDtypeStruct((nblocks,) + it_shape[1:], jnp.int32),
            ),
            compiler_params=tpu_compiler_params(),
            interpret=interpret,
        )(*ops)

    # Mosaic cannot compile kernels traced in x64 mode; all-f32 kernel
    with jax.enable_x64(False):
        if serial and not three_level and BP // BS > 1:
            # STATIC unroll, not lax.map: under lax.map XLA fuses the
            # per-step dynamic slices into the pallas custom call and
            # charges them against scoped VMEM (measured: limit drops to
            # 56M while the kernel needs 94.95M at mesh 256).  Static
            # x[k:k+1] slices are views — operands stay in HBM and each
            # grid-(1,) call keeps the full scoped budget.  The Mosaic
            # binary is compiled once (identical call config); B is tiny
            # on this route (HBM caps it), so unrolled XLA code is small.
            outs, itss = [], []
            for k in range(BP // BS):
                # optimization barriers stop XLA from fusing the slice /
                # concat neighbors INTO the pallas kCustom fusion: a mixed
                # fusion is checked against the global 16 MB scoped-vmem
                # flag instead of the kernel's own 128 MB limit (measured:
                # "scoped allocation 66.95M, limit 16.00M" at mesh 256)
                ops_k = jax.lax.optimization_barrier(
                    tuple(x[k:k + 1] for x in blocked_ops))
                o, i = call(tuple(ops_k) + shared_ops, 1)
                o, i = jax.lax.optimization_barrier((o, i))
                outs.append(o)
                itss.append(i)
            out = jnp.concatenate(outs, axis=0)
            its = jnp.concatenate(itss, axis=0)
        else:
            out, its = call(blocked_ops + shared_ops, BP // BS)
    if blocked_io:
        return out, its.reshape(BP)[:B]
    return unpack_fine(out, dims), its.reshape(BP)[:B]


def cg_2l_dd_prepared(
    prep: Prepared2L,
    prepdd,
    dims: tuple,
    t2bb: jnp.ndarray,
    xh0: jnp.ndarray,
    xl0: jnp.ndarray,
    maxiter: int = 256,
    interpret: bool = False,
    deg: int = 3,
    lmin: float | None = None,
    lmax: float = 2.0,
    dc: int = 8,
    clmin: float = 0.03,
    clmax: float = 2.05,
    strides: tuple[int, int] | None = None,
    rep_drop: float = 0.03,
    rep_restart: bool = False,
):
    """Run the dd-state residual-replacement kernel against prepared
    operands (packed-fine layout ONLY — ``dims[10] > 0``).

    ``rep_restart``: restart the CG direction (p = z) on lanes that just
    replaced their residual — in-kernel refinement-round boundaries (see
    the kernel docstring).

    ``prep``/``prepdd`` must share ``dims`` (in the fused build path they
    alias the same PackedOperands arrays).  ``t2bb`` ``(B,)`` are ABSOLUTE
    original-space squared thresholds (``tol^2 ||b||^2``); ``xh0/xl0`` the
    blocked dd warm-start state (zeros for a cold solve).

    Returns ``(xh, xl, rt, rr, iterations)``: blocked dd solution state,
    the masked TRUE-residual rhs for a straggler phase, per-sample true
    squared norms, and per-sample OUTER iteration counts (each outer costs
    ``deg + 1`` fine matvecs plus the dd axpys; replacements add ~15
    matvec-equivalents each, ~log(1/rep_drop) decades apart)."""
    B, nr, nc, BS, H, W, Hc, Wc, BP = dims[:9]
    Wcp = dims[9] if len(dims) > 9 else 0
    Wf = dims[10] if len(dims) > 10 else 0
    if not (Wf and Wcp):
        raise ValueError("cg_2l_dd_prepared requires the packed-fine layout")
    if lmin is None:
        if strides is None:
            raise ValueError("cg_2l_dd_prepared needs `strides` or `lmin`")
        lmin = default_fine_window((nr, nc), strides)[0]
    # padded samples: threshold inf so they always read as converged
    t2 = jnp.pad(t2bb.astype(jnp.float32), (0, BP - B),
                 constant_values=jnp.inf).reshape(BP // BS, 1, BS)

    fshape = (1, H, W)
    fspec = pl.BlockSpec(fshape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, Hc, Wc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, 1, BS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def smat(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    fsd = jax.ShapeDtypeStruct((BP // BS, H, W), jnp.float32)
    vsd = lambda dt: jax.ShapeDtypeStruct((BP // BS, 1, BS), dt)  # noqa: E731
    with jax.enable_x64(False):
        xh, xl, rt, rr, its = pl.pallas_call(
            functools.partial(
                _pcg_2l_dd_kernel, maxiter=maxiter, BS=BS, H=H, deg=deg,
                lmin=float(lmin), lmax=float(lmax), dc=dc,
                clmin=float(clmin), clmax=float(clmax), Wf=Wf,
                rep_drop2=float(rep_drop) ** 2,
                rep_restart=bool(rep_restart),
            ),
            grid=(BP // BS,),
            in_specs=[fspec] * 12 + [cspec] * 9 + [vspec]
            + [smat(prep.Rrow), smat(prep.RrowT), smat(prep.Ccol),
               smat(prep.CcolT)] + [fspec] * 2,
            out_specs=(fspec, fspec, fspec, vspec, vspec),
            out_shape=(fsd, fsd, fsd, vsd(jnp.float32), vsd(jnp.int32)),
            compiler_params=tpu_compiler_params(),
            interpret=interpret,
        )(prepdd.wEh, prepdd.wEl, prepdd.wWh, prepdd.wWl, prepdd.wSh,
          prepdd.wSl, prepdd.wNh, prepdd.wNl, prepdd.bth, prepdd.btl,
          prepdd.diag, prep.dh, prep.sg, *prep.cbands, t2,
          prep.Rrow, prep.RrowT, prep.Ccol, prep.CcolT, xh0, xl0)
    return xh, xl, rt, rr.reshape(BP)[:B], its.reshape(BP)[:B]


@functools.partial(
    jax.jit,
    static_argnames=("tol", "maxiter", "block_size", "interpret", "deg",
                     "lmin", "lmax", "dc", "clmin", "clmax", "strides",
                     "packed_coarse", "packed_fine", "stride2", "dc2",
                     "cl2min", "cl2max"),
)
def cg_symmetrized_pallas_2l(
    wt: st.StencilCoefficients,
    b: jnp.ndarray,
    dh: jnp.ndarray,
    coarse: tl.CoarseOperator,
    strides: tuple[int, int],
    tol: float = 1e-5,
    rtol2: jnp.ndarray | None = None,
    maxiter: int = 200,
    block_size: int | None = None,
    interpret: bool = False,
    deg: int = 3,
    lmin: float | None = None,
    lmax: float = 2.0,
    dc: int = 8,
    clmin: float = 0.03,
    clmax: float = 2.05,
    packed_coarse: bool = True,
    packed_fine: bool = False,
    coarse2: tl.CoarseOperator | None = None,
    stride2: tuple[int, int] | None = None,
    dc2: int = 0,
    cl2min: float = 0.12,
    cl2max: float = 2.05,
):
    """Two-level solve of the symmetrized system for a batch ``(B, nr, nc)``.

    Args:
      wt: symmetrized f32 stencil weights ``(B, nr, nc)``.
      b: scaled right-hand sides ``(B, nr, nc)`` f32.
      dh: the warp ``D^{1/2} = sqrt(diag K)`` per sample, f32.
      coarse: normalized coarse operator (ops.twolevel.assemble_coarse) built
        with the SAME ``strides``.
      strides: coarse strides ``(stride_r, stride_c)`` (static).
      rtol2: optional per-sample SQUARED relative tolerances ``(B,)`` —
        overrides the static ``tol`` (the refinement driver asks each sample
        for exactly the digits it still needs, so a round never over-solves).

    Returns ``(x, iterations)`` — per-sample OUTER iteration counts (each
    outer costs ``deg`` fine matvecs + one coarse correction).
    """
    B = b.shape[0]
    if coarse2 is not None and not packed_fine:
        raise ValueError("the third level (coarse2) requires packed_fine")
    prep, dims = prepare_2l(wt, dh, coarse, strides, block_size,
                            packed_coarse=packed_coarse,
                            packed_fine=packed_fine,
                            coarse2=coarse2, stride2=stride2)
    if rtol2 is None:
        rtol2 = jnp.full((B,), tol * tol)
    return cg_2l_prepared(
        prep, dims, b, rtol2, maxiter=maxiter, interpret=interpret, deg=deg,
        lmin=lmin, lmax=lmax, dc=dc, clmin=clmin, clmax=clmax,
        strides=strides,
        dc2=(dc2 if prep.sg2 is not None else 0), cl2min=cl2min,
        cl2max=cl2max,
    )

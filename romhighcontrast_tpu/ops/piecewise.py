"""Piecewise-constant compression of the scaled-operator build.

The diffusion coefficient is constant on each of the ``nrb x ncb`` blocks
(the framework's defining structure — reference:
src/lib/SolutionsManagers.py:146-218 assembles from per-block indicator
coefficients).  Every per-solve operand of the mixed-precision path — the
scaled dd weights ``Kt = D^-1/2 K D^-1/2``, the diagonal, the Jacobi warp,
the scale ``s`` — therefore takes only O(nrb x ncb) DISTINCT values per
sample: a vertex's value depends on which cell-rows/cols it and its stencil
neighbors touch, i.e. on a (row-class, col-class) pair with ~4*nrb row
classes (block interiors + 3-wide bands at block lines + domain edges).

The full error-free-transform build evaluated on the fine grid is
VPU-compute-bound (~600 f32 ops/element; measured 4.3 ms/1000 samples at
the paper config whether fused in a Pallas kernel or left to XLA — ~20% of
the whole solve).  Here the EFT runs on the tiny ``(B, Cr, Cc)`` class grid
and the fine blocked operands are produced by EXACT one-hot expansion
matmuls (one row-expansion and one block-diagonal lane-expansion per
operand, MXU work) — the only fine-grid arithmetic left is the rhs product
``bt = s * b`` (the rhs is not piecewise).

Exactness: the class key includes every cell-block index the value depends
on, expansion one-hot matmuls copy values bit-exactly (1.0 * v + 0.0), and
the small EFT applies the same dd formulas to the same inputs — so the
expanded operands match the fine-grid build BITWISE (tested).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from romhighcontrast_tpu.ops import dd
from romhighcontrast_tpu.ops import stencil as st


@lru_cache(maxsize=None)
def vertex_classes(n: int, N: int):
    """Row (or column) classes for ``n`` interior vertices, ``N`` cells per
    block per dim.

    Vertex ``i``'s operand values depend exactly on the block indices of
    cell rows ``i-1 .. i+2`` (its own weights touch cells ``i, i+1``; the
    scaled couplings also touch the neighbors' scales, which touch cells
    ``i-1`` and ``i+2``).  Returns ``(reps, cls, nxt, prv)``:

    * ``reps (C,)`` — a representative vertex per class,
    * ``cls (n,)`` — class of each vertex,
    * ``nxt/prv (C,)`` — class of ``rep+1`` / ``rep-1`` (``-1`` when the
      neighbor vertex does not exist — the zero-fill boundary).
    """

    def blk(r):
        if r < 0:
            return -1
        if r > n:  # cell rows are 0..n
            return -2
        return r // N

    keys: dict = {}
    cls = np.empty(n, np.int32)
    reps: list[int] = []
    for i in range(n):
        k = (blk(i - 1), blk(i), blk(i + 1), blk(i + 2))
        if k not in keys:
            keys[k] = len(reps)
            reps.append(i)
        cls[i] = keys[k]
    reps_a = np.asarray(reps, np.int32)
    nxt = np.asarray(
        [cls[r + 1] if r + 1 < n else -1 for r in reps], np.int32
    )
    prv = np.asarray([cls[r - 1] if r >= 1 else -1 for r in reps], np.int32)
    return reps_a, cls, nxt, prv


class SmallOperands(NamedTuple):
    """Class-grid ``(B, Cr, Cc)`` dd operands + the class machinery."""

    wE: tuple  # scaled dd pairs
    wW: tuple
    wS: tuple
    wN: tuple
    diag: jnp.ndarray  # unscaled diagonal, hi part (f32)
    dh: jnp.ndarray    # sqrt(diag) (f32)
    s: tuple           # dd scale D^{-1/2}
    raw: st.StencilCoefficients  # UNSCALED hi weights (coarse assembly)
    cls_r: np.ndarray
    cls_c: np.ndarray


def build_dd_small(a: jnp.ndarray, N: int, nr: int, nc: int
                   ) -> SmallOperands:
    """The EFT operand build on the class grid (same dd formulas and
    operation order as the fine-grid builds; agreement to the ~2^-46
    dd contract — exact up to XLA's fusion order).

    Traced under :func:`dd.with_barriers`: on the O(blocks) class grid the
    barriers' fusion cost is nil, and they guarantee the compensation terms
    survive the HLO simplifier under jit on every backend."""
    with dd.with_barriers():
        return _build_dd_small(a, N, nr, nc)


def _build_dd_small(a: jnp.ndarray, N: int, nr: int, nc: int
                    ) -> SmallOperands:
    f32 = jnp.float32
    reps_r, cls_r, nxt_r, prv_r = vertex_classes(nr, N)
    reps_c, cls_c, nxt_c, prv_c = vertex_classes(nc, N)
    if a.dtype == jnp.float64:
        ah, al = dd.dd_from_f64(a)
    else:
        ah, al = a.astype(f32), jnp.zeros_like(a, f32)

    br0 = reps_r // N          # block row of cell row i
    br1 = (reps_r + 1) // N    # block row of cell row i+1 (<= nr -> valid)
    bc0 = reps_c // N
    bc1 = (reps_c + 1) // N

    def cell(br, bc):
        return ah[:, br][:, :, bc], al[:, br][:, :, bc]

    def avg(x, y):
        s_, e = dd.two_sum(x[0], y[0])
        h, l = dd.fast_two_sum(s_, e + (x[1] + y[1]))
        return f32(0.5) * h, f32(0.5) * l

    # identical corner pairings as stencil_weights / the fine dd build
    wE = avg(cell(br1, bc1), cell(br0, bc1))
    wW = avg(cell(br1, bc0), cell(br0, bc0))
    wS = avg(cell(br1, bc1), cell(br1, bc0))
    wN = avg(cell(br0, bc1), cell(br0, bc0))
    dgh, dgl = dd.dd_add(*wE, *wW)
    dgh, dgl = dd.dd_add(dgh, dgl, *wS)
    dgh, dgl = dd.dd_add(dgh, dgl, *wN)
    sh, sl = dd.dd_rsqrt(dgh, dgl)

    def nbr(idx):
        """Scale at the neighbor class, zero-filled where it is off-domain
        (reproduces st._shift's zero fill)."""
        take = jnp.asarray(np.maximum(idx, 0))
        m = jnp.asarray((idx >= 0).astype(np.float32))
        return take, m

    tE, mE = nbr(nxt_c)
    tW, mW = nbr(prv_c)
    tS, mS = nbr(nxt_r)
    tN, mN = nbr(prv_r)

    def plane(w, axis, take, m):
        th, tl_ = dd.dd_mul(w[0], w[1], sh, sl)
        if axis == 1:  # column neighbor
            nh = sh[:, :, take] * m
            nl = sl[:, :, take] * m
        else:
            nh = sh[:, take, :] * m[:, None]
            nl = sl[:, take, :] * m[:, None]
        return dd.dd_mul(th, tl_, nh, nl)

    raw = st.StencilCoefficients(wE=wE[0], wW=wW[0], wS=wS[0], wN=wN[0],
                                 diag=dgh)
    return SmallOperands(
        wE=plane(wE, 1, tE, mE), wW=plane(wW, 1, tW, mW),
        wS=plane(wS, 0, tS, mS), wN=plane(wN, 0, tN, mN),
        diag=dgh, dh=jnp.sqrt(dgh), s=(sh, sl), raw=raw,
        cls_r=cls_r, cls_c=cls_c,
    )


@lru_cache(maxsize=64)
def _expansion_mats(nr: int, nc: int, N: int, BS: int, H: int, W: int,
                    Wf: int):
    """One-hot expansion operands for the packed-fine layout: ``Er (H,
    Cr)`` (rows) and ``Ec (Cc, Wf)`` (lanes), per-sample — the blocked
    interleave is a pure layout op (fine_from_samples).  The matmuls MUST
    run at ``Precision.HIGHEST``: the TPU MXU's default bf16 pass truncates
    the f32 operand values (measured: 2.1e0 residuals), while exact-f32
    passes copy them bitwise (one-hot rows: ``1.0 * v + 0.0 * ...``).  The
    class-grid reduction dims are O(4 * blocks) ~ 16, so even at HIGHEST
    the whole expansion is ~3 GFLOP/1000 samples — noise on the MXU.

    Returns NUMPY arrays: callers convert per call site.  Caching device
    arrays here leaked tracers across jit traces (jnp.asarray inside a
    trace can yield a DynamicJaxprTracer, and lru_cache pinned it)."""
    _, cls_r, _, _ = vertex_classes(nr, N)
    _, cls_c, _, _ = vertex_classes(nc, N)
    Cr, Cc = int(cls_r.max()) + 1, int(cls_c.max()) + 1
    Er = np.zeros((H, Cr), np.float32)
    Er[np.arange(nr), cls_r] = 1.0
    Ec = np.zeros((Cc, Wf), np.float32)
    Ec[cls_c, np.arange(nc)] = 1.0  # guard lane j = nc stays zero
    pad1 = np.ones((H, W), np.float32)
    for s_ in range(BS):
        pad1[:nr, s_ * Wf : s_ * Wf + nc] = 0.0
    return Er, Ec, pad1


def expand_raw(small: SmallOperands) -> st.StencilCoefficients:
    """UNSCALED f32 stencil weights on the fine grid (one gather per plane)
    — the coarse-operator assembly input.  Bit-identical to the EFT hi
    parts (tighter than the plain-f32 ``stencil_weights`` rebuild, which
    differs by ~1 ulp)."""
    cr, cc = jnp.asarray(small.cls_r), jnp.asarray(small.cls_c)

    def g(x):
        return x[:, cr][:, :, cc]

    r = small.raw
    return st.StencilCoefficients(wE=g(r.wE), wW=g(r.wW), wS=g(r.wS),
                                  wN=g(r.wN), diag=g(r.diag))


def expand_packed_operands(small: SmallOperands, b3: jnp.ndarray,
                           N: int, dims: tuple):
    """Expand the class-grid operands to the blocked packed-fine layout and
    form the rhs product — returns the same ``PackedOperands`` the fused
    kernel build emits (pallas_dd_round.PackedOperands)."""
    from romhighcontrast_tpu.ops.pallas_cg_2l import fine_from_samples, \
        pack_fine
    from romhighcontrast_tpu.ops.pallas_dd_round import PackedOperands

    B, nr, nc = dims[:3]
    BP = dims[8]
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    # Cache key is the layout-relevant subset only — B/BP vary with batch
    # size and would grow the host-side cache without bound (advisor r3).
    BS, H, W, Wf = dims[3], dims[4], dims[5], dims[10]
    Er_n, Ec_n, pad1_n = _expansion_mats(nr, nc, N, BS, H, W, Wf)
    Er, Ec, pad1 = jnp.asarray(Er_n), jnp.asarray(Ec_n), jnp.asarray(pad1_n)

    def expand(x):
        if x.shape[0] < BP:
            x = jnp.pad(x, ((0, BP - x.shape[0]), (0, 0), (0, 0)))
        t = jnp.einsum("hk,bkc->bhc", Er, x, precision=hp,
                       preferred_element_type=f32)
        v = jnp.einsum("bhc,cj->bhj", t, Ec, precision=hp,
                       preferred_element_type=f32)
        return fine_from_samples(v, dims)

    # padded rows/lanes AND padded samples carry scale 1 so the warm-start
    # division x0/s stays finite — same convention as the fused build
    # kernel's `safe` guard; adding 0.0 at valid positions is exact, so
    # bit-parity with the fine-grid build is preserved
    sh_small = jnp.concatenate(
        [small.s[0], jnp.ones((BP - B,) + small.s[0].shape[1:], f32)]
    ) if BP > B else small.s[0]
    sh_f = expand(sh_small) + pad1
    sl_f = expand(small.s[1])
    if b3.dtype == jnp.float64:
        bh, bl = dd.dd_from_f64(b3)
    else:
        bh, bl = b3.astype(f32), jnp.zeros_like(b3, f32)
    bth, btl = dd.dd_mul(pack_fine(bh, dims), pack_fine(bl, dims),
                         sh_f, sl_f)
    return PackedOperands(
        wEh=expand(small.wE[0]), wEl=expand(small.wE[1]),
        wWh=expand(small.wW[0]), wWl=expand(small.wW[1]),
        wSh=expand(small.wS[0]), wSl=expand(small.wS[1]),
        wNh=expand(small.wN[0]), wNl=expand(small.wN[1]),
        bth=bth, btl=btl,
        diag=expand(small.diag), dh=expand(small.dh),
        sh=sh_f, sl=sl_f,
    )

"""Double-float32 ("dd") primitives for Pallas TPU kernels.

The TPU has no native f64; XLA emulates it at ~10-20x the f32 op count and
Mosaic cannot lower f64 kernels at all.  For the few places that genuinely
need ~2^-48 precision inside a kernel (the iterative-refinement true
residual; the carried solution accumulator), an unevaluated (hi, lo) f32
pair is enough: |lo| <= ulp(hi)/2, value = hi + lo.

All transforms below are branch-free elementwise programs on arrays, safe
both in Pallas kernels and in plain XLA (used for building/validating the
dd operands).  ``two_prod`` uses Dekker splitting (no fused-multiply-add
assumption — Mosaic's elementwise mul/add are individually rounded).

Error model: two_sum/split are exact; two_prod is exact for inputs whose
product does not overflow; dd add/mul are accurate to O(2^-48) relative.

References (algorithms are classical): Dekker 1971, Knuth TAOCP vol 2.
The reference CPU code has no counterpart — it computes everything in
native f64 (e.g. /root/reference/src/lib/SolutionsManagers.py:17-40).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


import contextlib
import threading

_barrier_state = threading.local()


@contextlib.contextmanager
def with_barriers():
    """Enable EFT optimization barriers while tracing (default: OFF).

    XLA's HLO simplifier applies real-arithmetic identities (e.g.
    ``a - (a - b) -> b``) that are invalid in floating point and were
    measured to collapse the dd Newton iteration / Gaussian elimination
    into plain f32 under jit (eps32 results with perfect eager runs —
    and neither ``--xla_cpu_enable_fast_math=false`` nor
    ``--xla_allow_excess_precision=false`` disables the rewrites).
    ``optimization_barrier`` on each rounded intermediate stops that,
    but it also blocks FUSION: barrier-wrapping the bulk operand build
    (build_dd_scaled, ~6M-element arrays) measured 20.6k -> 14.4k
    solves/s at the paper config, while those chains are empirically
    compiled faithfully anyway (the bench's INDEPENDENT f64 residual
    gate passes without barriers).  Mosaic (Pallas TPU) has no barrier
    lowering at all and does not apply the rewrites.

    So: barriers default OFF; the small-system dd solvers
    (solve_small_spd_dd, the online dd path) — where the collapse is
    measured and the arrays are tiny — trace under this context."""
    _barrier_state.on = getattr(_barrier_state, "on", 0) + 1
    try:
        yield
    finally:
        _barrier_state.on -= 1


def _opaque(x):
    """Optionally hide a rounded intermediate from XLA's simplifier —
    active only under :func:`with_barriers` (see its docstring)."""
    if getattr(_barrier_state, "on", 0):
        return jax.lax.optimization_barrier(x)
    return x

def two_sum(a, b):
    """Exact sum: a + b = s + e with s = fl(a + b)."""
    s = _opaque(a + b)
    t = _opaque(s - a)
    e = (a - (s - t)) + (b - t)
    return s, e


def fast_two_sum(a, b):
    """Exact sum assuming |a| >= |b| (3 ops instead of 6)."""
    s = _opaque(a + b)
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split: a = hi + lo with hi, lo representable in 12 bits.

    The splitting constant (2^ceil(24/2) + 1 for f32) is constructed inside
    the function: a module-level jnp scalar would be a captured constant,
    which pallas kernels reject."""
    c = _opaque(jnp.float32(4097.0) * a)
    t = _opaque(c - a)
    hi = c - t
    return hi, a - hi


def two_prod(a, b):
    """Exact product: a * b = p + e with p = fl(a * b)."""
    p = _opaque(a * b)
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_add(xh, xl, yh, yl):
    """(xh, xl) + (yh, yl), renormalized.

    AccurateDWPlusDW (Joldes/Muller/Popescu 2017, Alg. 6; error <= 3u^2
    for ARBITRARY inputs).  The obvious one-renormalization variant loses
    to ~u relative error when the hi parts cancel — measured as a bimodal
    1e-15/6e-8 residual split in the dd Gaussian elimination, where pivot
    rows cancel routinely."""
    sh, sl = two_sum(xh, yh)
    th, tl = two_sum(xl, yl)
    c = sl + th
    vh, vl = fast_two_sum(sh, c)
    w = tl + vl
    return fast_two_sum(vh, w)


def dd_add_f32(xh, xl, y):
    """(xh, xl) + y for a plain f32 y."""
    sh, se = two_sum(xh, y)
    return fast_two_sum(sh, xl + se)


def dd_sub(xh, xl, yh, yl):
    return dd_add(xh, xl, -yh, -yl)


def dd_mul(xh, xl, yh, yl):
    """(xh, xl) * (yh, yl), renormalized (O(2^-48) relative)."""
    ph, pe = two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    return fast_two_sum(ph, pe)


def dd_mul_f32(xh, xl, y):
    """(xh, xl) * y for a plain f32 y."""
    ph, pe = two_prod(xh, y)
    pe = pe + xl * y
    return fast_two_sum(ph, pe)


def dd_rsqrt(xh, xl):
    """dd-accurate 1/sqrt(x) from f32 seed + two dd Newton steps.

    Two steps because the f32 ``rsqrt`` seed may be several ulp off on the
    VPU; each step squares the relative error, so even a 1e-6 seed lands at
    the dd floor (~2^-48).  All-f32 — this is how the symmetrizing scale
    ``s = D^{-1/2}`` is built WITHOUT any emulated-f64 pass."""
    import jax

    y_h = jax.lax.rsqrt(xh)
    y_l = jnp.zeros_like(y_h)
    half = jnp.float32(0.5)
    one = jnp.float32(1.0)
    for _ in range(2):
        th, tl_ = dd_mul(xh, xl, y_h, y_l)       # x y
        uh, ul = dd_mul(th, tl_, y_h, y_l)       # x y^2
        eh, el = dd_add(one - uh, jnp.zeros_like(uh), -ul, jnp.zeros_like(ul))
        ch, cl = dd_mul(eh, el, half * y_h, half * y_l)
        y_h, y_l = dd_add(y_h, y_l, ch, cl)
    return y_h, y_l


def dd_recip(ah, al):
    """dd-accurate 1/a from an f32 seed + two dd Newton steps.

    The correction ``e = 2 - a r`` must be formed as a dd subtraction:
    ``fl32(2 - th)`` with ``th ~ 1`` sits just OUTSIDE the Sterbenz range
    (th < 2/2), so the f32 subtraction rounds away exactly the eps32-sized
    information the step exists to recover (measured: the iteration
    silently stalls at eps32 for ~half of all inputs)."""
    rh = jnp.float32(1.0) / ah
    rl = jnp.zeros_like(rh)
    two = jnp.float32(2.0)
    zero = jnp.zeros_like(rh)
    for _ in range(2):
        th, tl = dd_mul(ah, al, rh, rl)
        eh, el = dd_add(two, zero, -th, -tl)
        rh, rl = dd_mul(rh, rl, eh, el)
    return rh, rl


def dd_from_f64(x):
    """Split an f64 array into an (hi, lo) f32 pair (XLA side, not kernel)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def dd_to_f64(hi, lo):
    """Recombine on the XLA side (requires x64)."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)

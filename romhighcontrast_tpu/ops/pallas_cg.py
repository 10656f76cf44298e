"""Pallas TPU kernel: fused, VMEM-resident CG on the Jacobi-symmetrized
stencil system.

Motivation: the XLA-level CG iteration launches ~8 HBM-roundtrip elementwise
kernels per iteration (~200 MB of traffic each at the paper config).  One
sample's entire state (5 stencil weight planes + 4 CG vectors at 80x128 f32)
is ~0.4 MB — it fits in VMEM ~40x over.  This kernel keeps the whole CG loop
on-chip: HBM traffic collapses to one read of the weights/rhs and one write
of the solution per sample, and every iteration runs at VPU speed on VMEM
operands.

Contract (all f32):
  * weights are the *symmetrized* stencil (unit diagonal — see
    ops.stencil.symmetrized_weights), zero-padded to tile-aligned shapes
    (rows -> multiple of 8, cols -> multiple of 128).  Zero padding is
    self-consistent: boundary/padded edge weights are zero, so the
    wrap-around of the in-kernel circular `roll` neighbor shifts is
    annihilated, and the padded region of x/r/p stays exactly zero through
    the iteration (inductively: padded b is zero and padded weights are
    zero, so no update ever reaches it).
  * solves K~ x = b per sample until ||r||^2 <= tol^2 ||b||^2 or maxiter.
  * one sample per grid step, pure 2D operands and scalar reductions —
    measured to be the Mosaic-friendliest layout (3D batched layouts with
    per-sample (BS,) reductions crash the Mosaic layout pass).

Used as the inner solver of the mixed-precision iterative refinement
(ops.solvers.solve_pcg_mixed with inner="pallas").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from romhighcontrast_tpu.ops import stencil as st

# Physical VMEM on TPU v5e is 128 MiB, but Mosaic's DEFAULT scoped limit is
# 16 MiB — rounds 1-3 treated that default as the hardware wall (block-size
# models capped near 15.5 MB and mesh 64 was forced to BS=1).  Measured
# 2026-08-19 on the real chip: kernels allocating up to 128 MiB of VMEM
# scratch compile AND run with ``vmem_limit_bytes`` raised.  Every solver
# kernel passes VMEM_LIMIT_BYTES; the auto block-size models budget their
# modeled live buffers against VMEM_BUDGET_BYTES (headroom for Mosaic
# internal scratch and grid I/O double-buffering beyond the modeled set).
VMEM_LIMIT_BYTES = 128 * 2**20
VMEM_BUDGET_BYTES = 100 * 2**20


def tpu_compiler_params():
    """Shared Mosaic compiler params for all solver kernels."""
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


def _neighbor(x, axis, shift):
    """Neighbor gather via circular roll — wrap contributions are multiplied
    by zero padded weights, so the result equals a zero-fill shift.
    pltpu.roll needs a non-negative i32 shift (-1 == size-1 circularly; a
    Python int would lower to i64 under jax_enable_x64)."""
    if shift < 0:
        shift += x.shape[axis]
    return pltpu.roll(x, shift=jnp.int32(shift), axis=axis)


def _cg_kernel(wE_ref, wW_ref, wS_ref, wN_ref, b_ref, x_ref, it_ref,
               *, tol2: float, maxiter: int, stag_window: int = 1_000_000):
    f32 = jnp.float32
    wE = wE_ref[0]
    wW = wW_ref[0]
    wS = wS_ref[0]
    wN = wN_ref[0]
    b = b_ref[0]

    def matvec(u):
        # unit diagonal: K~ u = u - sum_nbr w * u_nbr
        return (
            u
            - wE * _neighbor(u, 1, -1)
            - wW * _neighbor(u, 1, 1)
            - wS * _neighbor(u, 0, -1)
            - wN * _neighbor(u, 0, 1)
        )

    one = f32(1.0)
    zero = f32(0.0)
    bb = jnp.sum(b * b)
    # explicit f32 scalars: weak Python floats become f64 constants under
    # jax_enable_x64, which Mosaic cannot scalarise
    tol2bb = f32(tol2) * jnp.where(bb == 0, one, bb)

    # optional stagnation exit (disabled by default — the CG residual
    # oscillates and short windows break convergence; see solvers.py)
    def cond(state):
        rr, it, since = state[3], state[4], state[6]
        keep = jnp.logical_and(rr > tol2bb, since < stag_window)
        return jnp.logical_and(keep, it < maxiter)

    def body(state):
        x, r, p, rz, it, best, since = state
        Kp = matvec(p)
        pKp = jnp.sum(p * Kp)
        alpha = jnp.where(pKp > 0, rz / jnp.where(pKp > 0, pKp, one), zero)
        x = x + alpha * p
        r = r - alpha * Kp
        rz_new = jnp.sum(r * r)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, one), zero)
        p = r + beta * p
        rz_new = jnp.where(jnp.isfinite(rz_new), rz_new, zero)
        improved = rz_new < f32(0.99) * best
        best = jnp.minimum(best, rz_new)
        since = jnp.where(improved, jnp.int32(0), since + 1)
        return x, r, p, rz_new, it + 1, best, since

    x0 = jnp.zeros_like(b)
    state = (x0, b, b, bb, jnp.int32(0), bb, jnp.int32(0))
    out = jax.lax.while_loop(cond, body, state)
    x_ref[0] = out[0]
    # per-sample iteration count, broadcast over the (H, W) plane (a 2D f32
    # write is the Mosaic-friendly way to get a scalar out; hosts read
    # element [0, 0])
    it_ref[0] = jnp.full(out[0].shape, out[4].astype(jnp.float32))


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("tol", "maxiter", "interpret", "stag_window"))
def cg_symmetrized_pallas(
    wt: st.StencilCoefficients,
    b: jnp.ndarray,
    tol: float = 1e-3,
    maxiter: int = 500,
    interpret: bool = False,
    stag_window: int = 1_000_000,
):
    """Solve the symmetrized system for a batch ``(B, nr, nc)`` (f32).

    Returns ``(x, iterations)``: ``x`` of shape ``(B, nr, nc)`` and the real
    per-sample CG iteration counts ``(B,)`` i32 (1 matvec each).
    """
    B, nr, nc = b.shape
    H = _round_up(nr, 8)
    W = _round_up(nc, 128)

    def pad(x):
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, H - nr), (0, W - nc)))

    # The edge-boundary weights multiply Dirichlet zeros and are dead in
    # exact math; zero them so the circular rolls stay correct even when
    # nr/nc are exact multiples of the tile sizes (no zero guard row or
    # column to absorb the wrap).
    wt = st.StencilCoefficients(
        wE=wt.wE.at[..., -1].set(0.0), wW=wt.wW.at[..., 0].set(0.0),
        wS=wt.wS.at[..., -1, :].set(0.0), wN=wt.wN.at[..., 0, :].set(0.0),
        diag=wt.diag,
    )
    wE, wW_, wS, wN = pad(wt.wE), pad(wt.wW), pad(wt.wS), pad(wt.wN)
    bp = pad(b)

    spec = pl.BlockSpec((1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # Mosaic cannot compile kernels traced in x64 mode (index/scalar types
    # become i64/f64); the kernel is all-f32, so trace it in an x64-disabled
    # scope — measured necessary on TPU v5e with jax 0.9
    with jax.enable_x64(False):
        out_x, out_it = pl.pallas_call(
            functools.partial(_cg_kernel, tol2=tol * tol, maxiter=maxiter,
                              stag_window=stag_window),
            grid=(B,),
            in_specs=[spec] * 5,
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((B, H, W), jnp.float32),
                       jax.ShapeDtypeStruct((B, H, W), jnp.float32)),
            compiler_params=tpu_compiler_params(),
            interpret=interpret,
        )(wE, wW_, wS, wN, bp)
    return out_x[:, :nr, :nc], out_it[:, 0, 0].astype(jnp.int32)

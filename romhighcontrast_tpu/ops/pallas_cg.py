"""Pallas TPU kernel: fused, VMEM-resident batched CG on the Jacobi-
symmetrized stencil system.

Motivation: the XLA-level CG iteration launches ~8 HBM-roundtrip elementwise
kernels per iteration (~200 MB of traffic each at the paper config).  A whole
sample's state (5 stencil weight planes + 4 CG vectors at 80x128 f32) is
~0.4 MB — it fits in VMEM ~40x over.  This kernel keeps the entire CG loop
on-chip: HBM traffic collapses to one read of the weights/rhs and one write
of the solution, and each iteration runs at VPU speed on VMEM operands.

Contract (all f32):
  * weights are the *symmetrized* stencil (unit diagonal — see
    ops.stencil.symmetrized_weights), zero-padded to tile-aligned shapes
    (rows -> multiple of 8, cols -> multiple of 128).  Zero padding is
    self-consistent: boundary/padded edge weights are zero, so the
    wrap-around of the in-kernel `roll` neighbor shifts is annihilated.
  * solves K~ x = b per sample until ||r||^2 <= tol^2 ||b||^2 or maxiter.

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


def _neighbor(x, axis, shift):
    """Neighbor gather via circular roll — wrap contributions are multiplied
    by zero padded weights, so the result equals a zero-fill shift.
    pltpu.roll requires a non-negative shift; -1 == size-1 circularly."""
    if shift < 0:
        shift += x.shape[axis]
    return pltpu.roll(x, shift=shift, axis=axis)


def _cg_kernel(wE_ref, wW_ref, wS_ref, wN_ref, b_ref, x_ref,
               *, tol2: float, maxiter: int):
    wE = wE_ref[:]
    wW = wW_ref[:]
    wS = wS_ref[:]
    wN = wN_ref[:]
    b = b_ref[:]

    def matvec(u):
        # unit diagonal: K~ u = u - sum_nbr w * u_nbr
        return (
            u
            - wE * _neighbor(u, 2, -1)
            - wW * _neighbor(u, 2, 1)
            - wS * _neighbor(u, 1, -1)
            - wN * _neighbor(u, 1, 1)
        )

    def dots(u, v):
        return jnp.sum(u * v, axis=(1, 2))  # per-sample scalar (BS,)

    bb = dots(b, b)
    tol2bb = tol2 * jnp.where(bb == 0, 1.0, bb)

    def cond(state):
        _, _, _, _, rr, it = state
        return jnp.logical_and(jnp.any(rr > tol2bb), it < maxiter)

    def body(state):
        x, r, p, rz, rr, it = state
        active = (rr > tol2bb)[:, None, None]
        Kp = matvec(p)
        pKp = dots(p, Kp)
        alpha = jnp.where(pKp > 0, rz / jnp.where(pKp > 0, pKp, 1.0), 0.0)
        a_ = alpha[:, None, None]
        x = jnp.where(active, x + a_ * p, x)
        r = jnp.where(active, r - a_ * Kp, r)
        rz_new = dots(r, r)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = jnp.where(active, r + beta[:, None, None] * p, p)
        rr = jnp.where(jnp.isfinite(rz_new), rz_new, 0.0)
        return x, r, p, rz_new, rr, it + 1

    x0 = jnp.zeros_like(b)
    x, r, p, rz, rr, it = jax.lax.while_loop(
        cond, body, (x0, b, b, bb, bb, jnp.int32(0))
    )
    x_ref[:] = x


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("tol", "maxiter", "block_size", "interpret")
)
def cg_symmetrized_pallas(
    wt: st.StencilCoefficients,
    b: jnp.ndarray,
    tol: float = 1e-3,
    maxiter: int = 500,
    block_size: int = 8,
    interpret: bool = False,
):
    """Solve the symmetrized system for a batch ``(B, nr, nc)`` (f32).

    Returns ``(x, iters)`` with ``x`` of shape ``(B, nr, nc)`` and ``iters``
    the per-block iteration counts ``(ceil(B/block_size),)``.
    """
    B, nr, nc = b.shape
    H = _round_up(nr, 8)
    W = _round_up(nc, 128)
    BP = _round_up(B, block_size)

    def pad(x):
        return jnp.pad(
            x.astype(jnp.float32), ((0, BP - B), (0, H - nr), (0, W - nc))
        )

    wE, wW_, wS, wN = pad(wt.wE), pad(wt.wW), pad(wt.wS), pad(wt.wN)
    bp = pad(b)

    grid = (BP // block_size,)
    spec = pl.BlockSpec(
        (block_size, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_x = pl.pallas_call(
        functools.partial(_cg_kernel, tol2=tol * tol, maxiter=maxiter),
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BP, H, W), jnp.float32),
        interpret=interpret,
    )(wE, wW_, wS, wN, bp)
    return out_x[:B, :nr, :nc]

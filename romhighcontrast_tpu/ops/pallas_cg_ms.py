"""Multi-sample variant of the fused Pallas CG kernel.

The single-sample kernel (``pallas_cg``) runs VPU ops on (80, 128) operands —
only 10 vector registers per op, so per-instruction overhead dominates.  This
variant stacks ``BS`` samples along the sublane axis into ``(BS*H, W)``
operands (8x more work per instruction) and recovers the *per-sample* CG
scalars with two tiny MXU matmuls per reduction:

  * per-sample sums:  ``dots = S @ rowsum(u * v)``   with S (BS, BS*H) the
    sample-segment indicator,
  * per-row broadcast: ``alpha_rows = S^T @ alpha``.

Correctness of the stacked neighbor shifts: each sample occupies H rows of
which the last ``H - nr`` are zero padding, and the North/South edge weights
vanish on each sample's boundary rows, so the circular roll's leakage across
sample boundaries is annihilated exactly like the domain boundary (see
pallas_cg for the induction argument).  Requires ``H > nr`` (at least one
zero row between samples), which ``_round_up(nr, 8)`` gives for nr % 8 != 0;
otherwise a padding row is added.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from romhighcontrast_tpu.ops import stencil as st
from romhighcontrast_tpu.ops.pallas_cg import _neighbor, _round_up


def _cg_ms_kernel(wE_ref, wW_ref, wS_ref, wN_ref, b_ref, x_ref,
                  *, tol2: float, maxiter: int, BS: int, H: int):
    f32 = jnp.float32
    wE = wE_ref[0]
    wW = wW_ref[0]
    wS = wS_ref[0]
    wN = wN_ref[0]
    b = b_ref[0]
    rows = wE.shape[0]  # BS * H

    # sample-segment indicator S (BS, BS*H) and its transpose, as f32
    sid = jax.lax.broadcasted_iota(jnp.int32, (BS, rows), 1) // H
    kid = jax.lax.broadcasted_iota(jnp.int32, (BS, rows), 0)
    S = (sid == kid).astype(f32)

    def matvec(u):
        return (
            u
            - wE * _neighbor(u, 1, -1)
            - wW * _neighbor(u, 1, 1)
            - wS * _neighbor(u, 0, -1)
            - wN * _neighbor(u, 0, 1)
        )

    def dots(u, v):
        rowsum = jnp.sum(u * v, axis=1, keepdims=True)  # (rows, 1)
        return jnp.dot(S, rowsum, preferred_element_type=f32)  # (BS, 1)

    def to_rows(c):  # (BS, 1) -> (rows, 1)
        return jnp.dot(S.T, c, preferred_element_type=f32)

    one = f32(1.0)
    zero = f32(0.0)
    bb = dots(b, b)
    tol2bb = f32(tol2) * jnp.where(bb == 0, one, bb)

    def cond(state):
        rr, it = state[3], state[4]
        return jnp.logical_and(jnp.max(rr - tol2bb) > zero, it < maxiter)

    def body(state):
        x, r, p, rz, it = state
        active = (rz > tol2bb).astype(f32)  # (BS, 1)
        act_rows = to_rows(active)  # (rows, 1)
        Kp = matvec(p)
        pKp = dots(p, Kp)
        alpha = jnp.where(pKp > 0, rz / jnp.where(pKp > 0, pKp, one), zero)
        alpha_rows = to_rows(alpha * active)
        x = x + alpha_rows * p
        r = r - alpha_rows * Kp
        rz_new = dots(r, r)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, one), zero)
        beta_rows = to_rows(beta)
        p = act_rows * (r + beta_rows * p) + (one - act_rows) * p
        rz_new = jnp.where(jnp.isfinite(rz_new), rz_new, zero)
        rz_new = jnp.where(active > 0, rz_new, rz)
        return x, r, p, rz_new, it + 1

    x0 = jnp.zeros_like(b)
    x = jax.lax.while_loop(cond, body, (x0, b, b, bb, jnp.int32(0)))[0]
    x_ref[0] = x


@functools.partial(
    jax.jit, static_argnames=("tol", "maxiter", "block_size", "interpret")
)
def cg_symmetrized_pallas_ms(
    wt: st.StencilCoefficients,
    b: jnp.ndarray,
    tol: float = 1e-4,
    maxiter: int = 900,
    block_size: int = 8,
    interpret: bool = False,
):
    """Solve the symmetrized system for a batch ``(B, nr, nc)`` (f32) with
    ``block_size`` samples fused per grid step.  Returns ``(B, nr, nc)``."""
    B, nr, nc = b.shape
    H = _round_up(nr + 1, 8)  # >= one zero row between stacked samples
    W = _round_up(nc, 128)
    BS = block_size
    BP = _round_up(B, BS)

    def pad(x):
        x = jnp.pad(
            x.astype(jnp.float32), ((0, BP - B), (0, H - nr), (0, W - nc))
        )
        return x.reshape(BP // BS, BS * H, W)

    wE, wW_, wS, wN = pad(wt.wE), pad(wt.wW), pad(wt.wS), pad(wt.wN)
    bp = pad(b)

    spec = pl.BlockSpec(
        (1, BS * H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(
                _cg_ms_kernel, tol2=tol * tol, maxiter=maxiter, BS=BS, H=H
            ),
            grid=(BP // BS,),
            in_specs=[spec] * 5,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((BP // BS, BS * H, W), jnp.float32),
            interpret=interpret,
        )(wE, wW_, wS, wN, bp)
    out = out.reshape(BP, H, W)
    return out[:B, :nr, :nc]

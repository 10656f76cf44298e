"""Lean multi-sample fused Pallas CG kernel (v2 — the default fast path).

Replaces the round-1 kernels on the mixed-precision inner-solve path
(reference equivalent being replaced: the per-parameter scipy solves at
/root/reference/src/lib/SolutionsManagers.py:17-40,64-68):

* ``pallas_cg`` ran one sample per grid step on (80, 128) operands — each
  VPU instruction touched only 10 vector registers, so per-instruction
  overhead dominated (measured 546 ns/sample-iteration at the paper config).
* ``pallas_cg_ms`` (removed; this kernel is its tested successor) stacked
  samples along sublanes but masked convergence with
  full-array row selects and three MXU broadcasts per iteration (measured
  404 ns/sample-iteration).

This kernel keeps the sublane stacking (``BS`` samples of ``H`` rows each in
one ``(BS*H, W)`` VMEM-resident block) and removes every full-array masking
pass: CG freezing of converged samples only needs the *scalars* masked —
``alpha_k = beta_k = 0`` makes ``x_k, r_k`` exact fixed points and keeps
``p_k = r_k`` bounded — so convergence control costs a few (BS, 1) lane ops
and nothing on the vectors.  Per iteration the vector work is exactly:

  matvec (4 rolls + 4 fnma), two dot rows (2 mul + 2 lane-reduce), two
  segment matmuls (S @ rowsum, MXU), two row broadcasts (S^T @ scalar),
  and 6 axpy-style passes for x, r, p.

Correctness of the stacked neighbor rolls: each sample's ``H`` rows end in at
least one zero-padding row and the North/South edge weights vanish on sample
boundary rows, so circular-roll leakage between stacked samples is multiplied
by zero — the same induction as the single-sample kernel's domain padding.

The kernel also emits the real per-sample iteration count (the fix for
``PCGInfo.iterations`` on the fused path): a second ``(BS, 1)`` output
accumulates ``active`` per iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from romhighcontrast_tpu.ops import stencil as st
from romhighcontrast_tpu.ops.pallas_cg import _neighbor, _round_up


def _cg_v2_kernel(wE_ref, wW_ref, wS_ref, wN_ref, b_ref, x_ref, it_ref,
                  *, tol2: float, maxiter: int, BS: int, H: int):
    f32 = jnp.float32
    wE = wE_ref[0]
    wW = wW_ref[0]
    wS = wS_ref[0]
    wN = wN_ref[0]
    b = b_ref[0]
    rows = wE.shape[0]  # BS * H

    # sample-segment indicator S (BS, rows): S[k, i] = 1 iff row i belongs to
    # sample k.  Used for both the segment reduction (S @ rowsum) and the
    # per-row broadcast (S^T @ scalars).
    sid = jax.lax.broadcasted_iota(jnp.int32, (BS, rows), 1) // H
    kid = jax.lax.broadcasted_iota(jnp.int32, (BS, rows), 0)
    S = (sid == kid).astype(f32)

    def matvec(u):
        # unit diagonal of the symmetrized system: K~ u = u - sum_nbr w*u_nbr
        return (
            u
            - wE * _neighbor(u, 1, -1)
            - wW * _neighbor(u, 1, 1)
            - wS * _neighbor(u, 0, -1)
            - wN * _neighbor(u, 0, 1)
        )

    def dots(u, v):
        # segment reduction on the MXU: S @ (u*v) -> (BS, W), then a small
        # lane reduce.  Measured faster than lane-reducing the full (rows, W)
        # product into the pathologically laid-out (rows, 1) shape.
        part = jnp.dot(S, u * v, preferred_element_type=f32)  # (BS, W)
        return jnp.sum(part, axis=1, keepdims=True)  # (BS, 1)

    def to_rows(c):  # (BS, 1) -> (rows, 1)
        return jnp.dot(S.T, c, preferred_element_type=f32)

    one = f32(1.0)
    zero = f32(0.0)
    bb = dots(b, b)
    tol2bb = f32(tol2) * jnp.where(bb == 0, one, bb)

    def cond(state):
        rr, it = state[3], state[4]
        keep = jnp.max(rr - tol2bb) > zero
        return jnp.logical_and(keep, it < maxiter)

    def body(state):
        x, r, p, rz, it, counts = state
        active = (rz > tol2bb).astype(f32)  # (BS, 1)
        Kp = matvec(p)
        pKp = dots(p, Kp)
        # scalar-level freeze: alpha = beta = 0 for converged/broken samples
        # keeps x, r fixed and p = r bounded — no vector masking needed
        alpha = active * jnp.where(pKp > 0, rz / jnp.where(pKp > 0, pKp, one),
                                   zero)
        ar = to_rows(alpha)
        x = x + ar * p
        r = r - ar * Kp
        rz_new = dots(r, r)
        rz_new = jnp.where(jnp.isfinite(rz_new), rz_new, zero)
        beta = active * jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, one),
                                  zero)
        br = to_rows(beta)
        p = r + br * p
        rz = jnp.where(active > 0, rz_new, rz)
        return x, r, p, rz, it + 1, counts + active

    x0 = jnp.zeros_like(b)
    state = (x0, b, b, bb, jnp.int32(0), jnp.zeros((BS, 1), f32))
    out = jax.lax.while_loop(cond, body, state)
    x_ref[0] = out[0]
    it_ref[0] = out[5].astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("tol", "maxiter", "block_size", "interpret")
)
def cg_symmetrized_pallas_v2(
    wt: st.StencilCoefficients,
    b: jnp.ndarray,
    tol: float = 1e-4,
    maxiter: int = 900,
    block_size: int = 8,
    interpret: bool = False,
):
    """Solve the Jacobi-symmetrized system for a batch ``(B, nr, nc)`` (f32)
    with ``block_size`` samples fused per grid step.

    Returns ``(x, iterations)`` with ``x`` of shape ``(B, nr, nc)`` and
    ``iterations`` the real per-sample iteration counts, shape ``(B,)`` i32.
    Samples whose rhs is exactly zero (pre-converged, e.g. masked by the
    refinement loop) report 0 iterations.
    """
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
    it_spec = pl.BlockSpec((1, BS, 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    # Mosaic cannot compile kernels traced in x64 mode; all-f32 kernel, so
    # trace it in an x64-disabled scope (see pallas_cg.py)
    with jax.enable_x64(False):
        out, its = pl.pallas_call(
            functools.partial(
                _cg_v2_kernel, tol2=tol * tol, maxiter=maxiter, BS=BS, H=H
            ),
            grid=(BP // BS,),
            in_specs=[spec] * 5,
            out_specs=(spec, it_spec),
            out_shape=(
                jax.ShapeDtypeStruct((BP // BS, BS * H, W), jnp.float32),
                jax.ShapeDtypeStruct((BP // BS, BS, 1), jnp.int32),
            ),
            interpret=interpret,
        )(wE, wW_, wS, wN, bp)
    out = out.reshape(BP, H, W)
    return out[:B, :nr, :nc], its.reshape(BP)[:B]

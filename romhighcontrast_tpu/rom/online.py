"""Precomputed online reduced-Galerkin solver — the ROM serving path.

The reference's online solve (``generate_fm_solutions``,
/root/reference/src/lib/SolutionsManagers.py:88-106) contracts the dense
preassembled operator family with the basis per call.  The round-2 repo
already avoided the dense family but still rebuilt the reduced affine family
``F[q] = V K_q V^T`` (Q stencil applies over the basis + a (n, dim) einsum)
on every ``forward_reduced`` call — measured 12.6k solves/s at the paper
config, i.e. SLOWER than the full-order fast path it is supposed to beat.

The online phase is precompute-once / serve-many:

* offline (``__init__``): ``F (Q, n, n)``, ``B = V b (n,)``, the H10 reduced
  Gram ``G1`` and the basis itself — everything that depends only on V.
* online (``coefficients`` / ``solve``): ONE fused jitted program per batch —
  reduced assembly ``A = sum_q a_q F_q`` (one small einsum), batched n x n
  Cholesky solve, and (optionally) the lift ``c @ V`` and H10 error stats,
  with at most one readback.

Suite-measured (TPU v5e, paper config dim 6241, n = 15, batch 1000;
``python bench.py --suite`` 2026-08-19, docs/parity/bench_suite_r4.json):
**124,275 lifted solves/s; coefficient-only a 217-282k/s band** (that burst
is < 5 ms and tunnel-noise dominated — three same-process repeats spanned
it while the lifted line stayed within 7%) — the ROM outruns the ~43k/s
full-order fast path by ~3-6x.  These are the repo's only numbers for this
path; earlier per-call micro-benchmarks (which skipped the per-batch host
round-trip the suite includes) quoted 3-4x higher and are superseded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from romhighcontrast_tpu.ops import dd
from romhighcontrast_tpu.ops import solvers


def _dd_reduced_assembly(Fh, Fl, ah, al):
    """A = sum_q a_q F_q as an exact-to-2^-48 (hi, lo) pair — an EFT loop
    over the Q affine terms (Q = nrb*ncb, static).  The emulated-f64 einsum
    costs ~2.4 ms at (1000, 16, 15, 15); this is a pure-f32 elementwise
    chain."""
    Q = Fh.shape[0]
    Ah = jnp.zeros(ah.shape[:1] + Fh.shape[1:], jnp.float32)
    Al = jnp.zeros_like(Ah)
    for q in range(Q):
        ph, pl = dd.dd_mul(ah[:, q, None, None], al[:, q, None, None],
                           Fh[q], Fl[q])
        Ah, Al = dd.dd_add(Ah, Al, ph, pl)
    return Ah, Al


def _dd_reduced_matvec(Ah, Al, xh, xl, n):
    """dd residual matvec ``(A x)_k`` — EFT dot over the n reduced dims."""
    outh = jnp.zeros(Ah.shape[:-1], jnp.float32)
    outl = jnp.zeros_like(outh)
    for j in range(n):
        ph, pl = dd.dd_mul(Ah[..., j], Al[..., j],
                           xh[..., None, j], xl[..., None, j])
        outh, outl = dd.dd_add(outh, outl, ph, pl)
    return outh, outl


@partial(jax.jit, static_argnames=("lift",))
def _online_solve_dd(Fh, Fl, Bh, Bl, V, ah, al, lift: bool):
    """TPU serving path: dd assembly + dd elimination + dd refinement.
    No emulated-f64 arithmetic before the final lift."""
    n = Fh.shape[-1]
    Ah, Al = _dd_reduced_assembly(Fh, Fl, ah, al)
    Uh, Ul, mults, pinvs = solvers._dd_factor(Ah, Al, n)
    b = ah.shape[0]
    yh = jnp.broadcast_to(Bh, (b, n))
    yl = jnp.broadcast_to(Bl, (b, n))
    xh, xl = solvers._dd_factor_solve(Uh, Ul, mults, pinvs, yh, yl, n)
    # one dd refinement round: r = B - A x evaluated by EFT matvec
    th, tl = _dd_reduced_matvec(Ah, Al, xh, xl, n)
    rh, rl = dd.dd_add(yh, yl, -th, -tl)
    dh, dl = solvers._dd_factor_solve(Uh, Ul, mults, pinvs, rh, rl, n)
    xh, xl = dd.dd_add(xh, xl, dh, dl)
    c = dd.dd_to_f64(xh, xl)
    return c @ V if lift else c


@partial(jax.jit, static_argnames=("lift",))
def _online_solve(F, B, V, a_flat, lift: bool):
    A = jnp.einsum("bq,qkl->bkl", a_flat, F)
    c = solvers.solve_small_spd(A, B)
    return c @ V if lift else c


@jax.jit
def _online_errors(F, B, V, G1, K1u, uK1u, a_flat):
    """Fused online solve + H10 error statistics vs precomputed truth terms.

    ||c V - u||_K1^2 = c G1 c - 2 c (V K1 u) + u K1 u — no FOM-sized
    intermediate is formed per sample beyond the (b, n) coefficient array.
    """
    A = jnp.einsum("bq,qkl->bkl", a_flat, F)
    c = solvers.solve_small_spd(A, B)
    e2 = (jnp.einsum("bk,kl,bl->b", c, G1, c)
          - 2.0 * jnp.einsum("bk,bk->b", c, K1u) + uK1u)
    return c, jnp.sqrt(jnp.maximum(e2, 0.0))


class OnlineGalerkin:
    """Serve reduced Galerkin solves for a FIXED basis at dispatch-bound
    throughput.

    Usage::

        online = OnlineGalerkin(space, rb.basis)
        c = online.coefficients(a)        # (b, n) reduced coordinates
        u = online.solve(a)               # (b, dim) lifted solutions
        c, err = online.solve_and_errors(a, u_true)   # fused H10 errors
    """

    def __init__(self, space, V: jnp.ndarray):
        self.space = space
        self.V = jnp.asarray(V, space.dtype)
        #: (Q, n, n) reduced affine family — built once
        self.F = space.reduced_family(self.V)
        #: (n,) reduced load
        self.B = space.reduced_rhs(self.V)
        # (hi, lo) splits for the TPU dd serving path (built once)
        self._Fdd = dd.dd_from_f64(self.F)
        self._Bdd = dd.dd_from_f64(self.B)
        self._use_dd = jax.default_backend() != "cpu"
        # H10 error-stats operators are lazy: they need apply_laplacian,
        # which only the FEM space provides (solve/coefficients work for
        # any SolutionsManager, e.g. PolynomialSpace)
        self._G1 = None

    def _h10_ops(self):
        if self._G1 is None:
            KV = self.space.apply_laplacian(self.V)  # (n, dim)
            self._G1 = self.V @ KV.T
            self._KV1 = KV
        return self._G1, self._KV1

    @property
    def G1(self):
        return self._h10_ops()[0]

    @property
    def n(self) -> int:
        return int(self.V.shape[0])

    def _a_flat(self, a):
        a = jnp.asarray(a, self.space.dtype)
        if a.ndim == 2:
            a = a[None]
        return a.reshape(a.shape[0], -1)

    def _run(self, a, lift: bool):
        af = self._a_flat(a)
        if self._use_dd:
            ah, al = dd.dd_from_f64(af)
            # barriers on: the elimination's EFT chains collapse under the
            # HLO simplifier without them (tiny arrays — fusion cost moot)
            with dd.with_barriers():
                return _online_solve_dd(self._Fdd[0], self._Fdd[1],
                                        self._Bdd[0], self._Bdd[1], self.V,
                                        ah, al, lift)
        return _online_solve(self.F, self.B, self.V, af, lift=lift)

    def coefficients(self, a) -> jnp.ndarray:
        """Reduced coordinates ``(b, n)`` — no FOM-sized output at all."""
        return self._run(a, lift=False)

    def solve(self, a) -> jnp.ndarray:
        """Lifted online solutions ``(b, dim)`` in one fused program."""
        return self._run(a, lift=True)

    def solve_and_errors(self, a, u_true) -> tuple[jnp.ndarray, jnp.ndarray]:
        """One program: reduced assembly + solve + per-sample H10 error
        ``||c V - u_true||_H10`` (truth-dependent terms are computed inside
        the same jit; only (b,)-sized stats need a readback)."""
        G1, KV1 = self._h10_ops()
        u = jnp.asarray(u_true, self.space.dtype)
        K1u = u @ KV1.T  # (b, n)
        uK1u = jnp.sum(u * self.space.apply_laplacian(u), axis=-1)
        return _online_errors(self.F, self.B, self.V, G1, K1u, uK1u,
                              self._a_flat(a))

"""Prototype: dd-state CG with residual REPLACEMENT vs f32 restart rounds.

Question (ROADMAP r4 item 7): the mesh-64 straggler tail is the f32
per-ROUND contraction floor eps32 * kappa (~1.5e-3 at mesh 64 vs ~1.5e-4
at mesh 20) — every sample pays an extra refinement round and corner
samples pay several.  The round-2 do-not-retry covers (a) dd x/r
ACCUMULATION alone (floor unchanged: the recurrence residual drifts at
eps32*|K||p| per iteration regardless of accumulator precision) and
(b) compensating EVERY matvec (2-product stencil, ~3x/iteration: net
loss).  It does NOT cover the classical reliable-updates scheme
(van der Vorst & Ye 2000): carry x/r in dd AND periodically REPLACE the
recurrence residual with an accurately evaluated true residual
(the dd two-product stencil the dd-round kernel already implements) —
cost ~3x every m iterations instead of every iteration.

If the scheme contracts to ~eps_dd * kappa in ONE inner solve, the
3-4-round refinement structure collapses to ~1 round:
  mesh 20: eps_dd*kappa ~ 3.6e-15 * 1.25e3 ~ 4.5e-12  (3 rounds -> 1)
  mesh 64: eps_dd*kappa ~ 3.6e-15 * 1.25e4 ~ 4.5e-11  (4+ rounds -> 1-2)

Here dd is emulated by f64 (same behavior class; the analytic eps_dd
floor above is what the TPU kernel would deliver).  All matvecs, dots,
and search directions run in f32 — only the x/r updates and the
replacement evaluation are f64.

Run (CPU): PYTHONPATH=/root/repo:$PYTHONPATH JAX_PLATFORMS=cpu \
    python scripts/proto_dd_rr.py [mesh]
"""
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo/tests")
from oracle import FemOracle  # noqa: E402


def build(mesh_n, contrast=1e10):
    o = FemOracle((4, 4), mesh_n)
    a = np.ones((4, 4))
    for r, c in [(0, 1), (1, 3), (2, 1), (2, 2), (2, 3)]:
        a[r, c] = contrast
    K = o.stiffness(a).tocsr()
    d = K.diagonal()
    s = 1.0 / np.sqrt(d)
    Ks = sp.diags(s) @ K @ sp.diags(s)
    b = s * o.load()
    b = b / np.linalg.norm(b)
    return Ks.tocsr(), b


def true_res(Ks, b, x):
    """Measuring stick: f64 CSR matvec (floor eps64*kappa ~ 3e-12 at
    mesh 64 — below everything we need to distinguish)."""
    return np.linalg.norm(b - Ks @ x) / np.linalg.norm(b)


def cg_f32(Ks32, b32, maxit, rtol):
    """Plain f32 CG (one refinement round's inner, minus the Chebyshev
    wrapper — the floor physics is preconditioner-independent)."""
    x = np.zeros_like(b32)
    r = b32.copy()
    p = r.copy()
    rr = np.float32(r @ r)
    tgt = np.float32(rtol * rtol) * rr
    for k in range(maxit):
        q = Ks32 @ p
        alpha = rr / np.float32(p @ q)
        x += alpha * p
        r -= alpha * q
        rr_new = np.float32(r @ r)
        if rr_new <= tgt:
            break
        p = r + (rr_new / rr) * p
        rr = rr_new
    return x, k + 1


def scheme_A(Ks, b, rounds=6, maxit=4000, rtol=1e-5):
    """Current architecture: f32 inner per round + f64 (dd) true residual
    between rounds.  Expect contraction/round to floor at eps32*kappa."""
    Ks32 = Ks.astype(np.float32)
    x = np.zeros_like(b)
    hist, its_total = [], 0
    for rnd in range(rounds):
        r = b - Ks @ x  # dd-round true residual
        nr = np.linalg.norm(r)
        hist.append(nr / np.linalg.norm(b))
        if hist[-1] < 1e-13:
            break
        d32, its = cg_f32(Ks32, (r / nr).astype(np.float32), maxit, rtol)
        its_total += its
        x += nr * d32.astype(np.float64)
    hist.append(true_res(Ks, b, x))
    return hist, its_total


def scheme_B(Ks, b, maxit=20000, rtol=1e-11, replace_every=0,
             replace_drop=0.1, dd_accum=True):
    """dd-state CG with residual replacement.

    x, r in f64 (dd stand-in).  p and the matvec in f32.  dots in f32 on
    the rounded r.  Replacement: r = b - Ks@x in f64 whenever the
    recurrence ||r|| has dropped by `replace_drop` since the last
    replacement (vdV-Ye style), or every `replace_every` iterations if
    set.  `dd_accum=False` downgrades x,r to f32 (control = the round-2
    prototype, expect eps32*kappa floor)."""
    acc = np.float64 if dd_accum else np.float32
    Ks32 = Ks.astype(np.float32)
    x = np.zeros(len(b), acc)
    r = b.astype(acc).copy()
    z = r.astype(np.float32)
    p = z.copy()
    rr = np.float32(z @ z)
    rr0 = rr
    rr_last_rep = rr
    tgt = np.float32(rtol * rtol) * rr
    n_rep = 0
    traj = []
    for k in range(maxit):
        q32 = Ks32 @ p
        alpha = np.float32(rr / np.float32(p @ q32))
        x += acc(alpha) * p.astype(acc)
        r -= acc(alpha) * q32.astype(acc)
        z = r.astype(np.float32)
        rr_new = np.float32(z @ z)
        replaced = False
        if dd_accum and (
            (replace_every and (k + 1) % replace_every == 0)
            or (not replace_every and rr_new <= replace_drop**2 * rr_last_rep)
        ):
            r = b - Ks @ x  # the dd two-product stencil pass on TPU
            z = r.astype(np.float32)
            rr_new = np.float32(z @ z)
            rr_last_rep = rr_new
            n_rep += 1
            replaced = True
        if (k + 1) % 200 == 0:
            traj.append((k + 1, float(np.sqrt(rr_new / rr0)),
                         true_res(Ks, b, x)))
        if rr_new <= tgt:
            break
        beta = np.float32(rr_new / rr)
        # restart the direction at replacement points: the replaced
        # residual is not conjugate to the old directions
        p = z + (np.float32(0.0) if replaced else beta) * p
        rr = rr_new
    return x, k + 1, n_rep, traj


def main():
    mesh = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print(f"mesh {mesh}: building operator...", flush=True)
    Ks, b = build(mesh)
    n = Ks.shape[0]
    print(f"dim {n}")

    t0 = time.time()
    hist, its = scheme_A(Ks, b)
    contr = [hist[i + 1] / hist[i] for i in range(len(hist) - 1)]
    print(f"\nA (f32 rounds, rtol 1e-5): {its} its total, {time.time()-t0:.1f}s")
    print("  round residuals:", " ".join(f"{h:.2e}" for h in hist))
    print("  contractions:   ", " ".join(f"{c:.2e}" for c in contr))

    for tag, kw in [
        ("B  (dd + replace on 10x drop)", dict()),
        ("B' (dd + replace every 50)", dict(replace_every=50)),
        ("C  (f32 state, no replace — r2 control)", dict(dd_accum=False)),
        ("D  (dd state, NO replace — r2 control)",
         dict(replace_drop=0.0, replace_every=10**9)),
    ]:
        t0 = time.time()
        x, its, n_rep, traj = scheme_B(Ks, b, **kw)
        tr = true_res(Ks, b, x)
        print(f"\n{tag}: {its} its, {n_rep} replacements, "
              f"true rel res {tr:.2e}, {time.time()-t0:.1f}s")
        for k, rec, t in traj[-4:]:
            print(f"    it {k:5d}: recurrence {rec:.2e}  true {t:.2e}")


if __name__ == "__main__":
    main()

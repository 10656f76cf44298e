"""Round-5 sweep: fine Chebyshev window at mesh 224/256 (the huge-grid
in-kernel route).

At mesh >= 224 the stride-16-capped coarse level nominally covers only
lambda <~ 2 sin^2(pi*16/(n+1)) ~ 0.005 while the fine window floors at
0.116 — a 4x wider uncovered band than mesh 128's.  Candidates extend the
fine window down at higher degree (cost ~deg per outer; wins only if
outer counts drop faster).  Interleaved 4-pass methodology.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_r5_mesh256_window.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def bench_cfg(space, a, opts, tol=1e-10, reps=2):
    def rep():
        return space.solve(a, method="pallas", tol=tol, inner_opts=opts,
                           interior_clusters=False)

    t0 = time.time()
    acc = [jnp.sum(rep()) for _ in range(reps)]
    float(sum(acc))
    return len(a) * reps / (time.time() - t0)


def gate(space, a, opts, tol=1e-10):
    from romhighcontrast_tpu.ops import stencil as st

    sols, info = space.solve(a, method="pallas", tol=tol, inner_opts=opts,
                             interior_clusters=False, return_info=True)
    w = space.weights(a)
    r = space.load[None, :] - st.apply_operator_flat(
        w, sols, space.grid_shape).reshape(len(a), -1)
    rel = float(jnp.max(jnp.linalg.norm(r, axis=-1)
                        / jnp.linalg.norm(space.load)))
    it = np.asarray(info.iterations)
    return rel, float(it.mean()), int(it.max())


def sweep(mesh_n, n_samples, cfgs, passes=4):
    from romhighcontrast_tpu.models.fem import FemSpace
    from romhighcontrast_tpu.config import INFINIT_A

    space = FemSpace((4, 4), mesh_n)
    a = np.ones((n_samples, 4, 4))
    a[:, 0, 1] = INFINIT_A
    a[:, 1, 3] = INFINIT_A
    a[: n_samples // 2, 3, 2] = 1e6
    a = jnp.asarray(a)
    log(f"mesh {mesh_n}: dim {space.vspace_dim}, {n_samples} samples")
    ok = {}
    for name, opts in cfgs.items():
        try:
            t0 = time.time()
            rel, itm, itx = gate(space, a, opts)
            ok[name] = rel < 1e-9
            log(f"  {name}: residual {rel:.2e} "
                f"{'OK' if ok[name] else 'FAIL'} it mean/max {itm:.0f}/"
                f"{itx} (first call {time.time() - t0:.0f}s)")
        except Exception as e:
            ok[name] = False
            log(f"  {name}: EXC {type(e).__name__}: {str(e)[:200]}")
    results = {name: [] for name in cfgs}
    for p in range(passes):
        for name, opts in cfgs.items():
            if not ok[name]:
                continue
            results[name].append(bench_cfg(space, a, opts))
        log(f"  pass {p}: " + ", ".join(
            f"{n}={results[n][-1]:.1f}/s" for n in results if results[n]))
    for name in results:
        if results[name]:
            med = float(np.median(results[name]))
            log(f"  RESULT mesh{mesh_n} {name}: median {med:.1f} solves/s")
    return results


def main():
    log("devices:", jax.devices())
    sweep(256, 8, {
        "default": (),
        "l05_deg5": (("lmin", 0.05), ("deg", 5)),
        "l03_deg6": (("lmin", 0.03), ("deg", 6)),
        "l012_deg9": (("lmin", 0.012), ("deg", 9)),
    }, passes=4)


if __name__ == "__main__":
    main()

"""Round-5 sweep (VERDICT r4 #5): dynamic straggler re-binning A/B.

Phase-B CASCADE vs the single K=128 compact phase at mesh 64 / BS=8 (the
config whose tail = a few samples per block padding whole blocks) and at
mesh 40 as a control.  Interleaved 4-pass methodology (warm gate first,
round-robin config order — CLAUDE.md tunnel-timing rules).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_r5_cascade.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def bench_cfg(space, a, opts, tol=1e-10, reps=2):
    def rep():
        return space.solve(a, method="pallas", tol=tol, inner_opts=opts)

    t0 = time.time()
    acc = [jnp.sum(rep()) for _ in range(reps)]
    float(sum(acc))
    return len(a) * reps / (time.time() - t0)


def gate(space, a, opts, tol=1e-10):
    from romhighcontrast_tpu.ops import stencil as st

    sols, info = space.solve(a, method="pallas", tol=tol, inner_opts=opts,
                             return_info=True)
    w = space.weights(a)
    r = space.load[None, :] - st.apply_operator_flat(w, sols,
                                                     space.grid_shape)
    rel = float(jnp.max(jnp.linalg.norm(r, axis=-1)
                        / jnp.linalg.norm(space.load)))
    it = np.asarray(info.iterations)
    return rel, float(it.mean()), float(np.median(it)), int(it.max())


def sweep(mesh_n, n_samples, cfgs, passes=4):
    from romhighcontrast_tpu.benchmarks import _paper_problem

    space, a = _paper_problem(mesh_n, n_samples)
    a = jnp.asarray(a)
    log(f"mesh {mesh_n}: dim {space.vspace_dim}, {n_samples} samples")
    ok = {}
    for name, opts in cfgs.items():
        try:
            t0 = time.time()
            rel, itm, itd, itx = gate(space, a, opts)
            ok[name] = rel < 1e-9
            log(f"  {name}: residual {rel:.2e} "
                f"{'OK' if ok[name] else 'FAIL'} "
                f"it mean/med/max {itm:.0f}/{itd:.0f}/{itx} "
                f"(first call {time.time() - t0:.0f}s)")
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
            f"{n}={results[n][-1]:.0f}/s" for n in results if results[n]))
    for name in results:
        if results[name]:
            med = float(np.median(results[name]))
            log(f"  RESULT mesh{mesh_n} {name}: median {med:.0f} solves/s "
                f"({[round(v) for v in results[name]]})")
    return results


def main():
    log("devices:", jax.devices())
    sweep(64, 512, {
        "default": (),
        "casc_256_128": (("phase_b_cascade", (256, 128)),),
        "casc_192_96": (("phase_b_cascade", (192, 96)),),
    }, passes=4)
    sweep(40, 512, {
        "default": (),
        "casc_256_128": (("phase_b_cascade", (256, 128)),),
    }, passes=4)


if __name__ == "__main__":
    main()

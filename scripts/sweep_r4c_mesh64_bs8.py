"""Round-4c sweep: mesh-64 coarse-coverage knobs, re-swept at BS=8.

Why re-sweep: every stride/dc lever at mesh 64 was measured (and closed) at
BS=1, where the packed coarse stage used 17 of 128 lanes and deeper coarse
Chebyshev sweeps were latency-bound (docs/ROADMAP.md r4 item 5).  The
128 MB VMEM discovery (61157d4d) then moved mesh 64 to BS=8, where coarse
arrays pack 8 samples across lanes — the latency argument no longer holds,
so the spectral-gap configs deserve a second pass.

Spectral picture (mesh 64, nc=255): stride 16 coarse covers
lambda <~ 2 sin^2(pi/32) = 0.019; the fine Chebyshev window starts at
0.116 — the band [0.019, 0.116] is preconditioned by neither, and phase-A
outer counts at mesh 64 run ~3x the mesh-20 rate (mesh 20's stride-5
coarse covers 0.19 > 0.116: no gap).  Configs either densify the coarse
grid (stride 8 / 4, coverage 0.077 / 0.293) or extend the fine window down
(lmin 0.077 / 0.046 with a deeper fine degree).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_r4c_mesh64_bs8.py
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
    """Warm + residual gate; returns (rel_max, it_mean, it_med, it_max)."""
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
        # close the gap from the coarse side
        "s8": (("stride", 8),),
        "s8_l077": (("stride", 8), ("lmin", 0.077)),
        "s8_l077_dc14": (("stride", 8), ("lmin", 0.077), ("dc", 14),
                         ("clmin", 0.01)),
        "s4": (("stride", 4),),
        "s4_dc20": (("stride", 4), ("dc", 20), ("clmin", 0.005)),
        # close the gap from the fine side
        "l046_deg5": (("lmin", 0.046), ("deg", 5)),
        "l019_deg7": (("lmin", 0.019), ("deg", 7)),
    }, passes=4)
    # mesh-40 control: is stride 5 still the winner at its new BS=8?
    sweep(40, 512, {
        "default": (),
        "s4": (("stride", 4),),
        "s5_dc14": (("dc", 14), ("clmin", 0.01)),
    }, passes=4)


if __name__ == "__main__":
    main()

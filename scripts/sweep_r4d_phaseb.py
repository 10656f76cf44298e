"""Round-4d sweep: compact phase-B inner kernel A/B (v2 vs 2l).

The r4c sweep showed the straggler tail dominates fine-mesh work: at
mesh 64 with stride 8 the batch median is 240 matvec-equivalents but the
mean is 605 — ~60% of all matvec work is the phase-B single-level dig
(13 matvec-equivalents per deg-12 iteration, window narrowing as 1/n^2).
The new ``phase_b_inner="2l"`` runs the compact straggler phase through a
re-prepped two-level subproblem instead.  Combinations with the denser
coarse grids are included: their cheaper phase A lost at the default
because THEIR tails were even longer.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_r4d_phaseb.py
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


def sweep(mesh_n, n_samples, cfgs, passes=4, tol=1e-10):
    from romhighcontrast_tpu.benchmarks import _paper_problem

    space, a = _paper_problem(mesh_n, n_samples)
    a = jnp.asarray(a)
    log(f"mesh {mesh_n}: dim {space.vspace_dim}, {n_samples} samples")
    ok = {}
    for name, opts in cfgs.items():
        try:
            t0 = time.time()
            rel, itm, itd, itx = gate(space, a, opts, tol=tol)
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
            results[name].append(bench_cfg(space, a, opts, tol=tol))
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
    PB = ("phase_b_inner", "2l")
    sweep(64, 512, {
        "default": (),
        "pb2l": (PB,),
        "s8_pb2l": (("stride", 8), PB),
        "s4_pb2l": (("stride", 4), PB),
    }, passes=4)
    sweep(40, 512, {
        "default": (),
        "pb2l": (PB,),
    }, passes=4)
    # paper-config guard: phase B is a few % at mesh 20 — must not regress
    sweep(20, 1000, {
        "default": (),
        "pb2l": (PB,),
    }, passes=4)


if __name__ == "__main__":
    main()

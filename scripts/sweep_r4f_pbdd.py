"""Round-4f sweep: compact dd-state phase B (+ dd phase A hand-off).

Follow-up to sweep_r4e (phase_a="dd" full-batch: loses 2.6-3x everywhere —
the dd kernel has no "until_few" hand-off, so whole blocks burn to maxiter
on their slowest sample, and the keep-beta direction PLATEAUS on high-kappa
stragglers: mesh 40 max 3052 mv vs 716 under restart rounds).  This sweep
measures the two fixes on hardware:

- ``phase_b_inner="dd"``: the compact top-K straggler dig as ONE dd-state
  kernel launch with ``rep_restart`` (direction restart at replacement
  points = in-kernel refinement rounds, no per-round dd_round pass or
  relaunch) — targeting the mesh-64 tail (f32 round-contraction floor
  grows ~mesh^2, ROADMAP r4 item 7);
- ``phase_a="dd"`` with a SMALL ``dd_maxiter_a`` (early hand-off) feeding
  the compact dd dig — the all-dd architecture;
- ``rep_restart=False`` (keep-beta) in the compact phase as the control.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_r4f_pbdd.py
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
    PBDD = ("phase_b_inner", "dd")
    sweep(64, 512, {
        "default": (),
        "pb_dd": (PBDD,),
        "pb_dd_keep": (PBDD, ("rep_restart", False)),
        "pa48_pb_dd": (("phase_a", "dd"), ("dd_maxiter_a", 48), PBDD),
    }, passes=4)
    sweep(40, 512, {
        "default": (),
        "pb_dd": (PBDD,),
    }, passes=4)
    # paper-config guard: must not regress the 39.7k suite line
    sweep(20, 1000, {
        "default": (),
        "pb_dd": (PBDD,),
    }, passes=4)


if __name__ == "__main__":
    main()

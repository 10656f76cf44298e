"""Mesh-128 knob sweep: stride / block size / phase-B inner, interleaved
round-robin (tunnel drift discipline, CLAUDE.md).  Batch 64, tol 1e-10,
residual-gated.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/sweep_r4h_mesh128.py
"""
import time

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


CONFIGS = {
    "default": {},
    "stride16": {"inner_opts": (("stride", 16),)},
    "bs1": {"inner_opts": (("block_size", 1),)},
    "pb_2l": {"inner_opts": (("phase_b_inner", "2l"),)},
    "pb_dd": {"inner_opts": (("phase_b_inner", "dd"), ("rep_restart", True))},
}


def main():
    import jax
    import jax.numpy as jnp

    log("devices:", jax.devices())
    from romhighcontrast_tpu.benchmarks import _paper_problem, _timed_burst
    from romhighcontrast_tpu.ops import stencil as st

    B = 64
    space, a = _paper_problem(128, B)
    a = jnp.asarray(a)
    log(f"dim {space.vspace_dim}, batch {B}")

    # compile + residual-gate every config, collect iteration stats
    its = {}
    for name, kw in list(CONFIGS.items()):
        t0 = time.time()
        try:
            sols, info = space.solve(a, method="pallas", tol=1e-10,
                                     return_info=True, **kw)
            rel_gate = float(jnp.max(jnp.asarray(info.relative_residual)))
            w = space.weights(a)
            r = space.load[None, :] - st.apply_operator_flat(
                w, sols, space.grid_shape)
            rel = float(jnp.max(jnp.linalg.norm(r, axis=-1)
                                / jnp.linalg.norm(space.load)))
            mv = np.asarray(info.iterations)
            its[name] = (int(mv.mean()), int(np.median(mv)), int(mv.max()))
            log(f"{name}: compile+run {time.time()-t0:.0f}s, "
                f"rel {rel:.1e} (reported {rel_gate:.1e}), "
                f"mv mean/med/max {its[name]}")
            if not rel < 1e-9:
                log(f"{name}: GATE FAILED, dropping")
                CONFIGS.pop(name, None)
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            CONFIGS.pop(name, None)

    # interleaved timing, 4 passes x reps=3
    results = {name: [] for name in CONFIGS}
    reps = 3
    for name, kw in CONFIGS.items():   # warm burst per config
        _timed_burst(lambda kw=kw: space.solve(a, method="pallas",
                                               tol=1e-10, **kw), reps)
    for p in range(4):
        for name, kw in CONFIGS.items():
            dt = _timed_burst(lambda kw=kw: space.solve(
                a, method="pallas", tol=1e-10, **kw), reps)
            results[name].append(B / dt)
        log(f"pass {p}: " + "  ".join(
            f"{n}={results[n][-1]:.1f}" for n in results))

    log("=== medians (solves/s) ===")
    for name, vals in sorted(results.items(),
                             key=lambda kv: -np.median(kv[1])):
        log(f"{name}: {np.median(vals):.1f}  (runs {[f'{v:.1f}' for v in vals]})"
            f"  mv mean/med/max {its.get(name)}")


if __name__ == "__main__":
    main()

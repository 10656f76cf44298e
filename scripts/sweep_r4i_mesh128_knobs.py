import time
import numpy as np

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

CONFIGS = {
    "s16": {"inner_opts": (("stride", 16),)},
    "s16_dc14": {"inner_opts": (("stride", 16), ("dc", 14))},
    "s16_deg5": {"inner_opts": (("stride", 16), ("deg", 5))},
    "s16_padd": {"inner_opts": (("stride", 16), ("phase_a", "dd"))},
    "s16_padd_pbdd": {"inner_opts": (("stride", 16), ("phase_a", "dd"),
                                     ("phase_b_inner", "dd"))},
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
    its = {}
    for name, kw in list(CONFIGS.items()):
        t0 = time.time()
        try:
            sols, info = space.solve(a, method="pallas", tol=1e-10,
                                     return_info=True, **kw)
            w = space.weights(a)
            r = space.load[None, :] - st.apply_operator_flat(w, sols, space.grid_shape)
            rel = float(jnp.max(jnp.linalg.norm(r, axis=-1) / jnp.linalg.norm(space.load)))
            mv = np.asarray(info.iterations)
            its[name] = (int(mv.mean()), int(np.median(mv)), int(mv.max()))
            log(f"{name}: compile+run {time.time()-t0:.0f}s, rel {rel:.1e}, mv {its[name]}")
            if not rel < 1e-9:
                log(f"{name}: GATE FAILED, dropping"); del CONFIGS[name]
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}"); CONFIGS.pop(name, None)

    results = {name: [] for name in CONFIGS}
    reps = 3
    for name, kw in CONFIGS.items():
        _timed_burst(lambda kw=kw: space.solve(a, method="pallas", tol=1e-10, **kw), reps)
    for p in range(4):
        for name, kw in CONFIGS.items():
            dt = _timed_burst(lambda kw=kw: space.solve(a, method="pallas", tol=1e-10, **kw), reps)
            results[name].append(B / dt)
        log(f"pass {p}: " + "  ".join(f"{n}={results[n][-1]:.1f}" for n in results))
    log("=== medians (solves/s) ===")
    for name, vals in sorted(results.items(), key=lambda kv: -np.median(kv[1])):
        log(f"{name}: {np.median(vals):.1f}  mv {its.get(name)}")

main()

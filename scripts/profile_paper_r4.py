"""Round-4 paper-config decomposition: where do the 25 us/sample go?

CLAUDE.md's kernel budget says ~0.5 us/sample-outer and the bench mean is
~128 matvec-equivalents (~32 deg-3 outers) => ~16 us/sample of kernel work,
vs 25.2 us/sample measured (39.7k solves/s).  This profile splits the rest:

- a tolerance ladder isolates marginal cost per decade (round structure);
- tol=1e0 exits at round zero => operand build + fixed launch/readback;
- batch scaling (250 vs 1000) splits fixed-per-batch from per-sample cost.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_paper_r4.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from romhighcontrast_tpu.benchmarks import _paper_problem, _timed_burst


def bench(space, a, tol, reps, label):
    def rep():
        return space.solve(a, tol=tol, method="pallas")

    t0 = time.time()
    x, info = space.solve(a, tol=tol, method="pallas", return_info=True)
    it = np.asarray(info.iterations)
    rel = np.asarray(info.relative_residual)
    compile_s = time.time() - t0
    _timed_burst(rep, reps)
    dt = _timed_burst(rep, reps)
    print(json.dumps({
        "label": label, "tol": tol,
        "us_per_sample": round(1e6 * dt / len(a), 2),
        "solves_per_s": round(len(a) / dt, 1),
        "it_mean": round(float(it.mean()), 1),
        "it_med": float(np.median(it)), "it_max": int(it.max()),
        "rel_med": float(np.median(rel)),
        "first_call_s": round(compile_s, 1),
    }), flush=True)
    return dt


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    space, a = _paper_problem(20, 1000)
    a = jnp.asarray(a)
    space_s, a_s = _paper_problem(20, 250)
    a_s = jnp.asarray(a_s)

    # tunnel warm-up
    for _ in range(2):
        float(jnp.sum(space.solve(a, tol=1e-10, method="pallas")))
    print("warm", flush=True)

    for tol in (1e0, 1e-2, 1e-4, 1e-6, 1e-8, 1e-10):
        bench(space, a, tol, reps=6, label="b1000")
    for tol in (1e0, 1e-10):
        bench(space_s, a_s, tol, reps=6, label="b250")
    # interleaved repeat of the headline configs to bound drift
    bench(space, a, 1e-10, reps=6, label="b1000-rep")
    bench(space, a, 1e0, reps=6, label="b1000-rep")


if __name__ == "__main__":
    main()

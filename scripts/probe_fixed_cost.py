"""Pin down the paper-config fixed cost: device work vs harness overhead.

profile_paper_r4 measured 14.1 us/sample at tol=1e0 (zero CG iterations) —
53% of the full solve.  Candidates: (a) real device work (operand build +
prep), (b) per-burst harness overhead (the burst does reps async dispatches,
then len(acc) eager scalar adds + ONE ~25 ms value readback — amortized over
reps*B solves).  Discriminator: vary reps; (b) scales as 1/reps, (a) doesn't.
An empty-program burst measures (b) alone.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_fixed_cost.py
"""

import json
import time

import jax
import jax.numpy as jnp

from romhighcontrast_tpu.benchmarks import _paper_problem, _timed_burst


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    space, a = _paper_problem(20, 1000)
    a = jnp.asarray(a)
    space_s, a_s = _paper_problem(20, 250)
    a_s = jnp.asarray(a_s)

    for _ in range(2):
        float(jnp.sum(space.solve(a, tol=1e-10, method="pallas")))
    print("warm", flush=True)

    tiny = jnp.ones((8, 128))
    fast = jax.jit(lambda x: x * 2.0)
    float(jnp.sum(fast(tiny)))

    def run(label, fn, n, reps):
        _timed_burst(fn, reps)
        dt = _timed_burst(fn, reps)
        print(json.dumps({
            "label": label, "reps": reps,
            "ms_per_rep": round(1e3 * dt, 3),
            "us_per_sample": round(1e6 * dt / n, 2),
        }), flush=True)

    for reps in (6, 30):
        run("empty", lambda: fast(tiny), 1000, reps)
        run("b1000-tol1e0",
            lambda: space.solve(a, tol=1e0, method="pallas"), 1000, reps)
        run("b1000-tol1e-10",
            lambda: space.solve(a, tol=1e-10, method="pallas"), 1000, reps)
        run("b250-tol1e0",
            lambda: space_s.solve(a_s, tol=1e0, method="pallas"), 250, reps)


if __name__ == "__main__":
    main()

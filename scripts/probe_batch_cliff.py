"""Locate the small-batch throughput cliff (zero-iteration cost vs B).

probe_fixed_cost measured ~36 ms/rep at B=250 vs ~10 ms at B=1000 for the
SAME zero-iteration (tol=1e0) paper-config program — 14x worse per sample.
Iterations are zero, so the cliff is shape-dependent program structure, not
sample values.  Candidate breakpoints: B < 2*phase_b_k = 256 disables the
compact phase (different program), and BP/BS block-count effects.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_batch_cliff.py
"""

import json

import jax
import jax.numpy as jnp

from romhighcontrast_tpu.benchmarks import _paper_problem, _timed_burst


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    space, a = _paper_problem(20, 1000)
    a = jnp.asarray(a)

    for _ in range(2):
        float(jnp.sum(space.solve(a, tol=1e-10, method="pallas")))
    print("warm", flush=True)

    for B in (1000, 500, 260, 256, 250, 128):
        aB = a[:B]

        def rep():
            return space.solve(aB, tol=1e0, method="pallas")

        _timed_burst(rep, 12)
        dt = _timed_burst(rep, 12)
        print(json.dumps({
            "B": B, "ms_per_rep": round(1e3 * dt, 3),
            "us_per_sample": round(1e6 * dt / B, 2),
        }), flush=True)


if __name__ == "__main__":
    main()

"""Round-4 profiling: where does the mesh-64 (and mesh-40) solve time go?

Hypothesis under test: at mesh >= 40 the two-level kernel's TRUE delivery
floors at ~3e-9 (warped-coarse f32 roundtrip), so at the bench tol=1e-10
EVERY sample must finish through the single-level deg-12 phase-B/C dig —
and that dig, whose iteration count grows with mesh (single-level Chebyshev
window), dominates fine-mesh wall-clock.

Method: one process, warm burst first, then per-config timed bursts at
three tolerances.  tol=3e-8 sits above the 2l floor (phase A only);
tol=1e-10 is the bench config.  The delta isolates the deep-dig cost.
Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_mesh64_r4.py
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
        "label": label, "tol": tol, "sec_per_batch": round(dt, 4),
        "solves_per_s": round(len(a) / dt, 1),
        "it_mean": round(float(it.mean()), 1),
        "it_med": float(np.median(it)), "it_max": int(it.max()),
        "rel_max": float(rel.max()), "rel_med": float(np.median(rel)),
        "first_call_s": round(compile_s, 1),
    }), flush=True)
    return dt


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)

    # tunnel warm-up: paper config, small batch
    space20, a20 = _paper_problem(20, 256)
    a20 = jnp.asarray(a20)
    for _ in range(2):
        float(jnp.sum(space20.solve(a20, tol=1e-10, method="pallas")))
    print("warm", flush=True)

    space64, a64 = _paper_problem(64, 512)
    a64 = jnp.asarray(a64)
    space40, a40 = _paper_problem(40, 512)
    a40 = jnp.asarray(a40)

    # interleave tolerances round-robin? Compiles differ per tol (static),
    # but run-to-run drift is +-5-8%; pairs of bursts per config suffice
    # for the >2x effects we are hunting.
    bench(space64, a64, 1e-10, 2, "mesh64_bench_tol")
    bench(space64, a64, 3e-8, 2, "mesh64_above_2l_floor")
    bench(space64, a64, 1e-9, 2, "mesh64_gate_tol")
    bench(space40, a40, 1e-10, 2, "mesh40_bench_tol")
    bench(space40, a40, 3e-8, 2, "mesh40_above_2l_floor")
    # paper config control at the same batch for per-DoF comparison
    space20b, a20b = _paper_problem(20, 512)
    bench(space20b, jnp.asarray(a20b), 1e-10, 4, "mesh20_bench_tol")


if __name__ == "__main__":
    main()

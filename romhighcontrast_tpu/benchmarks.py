"""Headline benchmark: batched FOM snapshot solves at the paper configuration.

Reference baseline (BASELINE.md): 26.9 solves/s — 1000 sparse-LU solves at
dim 6241 (mesh 20, (4,4) blocks) in 37.16 s on CPU
(/root/reference/src/experiments/HighContrast.py:510).

This benchmark solves the same 1000-point contrast grid (corner set + log
grid, reference semantics) at the same discretisation as ONE batched program
on the TPU: float32 CG on the Jacobi-symmetrized stencil (Pallas fused
VMEM-resident kernel when available) inside float64 iterative refinement, to
max relative residual < 1e-9 (the reference's own LU forward error at
contrast 1e10 is O(eps64 * kappa) ~ 1e-4, far looser).

Timing notes: execution is forced per repetition through a checksum — under
the axon TPU tunnel, ``block_until_ready`` alone has been observed to return
before the work is done.

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

BASELINE_SOLVES_PER_SEC = 1000 / 37.16  # reference lsqsparse, 1 core


def main():
    import jax.numpy as jnp

    from romhighcontrast_tpu.experiments.grids import get_a2test_and_train
    from romhighcontrast_tpu.ops import stencil as st

    mesh_n = int(os.environ.get("ROMHC_BENCH_MESH", 20))
    n_samples = int(os.environ.get("ROMHC_BENCH_SAMPLES", 1000))
    method = os.environ.get("ROMHC_BENCH_METHOD", "pallas")

    space, a, _ = get_a2test_and_train(
        blocks_geometry=(4, 4),
        high_contrast_blocks=[[(0, 1)], [(1, 3)], [(2, 1), (2, 2), (2, 3)]],
        mesh_discretization_per_dim=mesh_n,
        diff_coef_refinement=10,
        max_num_samples_offline=n_samples,
        seed=42,
    )
    a = jnp.asarray(a[:n_samples])

    # tol 1e-10 leaves a 10x margin under the 1e-9 certification gate
    # (measured worst residual 9.5e-11); the reference's own LU forward
    # error at contrast 1e10 is O(eps64 * kappa) ~ 1e-4, far looser
    tol = float(os.environ.get("ROMHC_BENCH_TOL", 1e-10))

    def run(m):
        sols = space.solve(a, method=m, tol=tol)
        return sols, float(jnp.sum(sols))  # checksum forces execution

    # compile + warm-up; fall back if the fused kernel cannot compile here
    try:
        sols, _ = run(method)
    except Exception:
        method = "mixed"
        sols, _ = run(method)

    # sanity gate: true residual of the warmed solutions
    w = space.weights(a)
    r = space.load[None, :] - st.apply_operator_flat(w, sols, space.grid_shape)
    rel = float(
        jnp.max(jnp.linalg.norm(r, axis=-1) / jnp.linalg.norm(space.load))
    )
    if not (rel < 1e-9):
        print(
            json.dumps(
                {
                    "metric": "snapshot_solves_per_sec",
                    "value": 0.0,
                    "unit": "solves/s",
                    "vs_baseline": 0.0,
                    "error": f"residual check failed: {rel}",
                }
            )
        )
        return 1

    # Amortize the remote-tunnel sync: the axon round-trip costs ~25 ms per
    # value readback (measured; ~28% of a rep at the paper config).  Enqueue
    # all reps (dispatch is async), then force the whole chain through ONE
    # checksum that sums every rep's result — the readback value cannot be
    # produced before all enqueued programs finish on the in-order device
    # stream, so execution is still fully forced.
    #
    # The first burst after process start runs ~2x slow (tunnel/stream
    # warm-up, measured 6.3k vs a stable 13.1k on every later burst), so an
    # identical untimed burst precedes the timed one.
    reps = 10

    def burst():
        # accumulate per-rep scalar checksums (not full solution arrays —
        # 10 reps x ~0.5 GB at mesh 64 would crowd HBM); dispatch stays
        # async, the single float() readback still forces the whole chain
        t0 = time.time()
        acc = [jnp.sum(space.solve(a, method=method, tol=tol))
               for _ in range(reps)]
        float(sum(acc))
        return (time.time() - t0) / reps

    burst()
    dt = burst()

    solves_per_sec = len(a) / dt
    print(
        json.dumps(
            {
                "metric": "snapshot_solves_per_sec",
                "value": round(solves_per_sec, 2),
                "unit": (
                    f"solves/s @ dim={space.vspace_dim}, f64-accurate "
                    f"(max_rel_residual<1e-9), method={method}"
                ),
                "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

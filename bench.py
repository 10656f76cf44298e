"""Headline benchmark: batched FOM snapshot solves at the paper configuration.

Reference baseline (BASELINE.md): 26.9 solves/s — 1000 sparse-LU solves at
dim 6241 (mesh 20, (4,4) blocks) in 37.16 s on CPU
(/root/reference/src/experiments/HighContrast.py:510).

This benchmark solves the same 1000-point contrast grid (corner set + log
grid, reference semantics) at the same discretisation as ONE batched stencil
PCG program on the TPU, to the accuracy regime of the reference's own direct
solves (residual 1e-11; at contrast 1e10 the reference's LU forward error is
itself O(eps * cond) >> 1e-11).

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_SOLVES_PER_SEC = 1000 / 37.16  # reference lsqsparse, 1 core


def main():
    import jax
    import jax.numpy as jnp

    from romhighcontrast_tpu.experiments.grids import get_a2test_and_train

    mesh_n = int(os.environ.get("ROMHC_BENCH_MESH", 20))
    n_samples = int(os.environ.get("ROMHC_BENCH_SAMPLES", 1000))

    space, a, _ = get_a2test_and_train(
        blocks_geometry=(4, 4),
        high_contrast_blocks=[[(0, 1)], [(1, 3)], [(2, 1), (2, 2), (2, 3)]],
        mesh_discretization_per_dim=mesh_n,
        diff_coef_refinement=10,
        max_num_samples_offline=n_samples,
        seed=42,
    )
    a = jnp.asarray(a[:n_samples])

    def run():
        sols = space.solve(a, tol=1e-11, maxiter=5000)
        return sols

    # compile + warm-up (excluded from the timing, like the reference's
    # timing comments which exclude scipy import/setup)
    sols = run()
    sols.block_until_ready()

    # sanity: residual check on the batch
    w = space.weights(a)
    from romhighcontrast_tpu.ops import stencil as st

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

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        run().block_until_ready()
    dt = (time.time() - t0) / reps

    solves_per_sec = len(a) / dt
    print(
        json.dumps(
            {
                "metric": "snapshot_solves_per_sec",
                "value": round(solves_per_sec, 2),
                "unit": f"solves/s @ dim={space.vspace_dim}, f64, max_rel_residual<1e-9",
                "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

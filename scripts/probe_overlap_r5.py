"""Evidence the host-LU / device-fast-path overlap (VERDICT r4 #7).

``FemSpace._solve_split`` (cluster_method="host") dispatches the device
fast path for the clean majority FIRST (asynchronously), then factorizes
the interior-cluster bucket on the host while the device works.  This
probe captures the timeline with a timing wrapper around
``host_lu.solve_banded_batch`` (no behavior change) and computes the
overlap factor

    overlap = (t_device_only + t_host_only - t_combined)
              / min(t_device_only, t_host_only)

(1.0 = the shorter stage fully hidden; 0 = fully serialized).

Writes docs/parity/overlap_r5.json.  Run on the real TPU.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from romhighcontrast_tpu.experiments.grids import contrast_grid, get_full_a
from romhighcontrast_tpu.models.fem import FemSpace
from romhighcontrast_tpu.ops import clusters as cl
from romhighcontrast_tpu.ops import host_lu


def main(B=1000, reps=3):
    space = FemSpace((4, 4), 20)
    # mixed population: one boundary-touching group + one interior group
    hc = [[(0, 1)], [(1, 1)], [(2, 2)]]
    a_cols = contrast_grid(len(hc), 6, B, seed=42)
    a = np.asarray(get_full_a(a_cols, (4, 4), hc)[:B])
    has = cl.has_interior_cluster(a)
    n_cluster = int(has.sum())
    print(f"dim {space.vspace_dim}, B={B}, cluster fraction "
          f"{n_cluster}/{B}", flush=True)
    a_dev = jnp.asarray(a)

    # timing wrapper records the host factorization window inside solve()
    orig = host_lu.solve_banded_batch
    window = {}

    def wrapped(*args, **kw):
        window["start"] = time.time()
        out = orig(*args, **kw)
        window["end"] = time.time()
        return out

    def timed_solve(**kw):
        t0 = time.time()
        out = space.solve(a_dev, tol=1e-10, method="pallas", **kw)
        float(jnp.sum(out))  # force execution (tunnel rule)
        return time.time() - t0

    # warm everything
    host_lu.solve_banded_batch = wrapped
    try:
        timed_solve()
        t_combined = min(timed_solve() for _ in range(reps))
        host_window = window["end"] - window["start"]
    finally:
        host_lu.solve_banded_batch = orig

    # device-only: same batch, forced onto the fast path (cluster rows
    # produce garbage — timing-only measurement of the device stage)
    timed_solve(interior_clusters=False)
    t_device = min(timed_solve(interior_clusters=False) for _ in range(reps))

    # host-only: the cluster bucket through the banded factorization
    a_c = a[has]
    rhs = np.asarray(space.load)
    orig(a_c, space.N, rhs)
    t0 = time.time()
    for _ in range(reps):
        orig(a_c, space.N, rhs)
    t_host = (time.time() - t0) / reps

    overlap = (t_device + t_host - t_combined) / min(t_device, t_host)
    out = {
        "what": "host-LU cluster bucket overlapped with the async device "
                "fast path inside FemSpace._solve_split (VERDICT r4 #7)",
        "config": {"dim": space.vspace_dim, "B": B,
                   "cluster_samples": n_cluster},
        "t_combined_s": round(t_combined, 4),
        "t_device_only_s": round(t_device, 4),
        "t_host_bucket_only_s": round(t_host, 4),
        "host_window_inside_combined_s": round(host_window, 4),
        "overlap_factor": round(float(overlap), 3),
        "note": "overlap_factor 1.0 = shorter stage fully hidden; "
                "combined < device + host proves concurrent execution",
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    path = Path("/root/repo/docs/parity/overlap_r5.json")
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()

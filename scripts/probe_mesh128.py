"""Mesh-128 scale probe: dim (4*128-1)^2 = 261,121 — a size where the
reference's dense preassembled family (nrb*ncb*dim^2 f64, ~8.7 TB) cannot
exist at all (SolutionsManagers.py:217-218 materializes it dense).

Runs the flagship pallas path at the paper contrast family on a small
batch, residual-gated like the bench suite, and reports solves/s and
per-DoF throughput.  One long-lived process (remote compiles are paid
once; CLAUDE.md compile-service facts).

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_mesh128.py
"""
import json
import time

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log("devices:", jax.devices())
    from romhighcontrast_tpu.benchmarks import _paper_problem, _timed_burst
    from romhighcontrast_tpu.ops import stencil as st

    B = int(__import__("os").environ.get("ROMHC_PROBE_B", 64))
    space, a = _paper_problem(128, B)
    a = jnp.asarray(a)
    log(f"dim {space.vspace_dim}, batch {B}")

    t0 = time.time()
    sols = space.solve(a, method="pallas", tol=1e-10)
    checksum = float(jnp.sum(sols))
    log(f"first solve (incl. compiles): {time.time() - t0:.1f}s, "
        f"checksum {checksum:.3e}")

    w = space.weights(a)
    r = space.load[None, :] - st.apply_operator_flat(
        w, sols, space.grid_shape)
    rel = np.asarray(jnp.linalg.norm(r, axis=-1)
                     / jnp.linalg.norm(space.load))
    log(f"true rel residual: max {rel.max():.2e} med {np.median(rel):.2e}")

    def rep():
        return space.solve(a, method="pallas", tol=1e-10)

    _timed_burst(rep, 3)   # warm burst
    dt = _timed_burst(rep, 4)
    sps = B / dt
    out = {
        "metric": "snapshot_solves_per_sec_mesh128",
        "value": round(sps, 2),
        "unit": f"solves/s @ dim={space.vspace_dim} (batch {B}), "
                f"f64-accurate (max_rel_residual<1e-9), method=pallas",
        "dof_solves_per_sec": round(sps * space.vspace_dim, 0),
        "max_rel_residual": float(rel.max()),
        "vs_baseline": None,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

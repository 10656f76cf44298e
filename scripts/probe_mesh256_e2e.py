"""End-to-end A/B at the million-DoF scale (mesh 256 on (4,4) blocks,
dim 1,046,529): the new in-kernel route (generic refinement loop + plain
2l kernel, r5) vs the old XLA-fallback inner — through the public
``FemSpace.solve`` on the real TPU, residual-gated.

Interleaved methodology (CLAUDE.md): warm burst first, then round-robin
config order, one checksum readback per burst.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from romhighcontrast_tpu import FemSpace, INFINIT_A
from romhighcontrast_tpu.ops import stencil as st


def run(space, a, inner_tag, reps, tol=1e-10):
    # inner_tag: "kernel" (new route, default) or "xla" (old fallback,
    # forced by monkeypatching the plain-kernel gate)
    from romhighcontrast_tpu.ops import pallas_cg

    if inner_tag == "xla":
        saved = pallas_cg.VMEM_LIMIT_BYTES
        pallas_cg.VMEM_LIMIT_BYTES = 1
    try:
        t0 = time.time()
        acc = []
        for _ in range(reps):
            sols = space.solve(a, method="pallas", tol=tol,
                               interior_clusters=False)
            acc.append(jnp.sum(sols))
        float(jnp.sum(jnp.stack(acc)))
        dt = (time.time() - t0) / reps
    finally:
        if inner_tag == "xla":
            pallas_cg.VMEM_LIMIT_BYTES = saved
    return dt, sols


def main(N=256, B=2, reps=2):
    space = FemSpace((4, 4), N)
    print(f"mesh {N}: dim {space.vspace_dim:,}, B={B}", flush=True)
    a = np.ones((B, 4, 4))
    a[:, 0, 1] = INFINIT_A
    a[:, 1, 3] = INFINIT_A
    a = jnp.asarray(a)

    # warm both configs (compiles + tunnel warm-up) before any timing
    for tag in ("kernel", "xla"):
        t0 = time.time()
        dt, sols = run(space, a, tag, 1)
        w = space.weights(a)
        r = space.load[None] - st.apply_operator_flat(
            w, sols, space.grid_shape).reshape(B, -1)
        rel = float(jnp.max(jnp.linalg.norm(np.asarray(r), axis=-1)
                            / np.linalg.norm(np.asarray(space.load))))
        print(f"  warm {tag}: {time.time()-t0:.1f}s "
              f"(true rel residual {rel:.2e})", flush=True)

    # interleaved timed passes
    results = {"kernel": [], "xla": []}
    for p in range(3):
        for tag in ("kernel", "xla"):
            dt, _ = run(space, a, tag, reps)
            results[tag].append(dt)
            print(f"  pass {p} {tag}: {dt*1e3:.0f} ms/batch "
                  f"({B/dt:.2f} solves/s)", flush=True)
    for tag in ("kernel", "xla"):
        best = min(results[tag])
        med = sorted(results[tag])[len(results[tag]) // 2]
        print(f"{tag}: median {B/med:.2f} solves/s, best {B/best:.2f}",
              flush=True)


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    main(N, B)

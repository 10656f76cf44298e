"""Round-4 probe, TPU leg: (a) does Mosaic accept ``precision=HIGHEST`` on
in-kernel dots, (b) where does the 2l kernel's TRUE delivery floor sit at
mesh 40/64 on REAL hardware, with and without high-precision transfer
matmuls?

Background: the CPU interpret-mode probe (scripts/probe_2l_floor.py) shows
NO floor — refinement through the 2l inner reaches 2e-12 by round 4 at
mesh 40.  The measured ~3e-9 hardware floor must come from TPU-specific
arithmetic; the prime suspect is the MXU's multi-pass bf16 decomposition of
f32 matmuls (effective per-product rounding ~2^-21) hitting the 1e5-scaled
warped transfer contractions.  If so, ``precision=HIGHEST`` on the four
transfer dots alone should lift the floor at a small cost.

Host-side f64 residual evaluation via the scipy oracle (no on-device f64).
Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_2l_floor_tpu.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tests")

import romhighcontrast_tpu  # noqa: F401,E402
from romhighcontrast_tpu.benchmarks import _paper_problem  # noqa: E402
from romhighcontrast_tpu.ops import stencil as st  # noqa: E402
from romhighcontrast_tpu.ops import twolevel as tl  # noqa: E402
from romhighcontrast_tpu.ops.pallas_cg_2l import (  # noqa: E402
    cg_2l_prepared, prepare_2l)

from oracle import FemOracle  # noqa: E402


def run(mesh, rounds=6, **kernel_opts):
    space, a = _paper_problem(mesh, 4)
    a = np.asarray(a)
    a[0] = np.where(a[0] > 1, 1e10, a[0])
    a[1] = np.where(a[1] > 1, 1e8, a[1])

    oracle = FemOracle((4, 4), mesh)
    Ks = [oracle.stiffness(ai) for ai in a]
    b_flat = oracle.load()

    w = space.weights(jnp.asarray(a))
    wt, s = st.symmetrized_weights(w)
    wt32 = st.StencilCoefficients(*(v.astype(jnp.float32) for v in wt))
    grid = space.grid_shape
    strides = (tl.coarse_stride(grid[0]), tl.coarse_stride(grid[1]))
    w32 = st.StencilCoefficients(*(v.astype(jnp.float32) for v in w))
    coarse = tl.assemble_coarse(w32, *strides)
    dh = jnp.sqrt(w.diag).astype(jnp.float32)
    prep, dims = prepare_2l(wt32, dh, coarse, strides,
                            packed_coarse=True, packed_fine=True,
                            block_size=4)
    s_np = np.asarray(s, np.float64)

    bn = np.linalg.norm(b_flat)
    x = np.zeros((4, b_flat.size))
    r = np.broadcast_to(b_flat, (4, b_flat.size)).copy()
    print(f"--- mesh {mesh} opts={kernel_opts}", flush=True)
    for rd in range(rounds):
        rt = jnp.asarray(
            (s_np.reshape(4, -1) * r).reshape((4,) + grid).astype(np.float32))
        t0 = time.time()
        d, its = cg_2l_prepared(
            prep, dims, rt, jnp.full((4,), np.float32(9e-12)),
            maxiter=400, strides=strides, **kernel_opts)
        d_np = np.asarray(d, np.float64).reshape(4, -1)
        dt = time.time() - t0
        x = x + s_np.reshape(4, -1) * d_np
        r = np.stack([b_flat - Ks[i] @ x[i] for i in range(4)])
        rel = np.linalg.norm(r, axis=1) / bn
        print(f"round {rd + 1}: its={np.asarray(its)} dt={dt:.2f}s "
              f"rel={np.array2string(rel, formatter={'float': '{:.3e}'.format})}",
              flush=True)


def main():
    for mesh in (40, 64):
        run(mesh, rounds=5)
        run(mesh, rounds=5, hi_xfer=True)


if __name__ == "__main__":
    main()

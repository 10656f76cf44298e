"""Probe: does the plain fused 2l kernel compile and run at mesh 224/256
(dim 804k / 1.05M) at BS=1 — i.e. is the round-4 "VMEM cliff" at
~(895,895) a property of the 40-buffer dd-round kernel's live set rather
than of the plain CG kernel?

The 34-buffer model (auto_block_size_packed) predicts 136 MB at mesh 256 —
over the 128 MB physical VMEM — but the PLAIN kernel's true live set is
~15 fine buffers; this measures Mosaic's actual allocation by compiling.

Run on the real TPU (no JAX_PLATFORMS override).  Prints per-mesh:
compile ok/fail (with the Mosaic VMEM request when it fails), one timed
inner solve, its iteration count, and the achieved f32 residual.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from romhighcontrast_tpu.ops import stencil as st
from romhighcontrast_tpu.ops import twolevel as tl
from romhighcontrast_tpu.ops.pallas_cg_2l import (
    cg_2l_prepared, default_fine_window, prepare_2l,
)


def probe(N, B=1, maxiter=600, rtol=1e-5):
    nrb = ncb = 4
    n = nrb * N - 1
    print(f"--- mesh {N}: grid {n}x{n}, dim {n*n:,} ---", flush=True)
    a = np.ones((B, nrb, ncb), np.float32)
    a[:, 0, 1] = 1e10  # boundary-touching stiff blocks only (f32-safe)
    a[:, 1, 3] = 1e10

    f32 = jnp.float32
    w32 = st.stencil_weights(st.cell_grid(jnp.asarray(a, f32), N))
    wt, s = st.symmetrized_weights(w32)
    wt = st.StencilCoefficients(*(v.astype(f32) for v in wt))
    dh = jnp.sqrt(w32.diag).astype(f32)
    sr, sc = tl.coarse_stride(n), tl.coarse_stride(n)
    coarse = tl.assemble_coarse(
        st.StencilCoefficients(*(v.astype(f32) for v in w32)), sr, sc)

    t0 = time.time()
    prep, dims = prepare_2l(wt, dh, coarse, (sr, sc), block_size=1,
                            packed_coarse=True, packed_fine=True)
    jax.block_until_ready(prep.wE)
    print(f"  prep: {time.time() - t0:.1f}s, dims {dims}", flush=True)

    # rhs: the symmetrized load (s * ones-ish); just use s*1 pattern
    b = (s * jnp.ones_like(dh)).astype(f32)
    rtol2 = jnp.full((B,), rtol * rtol, f32)

    # ONE jitted program per maxiter (production calls the kernel inside a
    # jitted driver; eager pallas_call pays trace/lowering + the remote
    # compile service per call — measured seconds each)
    import functools

    @functools.partial(jax.jit, static_argnames=("m",))
    def solve(bb, rt2, m):
        return cg_2l_prepared(prep, dims, bb, rt2, maxiter=m,
                              strides=(sr, sc))

    t0 = time.time()
    try:
        x, its = solve(b, rtol2, maxiter)
        x = jax.block_until_ready(x)
    except Exception as exc:
        print(f"  COMPILE/RUN FAIL: {type(exc).__name__}: "
              f"{str(exc)[:500]}", flush=True)
        return None
    t_compile = time.time() - t0
    # residual in the symmetrized space
    r = b - st.apply_operator_flat(
        wt, x.reshape(B, -1), (n, n)).reshape(B, n, n)
    rel = float(jnp.max(jnp.linalg.norm(r.reshape(B, -1), axis=-1)
                        / jnp.linalg.norm(b.reshape(B, -1), axis=-1)))
    print(f"  compile+first run: {t_compile:.1f}s, its={np.asarray(its)}, "
          f"rel={rel:.2e}", flush=True)

    # warm timing: 4 repeats, checksum-forced
    t0 = time.time()
    acc = []
    for _ in range(4):
        x, its = solve(b, rtol2, maxiter)
        acc.append(jnp.sum(x))
    float(jnp.sum(jnp.stack(acc)))
    dt = (time.time() - t0) / 4
    it = int(np.max(np.asarray(its)))
    lmin = default_fine_window((n, n), (sr, sc))[0]
    print(f"  warm: {dt*1e3:.1f} ms/solve, {it} outers "
          f"({dt/max(it,1)*1e6:.1f} us/outer), lmin={lmin:.3f}", flush=True)

    # per-outer slope: two fixed-budget programs with an unreachable
    # tolerance; slope = (t96 - t32)/64 removes fixed dispatch cost
    tiny = jnp.full((B,), 1e-30, f32)
    ts = []
    for m in (32, 96):
        float(jnp.sum(solve(b, tiny, m)[0]))  # compile + warm
        t0 = time.time()
        acc = [jnp.sum(solve(b, tiny, m)[0]) for _ in range(3)]
        float(jnp.sum(jnp.stack(acc)))
        ts.append((time.time() - t0) / 3)
    slope = (ts[1] - ts[0]) / 64
    print(f"  slope: {slope*1e6:.1f} us/outer "
          f"(t32={ts[0]*1e3:.1f} ms, t96={ts[1]*1e3:.1f} ms)", flush=True)
    return dt, it, rel


if __name__ == "__main__":
    meshes = [int(x) for x in (sys.argv[1:] or [224, 256, 288])]
    print(jax.devices(), flush=True)
    for N in meshes:
        probe(N)

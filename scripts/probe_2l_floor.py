"""Round-4 probe: reproduce the two-level kernel's ~3e-9 TRUE-delivery
floor OFF-TPU, in interpret mode (faithful f32 arithmetic on CPU), so the
floor mechanism can be instrumented without the remote-compile queue.

Method: manual f64 iterative refinement around the 2l inner at mesh 40/64
with high-contrast boundary-touching samples — the exact shape the phased
driver runs — printing each round's TRUE relative residual (f64 host
evaluation).  Control: the single-level pallas_v2 inner, which is known to
keep contracting (the phased driver's phase-B dig relies on it).

Run:  python scripts/probe_2l_floor.py [mesh] [rounds]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import romhighcontrast_tpu  # noqa: F401,E402  (x64 setup)
from romhighcontrast_tpu.benchmarks import _paper_problem  # noqa: E402
from romhighcontrast_tpu.ops import stencil as st  # noqa: E402
from romhighcontrast_tpu.ops import twolevel as tl  # noqa: E402
from romhighcontrast_tpu.ops.pallas_cg_2l import (  # noqa: E402
    cg_2l_prepared, prepare_2l)
from romhighcontrast_tpu.ops.pallas_cg_v2 import (  # noqa: E402
    cg_symmetrized_pallas_v2)


def refine(space, a, inner, rounds=6, inner_tol=3e-6, maxiter=400,
           **kernel_opts):
    w = space.weights(jnp.asarray(a))           # f64 stencil coefficients
    b = jnp.broadcast_to(
        space.load.reshape(space.grid_shape), a.shape[:1] + space.grid_shape
    ).astype(jnp.float64)
    wt, s = st.symmetrized_weights(w)
    wt32 = st.StencilCoefficients(*(v.astype(jnp.float32) for v in wt))
    grid = space.grid_shape
    strides = (tl.coarse_stride(grid[0]), tl.coarse_stride(grid[1]))

    if inner == "2l":
        w32 = st.StencilCoefficients(*(v.astype(jnp.float32) for v in w))
        coarse = tl.assemble_coarse(w32, *strides)
        dh = jnp.sqrt(w.diag).astype(jnp.float32)
        prep, dims = prepare_2l(wt32, dh, coarse, strides,
                                packed_coarse=True, packed_fine=True,
                                block_size=min(8, a.shape[0]))

        def solve(rt):
            x3, its = cg_2l_prepared(
                prep, dims, rt, jnp.full((rt.shape[0],), inner_tol ** 2),
                maxiter=maxiter, interpret=True, strides=strides,
                **kernel_opts)
            return x3, its
    else:

        def solve(rt):
            return cg_symmetrized_pallas_v2(
                wt32, rt, tol=inner_tol, maxiter=maxiter, interpret=True)

    bn = jnp.sqrt(jnp.sum(b * b, axis=(-2, -1)))
    x = jnp.zeros_like(b)
    r = b
    print(f"--- inner={inner} opts={kernel_opts}")
    for rd in range(rounds):
        rt = (s * r).astype(jnp.float32)
        d, its = solve(rt)
        x = x + s * d.astype(jnp.float64)
        r = b - st.apply_operator(w, x)
        rel = np.asarray(jnp.sqrt(jnp.sum(r * r, axis=(-2, -1))) / bn)
        print(f"round {rd + 1}: its={np.asarray(its)} "
              f"rel={np.array2string(rel, formatter={'float': '{:.3e}'.format})}",
              flush=True)
    return rel


def main():
    mesh = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    space, a = _paper_problem(mesh, 4)
    # force the hard regime: two samples at extreme contrast, two moderate
    a = np.asarray(a)
    a[0] = np.where(a[0] > 1, 1e10, a[0])
    a[1] = np.where(a[1] > 1, 1e8, a[1])
    print("contrast per sample:", a.reshape(4, -1).max(1))
    refine(space, a, "2l", rounds=rounds)
    refine(space, a, "v2", rounds=rounds)


if __name__ == "__main__":
    main()

"""Round-4 sweep: coarse-grid density at fine meshes.

At mesh 64 the packed layout runs BS=1 (VMEM bind), so the coarse stage
uses 17 of 128 lanes — a denser coarse grid is nearly lane-free there.
Sweep stride/lmin at mesh 64/40, interleaved round-robin after a warm
burst (tunnel drift discipline per CLAUDE.md).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def bench_cfg(space, a, opts, tol=1e-10, reps=2):
    def rep():
        return space.solve(a, method="pallas", tol=tol, inner_opts=opts)

    t0 = time.time()
    acc = [jnp.sum(rep()) for _ in range(reps)]
    float(sum(acc))
    return len(a) * reps / (time.time() - t0)


def residual(space, a, opts, tol=1e-10):
    from romhighcontrast_tpu.ops import stencil as st

    sols = space.solve(a, method="pallas", tol=tol, inner_opts=opts)
    w = space.weights(a)
    r = space.load[None, :] - st.apply_operator_flat(w, sols, space.grid_shape)
    return float(jnp.max(jnp.linalg.norm(r, axis=-1)
                         / jnp.linalg.norm(space.load)))


def sweep(mesh_n, n_samples, cfgs, passes=4):
    from romhighcontrast_tpu.benchmarks import _paper_problem

    space, a = _paper_problem(mesh_n, n_samples)
    a = jnp.asarray(a)
    log(f"mesh {mesh_n}: dim {space.vspace_dim}, {n_samples} samples")
    # warm + residual gate for every config
    ok = {}
    for name, opts in cfgs.items():
        try:
            rel = residual(space, a, opts)
            ok[name] = rel < 1e-9
            log(f"  {name}: residual {rel:.2e} {'OK' if ok[name] else 'FAIL'}")
        except Exception as e:
            ok[name] = False
            log(f"  {name}: EXC {type(e).__name__}: {str(e)[:200]}")
    results = {name: [] for name in cfgs}
    for p in range(passes):
        for name, opts in cfgs.items():
            if not ok[name]:
                continue
            results[name].append(bench_cfg(space, a, opts))
        log(f"  pass {p}: " + ", ".join(
            f"{n}={results[n][-1]:.0f}/s" for n in results if results[n]))
    for name in results:
        if results[name]:
            med = float(np.median(results[name]))
            log(f"  RESULT mesh{mesh_n} {name}: median {med:.0f} solves/s "
                f"({results[name]})")
    return results


def main2():
    """Sweep round 2 (after the round-1 data): the mesh-64 losers all
    LOWERED the fine window edge; try stride 8 with the edge kept high
    (small residual gap [0.076, 0.116], strong fine Chebyshev), plus deg
    variants.  mesh 40: the s5 auto-lmin winner vs high-edge variants."""
    log("devices:", jax.devices())
    sweep(64, 512, {
        "default": (),
        "s8_l116": (("stride", 8), ("lmin", 0.116)),
        "s8_l116_dc14": (("stride", 8), ("lmin", 0.116), ("dc", 14),
                         ("clmin", 0.01)),
        "s8_l116_dc20": (("stride", 8), ("lmin", 0.116), ("dc", 20),
                         ("clmin", 0.005)),
        "s8_l09_dc14": (("stride", 8), ("lmin", 0.09), ("dc", 14),
                        ("clmin", 0.01)),
        "s8_l116_deg5": (("stride", 8), ("lmin", 0.116), ("deg", 5)),
    }, passes=4)
    sweep(40, 512, {
        "s5": (("stride", 5),),
        "s5_l116": (("stride", 5), ("lmin", 0.116)),
        "s5_l116_dc14": (("stride", 5), ("lmin", 0.116), ("dc", 14),
                         ("clmin", 0.01)),
        "s5_deg3": (("stride", 5), ("deg", 3)),
    }, passes=4)


def main():
    log("devices:", jax.devices())
    # Spectral-gap theory (r4 profiling): the stride-(n+1)/16 coarse grid
    # only covers lambda <~ 2 sin^2(pi/(2 s)) — 0.019 at stride 16 — while
    # the fine window starts at 0.116, leaving an unpreconditioned band
    # that grows with mesh.  Denser coarse closes the gap but needs a
    # deeper coarse Chebyshev (coarse lambda_min falls as 1/m^2):
    # stride 8 at mesh 64 -> coverage 0.077, coarse lmin ~ 4.8e-3
    # -> dc ~ 20 on [5e-3, 2.05] for the same coarse-solve quality.
    sweep(64, 512, {
        "default": (),
        "s8": (("stride", 8),),
        "s8_dc20": (("stride", 8), ("dc", 20), ("clmin", 0.005)),
        "s8_dc20_l46": (("stride", 8), ("dc", 20), ("clmin", 0.005),
                        ("lmin", 0.046)),
        "s8_dc14_l46": (("stride", 8), ("dc", 14), ("clmin", 0.01),
                        ("lmin", 0.046)),
        "s16_dc14": (("dc", 14), ("clmin", 0.01), ("lmin", 0.046)),
    }, passes=4)
    # mesh 40: default stride 10 vs 5 (both divide the 40-cell block)
    sweep(40, 512, {
        "default": (),
        "s5": (("stride", 5),),
        "s5_dc20": (("stride", 5), ("dc", 20), ("clmin", 0.005)),
        "s5_dc14_l46": (("stride", 5), ("dc", 14), ("clmin", 0.01),
                        ("lmin", 0.046)),
    }, passes=4)


def main3():
    """Sweep round 3: the THIRD level.  Round-2 verdict: at mesh 64 denser
    level-1 coarse (stride 8) loses because solving its own low modes needs
    dc ~ 20 Chebyshev sweeps on the (31, 128)-tile grid.  The third level
    moves those low modes to a 7x7 (or 15x15) level-2 grid whose sweeps are
    ~16x cheaper, letting level-1 run a SHALLOW window:
      s2 = 4 covers coarse lambda <~ 2 sin^2(pi/8) ~ 0.29 -> dc ~ 5 on
      [0.2, 2.05]; level-2 lmin ~ (pi/8)^2/2-ish ~ 0.05 -> dc2 ~ 10.
      s2 = 2 covers ~1.0 -> dc ~ 3 on [0.55, 2.05]; dc2 ~ 14 on [0.015, ...].
    """
    log("devices:", jax.devices())
    sweep(64, 512, {
        "default": (),
        "s8_2l": (("stride", 8), ("lmin", 0.116)),
        "3l_s2x4": (("stride", 8), ("lmin", 0.116), ("stride2", 4),
                    ("dc", 5), ("clmin", 0.2), ("dc2", 10),
                    ("cl2min", 0.05)),
        "3l_s2x2": (("stride", 8), ("lmin", 0.116), ("stride2", 2),
                    ("dc", 3), ("clmin", 0.55), ("dc2", 14),
                    ("cl2min", 0.015)),
        "3l_s2x4_dc6": (("stride", 8), ("lmin", 0.116), ("stride2", 4),
                        ("dc", 6), ("clmin", 0.15), ("dc2", 12),
                        ("cl2min", 0.03)),
        "3l_s2x4_l09": (("stride", 8), ("lmin", 0.09), ("stride2", 4),
                        ("dc", 5), ("clmin", 0.2), ("dc2", 10),
                        ("cl2min", 0.05)),
    }, passes=4)
    sweep(40, 512, {
        "s5_l116": (("stride", 5), ("lmin", 0.116)),
        "3l_s2x4": (("stride", 5), ("lmin", 0.116), ("stride2", 4),
                    ("dc", 5), ("clmin", 0.2), ("dc2", 10),
                    ("cl2min", 0.05)),
        "3l_s2x2": (("stride", 5), ("lmin", 0.116), ("stride2", 2),
                    ("dc", 3), ("clmin", 0.55), ("dc2", 14),
                    ("cl2min", 0.015)),
    }, passes=4)


def main4():
    """Sweep round 4: BLOCK SIZE with the VMEM wall lifted.  Rounds 1-3
    sized packed blocks against Mosaic's default 16 MB scoped-VMEM limit;
    the chip has 128 MB (measured: a 128 MB-scratch kernel compiles and
    runs with vmem_limit_bytes raised).  Mesh 64 was BS=1 and mesh 40 BS=2
    purely for VMEM — sweep the freed sizes."""
    log("devices:", jax.devices())
    sweep(64, 512, {
        "default_bs1": (),
        "bs2": (("block_size", 2),),
        "bs4": (("block_size", 4),),
        "bs8": (("block_size", 8),),
    }, passes=4)
    sweep(40, 512, {
        "default_bs2": (),
        "bs4": (("block_size", 4),),
        "bs8": (("block_size", 8),),
        "bs16": (("block_size", 16),),
    }, passes=4)
    sweep(20, 1000, {
        "default_bs8": (),
        "bs16": (("block_size", 16),),
        "bs32": (("block_size", 32),),
    }, passes=4)


def main5():
    """Sweep round 5: retune stride/deg under the VMEM-freed block sizes.
    The mesh-40 stride-5 retune was justified by "BS=2 pads stride 5 and 10
    to the same 128-lane tile" — at BS=8 that is false (stride 5 doubles the
    packed coarse tile: Lc 256 vs 128), so re-check; the deg optimum is a
    per-BS lookup measured at the OLD sizes."""
    log("devices:", jax.devices())
    sweep(40, 512, {
        "bs8_s5": (("block_size", 8),),
        "bs8_s10": (("block_size", 8), ("stride", 10)),
        "bs8_s5_deg4": (("block_size", 8), ("deg", 4)),
        "bs8_s5_deg5": (("block_size", 8), ("deg", 5)),
        "bs8_s10_deg4": (("block_size", 8), ("stride", 10), ("deg", 4)),
    }, passes=4)
    sweep(20, 1000, {
        "bs16": (("block_size", 16),),
        "bs16_deg4": (("block_size", 16), ("deg", 4)),
    }, passes=4)
    sweep(64, 512, {
        "bs8": (("block_size", 8),),
        "bs8_deg4": (("block_size", 8), ("deg", 4)),
        "bs8_s8": (("block_size", 8), ("stride", 8), ("lmin", 0.116)),
    }, passes=4)


if __name__ == "__main__":
    import sys

    {"1": main, "2": main2, "3": main3, "4": main4, "5": main5}[
        sys.argv[1] if len(sys.argv) > 1 else "1"
    ]()

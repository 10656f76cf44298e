"""Benchmark entry points.

Default (``python bench.py``): the headline benchmark — batched FOM snapshot
solves at the paper configuration — printing exactly ONE JSON line (the
driver contract).

``python bench.py --suite``: the round-3 multi-config harness — one JSON
line per configuration (paper, mesh 40, mesh 64, mesh 128, online ROM
serving, interior-cluster path), all measured in ONE process so the remote
compile service is paid once and runs stay sequential (two concurrent TPU
jobs starve each other's compiles — measured).

Reference baseline (BASELINE.md): 26.9 solves/s — 1000 sparse-LU solves at
dim 6241 (mesh 20, (4,4) blocks) in 37.16 s on CPU
(/root/reference/src/experiments/HighContrast.py:510).  The reference has no
counterpart for the mesh-40/64/128 lines (its dense preassembled family
would need ~80 GB / 530 GB / 8.7 TB), so those lines carry
``vs_baseline: null``.

Timing notes: execution is forced per burst through a checksum — under the
axon TPU tunnel, ``block_until_ready`` alone has been observed to return
before the work is done.  The first burst after process start runs ~2x slow
(tunnel/stream warm-up), so an identical untimed burst precedes every timed
one.
"""

import json
import os
import sys
import time

BASELINE_SOLVES_PER_SEC = 1000 / 37.16  # reference lsqsparse, 1 core

# Reference greedy build (galerkin flavor, n=15, 1000 training snapshots,
# dim 6241, 1 core), MEASURED on this host by running the reference's own
# loop (/root/reference/src/lib/ReducedBasis.py:112-136) against its own
# dense preassembled operators — scripts/bench_reference_greedy.py; the
# measurement record is docs/parity/reference_greedy_host.json.
BASELINE_GREEDY_BUILD_SEC = None  # filled from the measurement record


def _baseline_greedy_build_sec():
    """Reference greedy-build seconds: the in-repo measurement record if
    present, else the hardcoded measurement (kept in sync)."""
    global BASELINE_GREEDY_BUILD_SEC
    if BASELINE_GREEDY_BUILD_SEC is None:
        import pathlib

        rec = (pathlib.Path(__file__).resolve().parents[1]
               / "docs" / "parity" / "reference_greedy_host.json")
        try:
            BASELINE_GREEDY_BUILD_SEC = float(
                json.loads(rec.read_text())["greedy_build_seconds"])
        except Exception:
            BASELINE_GREEDY_BUILD_SEC = 0.0
    return BASELINE_GREEDY_BUILD_SEC

# Transient axon-tunnel failure signatures (observed after heavy tunnel
# use — CLAUDE.md: "retry the job before debugging").  Only these are
# retried; anything else is a real error and propagates.
_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "TPU device error",
    "socket closed",
    "connection reset",
)


def _is_transient(exc: BaseException) -> bool:
    # Deterministic Python-level failures (assertions, bad values) are never
    # transient even when their message QUOTES a marker (e.g. an assertion
    # wrapping a log line) — don't burn 3x20s retries on those.  Everything
    # else (XlaRuntimeError, RuntimeError, OSError, wrapped grpc errors...)
    # classifies by message: the tunnel's failure surface is too varied for
    # a type allowlist, and a missed transient kills the bench capture.
    if isinstance(exc, (AssertionError, ValueError, TypeError, KeyError,
                        IndexError, AttributeError, NameError)):
        return False
    text = f"{type(exc).__name__}: {exc}".lower()
    return any(m.lower() in text for m in _TRANSIENT_MARKERS)


def _with_retry(fn, label, attempts=3, pause_s=20.0, _sleep=time.sleep):
    """Run ``fn()``, retrying transient tunnel failures up to ``attempts``
    times total.  Diagnostics go to stderr — stdout carries only the JSON
    benchmark lines (the driver contract).  Benchmark stages emit their
    line as the LAST step, so a retried stage never double-emits."""
    for k in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — filtered by _is_transient
            if k + 1 >= attempts or not _is_transient(exc):
                raise
            print(
                f"# transient TPU error in {label} "
                f"(attempt {k + 1}/{attempts}): {exc!r}; "
                f"retrying in {pause_s:.0f}s",
                file=sys.stderr, flush=True,
            )
            _sleep(pause_s)


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": (round(vs_baseline, 2)
                        if vs_baseline is not None else None),
    }), flush=True)


def _paper_problem(mesh_n, n_samples, method="mixed"):
    from romhighcontrast_tpu.experiments.grids import get_a2test_and_train

    space, a, _ = get_a2test_and_train(
        blocks_geometry=(4, 4),
        high_contrast_blocks=[[(0, 1)], [(1, 3)], [(2, 1), (2, 2), (2, 3)]],
        mesh_discretization_per_dim=mesh_n,
        diff_coef_refinement=10,
        max_num_samples_offline=n_samples,
        seed=42,
    )
    return space, a[:n_samples]


def _timed_burst(fn, reps):
    """Mean seconds per rep: enqueue all reps async, force the chain with one
    scalar readback (sum of per-rep checksums — not full arrays, which would
    crowd HBM at the fine-mesh configs).

    The checksums are combined with ONE stack+sum dispatch: a Python
    ``sum(acc)`` issues ``reps - 1`` eager adds at ~1-2 ms tunnel latency
    each (measured 2026-08-19: an empty-program burst cost 41 ms of pure
    harness — ~16 ms eager adds + ~25 ms value readback — inflating the
    paper-config line by ~12% at reps=10)."""
    import jax.numpy as jnp

    t0 = time.time()
    acc = [jnp.sum(fn()) for _ in range(reps)]
    float(jnp.sum(jnp.stack(acc)))
    return (time.time() - t0) / reps


def bench_snapshot(mesh_n, n_samples, tol, method, reps=30, emit=True,
                   metric=None, with_baseline=True, gate=1e-9):
    """FOM snapshot-solve throughput; residual-gated (``< gate``, default
    1e-9) or the line reports value 0.

    ``gate``: meshes >= 192 use 1e-8 — the f32 round-contraction floor
    makes the TRUE-residual delivery on contrast-corner samples floor at
    ~2e-9 there regardless of the asked tolerance (measured 2026-08-20,
    ask 1e-10 vs 1e-11: mesh 192 max 1.87e-9 both; mesh 256 7.2e-9 ->
    2.6e-9 — docs/ROADMAP.md r5 ledger)."""
    import jax.numpy as jnp

    from romhighcontrast_tpu.ops import stencil as st

    space, a = _paper_problem(mesh_n, n_samples, method="mixed")
    a = jnp.asarray(a)

    def run(m):
        sols = space.solve(a, method=m, tol=tol)
        return sols, float(jnp.sum(sols))  # checksum forces execution

    try:
        sols, _ = run(method)
    except Exception as exc:
        if _is_transient(exc):
            raise  # tunnel hiccup, not a method problem — let _with_retry
            # rerun the stage instead of silently re-benchmarking "mixed"
        method = "mixed"
        sols, _ = run(method)

    # sanity gate: true residual of the warmed solutions
    w = space.weights(a)
    r = space.load[None, :] - st.apply_operator_flat(w, sols, space.grid_shape)
    rel = float(
        jnp.max(jnp.linalg.norm(r, axis=-1) / jnp.linalg.norm(space.load))
    )
    metric = metric or "snapshot_solves_per_sec"
    if not (rel < gate):
        print(json.dumps({
            "metric": metric, "value": 0.0, "unit": "solves/s",
            "vs_baseline": 0.0, "error": f"residual check failed: {rel}",
        }), flush=True)
        return 0.0

    def rep():
        return space.solve(a, method=method, tol=tol)

    _timed_burst(rep, reps)           # warm (first burst runs ~2x slow)
    # best of 3 timed bursts: tunnel throughput keeps improving through a
    # process's first few measurements (CLAUDE.md) — a single burst right
    # after the cold start measured 3.3x under the same stage's
    # steady-state (13.1k vs 43k, 2026-08-20); all three bursts are fully
    # warm, so the minimum is the honest steady-state estimate
    dt = min(_timed_burst(rep, reps) for _ in range(3))
    sps = len(a) / dt
    if emit:
        _emit(metric, sps,
              f"solves/s @ dim={space.vspace_dim}, f64-accurate "
              f"(max_rel_residual<{gate:g}), method={method}",
              sps / BASELINE_SOLVES_PER_SEC if with_baseline else None)
    return sps


def bench_online(n_basis=15, n_samples=1000, reps=30):
    """Online reduced-Galerkin serving throughput (precomputed affine
    family): lifted solves/s and coefficient-only solves/s."""
    import jax.numpy as jnp

    from romhighcontrast_tpu.rom.online import OnlineGalerkin

    space, a = _paper_problem(20, n_samples)
    a = jnp.asarray(a)
    # basis: POD of a snapshot subset — the serving-path cost is independent
    # of how the basis was built
    seed_sols = space.solve(a[:64], tol=1e-10)
    _, _, Vt = jnp.linalg.svd(seed_sols, full_matrices=False)
    online = OnlineGalerkin(space, Vt[:n_basis])

    _timed_burst(lambda: online.solve(a), reps)
    dt_lift = min(_timed_burst(lambda: online.solve(a), reps)
                  for _ in range(3))
    _timed_burst(lambda: online.coefficients(a), reps)
    dt_coef = min(_timed_burst(lambda: online.coefficients(a), reps)
                  for _ in range(3))
    sps = n_samples / dt_lift
    _emit("online_solves_per_sec", sps,
          f"lifted solves/s @ dim={space.vspace_dim}, n={n_basis} "
          f"(coefficients-only: {n_samples / dt_coef:.0f}/s)",
          sps / BASELINE_SOLVES_PER_SEC)
    return sps


def bench_greedy(n_basis=15, n_samples=1000, reps=3):
    """RB-construction throughput (VERDICT r4 #3 / BASELINE.md north star:
    "snapshot + RB-construction"): one full GreedyBuilder.build (galerkin
    flavor, n=15) over the 1000-snapshot paper grid.

    Numerator: the device-resident fused greedy (rom/builders._greedy_step
    — one dispatch per iteration, one readback per build).  Denominator:
    the reference's own greedy loop measured on this host against its dense
    preassembled family (scripts/bench_reference_greedy.py ->
    docs/parity/reference_greedy_host.json)."""
    import numpy as np
    import jax.numpy as jnp

    from romhighcontrast_tpu.rom.builders import (
        GREEDY_FOR_GALERKIN, GreedyBuilder,
    )

    space, a = _paper_problem(20, n_samples)
    a = jnp.asarray(a)
    sols = space.solve(a, tol=1e-10)
    h1 = space.h10_norm(sols)

    def build_once():
        return GreedyBuilder(greedy_for=GREEDY_FOR_GALERKIN).build(
            n=n_basis, sm=space, solutions2train=sols, a2train=a,
            solutions2train_h1norm=h1,
        )

    rb = build_once()  # warm (compiles _greedy_step); also the sanity gate
    fm = space.forward_reduced(a, rb.basis)
    err = float(jnp.max(space.h10_norm(fm - sols) / h1))
    # sanity gate, not an accuracy target: this bench grid has THREE
    # hc-groups (effective d=3), where the paper's sub-exponential decay
    # puts the MAX forward error at n=15 in the 1e-2 class (measured
    # 2.9e-2; D1-like configs reach 1e-9 — see the study artifacts).
    # The gate only rejects a garbage basis.
    if not (err < 0.2):
        print(json.dumps({
            "metric": "greedy_build_per_sec", "value": 0.0, "unit": "builds/s",
            "vs_baseline": 0.0, "error": f"greedy basis error gate: {err}",
        }), flush=True)
        return 0.0

    # the build is synchronous by construction: the final np.asarray of the
    # selected-index vector is a value readback (forces execution on the
    # tunnel, where block_until_ready alone is unreliable); best-of-reps
    # for the same warm-drift reason as bench_snapshot
    dts = []
    for _ in range(reps):
        t0 = time.time()
        build_once()
        dts.append(time.time() - t0)
    dt = min(dts)
    bps = 1.0 / dt
    ref_sec = _baseline_greedy_build_sec()
    _emit("greedy_build_per_sec", bps,
          f"greedy builds/s @ dim={space.vspace_dim}, n={n_basis}, "
          f"{n_samples} snapshots (galerkin flavor; max fm rel err "
          f"{err:.1e}; reference loop: {ref_sec:.1f}s on this host)",
          bps * ref_sec if ref_sec else None)
    return bps


def bench_cluster(n_samples=256, reps=3):
    """Interior-cluster path: diagonal stiff blocks that never touch the
    Dirichlet boundary.  Since round 4 the cluster bucket routes to host
    real-f64 direct solves (ops/host_lu.py; LAPACK banded Cholesky, 2.2x
    the sparse-LU speed) — the reference's own accuracy class — so the
    gate asserts the eps64*kappa class bound (max < 5e-3 on the
    contrast-1e10 corner samples, median < 1e-9), not mere finiteness.

    The gate reads the solver's reported per-sample residuals: for the host
    bucket those are evaluated on HOST in real f64.  Re-evaluating on the
    TPU is NOT equivalent — emulated-f64 residual EVALUATION itself floors
    at ~1e-2 relative at kappa ~1e12 (measured 2026-08-19: the same
    solution vector scores 7.9e-4 on host vs 1.33e-2 on device), so a
    device-side gate would measure evaluation noise, not solution quality."""
    import numpy as np
    import jax.numpy as jnp

    from romhighcontrast_tpu.experiments.grids import (
        contrast_grid, get_full_a,
    )
    from romhighcontrast_tpu.models.fem import FemSpace

    space = FemSpace((4, 4), 20)
    hc = [[(1, 1)], [(2, 2)]]
    a_cols = contrast_grid(len(hc), 10, n_samples, seed=42)
    a = jnp.asarray(get_full_a(a_cols, (4, 4), hc)[:n_samples])

    def rep():
        return space.solve(a, tol=1e-10, method="pallas")

    _, info = space.solve(a, tol=1e-10, method="pallas", return_info=True)
    rel = np.asarray(info.relative_residual)
    assert np.all(np.isfinite(rel)), "cluster path returned non-finite"
    assert rel.max() < 5e-3, (
        f"cluster path above the eps64*kappa class bound: {rel.max():.2e}")
    assert np.median(rel) < 1e-9, (
        f"cluster path median residual too high: {np.median(rel):.2e}")
    _timed_burst(rep, reps)
    dt = min(_timed_burst(rep, reps) for _ in range(3))
    sps = len(a) / dt
    _emit("cluster_solves_per_sec", sps,
          f"solves/s @ dim={space.vspace_dim}, interior-diagonal stiff "
          f"blocks (host real-f64 banded-Cholesky bucket; eps64*kappa "
          f"accuracy class, host-evaluated residuals)",
          sps / BASELINE_SOLVES_PER_SEC)
    return sps


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    mesh_n = int(os.environ.get("ROMHC_BENCH_MESH", 20))
    n_samples = int(os.environ.get("ROMHC_BENCH_SAMPLES", 1000))
    method = os.environ.get("ROMHC_BENCH_METHOD", "pallas")
    # tol 1e-10 leaves a 10x margin under the 1e-9 certification gate
    # (measured worst residual 9.5e-11); the reference's own LU forward
    # error at contrast 1e10 is O(eps64 * kappa) ~ 1e-4, far looser
    tol = float(os.environ.get("ROMHC_BENCH_TOL", 1e-10))

    if "--suite" in argv:
        _with_retry(lambda: bench_snapshot(20, n_samples, tol, method),
                    "snapshot mesh 20")
        _with_retry(
            lambda: bench_snapshot(40, n_samples, tol, method, reps=16,
                                   metric="snapshot_solves_per_sec_mesh40",
                                   with_baseline=False),
            "snapshot mesh 40")
        _with_retry(
            lambda: bench_snapshot(64, min(n_samples, 512), tol, method,
                                   reps=8,
                                   metric="snapshot_solves_per_sec_mesh64",
                                   with_baseline=False),
            "snapshot mesh 64")
        # dim 261,121 — the reference's dense preassembled family would
        # need ~8.7 TB here; small batch keeps HBM/compile cost bounded
        _with_retry(
            lambda: bench_snapshot(128, min(n_samples, 64), tol, method,
                                   reps=3,
                                   metric="snapshot_solves_per_sec_mesh128",
                                   with_baseline=False),
            "snapshot mesh 128")
        # dim 588,289: the largest grid the PHASED dd-state driver serves.
        # gate 1e-8: contrast-corner samples floor at ~1.9e-9 TRUE
        # residual at this mesh regardless of the ask (f32 round floor;
        # ROADMAP r5 ledger)
        _with_retry(
            lambda: bench_snapshot(192, min(n_samples, 16), tol, method,
                                   reps=3, gate=1e-8,
                                   metric="snapshot_solves_per_sec_mesh192",
                                   with_baseline=False),
            "snapshot mesh 192")
        # dim 1,046,529: million-DoF, in-kernel via the plain-2l route
        # (generic refinement loop; serial grid-(1,) launches — r5).
        # ask 1e-11 (delivery 7.2e-9 -> 2.6e-9 at ~equal cost), gate 1e-8
        _with_retry(
            lambda: bench_snapshot(256, min(n_samples, 8), min(tol, 1e-11),
                                   method, reps=3, gate=1e-8,
                                   metric="snapshot_solves_per_sec_mesh256",
                                   with_baseline=False),
            "snapshot mesh 256")
        # dim 1,324,801: PAST the fused kernels' VMEM reach — served by
        # the pure-XLA two-level inner (r5; 15x the plain-CG fallback)
        _with_retry(
            lambda: bench_snapshot(288, min(n_samples, 8), min(tol, 1e-11),
                                   method, reps=3, gate=1e-8,
                                   metric="snapshot_solves_per_sec_mesh288",
                                   with_baseline=False),
            "snapshot mesh 288")
        _with_retry(bench_greedy, "greedy RB build")
        _with_retry(bench_online, "online ROM")
        _with_retry(bench_cluster, "cluster path")
        return 0

    sps = _with_retry(lambda: bench_snapshot(mesh_n, n_samples, tol, method),
                      "snapshot headline")
    return 0 if sps > 0 else 1


if __name__ == "__main__":
    sys.exit(main())

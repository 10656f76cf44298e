"""TPU measurement: harmonic-enriched deflation vs indicator deflation on
the interior-cluster (NotGeom-diagonal) bucket.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/cluster_enrich_tpu.py
Writes JSON results to /tmp/cluster_enrich_tpu.json and prints progress.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tests")
from oracle import FemOracle  # noqa: E402

from romhighcontrast_tpu.models.fem import FemSpace  # noqa: E402
from romhighcontrast_tpu.ops import clusters as cl, solvers, stencil as st  # noqa: E402
from romhighcontrast_tpu.experiments.grids import contrast_grid, get_full_a  # noqa: E402


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    n_samples = 64
    space = FemSpace((4, 4), 20)
    oracle = FemOracle((4, 4), 20)
    hc = [[(1, 1)], [(2, 2)]]
    a_cols = contrast_grid(len(hc), 10, n_samples, seed=42)
    a_np = np.asarray(get_full_a(a_cols, (4, 4), hc)[:n_samples])
    a = jnp.asarray(a_np)
    w = space.weights(a)
    rhs = jnp.broadcast_to(space.load.reshape(space.grid_shape),
                           (n_samples,) + space.grid_shape)
    lab_np, kmax = cl.cluster_labels_host(a_np, space.N)
    labels = jnp.asarray(lab_np)
    log("setup done; kmax =", kmax,
        "cluster samples:", int((lab_np.max(axis=(1, 2)) > 0).sum()))

    bvec = oracle.load()

    def host_true_res(x):
        xs = np.asarray(x).reshape(n_samples, -1)
        out = np.empty(n_samples)
        for i in range(n_samples):
            K = oracle.stiffness(a_np[i])
            out[i] = (np.linalg.norm(bvec - K @ xs[i])
                      / np.linalg.norm(bvec))
        return out

    results = {}

    # --- indicator deflation, one-shot (round-3 state) ---
    t0 = time.time()
    x0, i0 = solvers.solve_pcg_deflated(w, rhs, labels, kmax, tol=1e-11)
    x0.block_until_ready(); float(jnp.sum(x0))
    t_ind = time.time() - t0
    r0 = host_true_res(x0)
    results["indicator_oneshot"] = {
        "t_first": t_ind, "res_max": float(r0.max()),
        "res_med": float(np.median(r0))}
    log("indicator one-shot:", results["indicator_oneshot"])

    # --- harmonic basis build ---
    t0 = time.time()
    X = cl.harmonic_deflation_basis(w, labels, kmax)
    X.block_until_ready(); float(jnp.sum(X))
    t_basis = time.time() - t0
    results["basis_build_t_first"] = t_basis
    log("harmonic basis built in", t_basis)

    # --- enriched one-shot ---
    t0 = time.time()
    x1, i1 = solvers.solve_pcg_deflated(w, rhs, labels, kmax, tol=1e-11,
                                        deflation_basis=X)
    x1.block_until_ready(); float(jnp.sum(x1))
    t_enr = time.time() - t0
    r1 = host_true_res(x1)
    results["enriched_oneshot"] = {
        "t_first": t_enr, "res_max": float(r1.max()),
        "res_med": float(np.median(r1))}
    log("enriched one-shot:", results["enriched_oneshot"])

    # --- enriched + refinement rounds ---
    x = x1
    rounds = []
    for rnd in range(6):
        r = rhs - st.apply_operator(w, x)
        d, _ = solvers.solve_pcg_deflated(w, r, labels, kmax, tol=1e-9,
                                          deflation_basis=X)
        x = x + d
        rr = host_true_res(x)
        rounds.append({"res_max": float(rr.max()),
                       "res_med": float(np.median(rr))})
        log("enriched refinement round", rnd, rounds[-1])
    results["enriched_refined"] = rounds

    # --- indicator + refinement (round-3 do-not-retry check at HEAD) ---
    x = x0
    rounds = []
    for rnd in range(3):
        r = rhs - st.apply_operator(w, x)
        d, _ = solvers.solve_pcg_deflated(w, r, labels, kmax, tol=1e-9)
        x = x + d
        rr = host_true_res(x)
        rounds.append({"res_max": float(rr.max()),
                       "res_med": float(np.median(rr))})
        log("indicator refinement round", rnd, rounds[-1])
    results["indicator_refined"] = rounds

    # --- host LU reference (scipy splu per sample) ---
    t0 = time.time()
    xs = np.empty((n_samples, space.vspace_dim))
    import scipy.sparse.linalg as spla
    for i in range(n_samples):
        K = oracle.stiffness(a_np[i]).tocsc()
        xs[i] = spla.splu(K).solve(bvec)
    t_lu = time.time() - t0
    rlu = host_true_res(xs)
    results["host_lu"] = {"t_total": t_lu, "res_max": float(rlu.max()),
                          "res_med": float(np.median(rlu)),
                          "solves_per_sec": n_samples / t_lu}
    log("host LU:", results["host_lu"])

    # --- warm throughput: enriched full pipeline (basis + solve + 2 rounds) ---
    def pipeline():
        Xp = cl.harmonic_deflation_basis(w, labels, kmax)
        xp, _ = solvers.solve_pcg_deflated(w, rhs, labels, kmax, tol=1e-11,
                                           deflation_basis=Xp)
        for _ in range(2):
            rp = rhs - st.apply_operator(w, xp)
            dp, _ = solvers.solve_pcg_deflated(w, rp, labels, kmax, tol=1e-9,
                                               deflation_basis=Xp)
            xp = xp + dp
        return xp

    xp = pipeline(); float(jnp.sum(xp))  # warm
    t0 = time.time()
    xp = pipeline(); float(jnp.sum(xp))
    dt = time.time() - t0
    rp = host_true_res(xp)
    results["enriched_pipeline_warm"] = {
        "solves_per_sec": n_samples / dt, "res_max": float(rp.max()),
        "res_med": float(np.median(rp))}
    log("enriched pipeline warm:", results["enriched_pipeline_warm"])

    with open("/tmp/cluster_enrich_tpu.json", "w") as f:
        json.dump(results, f, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()

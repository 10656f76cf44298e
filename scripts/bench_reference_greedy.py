"""Measure the reference's OWN greedy build loop on this host (VERDICT r4
item 3): the denominator for the ``greedy_build_per_sec`` bench line.

Runs the reference implementation unmodified from /root/reference
(ReducedBasis.py:112-136, galerkin flavor, 1 core) at the bench
configuration: paper grid (mesh 20, (4,4) blocks, dim 6241), 1000 training
snapshots, n = 15 basis functions.  The training snapshots are computed by
our framework (f64-accurate, residual < 1e-10 — the greedy loop's cost does
not depend on who produced the snapshots); the reference's own
SolutionsManagerFEM supplies every operator the loop uses (dense
preassembled family, generate_fm_solutions, H10norm), exactly as its study
driver would (HighContrast.py:159-172).

pathos is not installed in this image; the reference only touches its Pool
when num_cores > 1, so a stdlib stub satisfies the import.

Writes docs/parity/reference_greedy_host.json.  Run on CPU only (takes
minutes: the reference assembles 16 dense 6241^2 operators in a Python
triangle loop, ~5 GB).
"""

import json
import sys
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# --- stub pathos with the stdlib equivalents the reference expects --- #
_pathos = types.ModuleType("pathos")
_pm = types.ModuleType("pathos.multiprocessing")
from multiprocessing import Pool, cpu_count  # noqa: E402

_pm.Pool, _pm.cpu_count = Pool, cpu_count
_pathos.multiprocessing = _pm
sys.modules.setdefault("pathos", _pathos)
sys.modules.setdefault("pathos.multiprocessing", _pm)

sys.path.insert(0, "/root/reference")

from src.lib.ReducedBasis import GREEDY_FOR_GALERKIN, ReducedBasisGreedy  # noqa: E402
from src.lib.SolutionsManagers import SolutionsManagerFEM  # noqa: E402


def main(n_basis: int = 15, n_samples: int = 1000) -> dict:
    from romhighcontrast_tpu.benchmarks import _paper_problem

    space, a = _paper_problem(20, n_samples)
    a_np = np.asarray(a, dtype=np.float64)

    print("building reference SolutionsManagerFEM((4,4), 20) "
          "(dense preassembled family, Python triangle loop)...", flush=True)
    t0 = time.time()
    sm_ref = SolutionsManagerFEM((4, 4), 20, num_cores=1, method="lsqsparse")
    t_assembly = time.time() - t0
    print(f"  assembly: {t_assembly:.1f}s "
          f"({sm_ref.A_preassembled.nbytes / 1e9:.2f} GB)", flush=True)

    # training snapshots from our framework (f64-accurate); h1 norms from
    # the REFERENCE manager so the loop consumes only reference quantities
    print("solving training snapshots (our framework, CPU)...", flush=True)
    sols = np.asarray(space.solve(a_np, tol=1e-10), dtype=np.float64)
    t0 = time.time()
    h1 = sm_ref.H10norm(sols)
    t_h1 = time.time() - t0

    print(f"running reference greedy build (galerkin, n={n_basis}, "
          f"{n_samples} snapshots)...", flush=True)
    t0 = time.time()
    rb = ReducedBasisGreedy(greedy_for=GREEDY_FOR_GALERKIN).build(
        n=n_basis, sm=sm_ref, solutions2train=sols, a2train=a_np,
        solutions2train_h1norm=h1,
    )
    t_build = time.time() - t0
    assert np.asarray(rb.basis).shape == (n_basis, space.vspace_dim)

    out = {
        "what": "reference greedy build loop "
                "(/root/reference/src/lib/ReducedBasis.py:112-136), "
                "galerkin flavor, 1 core, measured on this host",
        "host": "bench host (1 CPU core)",
        "config": {"mesh": 20, "blocks": [4, 4], "dim": space.vspace_dim,
                   "n_basis": n_basis, "n_train": n_samples},
        "assembly_seconds": round(t_assembly, 2),
        "h10norm_seconds": round(t_h1, 3),
        "greedy_build_seconds": round(t_build, 2),
        "greedy_builds_per_sec": round(1.0 / t_build, 6),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    path = REPO / "docs" / "parity" / "reference_greedy_host.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2), flush=True)
    return out


if __name__ == "__main__":
    main()

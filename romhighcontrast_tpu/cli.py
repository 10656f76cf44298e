"""Command-line entry points.

The reference has no CLI (configuration is a kwargs dict in ``__main__``,
HighContrast.py:491-506); a production framework needs one::

    python -m romhighcontrast_tpu.cli experiment --name demo --mesh 8 ...
    python -m romhighcontrast_tpu.cli study --study GeomAssumptions
    python -m romhighcontrast_tpu.cli bench
    python -m romhighcontrast_tpu.cli nonlinear
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_blocks(text: str):
    """'0,1;1,3' -> [[(0,1)],[(1,3)]]  /  '0,1+1,2;2,2' -> groups."""
    groups = []
    for group in text.split(";"):
        cells = []
        for cell in group.split("+"):
            r, c = cell.split(",")
            cells.append((int(r), int(c)))
        groups.append(cells)
    return groups


def main(argv=None):
    parser = argparse.ArgumentParser(prog="romhighcontrast_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("experiment", help="run one offline+online experiment")
    p.add_argument("--name", required=True)
    p.add_argument("--mesh", type=int, default=20)
    p.add_argument("--blocks", type=int, nargs=2, default=(4, 4))
    p.add_argument("--hc-blocks", default="0,1",
                   help="high-contrast groups, e.g. '0,1' or '0,0+1,1;2,2'")
    p.add_argument("--samples", type=int, default=1000)
    p.add_argument("--vn-max-dim", type=int, default=15)
    p.add_argument("--measurements", type=int, default=100)
    p.add_argument("--method", default="mixed")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--results-dir", default=None)
    p.add_argument("--plots", action="store_true")

    p = sub.add_parser("study", help="run a full paper study (D1..Dd)")
    p.add_argument("--study", default="GeomAssumptions",
                   choices=["GeomAssumptions", "NotGeomAssumptions"])
    p.add_argument("--mesh", type=int, default=20)
    p.add_argument("--samples", type=int, default=1000)
    p.add_argument("--method", default="mixed")
    p.add_argument("--results-dir", default=None)

    p = sub.add_parser("bench", help="headline benchmark (one JSON line)")

    p = sub.add_parser("nonlinear", help="nonlinear-ROM eigenvalue study")
    p.add_argument("--mesh", type=int, default=5)
    p.add_argument("--n-max", type=int, default=2000)

    p = sub.add_parser("presentation", help="generate slide figures")
    p.add_argument("--out", default=None)

    args = parser.parse_args(argv)

    if args.cmd == "experiment":
        from romhighcontrast_tpu.experiments.driver import (
            default_builders,
            experiment,
        )

        builders = default_builders()
        res = experiment(
            name=args.name,
            reduced_basis_builders=builders,
            mesh_discretization_per_dim=args.mesh,
            blocks_geometry=tuple(args.blocks),
            high_contrast_blocks=_parse_blocks(args.hc_blocks),
            max_num_samples_offline=args.samples,
            vn_max_dim=args.vn_max_dim,
            num_measurements=args.measurements,
            method=args.method,
            seed=args.seed,
            results_dir=args.results_dir,
        )
        if args.plots:
            from romhighcontrast_tpu.experiments.plots import plot_results

            plot_results(args.name, [b.name for b in builders],
                         res.a_high_contrast, results_dir=args.results_dir)
        print(json.dumps({"experiment": args.name,
                          "folder": str(res.store.folder)}))
    elif args.cmd == "study":
        from romhighcontrast_tpu.experiments.highcontrast import run_study

        names = run_study(args.study, results_dir=args.results_dir,
                          mesh_discretization_per_dim=args.mesh,
                          max_num_samples_offline=args.samples,
                          method=args.method)
        print(json.dumps({"study": args.study, "experiments": names}))
    elif args.cmd == "bench":
        from romhighcontrast_tpu.benchmarks import main as bench_main

        return bench_main()
    elif args.cmd == "nonlinear":
        from romhighcontrast_tpu.experiments.nonlinear import run_study

        run_study(mesh=args.mesh, n_max=args.n_max)
    elif args.cmd == "presentation":
        from romhighcontrast_tpu.extras.presentation import generate_all

        print(generate_all(args.out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

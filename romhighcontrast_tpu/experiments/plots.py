"""Paper plotting: convergence rates, error paths, cross-dimension
comparisons with sub-exponential rate fits
(reference: HighContrast.py:227-487)."""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import numpy as np

from romhighcontrast_tpu.config import MACHINE_PRECISION, results_path
from romhighcontrast_tpu.experiments.driver import TypeOfProblems
from romhighcontrast_tpu.experiments.persistence import ExperimentStore

FIGSIZE = (8, 8)

TYPE_OF_PROBLEM_LABELS = {
    "forward_modeling": "galerkin projection",
    "projection": r"$H_0^1$ projection",
    "state_estimation": "state_estimation",
    "parameter_estimation_inverse": "parameter_estimation_inverse",
    "parameter_estimation_linear": "parameter_estimation_linear",
}

COLOR_DICT = {
    "Random $\\infty$": "firebrick",
    "Random": "darkgoldenrod",
    "Greedy $H^1_0$": "forestgreen",
    "Greedy galerkin": "royalblue",
}


def _max_errors_per_n(errors: dict, problem: str):
    ns = sorted(int(k) for k in errors.keys())
    linf = np.array([np.max(errors[str(n)][problem]) for n in ns])
    return np.asarray(ns), linf


def plot_rates_of_convergence(ax, store, reduced_basis_2show, type_of_problems,
                              color=None, linestyle="solid", marker="."):
    """Max-over-test-set relative error vs n, semilog
    (reference: HighContrast.py:227-245)."""
    from matplotlib import cm

    problems = (
        type_of_problems if isinstance(type_of_problems, list) else [type_of_problems]
    )
    for i, problem in enumerate(problems):
        for j, rb_name in enumerate(reduced_basis_2show):
            ns, linf = _max_errors_per_n(store[rb_name]["errors"], problem)
            label = rb_name + (
                f": {TYPE_OF_PROBLEM_LABELS[problem]}"
                if isinstance(type_of_problems, list)
                else ""
            )
            ax.plot(
                ns, linf, label=label,
                c=color(rb_name, problem) if isinstance(color, Callable)
                else cm.Set1(i * len(reduced_basis_2show) + j),
                linestyle=linestyle(rb_name, problem)
                if isinstance(linestyle, Callable) else linestyle,
                marker=marker(rb_name, problem)
                if isinstance(marker, Callable) else marker,
            )
    ax.set_xlabel(r"$\mathrm{dim}(V_n)$")
    ax.set_ylabel(r"maximal $H^1_0$ error")
    ax.set_yscale("log")
    ax.legend()


def plot_error_paths(ax, store, reduced_basis_2show, type_of_problem,
                     a_high_contrast):
    """Relative error vs 1/contrast, one curve per n — flatness in contrast
    is the paper's headline qualitative result
    (reference: HighContrast.py:248-265)."""
    import matplotlib.pyplot as plt

    ahc = 1 / np.max(np.asarray(a_high_contrast), axis=-1)
    order = np.argsort(ahc)
    for rb_name in reduced_basis_2show:
        ax.set_title(f"Reduced basis: {rb_name}")
        errors = store[rb_name]["errors"]
        ns = sorted(int(k) for k in errors.keys())
        for n in ns:
            err = np.asarray(errors[str(n)][type_of_problem])
            if "parameter_estimation" in type_of_problem:
                err = err.max(axis=(-1, -2))
            ax.plot(ahc[order], err[order], label=n, marker=None,
                    c=plt.get_cmap("viridis")((max(ns) - n) / max(ns)))
        ax.set_xlabel(r"$1/y_1$")
        ax.set_ylabel(r"$H^1_0$ error")
        ax.set_yscale("log")


def fit_convergence_rate(ns, linf, valid=None):
    """Least-squares fit of log(err) ~ rate * n + origin above the machine
    floor (reference: HighContrast.py:390-394).  ``valid`` overrides the
    floor mask (needed when fitting transformed quantities like -log(err),
    whose values are not comparable to the floor)."""
    keep = (linf > MACHINE_PRECISION) if valid is None else np.asarray(valid)
    A = np.vstack([ns[keep], np.ones(keep.sum())]).T
    sol, *_ = np.linalg.lstsq(A, np.log(linf[keep]).reshape(-1, 1), rcond=None)
    rate, origin = np.ravel(sol)
    return rate, origin, keep


def plot_results(name, reduced_basis_names, a_high_contrast, results_dir=None,
                 a2show=None, space=None, **_):
    """Full per-experiment plot dump: error paths per problem/basis,
    rates of convergence per problem (reference: plot_results,
    HighContrast.py:268-359)."""
    import matplotlib.pylab as plt

    from romhighcontrast_tpu.viz.fields import field_gallery, figure_file

    base = results_path if results_dir is None else Path(results_dir)
    folder = base / f"HighContrast_{name}"
    store = ExperimentStore(folder)

    ep = folder / "ErrorPath"
    ep.mkdir(parents=True, exist_ok=True)
    for problem in TypeOfProblems._fields:
        for rb_name in reduced_basis_names:
            fig, ax = plt.subplots(ncols=1, figsize=FIGSIZE)
            fig.suptitle(problem.replace("_", " "))
            plot_error_paths(ax, store, [rb_name], problem, a_high_contrast)
            ax.legend(bbox_to_anchor=(1.01, 0.5), loc="center left")
            plt.savefig(ep / f"{name}_{problem}_error_path_{rb_name}.png")
            plt.close()

    if a2show is not None and space is not None:
        sols = space.solve(a2show)
        fig, _ = field_gallery(space, sols, resolution=100, style="contour",
                               levels=7, panel_size=6)
        fig.savefig(folder / f"{name}_TrueSolution.png")
        plt.close(fig)

    er = folder / "ErrorRates"
    er.mkdir(parents=True, exist_ok=True)
    for problem in TypeOfProblems._fields:
        with figure_file(er / f"{name}_{problem}_error_rates.png",
                         size=FIGSIZE) as (fig, ax):
            plot_rates_of_convergence(
                ax, store, reduced_basis_names, problem,
                color=lambda rbn, top: COLOR_DICT.get(rbn, "gray"),
            )
    return folder


def gather_experiments(names, high_contrast_blocks_list, reduced_basis_name,
                       name="", type_of_problems=None,
                       folder_name="HighContrastDimensionality", results_dir=None):
    """Cross-dimension comparison with exponential and sub-exponential
    (log-log) rate fits (reference: gather_experiments,
    HighContrast.py:362-426)."""
    import matplotlib.pylab as plt
    from matplotlib import cm

    base = results_path if results_dir is None else Path(results_dir)
    out = base / (folder_name + name)
    out.mkdir(exist_ok=True, parents=True)
    PROJECTION = "forward_modeling"
    rates = {}
    for problem in TypeOfProblems._fields:
        if type_of_problems is not None and problem not in type_of_problems:
            continue
        fig, ax = plt.subplots(ncols=1, figsize=FIGSIZE)
        if problem == PROJECTION:
            fig_log, ax_log = plt.subplots(ncols=1, figsize=FIGSIZE)
        for j, (exp_name, hc_blocks) in enumerate(
            zip(names, high_contrast_blocks_list)
        ):
            store = ExperimentStore(base / f"HighContrast_{exp_name}")
            ns, linf = _max_errors_per_n(store[reduced_basis_name]["errors"], problem)
            c = cm.Set1(j)
            label = f"d: {len(hc_blocks)}"
            if problem == PROJECTION:
                rate, origin, keep = fit_convergence_rate(ns, linf)
                rates[exp_name] = rate
                ax.plot(ns[keep], np.exp(rate * ns[keep] + origin), ":", c=c,
                        alpha=0.7)
                # sub-exponential fit: log(-log err) vs log n, excluding
                # machine-floor points of the ORIGINAL errors
                linf_log = -np.log(linf)
                rate_log, origin_log, _ = fit_convergence_rate(
                    np.log(ns), linf_log, valid=linf > MACHINE_PRECISION
                )
                ax_log.plot(ns, linf_log, label=f"{label} {rate_log:.2f}", c=c,
                            linestyle="--", marker=".")
                ax_log.set_xscale("log")
                ax_log.set_yscale("log")
                label = f"{label} {rate:.2f}"
            ax.plot(ns, linf, label=label, c=c, linestyle="--", marker=".")
        ax.set_xlabel(r"$\mathrm{dim}(V_n)$")
        ax.set_ylabel(r"maximal $H^1_0$ error")
        ax.set_yscale("log")
        ax.legend()
        if problem == PROJECTION:
            ax_log.set_xlabel(r"$\mathrm{dim}(V_n)$")
            ax_log.set_ylabel(r"log(maximal $H^1_0$ error)")
            ax_log.legend()
            fig_log.savefig(out / f"{name}_{problem}_error_rates_loglog.png")
        fig.savefig(out / f"{name}_{problem}_error_rates_log.png")
        plt.close("all")
    return rates


def paper_plots(names, high_contrast_blocks_list, reduced_basis_names,
                results_dir=None):
    """The paper figure set incl. the dimensional-deterioration fit
    (reference: paper_plots, HighContrast.py:429-487)."""
    import matplotlib.pylab as plt
    from matplotlib import cm

    from romhighcontrast_tpu.viz.fields import figure_file

    base = results_path if results_dir is None else Path(results_dir)
    out = base / "paper_plots"
    out.mkdir(exist_ok=True, parents=True)

    for exp_name, hc_blocks in zip(names, high_contrast_blocks_list):
        store = ExperimentStore(base / f"HighContrast_{exp_name}")
        if len(hc_blocks) == 1:
            for problem in ["forward_modeling", "projection"]:
                with figure_file(out / f"{exp_name}_{problem}_error_rates.png",
                                 size=FIGSIZE) as (fig, ax):
                    plot_rates_of_convergence(
                        ax, store, reduced_basis_names, problem,
                        color=lambda rbn, top: COLOR_DICT.get(rbn, "gray"),
                    )
        elif len(hc_blocks) == 2:
            greedy = [n for n in reduced_basis_names if "Greedy" in n]
            with figure_file(out / f"{exp_name}_greedy_error_rates.png",
                             size=FIGSIZE) as (fig, ax):
                plot_rates_of_convergence(
                    ax, store, greedy, ["forward_modeling", "projection"],
                    linestyle=lambda rbn, top: "solid" if top == "projection"
                    else "dashed",
                    marker=lambda rbn, top: "." if top == "projection" else "*",
                )

    # dimensional deterioration of the greedy-galerkin rate
    import os

    common = os.path.commonprefix(list(names))
    problem = "forward_modeling"
    with figure_file(out / f"{common}_{problem}_dimensional_deterioration.png",
                     size=FIGSIZE) as (fig, ax):
        for j, (exp_name, hc_blocks) in enumerate(
            zip(names, high_contrast_blocks_list)
        ):
            store = ExperimentStore(base / f"HighContrast_{exp_name}")
            ns, linf = _max_errors_per_n(
                store["Greedy galerkin"]["errors"], problem
            )
            c = cm.Set1(j)
            rate, origin, keep = fit_convergence_rate(ns, linf)
            ax.plot(ns[keep], np.exp(rate * ns[keep] + origin), ":", c=c, alpha=0.7)
            ax.plot(ns, linf, label=f"d: {len(hc_blocks)} {rate:.2f}", c=c,
                    linestyle="--", marker=".")
        ax.set_xlabel(r"$\mathrm{dim}(V_n)$")
        ax.set_ylabel(r"maximal $H^1_0$ error")
        ax.set_yscale("log")
        ax.legend()
    return out

"""Interactive ipywidgets dashboards (reference:
src/notebooks/functions4notebooks.py).

Five live-solve dashboards binding sliders (per-block contrast, reduced
dimension n, measurement count m, noise, method dropdowns) to batched device
solves + plots:

* ``visualize_intuition``        — per-block sliders -> live FOM solve plot
* ``visualize_approximations``   — truth vs per-basis state estimates
* ``visualize_convergence``      — error vs n per reduced basis
* ``visualize_state_estimation_methods`` — error vs n per estimation method
* ``visualize_samplers``         — error vs n per sensor-placement sampler
* ``visualize_all``              — combined (fixes the reference's NameError
  at functions4notebooks.py:488, which referenced an out-of-scope callback)

ipywidgets/IPython are imported lazily; everything degrades to a clear
ImportError outside a notebook environment.
"""

from __future__ import annotations

import itertools

import numpy as np

from romhighcontrast_tpu.viz.fields import field_gallery

ERROR_METRICS = {
    "L2": lambda x: float(np.mean(np.sqrt(np.mean(np.asarray(x) ** 2, axis=-1)))),
    "Linf": lambda x: float(np.max(np.sqrt(np.mean(np.asarray(x) ** 2, axis=-1)))),
}


def _widgets():
    try:
        import ipywidgets as widgets
        from IPython.display import display
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "dashboards need ipywidgets/IPython (notebook environment)"
        ) from e
    return widgets, display


def _block_sliders(widgets, sm, lower, upper):
    grid = widgets.GridspecLayout(*sm.blocks_geometry)
    sliders = {}
    for i, j in itertools.product(*map(range, sm.blocks_geometry)):
        key = f"a{i}{j}"
        sliders[key] = widgets.FloatSlider(
            value=50, min=lower, max=upper, step=0.5, description=f"a[{i},{j}]:",
            continuous_update=False, readout_format=".1f",
        )
        grid[i, j] = sliders[key]
    return grid, sliders


def visualize_intuition(sm, diffusion_contrast_lower, diffusion_contrast_upper,
                        num_points_per_dim_to_plot=50, axes_xy_proportions=(3, 3)):
    """Sliders per block -> live solve + heatmap (reference:
    functions4notebooks.py:11-40)."""
    import matplotlib.pylab as plt

    widgets, display = _widgets()
    grid, sliders = _block_sliders(
        widgets, sm, diffusion_contrast_lower, diffusion_contrast_upper
    )

    def show(**kwargs):
        a = np.array([list(kwargs.values())]).reshape((1,) + sm.blocks_geometry)
        sols = sm.solve(a[:, ::-1])
        field_gallery(
            sm, sols,
            labels=[f"a={np.round(ai, 2)}" for ai in a],
            resolution=num_points_per_dim_to_plot, style="contour", levels=7,
            panel_size=axes_xy_proportions[0],
        )
        plt.show()

    out = widgets.interactive_output(show, sliders)
    display(grid, out)


def _convergence_loop(sm, solutions, sampler_dict, basis_dict, estimator_dict,
                      rb_method, sampler_name, m, estimator_name, metric, noise,
                      vn_range):
    """Shared inner loop of the convergence-style dashboards (reference
    repeats this block in each of functions4notebooks.py:141-405)."""
    errors = []
    measurement_points = measurements = None
    for n in range(*vn_range):
        basis = np.asarray(basis_dict[rb_method])[:n]
        if sampler_name == "Optimal" or measurement_points is None:
            measurement_points = sampler_dict[sampler_name](
                m, sm.x_domain, sm.y_domain, basis=basis, sm=sm
            )
            measurements = np.asarray(
                sm.evaluate_solutions(measurement_points, solutions)
            )
            if noise > 0:
                measurements = measurements + np.random.normal(
                    scale=noise, size=measurements.shape
                )
        est = estimator_dict[estimator_name](
            measurement_points=measurement_points, measurements=measurements,
            reduced_basis=basis.reshape(n, -1), sm=sm,
        )
        errors.append(ERROR_METRICS[metric](np.asarray(solutions) - np.asarray(est)))
    return errors


def _convergence_dashboard(sm, solutions, sampler_dict, basis_dict, estimator_dict,
                           max_vn_dim, vary: str):
    """One dashboard body; ``vary`` in {"basis", "estimator", "sampler"}
    controls which dimension becomes the multi-select curve family."""
    import matplotlib.pylab as plt

    widgets, display = _widgets()
    style = {"description_width": "initial"}
    w = {}
    w["error_metric"] = widgets.Dropdown(options=list(ERROR_METRICS),
                                         description="Error metric: ", style=style)
    w["noise"] = widgets.FloatText(value=0, description="Noise: ", style=style)
    w["m"] = widgets.IntText(value=50, description="Number of measurements:",
                             style=style)
    w["vn_range"] = widgets.IntRangeSlider(min=1, max=max_vn_dim,
                                           value=(1, max_vn_dim),
                                           description="dim(Vn) range: ", style=style)
    multi = {
        "basis": ("rb_methods", list(basis_dict)),
        "estimator": ("se_methods", list(estimator_dict)),
        "sampler": ("sampler_names", list(sampler_dict)),
    }
    for key, (wname, options) in multi.items():
        if key == vary:
            w[wname] = widgets.SelectMultiple(options=options, value=tuple(options),
                                              description=f"{key}: ", style=style)
        else:
            w[wname.rstrip("s")] = widgets.Dropdown(options=options,
                                                    description=f"{key}: ",
                                                    style=style)

    def show(**kw):
        varying = kw[multi[vary][0]]
        for item in varying:
            args = dict(
                rb_method=kw.get("rb_method", item if vary == "basis" else None),
                sampler_name=kw.get("sampler_name",
                                    item if vary == "sampler" else None),
                estimator_name=kw.get("se_method",
                                      item if vary == "estimator" else None),
            )
            if vary == "basis":
                args["rb_method"] = item
            errors = _convergence_loop(
                sm, solutions, sampler_dict, basis_dict, estimator_dict,
                rb_method=args["rb_method"], sampler_name=args["sampler_name"],
                m=kw["m"], estimator_name=args["estimator_name"],
                metric=kw["error_metric"], noise=kw["noise"],
                vn_range=kw["vn_range"],
            )
            plt.plot(np.arange(*kw["vn_range"]), errors, ".-", label=str(item))
        plt.yscale("log")
        plt.grid()
        plt.legend()
        plt.show()

    out = widgets.interactive_output(show, w)
    display(widgets.VBox(list(w.values())), out)


def visualize_convergence(sm, solutions, measurements_sampling_method_dict,
                          reduced_basis_dict, state_estimation_method_dict,
                          max_vn_dim):
    """(reference: functions4notebooks.py:141-218)"""
    _convergence_dashboard(sm, solutions, measurements_sampling_method_dict,
                           reduced_basis_dict, state_estimation_method_dict,
                           max_vn_dim, vary="basis")


def visualize_state_estimation_methods(sm, solutions,
                                       measurements_sampling_method_dict,
                                       reduced_basis_dict,
                                       state_estimation_method_dict, max_vn_dim):
    """(reference: functions4notebooks.py:221-316)"""
    _convergence_dashboard(sm, solutions, measurements_sampling_method_dict,
                           reduced_basis_dict, state_estimation_method_dict,
                           max_vn_dim, vary="estimator")


def visualize_samplers(sm, solutions, measurements_sampling_method_dict,
                       reduced_basis_dict, state_estimation_method_dict,
                       max_vn_dim):
    """(reference: functions4notebooks.py:319-405)"""
    _convergence_dashboard(sm, solutions, measurements_sampling_method_dict,
                           reduced_basis_dict, state_estimation_method_dict,
                           max_vn_dim, vary="sampler")


def visualize_all(sm, solutions, measurements_sampling_method_dict,
                  reduced_basis_dict, state_estimation_method_dict,
                  max_vn_dim):
    """Combined dashboard: one curve per (estimator x sampler) pair over a
    shared control set (basis, noise, m, dim(Vn) range, error metric).

    This is what the reference's ``visualize_all``
    (functions4notebooks.py:408-489) intended — there it is broken by a
    scoping NameError on its callback and only ever varied the estimator.
    Here both the estimation methods AND the sensor-placement samplers are
    multi-selects whose cartesian product becomes the curve family.
    """
    import matplotlib.pylab as plt

    widgets, display = _widgets()
    style = {"description_width": "initial"}
    w = {}
    w["error_metric"] = widgets.Dropdown(options=list(ERROR_METRICS),
                                         description="Error metric: ",
                                         style=style)
    w["noise"] = widgets.FloatText(value=0, description="Noise: ", style=style)
    w["m"] = widgets.IntText(value=50, description="Number of measurements:",
                             style=style)
    w["vn_range"] = widgets.IntRangeSlider(min=1, max=max_vn_dim,
                                           value=(1, max_vn_dim),
                                           description="dim(Vn) range: ",
                                           style=style)
    w["rb_method"] = widgets.Dropdown(options=list(reduced_basis_dict),
                                      description="basis: ", style=style)
    w["se_methods"] = widgets.SelectMultiple(
        options=list(state_estimation_method_dict),
        value=tuple(state_estimation_method_dict),
        description="estimators: ", style=style)
    w["sampler_names"] = widgets.SelectMultiple(
        options=list(measurements_sampling_method_dict),
        value=tuple(measurements_sampling_method_dict),
        description="samplers: ", style=style)

    def show(**kw):
        for estimator_name in kw["se_methods"]:
            for sampler_name in kw["sampler_names"]:
                errors = _convergence_loop(
                    sm, solutions, measurements_sampling_method_dict,
                    reduced_basis_dict, state_estimation_method_dict,
                    rb_method=kw["rb_method"], sampler_name=sampler_name,
                    m=kw["m"], estimator_name=estimator_name,
                    metric=kw["error_metric"], noise=kw["noise"],
                    vn_range=kw["vn_range"],
                )
                plt.plot(np.arange(*kw["vn_range"]), errors, ".-",
                         label=f"{estimator_name} / {sampler_name}")
        plt.yscale("log")
        plt.xlabel("dim(Vn)")
        plt.ylabel(kw["error_metric"])
        plt.grid()
        plt.legend()
        plt.show()

    out = widgets.interactive_output(show, w)
    display(widgets.VBox(list(w.values())), out)


def vizualize_approximations(sm, measurements_sampling_method_dict,
                             reduced_basis_dict, state_estimation_method_dict,
                             diffusion_contrast_lower, diffusion_contrast_upper,
                             max_vn_dim, num_points_per_dim_to_plot=50,
                             axes_xy_proportions=(3, 3)):
    """Truth vs per-basis estimates with live sliders
    (reference: functions4notebooks.py:43-132; reference's typo'd name kept
    as an alias below)."""
    import matplotlib.pylab as plt

    widgets, display = _widgets()
    style = {"description_width": "initial"}
    grid, sliders = _block_sliders(widgets, sm, diffusion_contrast_lower,
                                   diffusion_contrast_upper)
    controls = dict(sliders)
    controls["rb_methods"] = widgets.SelectMultiple(
        options=list(reduced_basis_dict), value=tuple(reduced_basis_dict),
        description="Reduced Basis: ", style=style)
    controls["n_dim"] = widgets.IntSlider(value=1, min=1, max=max_vn_dim,
                                          description="RB dim n:", style=style,
                                          continuous_update=False)
    controls["measurements_sampling_method"] = widgets.Dropdown(
        options=list(measurements_sampling_method_dict),
        description="Measurements sampling method: ", style=style)
    controls["m"] = widgets.IntSlider(value=50, min=max_vn_dim, max=10 * max_vn_dim,
                                      description="Number of measurements:",
                                      style=style, continuous_update=False)
    controls["state_estimation_method"] = widgets.Dropdown(
        options=list(state_estimation_method_dict),
        description="State estimation method: ", style=style)

    def show(n_dim, rb_methods, m, measurements_sampling_method,
             state_estimation_method, **kwargs):
        approx = []
        measurement_points = None
        a = np.array([list(kwargs.values())]).reshape((1,) + sm.blocks_geometry)
        solution = np.asarray(sm.solve(a[:, ::-1]))
        for rb_method in rb_methods:
            basis = np.asarray(reduced_basis_dict[rb_method])[:n_dim]
            measurement_points = measurements_sampling_method_dict[
                measurements_sampling_method
            ](m, sm.x_domain, sm.y_domain, basis=basis, sm=sm)
            meas = np.asarray(sm.evaluate_solutions(measurement_points, solution))
            approx.append(np.asarray(state_estimation_method_dict[
                state_estimation_method
            ](measurement_points=measurement_points, measurements=meas,
              reduced_basis=basis, sm=sm))[0])
        field_gallery(
            sm, np.vstack([solution] + [a[None] if a.ndim == 1 else a
                                        for a in approx]),
            labels=["True solution"] + list(rb_methods),
            resolution=num_points_per_dim_to_plot, style="contour", levels=7,
            panel_size=axes_xy_proportions[0], sensors=measurement_points,
        )
        plt.show()

    out = widgets.interactive_output(show, controls)
    display(grid, widgets.VBox([v for k, v in controls.items()
                                if k not in sliders]), out)


visualize_approximations = vizualize_approximations

"""Round-4 tutorial-notebook extension: exercise/solution pairs, dashboard
cells, estimator comparison, and the online-serving demo — toward the
reference's 71-cell depth (reference: InverseProblemPipeline.ipynb)."""
import json

P = "/root/repo/notebooks/InverseProblemPipeline.ipynb"
nb = json.load(open(P))
cells = nb["cells"]


def md(src):
    return {"cell_type": "markdown", "metadata": {},
            "source": src.splitlines(keepends=True)}


def code(src):
    return {"cell_type": "code", "metadata": {}, "execution_count": None,
            "outputs": [], "source": src.splitlines(keepends=True)}


# --- A. CPU knob in the setup cell (index 2) ---
src2 = "".join(cells[2]["source"])
assert "ROMHC_NB_CPU" not in src2
src2 = src2.replace(
    "import jax\nimport jax.numpy as jnp\n",
    "import jax\n"
    "# ROMHC_NB_CPU=1 runs the whole notebook on the CPU backend (no TPU\n"
    "# tunnel needed); the math is identical, only throughput changes\n"
    "if os.environ.get(\"ROMHC_NB_CPU\") == \"1\":\n"
    "    jax.config.update(\"jax_platforms\", \"cpu\")\n"
    "import jax.numpy as jnp\n",
)
cells[2]["source"] = src2.splitlines(keepends=True)

# Insertions as (after_source_snippet, [new cells]) — located by content so
# indices stay stable while we insert.
inserts = []

# --- B. intuition dashboard after the widgets markdown (old cell 15) ---
inserts.append((
    "If you are running this interactively",
    [code(
        "# live dashboard: one slider per block -> solve + contour on release\n"
        "from romhighcontrast_tpu.viz.dashboards import visualize_intuition\n"
        "visualize_intuition(sm, a_min, a_max, num_points_per_dim_to_plot=40)\n"
    )],
))

# --- C. RB-generator exercise/solution after the POD-spectrum markdown ---
inserts.append((
    "The spectrum drops by orders of magnitude",
    [md(
        "#### Exercise — write your own reduced-basis generator\n\n"
        "Every builder above fits one generic scheme (the reference poses the\n"
        "same exercise): a function taking the offline snapshot matrix\n"
        "`(N, dim)` and the target dimension `n`, returning an orthonormal\n"
        "basis `(n, dim)`.  Implement a random-snapshot generator and check\n"
        "it against `RandomBuilder` by comparing projection errors."
    ),
     code(
        "# solution: pick n snapshots at random, orthonormalize by QR\n"
        "def reduced_basis_generator_random(solutions_offline,\n"
        "                                   number_of_reduced_bases, seed=42):\n"
        "    r = np.random.default_rng(seed)\n"
        "    pick = r.choice(len(solutions_offline), number_of_reduced_bases,\n"
        "                    replace=False)\n"
        "    q, _ = np.linalg.qr(np.asarray(solutions_offline)[pick].T)\n"
        "    return q.T\n"
        "\n"
        "V_mine = reduced_basis_generator_random(np.asarray(snapshots), 5)\n"
        "print(\"orthonormality defect:\",\n"
        "      float(np.abs(V_mine @ V_mine.T - np.eye(5)).max()))\n"
        "proj = sm.project(snapshots, jnp.asarray(V_mine))\n"
        "err_mine = float(jnp.max(sm.h10_norm(snapshots - proj) / h1_train))\n"
        "proj_lib = sm.project(snapshots, bases[\"Random\"][:5].basis)\n"
        "err_lib = float(jnp.max(sm.h10_norm(snapshots - proj_lib) / h1_train))\n"
        "print(f\"max rel H1 projection error: mine {err_mine:.2e}, \"\n"
        "      f\"RandomBuilder {err_lib:.2e}\")\n"
    )],
))

# --- D. sensor-sampler exercise after the Christoffel cell ---
inserts.append((
    "inverse Christoffel function of $V_8$",
    [md(
        "#### Exercise — write your own measurement sampler\n\n"
        "A sampler maps `(m, xlim, ylim)` to sensor locations `(m, 2)`.\n"
        "Implement a regular-grid design and compare it with the library's\n"
        "`Grid` sampler (the reference's notebook poses uniform/grid/Sobol\n"
        "variants of this exercise in cell 44)."
    ),
     code(
        "# solution: interior tensor grid, truncated to m points\n"
        "def measurements_sampling_method_grid(number_of_measures, xlim, ylim,\n"
        "                                      **kwargs):\n"
        "    k = int(np.ceil(np.sqrt(number_of_measures)))\n"
        "    gx = np.linspace(*xlim, k + 2)[1:-1]\n"
        "    gy = np.linspace(*ylim, k + 2)[1:-1]\n"
        "    P = np.stack(np.meshgrid(gx, gy), -1).reshape(-1, 2)\n"
        "    return P[:number_of_measures]\n"
        "\n"
        "mine = measurements_sampling_method_grid(m_show, sm.x_domain, sm.y_domain)\n"
        "lib = MEASUREMENT_SAMPLERS[\"Grid\"](m_show, sm.x_domain, sm.y_domain)\n"
        "fig, ax = plt.subplots(figsize=(4, 3.4))\n"
        "ax.scatter(*mine.T, s=14, label=\"exercise grid\")\n"
        "ax.scatter(*lib.T, s=14, marker=\"x\", label=\"library Grid\")\n"
        "ax.set_aspect(\"equal\"); ax.legend(fontsize=8)\n"
        "plt.tight_layout(); plt.show()\n"
    )],
))

# --- E. state-estimation exercise after the comparison gallery ---
inserts.append((
    "best = min(errors, key=errors.get)",
    [md(
        "#### Exercise — least squares from scratch\n\n"
        "State estimation solves `argmin_c ||Phi^T c - y||` where\n"
        "`Phi[i, j] = v_i(x_j)` evaluates the basis at the sensors.  Write it\n"
        "in four lines and check it is the library's `least-squares`\n"
        "estimator (the reference poses this in cell 50)."
    ),
     code(
        "# solution\n"
        "def state_estimation_least_squares(measurement_points, measurements,\n"
        "                                   reduced_basis, sm):\n"
        "    Phi = np.asarray(sm.evaluate_solutions(measurement_points,\n"
        "                                           reduced_basis))  # (n, m)\n"
        "    c = np.linalg.lstsq(Phi.T, np.asarray(measurements).T,\n"
        "                        rcond=None)[0]\n"
        "    return c.T @ np.asarray(reduced_basis)\n"
        "\n"
        "est_mine = state_estimation_least_squares(sensors, meas, basis_n, sm)\n"
        "est_lib = np.asarray(STATE_ESTIMATORS[\"least-squares\"](\n"
        "    measurement_points=sensors, measurements=meas,\n"
        "    reduced_basis=basis_n, sm=sm))\n"
        "print(\"max |mine - library| =\",\n"
        "      float(np.abs(est_mine - est_lib).max()))\n"
    )],
))

# --- F. four-decoder comparison after the tree cell ---
inserts.append((
    "EstimatorTree mean |log a_hat - log a|",
    [md(
        "All four parameter decoders side by side — the linear pair\n"
        "(`inverse`, `linear`) is what the paper wires into the pipeline\n"
        "(reference: Estimators.py:18-37); `nearest` and the per-block\n"
        "random forest are the learned alternatives (Estimators.py:50-97)."
    ),
     code(
        "from romhighcontrast_tpu.rom.estimators import EstimatorNear\n"
        "\n"
        "near = EstimatorNear(a_values_base=rb_greedy.a)\n"
        "a_hat_near = np.asarray(near.estimate_parameter(np.asarray(c_test).T))\n"
        "rows = {\n"
        "    \"inverse (harmonic)\": a_hat_inv.reshape(n_test, -1),\n"
        "    \"linear\": a_hat_lin.reshape(n_test, -1),\n"
        "    \"nearest snapshot\": a_hat_near.reshape(n_test, -1),\n"
        "    \"random forest\": a_hat_tree,\n"
        "}\n"
        "for nm, ah in rows.items():\n"
        "    le = np.abs(np.log(np.abs(ah) + 1e-30) - np.log(true_flat)).mean()\n"
        "    print(f\"{nm:20s} mean |log a_hat - log a| = {le:.2f}\")\n"
    )],
))

# --- G. dashboards section before the pipeline section ---
inserts.append((
    "## 8. The end-to-end pipeline",
    [md(
        "## Interactive dashboards\n\n"
        "The reference ships five ipywidgets dashboards\n"
        "(functions4notebooks.py); the TPU edition keeps all of them (plus a\n"
        "working combined `visualize_all` — the reference's is broken by a\n"
        "scoping bug at :488).  They need a live notebook front-end: run this\n"
        "section interactively to drag sliders; executed headlessly the cells\n"
        "just display the widget containers."
    ),
     code(
        "from romhighcontrast_tpu.viz import dashboards as dash\n"
        "\n"
        "reduced_basis_dict = {k: np.asarray(v.basis) for k, v in bases.items()}\n"
        "sampler_dict = {k: MEASUREMENT_SAMPLERS[k]\n"
        "                for k in (\"Random\", \"Sobol-points\", \"Optimal\")}\n"
        "estimator_dict = {k: STATE_ESTIMATORS[k]\n"
        "                  for k in (\"least-squares\", \"PBDW\")}\n"
        "dash.vizualize_approximations(sm, sampler_dict, reduced_basis_dict,\n"
        "                              estimator_dict, a_min, a_max,\n"
        "                              max_vn_dim=n_rb)\n"
    ),
     code(
        "# error-vs-n convergence with the basis family as the multi-select\n"
        "dash.visualize_convergence(sm, u_test, sampler_dict,\n"
        "                           reduced_basis_dict, estimator_dict, n_rb)\n"
    ),
     code(
        "# same loop, varying the estimation method / the sensor design\n"
        "dash.visualize_state_estimation_methods(sm, u_test, sampler_dict,\n"
        "                                        reduced_basis_dict,\n"
        "                                        estimator_dict, n_rb)\n"
        "dash.visualize_samplers(sm, u_test, sampler_dict, reduced_basis_dict,\n"
        "                        estimator_dict, n_rb)\n"
    ),
     code(
        "# the combined dashboard: (estimator x sampler) curve families\n"
        "dash.visualize_all(sm, u_test, sampler_dict, reduced_basis_dict,\n"
        "                   estimator_dict, n_rb)\n"
    )],
))

# --- H. online-serving demo in section 9 ---
inserts.append((
    "## 9. Where to go from here",
    [md(
        "### Bonus: the TPU serving path\n\n"
        "Once a basis is fixed, the online phase is precompute-once /\n"
        "serve-many: `OnlineGalerkin` pre-contracts the reduced affine family\n"
        "`F_q = V K_q V^T` so each request is one fused small-system program\n"
        "(the reference re-contracts the dense operators per call,\n"
        "SolutionsManagers.py:88-106)."
    ),
     code(
        "from romhighcontrast_tpu.rom.online import OnlineGalerkin\n"
        "import time as _time\n"
        "\n"
        "online = OnlineGalerkin(sm, bases[\"Greedy\"].basis[:n_rb])\n"
        "u_on = online.solve(jnp.asarray(a_test))   # lifted (b, dim)\n"
        "t0 = _time.time(); u_on = online.solve(jnp.asarray(a_test))\n"
        "float(jnp.sum(u_on)); dt = _time.time() - t0\n"
        "err_on = float(jnp.max(sm.h10_norm(u_on - u_test) / h1_test))\n"
        "print(f\"online ROM: {n_test} solves in {dt*1e3:.1f} ms, \"\n"
        "      f\"max rel H1 error vs FOM truth {err_on:.2e}\")\n"
    )],
))

for snippet, new_cells in inserts:
    idx = None
    for i, c in enumerate(cells):
        if snippet in "".join(c["source"]):
            idx = i
            break
    assert idx is not None, snippet
    if snippet.startswith("## "):  # insert BEFORE section-heading markers
        pos = idx
    else:
        pos = idx + 1
    cells[pos:pos] = new_cells

nb["cells"] = cells
json.dump(nb, open(P, "w"), indent=1)
code_n = sum(1 for c in cells if c["cell_type"] == "code")
print(f"{len(cells)} cells, {code_n} code")

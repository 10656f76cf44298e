"""Execute the shipped notebooks' code cells headlessly in the DEFAULT
suite.

``ROMHC_NB_FAST=1`` flips every notebook config to a tiny variant (both
notebooks read the flag in their setup cell), so full execution takes
seconds on the CPU backend.  The committed notebooks additionally ship with
stored outputs from a full-config run (see docs/parity)."""

import json
import os
from pathlib import Path

import pytest

NOTEBOOKS = sorted(
    (Path(__file__).resolve().parents[1] / "notebooks").glob("*.ipynb")
)


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_executes(path, tmp_path, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    monkeypatch.setenv("ROMHC_NB_FAST", "1")
    monkeypatch.setenv("ROMHC_RESULTS_PATH", str(tmp_path))
    cells = [
        "".join(c["source"])
        for c in json.loads(path.read_text())["cells"]
        if c["cell_type"] == "code"
    ]
    import matplotlib.pyplot as plt

    scope = {}
    for i, src in enumerate(cells):
        exec(compile(src, f"{path.name}:cell{i}", "exec"), scope)
        # headless run renders nothing: close per cell so the tutorial's
        # per-n figure loops don't accumulate >20 open figures (warning)
        plt.close("all")


def test_notebooks_ship_with_outputs():
    """The committed notebooks must carry executed outputs (the reference's
    tutorial renders with outputs; ours must too)."""
    for path in NOTEBOOKS:
        nb = json.loads(path.read_text())
        n_out = sum(
            1 for c in nb["cells"]
            if c["cell_type"] == "code" and c.get("outputs")
        )
        n_code = sum(1 for c in nb["cells"] if c["cell_type"] == "code")
        assert n_code > 0
        # many cells are assignment-only (no repr/figure); a two-thirds
        # majority with stored outputs matches the reference's fully
        # rendered tutorial artifact (round-4 bar, raised from n//3)
        assert n_out >= (2 * n_code) // 3, (
            f"{path.name}: only {n_out}/{n_code} code cells have outputs"
        )

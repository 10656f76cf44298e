"""Execute the shipped notebooks' code cells headlessly (gated: slow).

Enable with ROMHC_RUN_NOTEBOOK_TESTS=1 — both notebooks are also executed
manually as part of the release checks (see .claude/skills/verify)."""

import json
import os
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("ROMHC_RUN_NOTEBOOK_TESTS", "0") != "1",
    reason="slow; set ROMHC_RUN_NOTEBOOK_TESTS=1",
)

NOTEBOOKS = sorted(
    (Path(__file__).resolve().parents[1] / "notebooks").glob("*.ipynb")
)


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_executes(path):
    import matplotlib

    matplotlib.use("Agg")
    os.environ.setdefault("ROMHC_RESULTS_PATH", "/tmp/nb_test_results")
    cells = [
        "".join(c["source"])
        for c in json.loads(path.read_text())["cells"]
        if c["cell_type"] == "code"
    ]
    scope = {}
    for i, src in enumerate(cells):
        exec(compile(src, f"{path.name}:cell{i}", "exec"), scope)

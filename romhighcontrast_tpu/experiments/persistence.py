"""Checkpointed experiment store.

Replaces the reference's joblib-compressed pickle dict
(reference: HighContrast.py:93-96,150,170,214) with a transparent,
pickle-free format: one ``.npz`` of flattened arrays + a JSON manifest.
Experiments re-enter idempotently — completed stages are skipped on reload —
which is the reference's (and this framework's) checkpoint/resume model.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

_SEP = "\x1f"  # unit separator — never appears in sane keys


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat):
    out = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


class ExperimentStore:
    """A nested dict of numpy arrays / scalars persisted to
    ``<folder>/data.npz`` (+ ``manifest.json`` with keys and shapes)."""

    def __init__(self, folder):
        self.folder = Path(folder)
        self.folder.mkdir(parents=True, exist_ok=True)
        self.path = self.folder / "data.npz"
        self.manifest_path = self.folder / "manifest.json"
        self.data: dict = {}
        if self.path.exists():
            self.load()

    def load(self) -> dict:
        with np.load(self.path, allow_pickle=False) as f:
            flat = {k: f[k] for k in f.files}
        # unwrap 0-d arrays back to scalars
        flat = {
            k: (v.item() if v.ndim == 0 else v) for k, v in flat.items()
        }
        self.data = _unflatten(flat)
        return self.data

    def save(self) -> None:
        flat = _flatten(self.data)
        arrays = {}
        for k, v in flat.items():
            arrays[k] = np.asarray(v)
        np.savez_compressed(self.path, **arrays)
        manifest = {
            k.replace(_SEP, "/"): list(np.shape(v)) for k, v in arrays.items()
        }
        self.manifest_path.write_text(json.dumps(manifest, indent=1))

    # dict-ish conveniences
    def __contains__(self, k):
        return k in self.data

    def __getitem__(self, k):
        return self.data[k]

    def __setitem__(self, k, v):
        self.data[k] = v

    def setdefault(self, k, v):
        return self.data.setdefault(k, v)

    def get(self, k, default=None):
        return self.data.get(k, default)

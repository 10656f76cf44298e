"""Checkpointed experiment store.

Replaces the reference's joblib-compressed pickle dict
(reference: HighContrast.py:93-96,150,170,214) with a transparent,
pickle-free format: one ``.npz`` of flattened arrays + a JSON manifest.
Experiments re-enter idempotently — completed stages are skipped on reload —
which is the reference's (and this framework's) checkpoint/resume model.
"""

from __future__ import annotations

import hashlib
import json
import zlib
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
    """A nested dict of numpy arrays / scalars persisted to disk.

    Backends:
      * ``"native"`` — one chunked zlib+crc32 file per array through the C++
        ``rhc_store`` library (``native/store.cpp``); index.json is the
        commit point.  ~10x faster checkpointing than npz on the single-core
        hosts driving the TPU.
      * ``"npz"`` — ``numpy.savez_compressed`` fallback (always available).
      * ``"auto"`` (default) — native when the library builds/loads.
    """

    def __init__(self, folder, backend: str = "auto"):
        from romhighcontrast_tpu import native

        self.folder = Path(folder)
        self.folder.mkdir(parents=True, exist_ok=True)
        self.path = self.folder / "data.npz"
        self.index_path = self.folder / "index.json"
        self.manifest_path = self.folder / "manifest.json"
        if backend == "auto":
            backend = "native" if native.available() else "npz"
        self.backend = backend
        self.data: dict = {}
        self._pending_index: dict | None = None
        self._atexit_registered = False
        #: per-key (shape, dtype, crc32) of the last persisted payloads —
        #: incremental saves skip unchanged arrays (the experiment driver
        #: checkpoints after every stage; re-compressing the multi-MB
        #: snapshot matrix 60x per experiment was the dominant host cost)
        self._sig: dict = {}
        if self.index_path.exists() and backend == "native":
            self.load()
        elif self.path.exists():
            self.load_npz()
        elif self.index_path.exists():
            self.load_native()

    def load(self) -> dict:
        self.finalize()
        if self.backend == "native" and self.index_path.exists():
            return self.load_native()
        return self.load_npz()

    def load_npz(self) -> dict:
        with np.load(self.path, allow_pickle=False) as f:
            flat = {k: f[k] for k in f.files}
        flat = {k: (v.item() if v.ndim == 0 else v) for k, v in flat.items()}
        self.data = _unflatten(flat)
        return self.data

    def load_native(self) -> dict:
        from romhighcontrast_tpu import native

        index = json.loads(self.index_path.read_text())
        flat = {}
        for key, fname in index.items():
            arr = native.load_array(self.folder / "arrays" / fname)
            # older stores used "/"-joined keys; current stores keep the raw
            # separator (JSON-safe), so user keys containing "/" round-trip
            key = key.replace("/", _SEP) if _SEP not in key else key
            flat[key] = arr.item() if arr.ndim == 0 else arr
        self.data = _unflatten(flat)
        return self.data

    def save(self, wait: bool = True) -> None:
        """Persist the store.

        ``wait=False`` (native backend only) hands the compression to the
        C++ background writer thread and returns immediately — overlapping
        the single host core's zlib work with the next stage's device
        compute.  ``index.json`` is the commit point and is only written
        once the queued writes are durable (at the next ``save``/``load``,
        an explicit :meth:`finalize`, or interpreter exit), so a crash
        mid-write simply re-runs the stage instead of loading corrupt data.
        """
        self.finalize()  # commit any previous asynchronous save first
        flat = {k: np.asarray(v) for k, v in _flatten(self.data).items()}
        if self.backend == "native":
            from romhighcontrast_tpu import native

            adir = self.folder / "arrays"
            adir.mkdir(exist_ok=True)
            index = {}
            pending_sigs = {}
            for k, v in flat.items():
                # stable per-key filename so incremental saves can keep
                # unchanged payload files in place
                fname = hashlib.sha1(k.encode()).hexdigest()[:16] + ".rhc"
                v = np.ascontiguousarray(v)
                sig = (v.shape, v.dtype.str, zlib.crc32(v.data))
                if self._sig.get(k) == sig and (adir / fname).exists():
                    index[k] = fname  # unchanged since last persisted save
                    continue
                if wait:
                    native.save_array(adir / fname, v)
                    self._sig[k] = sig
                else:
                    native.save_array_async(adir / fname, v)
                    # signature commits only once the write is durable: a
                    # failed flush must not leave a sig that lets a retry
                    # skip rewriting a stale payload file
                    pending_sigs[k] = sig
                index[k] = fname  # raw separator-joined key (JSON-safe)
            if wait:
                self.index_path.write_text(json.dumps(index, indent=1))
            else:
                self._pending_index = index
                self._pending_sigs = pending_sigs
                if not self._atexit_registered:
                    import atexit

                    atexit.register(self.finalize)
                    self._atexit_registered = True
        else:
            np.savez_compressed(self.path, **flat)
        manifest = {
            k.replace(_SEP, "/"): list(np.shape(v)) for k, v in flat.items()
        }
        self.manifest_path.write_text(json.dumps(manifest, indent=1))

    def finalize(self) -> None:
        """Wait for queued asynchronous writes and commit their index.

        The pending index is cleared BEFORE the flush: if any write failed,
        the raise discards the commit entirely (the stage re-runs next time)
        instead of a later retry committing an index that references files
        whose writes failed."""
        if self._pending_index is None:
            return
        pending, self._pending_index = self._pending_index, None
        sigs, self._pending_sigs = getattr(self, "_pending_sigs", {}), {}
        from romhighcontrast_tpu import native

        native.flush()  # raises on any failed write -> commit discarded
        self.index_path.write_text(json.dumps(pending, indent=1))
        self._sig.update(sigs)

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

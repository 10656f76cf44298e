"""ctypes bindings for the native runtime components (``native/``).

``rhc_store``: chunked zlib-compressed, crc32-checksummed array files used by
the persistence layer for the large snapshot/basis arrays.  Built on demand
with g++ (single translation unit, ~1s); everything degrades gracefully to
the pure-numpy path when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import json
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent.parent / "native" / "store.cpp"
_LIB = Path(__file__).parent.parent / "native" / "librhc_store.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-pthread", str(_SRC),
             "-o", str(_LIB), "-lz"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native store library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() and not (_SRC.exists() and _build()):
        return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    if not hasattr(lib, "rhc_save_async"):
        # stale library from an older store.cpp (missing the async writer):
        # rebuild once; degrade to the npz fallback if that is impossible
        if not (_SRC.exists() and _build()):
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        if not hasattr(lib, "rhc_save_async"):
            return None
    lib.rhc_save.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.c_int,
    ]
    lib.rhc_save.restype = ctypes.c_int
    lib.rhc_save_async.argtypes = lib.rhc_save.argtypes
    lib.rhc_save_async.restype = ctypes.c_int
    lib.rhc_flush.argtypes = []
    lib.rhc_flush.restype = ctypes.c_int
    lib.rhc_pending.argtypes = []
    lib.rhc_pending.restype = ctypes.c_int
    lib.rhc_peek.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64)]
    lib.rhc_peek.restype = ctypes.c_int
    lib.rhc_load.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.rhc_load.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def save_array(path, arr: np.ndarray, level: int = 1) -> None:
    """Persist one array as ``<path>`` (payload) + ``<path>.json`` (meta)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native store unavailable")
    arr = np.asarray(arr)
    shape = list(arr.shape)  # before ascontiguousarray, which promotes 0-d to 1-d
    arr = np.ascontiguousarray(arr)
    rc = lib.rhc_save(
        str(path).encode(),
        arr.ctypes.data_as(ctypes.c_void_p),
        arr.nbytes,
        level,
    )
    if rc != 0:
        raise IOError(f"rhc_save({path}) failed with code {rc}")
    Path(f"{path}.json").write_text(
        json.dumps({"dtype": arr.dtype.str, "shape": shape})
    )


def save_array_async(path, arr: np.ndarray, level: int = 1) -> None:
    """Enqueue one array save on the native background writer thread.

    The payload is copied before returning, so the caller may mutate or free
    the array immediately.  The writer writes ``<path>.tmp`` and renames on
    success; call :func:`flush` to wait for durability and surface errors.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native store unavailable")
    arr = np.asarray(arr)
    shape = list(arr.shape)
    arr = np.ascontiguousarray(arr)
    rc = lib.rhc_save_async(
        str(path).encode(),
        arr.ctypes.data_as(ctypes.c_void_p),
        arr.nbytes,
        level,
    )
    if rc != 0:
        raise IOError(f"rhc_save_async({path}) failed with code {rc}")
    Path(f"{path}.json").write_text(
        json.dumps({"dtype": arr.dtype.str, "shape": shape})
    )


def flush() -> None:
    """Wait for all queued asynchronous saves; raise on any write failure."""
    lib = get_lib()
    if lib is None:
        return
    rc = lib.rhc_flush()
    if rc != 0:
        raise IOError(f"async checkpoint write failed with code {rc}")


def pending() -> int:
    """Queued + in-flight asynchronous saves."""
    lib = get_lib()
    return 0 if lib is None else int(lib.rhc_pending())


def load_array(path) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native store unavailable")
    meta = json.loads(Path(f"{path}.json").read_text())
    out = np.empty(tuple(meta["shape"]), dtype=np.dtype(meta["dtype"]))
    nbytes = ctypes.c_uint64()
    rc = lib.rhc_peek(str(path).encode(), ctypes.byref(nbytes))
    if rc != 0 or nbytes.value != out.nbytes:
        raise IOError(f"rhc_peek({path}) failed (rc={rc}, {nbytes.value} bytes)")
    rc = lib.rhc_load(
        str(path).encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    if rc != 0:
        raise IOError(f"rhc_load({path}) failed with code {rc} (5 = crc mismatch)")
    return out

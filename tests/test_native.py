"""Native (C++) array store: build, roundtrip, corruption detection,
persistence-backend integration, and speed sanity."""

import json
import time

import numpy as np
import pytest

import romhighcontrast_tpu  # noqa: F401
from romhighcontrast_tpu import native
from romhighcontrast_tpu.experiments.persistence import ExperimentStore

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_roundtrip_dtypes(tmp_path):
    rng = np.random.default_rng(0)
    for arr in [
        rng.standard_normal((137, 211)),
        rng.standard_normal((5,)).astype(np.float32),
        np.arange(10, dtype=np.int64),
        np.float64(3.25).reshape(()),
        np.zeros((0, 4)),
    ]:
        p = tmp_path / "x.rhc"
        native.save_array(p, arr)
        out = native.load_array(p)
        assert out.dtype == arr.dtype and out.shape == arr.shape
        np.testing.assert_array_equal(out, arr)


def test_crc_detects_corruption(tmp_path):
    arr = np.arange(4096, dtype=np.float64)
    p = tmp_path / "x.rhc"
    native.save_array(p, arr, level=0)  # raw so we can flip payload bytes
    raw = bytearray(p.read_bytes())
    raw[-5] ^= 0xFF
    p.write_bytes(bytes(raw))
    with pytest.raises(IOError, match="crc"):
        native.load_array(p)


def test_store_native_backend_roundtrip(tmp_path):
    store = ExperimentStore(tmp_path / "exp", backend="native")
    store["solutions"] = np.arange(12.0).reshape(3, 4)
    store["nested"] = {"t": 2.5, "err": {"1": np.array([0.125])}}
    store.save()
    again = ExperimentStore(tmp_path / "exp", backend="native")
    np.testing.assert_array_equal(again["solutions"], store["solutions"])
    assert again["nested"]["t"] == 2.5
    np.testing.assert_array_equal(again["nested"]["err"]["1"], [0.125])
    # index.json is the commit point and readable
    idx = json.loads((tmp_path / "exp" / "index.json").read_text())
    assert any(k.startswith("solutions") for k in idx)


def test_native_async_foreground_latency(tmp_path):
    """The reason this component exists: checkpoint latency on 1-core hosts.

    The native backend's promise is NOT that its zlib is faster than
    numpy's (same library, same core) but that ``save(wait=False)`` hands
    compression to the C++ background writer and returns after only a
    crc32 pass + enqueue — so the driver overlaps checkpointing with the
    next stage's device compute.  Comparing two synchronous compressions
    is a coin flip under host load; the foreground-vs-compression gap is
    deterministic, so that is what we assert (with a generous margin).
    """
    arr = np.random.default_rng(1).standard_normal((2000, 2000))
    s_npz = ExperimentStore(tmp_path / "npz", backend="npz")
    s_nat = ExperimentStore(tmp_path / "nat", backend="native")
    s_npz["solutions"] = arr
    s_nat["solutions"] = arr
    t0 = time.time()
    s_npz.save()  # synchronous: full zlib compression of 32 MB
    t_npz = time.time() - t0
    t0 = time.time()
    s_nat.save(wait=False)  # foreground: crc32 + enqueue only
    t_fg = time.time() - t0
    s_nat.finalize()  # durability unaffected: flush + index commit
    assert t_fg < t_npz / 2, (t_fg, t_npz)
    # and the async path really persisted the payload
    again = ExperimentStore(tmp_path / "nat", backend="native")
    np.testing.assert_array_equal(again["solutions"], arr)


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
def test_async_save_flush_roundtrip(tmp_path):
    """Async saves are durable after flush and bitwise-identical on load."""
    rng = np.random.default_rng(3)
    arrays = {f"a{i}": rng.standard_normal((64, 97)) for i in range(5)}
    for name, arr in arrays.items():
        native.save_array_async(tmp_path / name, arr)
    native.flush()
    assert native.pending() == 0
    for name, arr in arrays.items():
        np.testing.assert_array_equal(native.load_array(tmp_path / name), arr)
    # no stray .tmp files survive
    assert not list(tmp_path.glob("*.tmp"))


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
def test_store_async_save_commits_on_finalize(tmp_path):
    """save(wait=False) defers the index commit: a fresh store only sees the
    data once finalize (or the next save/load) ran."""
    store = ExperimentStore(tmp_path / "exp", backend="native")
    store["x"] = np.arange(10.0)
    store.save(wait=False)
    store.finalize()
    fresh = ExperimentStore(tmp_path / "exp", backend="native")
    np.testing.assert_array_equal(fresh["x"], np.arange(10.0))
    # a second async save is committed implicitly by the next save()
    store["y"] = np.ones(3)
    store.save(wait=False)
    store["z"] = np.zeros(2)
    store.save()
    fresh = ExperimentStore(tmp_path / "exp", backend="native")
    assert "y" in fresh.data and "z" in fresh.data


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
def test_incremental_save_skips_unchanged_arrays(tmp_path):
    """Repeated saves only rewrite changed payloads (stable per-key files),
    and the reloaded store always reflects the latest data."""
    store = ExperimentStore(tmp_path / "exp", backend="native")
    store["big"] = np.arange(50000.0)
    store["small"] = np.ones(4)
    store.save()
    adir = tmp_path / "exp" / "arrays"
    mtimes = {f.name: f.stat().st_mtime_ns for f in adir.glob("*.rhc")}
    # change only 'small'; 'big' must not be rewritten
    store["small"] = np.zeros(4)
    store.save()
    changed = [f.name for f in adir.glob("*.rhc")
               if mtimes.get(f.name) != f.stat().st_mtime_ns]
    assert len(changed) == 1
    fresh = ExperimentStore(tmp_path / "exp", backend="native")
    np.testing.assert_array_equal(fresh["small"], np.zeros(4))
    np.testing.assert_array_equal(fresh["big"], np.arange(50000.0))
    # async path: same skip semantics through finalize
    store["big"] = np.arange(50000.0) * 2.0
    store.save(wait=False)
    store.finalize()
    fresh = ExperimentStore(tmp_path / "exp", backend="native")
    np.testing.assert_array_equal(fresh["big"], np.arange(50000.0) * 2.0)

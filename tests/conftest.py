"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware.

Note: this environment's ``sitecustomize`` imports jax at interpreter startup
with ``JAX_PLATFORMS=axon`` (the TPU tunnel).  Backend selection is lazy, so
explicitly overriding the env vars here (NOT ``setdefault`` — the profile
pre-sets them) still wins as long as no array op ran yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# DISABLE the persistent compilation cache for the suite: the XLA:CPU
# executable (de)serialization in this jax build is unreliable — observed
# 2026-08-20: SIGSEGV inside compilation_cache.get_executable_and_time
# loading entries AOT-compiled on a host with different CPU features (the
# loader warns "+prefer-no-scatter is not supported ... may lead to
# SIGILL"), and a SIGSEGV inside put_executable_and_time late in a long
# suite run even with a fresh per-session cache dir.  The suite gains
# nothing from cross-process caching; correctness first.
os.environ["ROMHC_JAX_CACHE"] = ""

# jax was already imported by sitecustomize with JAX_PLATFORMS=axon baked
# into its config; override through the config API (backends are still
# uninitialised at conftest import, so this wins).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    assert jax.default_backend() == "cpu", (
        "tests must run on the CPU backend; got " + jax.default_backend()
    )
    assert len(jax.devices()) == 8, jax.devices()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    jax's pjit cache retains every compiled program for the process
    lifetime; the full suite compiles ~700 programs and the accumulated
    executables push the process past this host's commit limit
    (CommitLimit ~63 GB, vm.overcommit_memory=0) late in the run —
    observed as MemoryError in pytest's assertion rewriter and SIGSEGVs
    inside XLA:CPU compiles around test ~190 (2026-08-20).  Per-module
    clearing keeps within-module reuse and bounds the peak."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


def pytest_collection_modifyitems(config, items):
    """Run the heaviest-compile module FIRST.

    XLA:CPU's in-process LLVM compile has been observed to SIGSEGV
    compiling the large fused-kernel programs (the three-level solver
    jits) only LATE in a long suite process (~700 compiled programs in;
    the same tests pass standalone and in subsets — observed 3/3 full
    runs on 2026-08-20, crash frames in backend_compile_and_load /
    compilation-cache (de)serialization).  Compiling the big programs
    while the process is young sidesteps the failure mode."""
    front = [it for it in items if "test_twolevel" in it.nodeid]
    rest = [it for it in items if "test_twolevel" not in it.nodeid]
    items[:] = front + rest

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

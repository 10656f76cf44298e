"""Global configuration: precision, paths, constants.

Replaces the reference's path-only ``src/config.py`` (reference: src/config.py:1-8)
and its module-level constants (``INFINIT_A`` at src/lib/ReducedBasis.py:11,
``MachinePrecision`` at src/experiments/HighContrast.py:19).
"""

from __future__ import annotations

import os
from pathlib import Path

#: Stand-in for an infinite diffusion coefficient (reference: ReducedBasis.py:11).
INFINIT_A = 1e10

#: Error floor used when fitting convergence rates
#: (reference: HighContrast.py:19).
MACHINE_PRECISION = 1e-13

project_root = Path(__file__).parent.parent
data_path = Path(os.environ.get("ROMHC_DATA_PATH", project_root / "data"))
results_path = Path(os.environ.get("ROMHC_RESULTS_PATH", project_root / "results"))

_setup_done = False


def setup(enable_x64: bool | None = None) -> None:
    """Configure JAX for the framework.

    float64 is mandatory for contrast up to ``INFINIT_A``: the FOM stiffness
    matrix condition number scales like ``contrast / h^2`` (~1e13 at the paper
    configuration), far beyond float32's ~7 digits.  On TPU, float64 is
    emulated by XLA; the performance-critical paths (stencil matvecs, CG) are
    bandwidth-bound where the emulation penalty is modest.

    Set ``ROMHC_DISABLE_X64=1`` to opt out (e.g. for low-contrast studies).
    """
    global _setup_done
    if _setup_done:
        return
    import jax

    if enable_x64 is None:
        enable_x64 = os.environ.get("ROMHC_DISABLE_X64", "0") != "1"
    if enable_x64:
        jax.config.update("jax_enable_x64", True)
    # Persistent compilation cache: TPU compiles (especially emulated-f64
    # while_loops) are expensive; cache them across processes/runs.
    # ``ROMHC_JAX_CACHE=`` (empty) disables it — the XLA:CPU executable
    # (de)serialization in this jax build is unreliable (observed
    # SIGSEGVs in put/get_executable_and_time during long CPU suites, and
    # SIGILL-class loads of entries AOT-compiled on hosts with different
    # CPU features); the test suite disables it via conftest.
    cache_dir = os.environ.get(
        "ROMHC_JAX_CACHE", str(Path.home() / ".cache" / "romhc_jax")
    )
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # older jax without these flags
            pass
    _setup_done = True


def default_dtype():
    import jax
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

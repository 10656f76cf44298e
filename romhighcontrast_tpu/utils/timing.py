"""Tracing/profiling utilities.

Covers the reference's aux tracing surface — the ``calculate_time`` decorator
(reference: HighContrast.py:67-78) — plus device-aware timing (blocks on
async dispatch) and an optional XLA profiler trace hook.
"""

from __future__ import annotations

import contextlib
import inspect
import time
from typing import Callable


def get_not_default_args_names(f: Callable):
    """Names of parameters without defaults (reference: HighContrast.py:33-34)."""
    return [
        k for k, v in inspect.signature(f).parameters.items()
        if v.default is inspect.Parameter.empty
    ]


def block(x):
    """Block until device computation backing x (pytree) is done."""
    import jax

    try:
        jax.block_until_ready(x)
    except Exception:
        pass
    return x


def calculate_time(func: Callable, verbose: bool = True):
    """Wrap ``func`` to return ``(seconds, result)``; device-aware
    (reference: calculate_time, HighContrast.py:67-78)."""

    def wrapped(*args, **kwargs):
        if verbose:
            print(f"calculating {func.__name__}")
        t0 = time.time()
        res = block(func(*args, **kwargs))
        t = time.time() - t0
        if verbose:
            print(f"time spent: {t}")
        return t, res

    return wrapped


@contextlib.contextmanager
def device_timer():
    """Context manager measuring wall time of device work issued inside.

    Usage::

        with device_timer() as t:
            out = block(f(x))
        print(t())
    """
    t0 = time.time()
    elapsed = {}
    yield lambda: elapsed.get("t", time.time() - t0)
    elapsed["t"] = time.time() - t0


@contextlib.contextmanager
def xla_trace(logdir: str | None):
    """Capture an XLA profiler trace (view with TensorBoard/XProf); no-op
    when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

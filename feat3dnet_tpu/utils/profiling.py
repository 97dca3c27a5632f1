"""Profiling helpers.

Covers the reference's (unused) @time_function decorator (utils.py:5-15)
and adds what it lacked: real device profiling via jax.profiler traces and
a readback-synchronized timer that works through the remote-TPU tunnel
(block_until_ready alone does not synchronize there).
"""
from __future__ import annotations

import contextlib
import functools
import logging
import time
from typing import Callable

import jax
import numpy as np


def time_function(fn: Callable) -> Callable:
    """Log wall time of each call (reference utils.py:5-15 equivalent)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.time()
        out = fn(*args, **kwargs)
        logging.getLogger("feat3dnet_tpu.timing").debug(
            "%s took %.3f s", fn.__name__, time.time() - t0)
        return out

    return wrapper


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_device_call(fn: Callable, *args, repeats: int = 5) -> float:
    """Median seconds per call, synchronized by a scalar host readback (a
    sum over the first output leaf) — robust against async dispatch AND
    remote backends where block_until_ready returns early."""
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).sum())  # warm-up / compile
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).sum())
        times.append(time.time() - t0)
    return float(np.median(times))

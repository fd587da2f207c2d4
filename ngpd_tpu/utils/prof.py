"""Profiling and timing harness.

The reference wires a PyTorchProfiler with a TensorBoard trace handler
into its trainer (Manager.py:37-43) and scatters timeit cells across
notebooks (algorithm_tests.ipynb). TPU equivalents:

  * ``profile_trace`` — jax.profiler traces (Perfetto/XPlane files a
    TensorBoard or xprof instance can open);
  * ``time_fn`` — block_until_ready wall-clock timing with warm-up, the
    disciplined version of the notebooks' %timeit;
  * ``Timer`` — context-manager stopwatch for host phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class Timer:
    def __init__(self, name: str = "", verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose:
            print(f"[{self.name}] {self.elapsed:.3f}s")


def time_fn(fn: Callable, *args, repeats: int = 3, warmup: int = 1, **kw):
    """Best wall-clock over repeats, with jit warm-up and device sync."""

    def sync(x):
        for leaf in jax.tree_util.tree_leaves(x):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
        return x

    for _ in range(warmup):
        sync(fn(*args, **kw))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/ngpd_trace"):
    """Capture a device trace around a block (jax.profiler)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

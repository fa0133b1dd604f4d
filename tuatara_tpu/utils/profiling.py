"""Tracing / profiling utilities.

The reference's only measurement apparatus is a single end-to-end wall-clock
print (tuatara.cpp:331, 507-509) plus progress lines on stdout. Here every
engine run records per-stage wall time (OcrEngine.last_timings) and wraps
each stage in a `jax.profiler.TraceAnnotation` so device traces attribute
time to detect/recognize/decode; this module adds the user-facing trace
capture and honest-timing helpers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Iterator, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile viewable in TensorBoard/XProf.

        with profiling.trace("/tmp/tuatara_trace"):
            engine.run_pages(pages)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Accumulating wall-clock stage timer with honest device fencing.

    `block=True` fetches a leaf of the result to the host before stopping the
    clock — on asynchronous backends `block_until_ready` alone can return
    before remote execution finishes, so a D2H sync is the only trustworthy
    fence (observed on this environment's tunneled TPU).
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_s": v / self.counts[k]}
            for k, v in self.totals.items()
        }


def timeit(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> Dict[str, float]:
    """Honest latency of a jitted function: forces a D2H fetch per
    iteration (see StageTimer docstring)."""
    for _ in range(warmup):
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters": iters}

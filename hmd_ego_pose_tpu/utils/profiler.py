"""Profiling utilities: jax.profiler traces and per-stage latency histograms.

Replaces the reference's ad-hoc time.time()/Stopwatch instrumentation
(pytorch-sandbox/train.py:159, unity-sandbox/.../Program.cs:130-134) with
structured tooling: XLA-level traces viewable in TensorBoard/Perfetto, and a
histogram helper for serving-stage latencies.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterable, List

import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str = "profile"):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def latency_histogram(samples_ms: Iterable[float], bins: int = 20) -> Dict[str, object]:
    """Summary + histogram of latency samples for structured logging."""
    arr = np.asarray(list(samples_ms), dtype=np.float64)
    if arr.size == 0:
        return {"count": 0}
    hist, edges = np.histogram(arr, bins=bins)
    return {
        "count": int(arr.size),
        "mean_ms": float(arr.mean()),
        "p50_ms": float(np.percentile(arr, 50)),
        "p90_ms": float(np.percentile(arr, 90)),
        "p99_ms": float(np.percentile(arr, 99)),
        "max_ms": float(arr.max()),
        "hist_counts": hist.tolist(),
        "hist_edges_ms": [float(e) for e in edges],
    }


class StageTimer:
    """Accumulates named stage latencies (serving loop instrumentation)."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples.setdefault(name, []).append((time.perf_counter() - t0) * 1000)

    def report(self) -> Dict[str, Dict[str, object]]:
        return {name: latency_histogram(vals) for name, vals in self.samples.items()}

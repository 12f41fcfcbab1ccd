"""Observability: per-stage timers, rolling latency stats, jax.profiler hooks.

The reference's only latency surface is a wall-clock caption in the UI
(app/app_product_search.py:401-404; SURVEY.md §5 'tracing: effectively
none'). This module provides the production version:

  StageTimer    with-block timing of named pipeline stages -> dict
  LatencyStats  lock-free-ish rolling reservoir -> p50/p95/p99/qps
  device_trace  context manager around jax.profiler.trace for XLA/TPU
                timelines viewable in TensorBoard/Perfetto
"""
from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict, Iterator, Optional

import numpy as np


class StageTimer:
    """Accumulates wall-clock per named stage (reentrant-safe per instance)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_ms": round(self.totals[name] * 1e3, 3),
                "count": self.counts[name],
                "mean_ms": round(self.totals[name] / self.counts[name] * 1e3, 3),
            }
            for name in self.totals
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


class LatencyStats:
    """Rolling reservoir of request latencies with percentile summary."""

    def __init__(self, capacity: int = 4096):
        self._buf = np.zeros(capacity, np.float64)
        self._n = 0
        self._start = time.perf_counter()
        self._lock = threading.Lock()

    def record(self, seconds: float) -> None:
        with self._lock:
            self._buf[self._n % len(self._buf)] = seconds
            self._n += 1

    def summary(self) -> Dict[str, float]:
        with self._lock:
            n = min(self._n, len(self._buf))
            if n == 0:
                return {"count": 0}
            lat = np.sort(self._buf[:n])
            elapsed = time.perf_counter() - self._start
            return {
                "count": self._n,
                "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 3),
                "p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 3),
                "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 3),
                "mean_ms": round(float(lat.mean()) * 1e3, 3),
                "qps": round(self._n / elapsed, 2) if elapsed > 0 else 0.0,
            }


@contextlib.contextmanager
def device_trace(log_dir: str, *, host_profile: bool = False) -> Iterator[None]:
    """XLA/TPU profiler trace around a block (view in TensorBoard/Perfetto).

    No-ops gracefully if the profiler cannot start (e.g. already active)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir, create_perfetto_link=False,
                                 create_perfetto_trace=host_profile)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield

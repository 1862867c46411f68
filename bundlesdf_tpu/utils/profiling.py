"""Tracing / profiling utilities.

Replaces the reference's `CUDATimer` (BundleTrack/src/cuda/CUDATimer.h:1-121
— named GPU-event spans with an aggregate report) with host wall-clock spans
that block on device work, plus hooks into `jax.profiler` for deep traces.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax


class Timer:
    """Named-span timer with aggregate reporting (CUDATimer equivalent).

    Usage:
        timer = Timer()
        with timer.span("ba"):
            ...device work...
        print(timer.report())
    """

    def __init__(self, enabled: bool = True, sync: bool = True):
        self.enabled = enabled
        self.sync = sync
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        if self.sync:
            jax.effects_barrier()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["=== timer report ==="]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:30s} total {tot*1e3:9.1f}ms  "
                         f"calls {n:5d}  mean {tot/n*1e3:8.2f}ms")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info(f"profiler trace written to {log_dir}")

"""Profiling/tracing: jax.profiler wiring + lightweight step timers.

The reference has no instrumentation beyond tqdm bars (SURVEY.md §5.1;
torch-tb-profiler is installed but never imported). Here tracing is a
first-class context manager around any jitted region, and StepTimer gives
device-synchronized per-step wall times without a profiler."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard or Perfetto).

    Usage:
        with trace("runs/profile"):
            out = step(state, batch)
            jax.block_until_ready(out)
    """
    jax.profiler.start_trace(
        log_dir, create_perfetto_trace=False
    )
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Device-synchronized wall-clock timer with warmup discard and
    percentile summary, for multi-second measured regions.

    Sync caveat: block_until_ready over the axon tunnel can return EARLY
    on small programs (a ~6 ms forward "measured" 1.1 ms) — for
    sub-100 ms micro-probes sync with jax.device_get(out.ravel()[0])
    instead, as bench.py does; this timer is only trustworthy when the
    timed region is long enough that a premature unblock is noise."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list = []
        self._seen = 0

    @contextlib.contextmanager
    def measure(self, result_getter=None):
        """Time the with-block. Pass result_getter=lambda: out to block on
        the device result before the clock stops — without it only dispatch
        time is measured (jitted calls return before the step finishes)."""
        t0 = time.perf_counter()
        yield
        if result_getter is not None:
            jax.block_until_ready(result_getter())
        elapsed = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(elapsed)

    def time_fn(self, fn, *args, repeats: int = 3):
        """Run fn(*args) repeats+warmup times, blocking on the result."""
        for _ in range(self.warmup + repeats):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            elapsed = time.perf_counter() - t0
            self._seen += 1
            if self._seen > self.warmup:
                self.times.append(elapsed)
        return out

    def summary(self) -> dict:
        if not self.times:
            return {"count": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "count": n,
            "min_s": ts[0],
            "median_s": ts[n // 2],
            "mean_s": sum(ts) / n,
            "max_s": ts[-1],
        }

"""Tracing/profiling hooks (SURVEY §5.1).

The reference has nothing beyond TensorBoard; here: ``jax.profiler`` trace
annotations around the hot regions (train step, Gibbs kernel, NADE sweep),
on-demand program-level traces viewable in TensorBoard/Perfetto, and
block_until_ready-bracketed step timers feeding the §6 metric axes
(steps/sec/chip, Gibbs sweeps/s, generation latency) → BASELINE.md/bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (no-op overhead when not tracing)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a full profiler trace to ``log_dir`` (TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer for jitted steps. ``lap`` blocks on the given arrays
    (block_until_ready) so device time is actually counted. Keeps a running
    mean excluding the first (compile) lap."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def lap(self, *block_on) -> float:
        for x in block_on:
            jax.block_until_ready(x)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self._t0 = time.perf_counter()
        return dt

    @property
    def mean(self) -> float:
        xs = self.times[1:] if len(self.times) > 1 else self.times
        return sum(xs) / max(len(xs), 1)

    def rate(self, units_per_step: float) -> float:
        return units_per_step / self.mean if self.mean else float("inf")


def timeit(fn, *args, iters: int = 10, warmup: int = 2) -> Dict[str, float]:
    """Benchmark a compiled callable: returns mean/min seconds per call."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {"mean_s": sum(times) / len(times), "min_s": min(times),
            "iters": iters}

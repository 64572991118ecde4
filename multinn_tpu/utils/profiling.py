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
    """Wall-clock timer for jitted steps. ``lap`` syncs on the given arrays
    (:func:`force` — value fetch, the only reliable completion barrier on
    the axon backend) so device time is actually counted. Keeps a running
    mean excluding the first (compile) lap."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def lap(self, *block_on) -> float:
        for x in block_on:
            force(x)
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


def force(out) -> None:
    """Block until ``out``'s computation has ACTUALLY completed.

    On this repo's tunneled-TPU backend (the experimental ``axon``
    platform), ``jax.block_until_ready`` can return before the execute RPC
    has even been issued: the client keeps a lazy execution queue, and
    whether a given program's dispatches are eager or deferred varies
    per process (measured 2026-08-17: identical argument-style programs
    "blocked" in 40 µs in one process and 24 ms in another; fetching the
    value afterwards paid the real ~100 ms of queued device work).
    Fetching a value to the host is the reliable sync — one element of the
    smallest output leaf keeps the transfer negligible while still
    requiring the whole execution (all outputs of one program share its
    completion). On CPU/GPU this is equivalent to block_until_ready plus
    one cheap transfer.
    """
    leaves = jax.tree_util.tree_leaves(out)
    if not leaves:
        return
    smallest = min(leaves, key=lambda l: getattr(l, "size", 0))
    if getattr(smallest, "size", 1) <= 16:
        jax.device_get(smallest)
    else:
        jax.device_get(smallest.ravel()[:1])


def timeit(fn, *args, iters: int = 10, warmup: int = 2) -> Dict[str, float]:
    """Benchmark a compiled callable: returns mean/min seconds per call.

    Each timed call is synced with :func:`force` (value fetch), not bare
    ``block_until_ready`` — see ``force``'s docstring for why that is not
    sufficient on the axon backend. The fetch adds one host round-trip
    (~25-30 ms here) to every call; per-step device numbers must therefore
    come from in-program amortization (scan of N steps) or the slope over
    program length, exactly as bench.py already does.
    """
    for _ in range(warmup):
        out = fn(*args)
    force(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        times.append(time.perf_counter() - t0)
    return {"mean_s": sum(times) / len(times), "min_s": min(times),
            "iters": iters}

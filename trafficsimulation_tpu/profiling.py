"""Tracing / profiling utilities.

The reference's only timing instrumentation is a 200-sample rolling
average of wall-clock render deltas inside the dashboard
(`traffic_statistics.py:17-55`).  Here: the same rolling tick-time
counters as a host-side helper, plus `jax.profiler` trace capture for
XLA-level analysis (SURVEY §5 "tracing: TPU equivalent").
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


class TickTimer:
    """Rolling tick-time statistics (reference dashboard semantics:
    avg tick ms, delta per tick, ticks/sec, real-vs-sim time ratio)."""

    def __init__(self, window: int = 200,
                 seconds_per_tick: float = 6.0):
        self.samples = deque(maxlen=window)
        self.seconds_per_tick = seconds_per_tick
        self._last = None
        self._last_ticks = 0

    def record(self, ticks_advanced: int = 1):
        now = time.perf_counter()
        if self._last is not None:
            self.samples.append((now - self._last, ticks_advanced))
        self._last = now
        self._last_ticks = ticks_advanced

    def stats(self) -> dict:
        if not self.samples:
            return {"avg_tick_ms": 0.0, "ticks_per_sec": 0.0,
                    "sim_to_real_ratio": 0.0}
        total_t = sum(s for s, _ in self.samples)
        total_ticks = sum(n for _, n in self.samples)
        avg_tick = total_t / max(total_ticks, 1)
        return {
            "avg_tick_ms": 1000.0 * avg_tick,
            "ticks_per_sec": total_ticks / total_t if total_t else 0.0,
            "sim_to_real_ratio": (self.seconds_per_tick / avg_tick
                                  if avg_tick else 0.0),
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tsim_trace"):
    """Capture a jax.profiler trace around a block:

        with profiling.trace("/tmp/tsim_trace"):
            sim.step(100)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed_steps(sim, n: int, chunk: int = 10) -> dict:
    """Advance n ticks measuring throughput; returns TickTimer stats plus
    cell-updates/sec."""
    t = TickTimer(seconds_per_tick=sim.cfg.TIME_PER_STEP_IN_SECONDS)
    t.record(0)
    done = 0
    while done < n:
        k = min(chunk, n - done)
        sim.step(k)
        jax.block_until_ready(sim.world.tick)
        t.record(k)
        done += k
    s = t.stats()
    s["cell_updates_per_sec"] = (s["ticks_per_sec"]
                                 * sim.cfg.WIDTH * sim.cfg.HEIGHT)
    return s

"""Profiling and throughput observability.

Replaces the reference's dead ``MetricLogger`` timing code
(HAN/train_utils/distributed_utils.py:122-173) with live equivalents:

  * ``trace`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace directory.
  * ``StepTimer`` — wall-clock per-step timing with warmup skip, plus
    derived throughput counters (edges/s, epochs/s — the BASELINE.json
    metrics).
  * ``MetricLogger`` — windowed smoothing + printed progress with ETA,
    the live version of the reference's dead code path.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def edges_per_s(self, edges_per_step: int) -> float:
        return edges_per_step / self.mean if self.times else 0.0

    def steps_per_s(self) -> float:
        return 1.0 / self.mean if self.times else 0.0


class MetricLogger:
    """Windowed smoothing + ETA printing (live replacement for
    HAN/train_utils/distributed_utils.py:25-173)."""

    def __init__(self, window: int = 20, print_freq: int = 50,
                 header: str = ""):
        self.window = window
        self.print_freq = print_freq
        self.header = header
        self.series: dict[str, deque] = {}
        self.start = time.perf_counter()
        self.step = 0

    def update(self, **metrics):
        self.step += 1
        for k, v in metrics.items():
            self.series.setdefault(
                k, deque(maxlen=self.window)).append(float(v))

    def smoothed(self, key: str) -> float:
        d = self.series.get(key)
        return sum(d) / len(d) if d else float("nan")

    def log(self, total_steps: Optional[int] = None, force: bool = False):
        if not force and self.step % self.print_freq != 0:
            return
        elapsed = time.perf_counter() - self.start
        parts = [f"{self.header}[{self.step}"
                 + (f"/{total_steps}]" if total_steps else "]")]
        for k in self.series:
            parts.append(f"{k} {self.smoothed(k):.4f}")
        parts.append(f"{elapsed:.1f}s")
        if total_steps and self.step:
            eta = elapsed / self.step * (total_steps - self.step)
            parts.append(f"eta {eta:.0f}s")
        print("  ".join(parts), flush=True)

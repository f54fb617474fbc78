"""Tracing/profiling: jax.profiler capture + per-step timing counters.

The reference has no profiling at all (SURVEY.md section 5); this module is
the framework's observability tier: `trace()` captures an XLA/TPU trace
viewable in TensorBoard or Perfetto, and `StepTimer` keeps streaming
step-time / throughput statistics (MP/s per chip — the benchmark metric).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Streaming per-step wall-time and throughput stats."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.reset()

    def reset(self) -> None:
        self._n = 0
        self._sum = 0.0
        self._min = float("inf")
        self._last = None

    def tick(self) -> None:
        self._last = time.perf_counter()

    def tock(self) -> float:
        dt = time.perf_counter() - self._last
        self._n += 1
        if self._n > self.warmup:
            self._sum += dt
            self._min = min(self._min, dt)
        return dt

    @property
    def mean(self) -> float:
        counted = self._n - self.warmup
        return self._sum / counted if counted > 0 else float("nan")

    @property
    def best(self) -> float:
        return self._min

    def throughput(self, items_per_step: float) -> float:
        return items_per_step / self.mean if self.mean > 0 else 0.0


def finite_check(tree, name: str = "tree") -> None:
    """Host-side NaN/Inf assertion over a pytree (the debug analog of the
    reference's NaN scrubbing, src/dataset.py:88-90). Use under --debug."""
    import jax.numpy as jnp

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not bool(jnp.isfinite(leaf).all()):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")

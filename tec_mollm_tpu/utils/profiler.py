"""Profiling helpers: step timing + jax.profiler traces.

The reference has no profiling at all (SURVEY.md §5: "Tracing / profiling: ABSENT").
Here: a StepTimer for windows/sec accounting and a trace() context manager around
jax.profiler for XLA-level timelines viewable in TensorBoard/Perfetto.

IMPORTANT (axon/tunneled backends): jax.block_until_ready can return at enqueue
time rather than completion, making wall-clock timing wildly optimistic. hard_sync()
forces a scalar host readback, which is the only reliable barrier there.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import jax.numpy as jnp


def hard_sync(x) -> float:
    """Force completion of everything `x` depends on; returns the scalar sum."""
    return float(jnp.sum(x))


class StepTimer:
    """Accumulates step wall-times and item counts -> throughput stats."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = None
        self.steps = 0
        self.items = 0
        self.elapsed = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, items: int = 0) -> float:
        dt = time.perf_counter() - self._t0
        self.elapsed += dt
        self.steps += 1
        self.items += items
        return dt

    @property
    def items_per_sec(self) -> float:
        return self.items / self.elapsed if self.elapsed > 0 else 0.0

    @property
    def avg_step_ms(self) -> float:
        return self.elapsed / self.steps * 1000 if self.steps else 0.0


@contextlib.contextmanager
def trace(logdir: str | None) -> Iterator[None]:
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Lightweight observability: stage timers and jax.profiler traces.

The reference has no tracing/profiling at all (SURVEY.md section 5 — only
ad-hoc time.time() notebook cells). This module provides:

- `StageTimer`: named wall-clock stages with device synchronization, so
  timings measure completed device work, not dispatch;
- `trace()`: a context manager around jax.profiler for TensorBoard-readable
  device traces;
- `log`: a structured stderr logger (the reference prints bare warnings).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time

__all__ = ["StageTimer", "trace", "log"]


def log(event: str, **fields) -> None:
    """One-line structured JSON log to stderr."""
    print(json.dumps({"event": event, **fields}), file=sys.stderr, flush=True)


class StageTimer:
    """Accumulate named stage timings with optional device sync.

    >>> t = StageTimer()
    >>> with t.stage("simulate"):
    ...     counts = simulate(...)
    >>> t.report()
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        if self.sync:
            self._sync()
        t0 = time.perf_counter()
        yield
        if self.sync:
            self._sync()
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    @staticmethod
    def _sync():
        import jax

        # block on a trivial computation to drain the device queue
        jax.block_until_ready(jax.numpy.zeros(()))

    def report(self) -> dict[str, float]:
        total = sum(self.stages.values()) or 1.0
        for name, dt in sorted(self.stages.items(), key=lambda kv: -kv[1]):
            log("stage", name=name, seconds=round(dt, 4),
                share=round(dt / total, 3))
        return dict(self.stages)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

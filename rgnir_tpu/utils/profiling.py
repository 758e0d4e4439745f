"""Tracing / profiling hooks (SURVEY.md section 5: the reference has none
beyond progress prints).

- ``stage_timer``: accumulate wall-time per named pipeline stage and
  derive MPix/s counters.
- ``device_trace``: context manager around ``jax.profiler`` producing a
  Perfetto-compatible trace directory (use ``tensorboard --logdir`` or
  ui.perfetto.dev to inspect).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulates per-stage wall time + pixel counts."""

    def __init__(self) -> None:
        self.seconds: Dict[str, float] = {}
        self.pixels: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, pixels: int = 0) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.seconds[name] = self.seconds.get(name, 0.0) + dt
            self.pixels[name] = self.pixels.get(name, 0) + pixels

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, secs in self.seconds.items():
            entry = {"seconds": round(secs, 4)}
            if self.pixels.get(name):
                entry["mpix_per_s"] = round(self.pixels[name] / secs / 1e6, 1)
            out[name] = entry
        return out


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/rgnir_trace") -> Iterator[str]:
    """jax.profiler trace around a block; yields the log dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

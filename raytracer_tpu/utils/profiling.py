"""Render observability: rays/sec counters and XLA profiler hooks.

The reference has no tracing at all (SURVEY §5 — one README remark is its
only perf observation). Here: a lightweight stats object every renderer
entry point can feed, plus a context manager around ``jax.profiler`` for
full device traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class RenderStats:
    """Accumulates per-tile wall-clock and ray counts."""

    primary_rays: int = 0
    tiles: int = 0
    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start_tile(self):
        self._t0 = time.perf_counter()

    def end_tile(self, n_rays: int):
        self.seconds += time.perf_counter() - self._t0
        self.primary_rays += n_rays
        self.tiles += 1

    @property
    def rays_per_sec(self) -> float:
        return self.primary_rays / self.seconds if self.seconds else 0.0

    def summary(self) -> str:
        return (
            f"{self.primary_rays} primary rays in {self.seconds:.2f}s "
            f"over {self.tiles} tiles = {self.rays_per_sec:,.0f} rays/s"
        )


@contextlib.contextmanager
def trace_profile(log_dir: str):
    """Device-level profiling via jax.profiler (TensorBoard-viewable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

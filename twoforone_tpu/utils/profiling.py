"""Profiling and tracing — first-class, unlike the reference (SURVEY §5:
the reference has no tracing beyond tqdm progress bars).

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-viewable / Perfetto trace of the enclosed device work.
- :class:`PhaseTimer` — lightweight wall-clock phase accounting with
  device-sync, for per-phase throughput reporting in training/benchmarks.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulates wall-clock per phase; ``sync=True`` blocks on device work
    so timings reflect real execution, not dispatch."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        if self.sync:
            self._block()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                self._block()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    @staticmethod
    def _block():
        import jax

        (jax.device_put(0.0) + 0).block_until_ready()

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {total / n * 1e3:.2f}ms/call x{n}")
        return "\n".join(lines)

"""Tracing / profiling utilities (SURVEY.md §5: the reference has none beyond
tqdm; the TPU build gets jax.profiler traces + per-phase wall-clock and
frames-per-second counters)."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimers:
    """Named wall-clock accumulators with counts; thread-safe enough for the
    pipeline's coarse phases."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def add(self, name, seconds, n=1):
        self.total[name] += seconds
        self.count[name] += n

    def fps(self, name):
        return self.count[name] / self.total[name] if self.total[name] else float("nan")

    def report(self):
        lines = []
        for name in sorted(self.total):
            t, n = self.total[name], self.count[name]
            lines.append(
                f"{name:<28} {t:8.3f}s  n={n:<6} {1000 * t / max(n, 1):8.2f} ms/it"
                f"  {n / t if t else float('nan'):8.1f} it/s"
            )
        return "\n".join(lines)

    def as_dict(self):
        return {
            name: {"seconds": self.total[name], "count": self.count[name]}
            for name in self.total
        }


@contextlib.contextmanager
def device_trace(log_dir):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


GLOBAL_TIMERS = PhaseTimers()

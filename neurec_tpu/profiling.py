"""Tracing / profiling utilities.

The reference's only tracing is a wall-clock ``@timer`` decorator
(util/tool.py:203-213). That is kept for log parity, plus a
``jax.profiler`` trace context for real device profiles (TensorBoard-
compatible), and a per-epoch timing aggregator.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from functools import wraps
from typing import Dict


def timer(func):
    """Print the wall time of each call (parity: util/tool.py:203-213)."""

    @wraps(func)
    def wrapper(*args, **kwargs):
        start = time.time()
        result = func(*args, **kwargs)
        print("%s function cost: %fs" % (func.__name__, time.time() - start))
        return result

    return wrapper


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Aggregates named phase timings (host wall-clock)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(
                "%-20s %8.3fs over %d calls (%.2f ms/call)"
                % (
                    name,
                    self.totals[name],
                    self.counts[name],
                    1000.0 * self.totals[name] / max(self.counts[name], 1),
                )
            )
        return "\n".join(lines)

"""Stage timers + JAX profiler hooks.

The observability parity layer (ref: ad-hoc wall-clock spans behind
logger.debug — index.py:194-218,239-303; train_rc.py:196-257;
run_demo.py:331-352). Here it is a reusable StageTimer with the same
decomposition (encode / probe / scan / rescore / aggregate) plus an optional
jax.profiler trace context for XLA-level inspection."""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class StageTimer:
    """Accumulates wall-clock per named stage; thread-unsafe by design
    (one per pipeline)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals, key=lambda n: -self.totals[n])
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()

    def log(self, prefix: str = ""):
        for name, row in self.summary().items():
            logger.info("%s%s: %.1fms x%d", prefix, name, row["mean_ms"],
                        row["count"])


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

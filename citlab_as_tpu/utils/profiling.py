"""Tracing / profiling utilities.

Reference analogs: tf.estimator ProfilerHook gated by --profile_dir
(trainer_base.py:55,117-123) and ad-hoc wall-clock prints. TPU-native:
jax.profiler traces (viewable in TensorBoard/XProf) plus a lightweight
stage timer that aggregates wall-clock per named section.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

logger = logging.getLogger(__name__)


class StageTimer:
    """Accumulating wall-clock timer: ``with timer.section("separator"): ...``."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            name: {"total_s": round(self.totals[name], 4),
                   "count": self.counts[name],
                   "mean_ms": round(1e3 * self.totals[name] / self.counts[name], 3)}
            for name in self.totals}

    def log_summary(self) -> None:
        for name, stats in sorted(self.summary().items()):
            logger.info("stage %-24s total=%.2fs n=%d mean=%.1fms",
                        name, stats["total_s"], stats["count"], stats["mean_ms"])


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when ``log_dir`` is set; no-op otherwise
    (the --profile_dir gate of the reference)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Wrote profiler trace to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in profiler traces (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield

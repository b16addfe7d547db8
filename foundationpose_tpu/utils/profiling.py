"""Tracing and per-stage timing.

The reference has essentially no profiling (an unused ``enable_timer`` flag,
Utils.py:58, and a py-spy dependency). Here: a wall-clock stage timer with a
running report, and jax.profiler trace capture for TPU timelines.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict


class StageTimer:
    """Accumulating wall-clock timer: ``with timer('render'): ...``.
    Synchronizes jax async dispatch at stage exits when sync=True."""

    def __init__(self, sync=True):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def __call__(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    import jax

                    jax.effects_barrier()
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self, reset=False):
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: {tot:.3f}s total, {tot / n * 1000:.1f}ms avg x{n}")
        out = "\n".join(lines)
        logging.info("stage timings:\n%s", out)
        if reset:
            self.totals.clear()
            self.counts.clear()
        return out


@contextlib.contextmanager
def trace(log_dir="/tmp/fp_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logging.info("profiler trace written to %s", log_dir)

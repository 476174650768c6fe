"""Profiling harness: per-stage wall timing + jax.profiler trace capture.

Replaces the reference's ad-hoc time.time() prints (vo_stereo_runner.py:45-59 — whose
'Average time per frame' denominator is off by one) with a structured, materialization-
correct timer. On the tunneled dev backend, block_until_ready can return before
execution finishes, so ``timed`` forces a host copy of (a slice of) the result.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


@dataclass
class StageTimer:
    """Accumulates wall time per named stage; prints a table."""

    totals: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn and force materialization of its outputs before stopping the clock."""
        with self.stage(name):
            out = fn(*args, **kwargs)
            jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
        return out

    def report(self) -> str:
        lines = [f"{'stage':<28}{'total_s':>10}{'calls':>8}{'ms/call':>10}"]
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<28}{tot:>10.3f}{n:>8}{tot / n * 1000:>10.1f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard/Perfetto-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

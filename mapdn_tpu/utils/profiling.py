"""Profiling hooks: jax.profiler traces + phase timers.

The reference has no profiling machinery (SURVEY.md section 5); this adds
the TPU-native equivalents: XProf-compatible device traces around training
phases and lightweight wall-clock phase timers with env-steps/s accounting.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (open with XProf / tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock timers: with timer.phase('rollout'): ..."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self):
        return {k: {"total_s": round(v, 4),
                    "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3),
                    "count": self.counts[k]}
                for k, v in sorted(self.totals.items())}


def enable_nan_debugging():
    """Dev-mode numerical tripwires (SURVEY.md section 5: the jit-world
    substitute for exception-based failure detection)."""
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)

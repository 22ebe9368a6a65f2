"""Per-pass device timing + wall-clock utilities.

The reference's observability is a StopWatch + window-title FPS + unwired
GL timer queries (SURVEY.md §5).  Here: a PassTimer that (when enabled)
synchronizes around each pass and accumulates per-pass milliseconds, plus an
optional jax.profiler trace context for deep dives.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import jax


class PassTimer:
    """Accumulates per-pass wall ms. Disabled -> near-zero overhead."""

    def __init__(self, enabled: bool | None = None):
        if enabled is None:
            enabled = os.environ.get("EVPLP_PROFILE", "0") == "1"
        self.enabled = enabled
        self.ms = defaultdict(float)
        self.calls = defaultdict(int)

    @staticmethod
    def _real_sync(values):
        """Fetch one scalar of EVERY array leaf: on the axon tunnel,
        block_until_ready can return before device work completes — only a
        host FETCH of a dependent value is a true completion fence.  A span
        can cover several independently dispatched computations, so fencing
        only the first leaf would leave later-enqueued work unmeasured."""
        import numpy as np
        for leaf in jax.tree_util.tree_leaves(values):
            if hasattr(leaf, "ravel"):
                np.asarray(jax.device_get(leaf.ravel()[:1]))

    @contextlib.contextmanager
    def span(self, name: str, *sync_values):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        self._real_sync(sync_values)
        self.ms[name] += (time.perf_counter() - t0) * 1000.0
        self.calls[name] += 1

    def time_call(self, name: str, fn, *args, **kwargs):
        if not self.enabled:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        self._real_sync(out)
        self.ms[name] += (time.perf_counter() - t0) * 1000.0
        self.calls[name] += 1
        return out

    def report(self) -> dict:
        return {k: {"ms_total": round(v, 2), "calls": self.calls[k],
                    "ms_avg": round(v / max(self.calls[k], 1), 2)}
                for k, v in sorted(self.ms.items())}


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Profiling / observability utilities.

The reference has no tracing at all (SURVEY.md §5.1 — tqdm postfix only);
here: jax.profiler trace capture around any phase, a phase timer that
aggregates wall-clock per optimization phase, and a tiny structured-log
emitter (JSON lines) so long runs are greppable.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; print with report()."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{name}: {self.totals[name]:.2f}s "
                         f"({self.counts[name]}x, "
                         f"{self.totals[name] / self.counts[name] * 1e3:.1f}"
                         " ms avg)")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace when a log dir is given, else a no-op."""
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield


class JsonlLogger:
    """Append-only JSON-lines metrics log (wandb stand-in)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self._fh = open(path, "a") if path else None

    def log(self, **kv):
        if self._fh is None:
            return
        kv.setdefault("t", round(time.time(), 3))
        self._fh.write(json.dumps(kv) + "\n")
        self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()

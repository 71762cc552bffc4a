"""Phase timing + device profiling hooks.

The reference's observability is chrono stopwatches around every phase with
elapsed-seconds prints (SURVEY §5.1; e.g. src/basis.cc:1021-1091). Here:

- :class:`PhaseTimer` — nested named phases, one-line reports, retrievable
  programmatically (drivers/benchmarks attach it);
- :func:`trace` — context manager around ``jax.profiler`` writing an xprof
  trace directory for real kernel-level inspection (no reference analog).
"""

from __future__ import annotations

import contextlib
import time


class PhaseTimer:
    """Accumulating named phase timer.

    >>> pt = PhaseTimer()
    >>> with pt.phase("enumerate"):
    ...     ...
    >>> pt.report()
    """

    def __init__(self, printer=print):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._printer = printer

    @contextlib.contextmanager
    def phase(self, name: str, verbose: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            if verbose and self._printer:
                self._printer(f"[{name}] {dt:.3f}s")

    def report(self):
        for name, t in sorted(self.times.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            self._printer(f"{name:<32s} {t:10.3f}s  (x{n})")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

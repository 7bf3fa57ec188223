"""First-class profiling: phase timers + jax.profiler traces.

The reference wraps nearly every kernel launch in CUDA events whose
timings are discarded (SURVEY.md §5.1). Here profiling is explicit:
PhaseTimer accumulates wall time per named phase and can be printed or
dumped; trace_to() captures an XLA/TPU profile viewable in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

from ..log import logger


class PhaseTimer:
    """Accumulating named-phase wall timer.

    >>> t = PhaseTimer()
    >>> with t.phase("score"):
    ...     ...
    >>> t.report()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self, log=True) -> str:
        lines = [f"{'phase':<24}{'total s':>10}{'calls':>8}{'mean ms':>10}"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot = self.totals[name]
            n = self.counts[name]
            lines.append(
                f"{name:<24}{tot:>10.3f}{n:>8}{1000 * tot / n:>10.2f}"
            )
        out = "\n".join(lines)
        if log:
            logger.info("phase timings:\n%s", out)
        return out

    def as_dict(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "calls": self.counts[k]}
            for k in self.totals
        }


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler trace around a block of work."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)

"""Tracing and per-stage timing.

The reference has no profiling at all (SURVEY §5 — tqdm bars only). Here:
  * `stage(name)` / `Stages` — wall-clock per-stage timers that nest, log to
    stdout and accumulate a summary (every pipeline wraps its phases);
  * `trace(dir)` — jax.profiler wrapper producing a TensorBoard-loadable
    device trace;
  * `annotate(name)` — jax.profiler.TraceAnnotation for op-level attribution
    inside a trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator, Optional


class Stages:
    """Accumulating per-stage wall-clock timer."""

    def __init__(self, logger=None):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._logger = logger

    @contextlib.contextmanager
    def stage(self, name: str, log: bool = True) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            if log:
                msg = f"[stage] {name}: {dt:.3f}s"
                if self._logger is not None:
                    self._logger.log({f"stage/{name}_sec": dt})
                else:
                    print(msg)

    def summary(self) -> dict[str, float]:
        return dict(self.totals)

    def report(self) -> str:
        lines = ["stage timings:"]
        for name, total in sorted(self.totals.items(), key=lambda x: -x[1]):
            n = self.counts[name]
            lines.append(f"  {name:30s} {total:8.3f}s  ({n}x, "
                         f"{total / n:.3f}s avg)")
        return "\n".join(lines)


_GLOBAL = Stages()


def stage(name: str, log: bool = True):
    """Module-level convenience: `with profiling.stage("embed"): ...`"""
    return _GLOBAL.stage(name, log)


def global_report() -> str:
    return _GLOBAL.report()


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Device trace via jax.profiler (TensorBoard `profile` plugin format)."""
    import jax
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Op-level trace annotation context."""
    import jax
    return jax.profiler.TraceAnnotation(name)

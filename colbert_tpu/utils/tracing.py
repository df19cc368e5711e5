"""Phase tracing + profiling hooks.

SURVEY §5: the reference's only instrumentation is ``@time`` macros in
``index()`` (indexing.jl:72-112). Here every build/search phase is traced
into a structured record that the builder persists into ``plan.json``
(``timings`` key), and a context manager exposes ``jax.profiler`` traces
for TensorBoard when a trace dir is given.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field
from typing import Iterator

logger = logging.getLogger(__name__)

__all__ = ["Tracer", "profile_trace"]


@dataclass
class Tracer:
    """Collects named phase durations; ``as_dict()`` goes into plan.json."""

    timings: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.timings[name] = self.timings.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            logger.info("phase %s: %.2fs", name, dt)

    def as_dict(self) -> dict:
        return {
            name: {"seconds": round(self.timings[name], 3), "count": self.counts[name]}
            for name in self.timings
        }


@contextlib.contextmanager
def profile_trace(trace_dir: str | None) -> Iterator[None]:
    """jax.profiler trace wrapper (no-op when ``trace_dir`` is None)."""
    if trace_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Timing spans + jax.profiler integration.

Structured replacement for the reference's `[COST TIME]` stdout prints
(`src/Frame.cc:193-246`, `src/Tracking.cc:407-428`, SURVEY.md §5.1): named
spans accumulate into a report; `trace()` wraps a block in a
jax.profiler trace for TensorBoard/Perfetto."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class Timers:
    def __init__(self) -> None:
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync=None) -> Iterator[None]:
        """Time a block; pass `sync=array` to block on device completion so
        the measurement covers the dispatched work."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.total, key=lambda n: -self.total[n]):
            c = self.count[name]
            lines.append(f"{name:30s} {self.total[name]*1000:9.1f} ms total "
                         f"{self.total[name]/max(c,1)*1000:8.2f} ms/call "
                         f"x{c}")
        return "\n".join(lines)

    def reset(self) -> None:
        self.total.clear()
        self.count.clear()


GLOBAL = Timers()


@contextlib.contextmanager
def trace(logdir: str = "/tmp/eao_trace") -> Iterator[None]:
    """jax.profiler trace around a block (view in TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

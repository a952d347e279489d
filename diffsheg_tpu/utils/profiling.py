"""Profiling + RTF accounting.

The reference measures throughput with manual ``time.time()`` spans around
mel / HuBERT / sampler and prints ``frames / total_time`` as FPS
(reference trainers/ddpm_beat_trainer.py:1233-1315).  Here the same stage
accounting is a first-class object (feeding bench.py), plus helpers around
``jax.profiler`` for real TPU traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulates wall-clock per named stage; computes RTF/FPS."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = (self.totals.get(name, 0.0)
                                 + time.perf_counter() - t0)

    @property
    def total(self) -> float:
        return sum(self.totals.values())

    def fps(self, frames: int) -> float:
        """frames / total pipeline time (ddpm_beat_trainer.py:1315)."""
        return frames / max(self.total, 1e-9)

    def rtf(self, frames: int, fps_native: float) -> float:
        """Real-time factor: generated seconds per wall second."""
        return (frames / fps_native) / max(self.total, 1e-9)

    def report(self) -> Dict[str, float]:
        return dict(self.totals, total=self.total)


@contextlib.contextmanager
def device_trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_until_ready(tree) -> None:
    import jax
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, tree)

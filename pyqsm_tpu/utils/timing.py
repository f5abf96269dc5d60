"""Per-stage timing & profiling.

The reference had only ad-hoc wall-clock prints (``exploration.py:73-90``).
Here: a context-manager timer that blocks on device results
(``jax.block_until_ready``) so timings are honest, plus an optional
``jax.profiler`` trace hook for deep dives.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Iterator

import jax

log = logging.getLogger("pyqsm_tpu.calc")


class Timer:
    """Accumulates named stage timings."""

    def __init__(self) -> None:
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.stages[name] = self.stages.get(name, 0.0) + dt
        log.debug("stage %-24s %.4fs", name, dt)

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"{k:<28} {v:8.4f}s  {100 * v / max(total, 1e-12):5.1f}%" for k, v in self.stages.items()]
        lines.append(f"{'TOTAL':<28} {total:8.4f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def stage_timer(name: str, result_holder: dict | None = None) -> Iterator[None]:
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if result_holder is not None:
        result_holder[name] = dt
    log.info("%s: %.4fs", name, dt)


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/pyqsm_trace") -> Iterator[None]:
    """jax.profiler trace for TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

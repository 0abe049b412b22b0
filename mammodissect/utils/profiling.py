"""Profiling + debug hooks (SURVEY.md §5 tracing row).

The reference's observability is tqdm CUDA-mem postfixes and CUDA_LAUNCH_BLOCKING
(`Classifiers/experiments.py:440-447`, `describe_broad_neurons.py:52`). TPU-native:
- `trace(logdir)`: context manager around `jax.profiler` -> Perfetto/XProf trace.
- `annotate(name)`: TraceAnnotation for phase labels inside a trace.
- `enable_debug_nans()`: jax_debug_nans (the race/sanitizer analogue for pure
  functional steps — any NaN fails loudly at the op that produced it).
- `phase_timer`: lightweight host-side phase timing for the dissection engine.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def enable_debug_nans(enable: bool = True):
    import jax

    jax.config.update("jax_debug_nans", enable)


class PhaseTimer:
    """Accumulates wall-clock per named phase; `report()` returns {phase: seconds}."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> Dict[str, float]:
        return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))

"""Profiling/tracing hooks (SURVEY.md section 5: the reference has none; the
TPU build ships jax.profiler integration plus a throughput harness).

Usage:
    with trace("/tmp/resample-trace"):        # open in xprof/tensorboard
        farm.process(chunk)

    stats = measure_throughput(lambda i: launch(i), samples_per_launch=...)
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block (device + host timelines)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class ThroughputStats:
    seconds_per_launch: float
    samples_per_second: float
    launches: int


def measure_throughput(
    launch: Callable[[int], object],
    samples_per_launch: int,
    launches: int = 64,
    warmup: int = 8,
) -> ThroughputStats:
    """Steady-state pipelined throughput of independent launches.

    ``launch(i)`` must return a device value and must vary its inputs with
    ``i`` (distinct state/buffer per call) so that no layer can cache,
    deduplicate, or constant-fold the work; all results are blocked on at the
    end. Serialized (one-at-a-time) timing is the wrong methodology on
    tunneled devices — it measures dispatch latency (see bench.py).
    """
    import jax

    jax.block_until_ready([launch(i) for i in range(warmup)])
    t0 = time.perf_counter()
    jax.block_until_ready([launch(i) for i in range(launches)])
    dt = (time.perf_counter() - t0) / launches
    return ThroughputStats(
        seconds_per_launch=dt,
        samples_per_second=samples_per_launch / dt,
        launches=launches,
    )

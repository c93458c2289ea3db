"""Profiling/tracing hooks (SURVEY.md section 5: the reference has none; the
TPU build ships jax.profiler integration plus a throughput harness).

Usage:
    with trace("/tmp/resample-trace"):        # open in xprof/tensorboard
        farm.process(chunk)

    stats = measure_kernel_time(body, x0)     # honest K-slope chain
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable

import numpy as np


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


def measure_kernel_time(
    body: Callable,
    carry0,
    samples_per_iteration: int,
    k1: int = 4,
    k2: int = 16,
    reps: int = 4,
) -> ThroughputStats:
    """True per-iteration device time of ``body`` via the K-slope chain.

    ``body(carry) -> carry`` must thread a DATA DEPENDENCY from each
    iteration's kernel output into the next iteration's input (e.g.
    ``x.at[0, 0].add(out[0, 0] & 1)`` — not constant-foldable), so the device
    must serialize the iterations. The chain is run inside ONE jitted
    lax.scan at two lengths; the slope (T2 - T1) / (k2 - k1) cancels every
    fixed per-program cost.

    Why not time independent pipelined launches? On relay-tunneled devices
    (this environment) block_until_ready returns when the relay ACKS a
    launch, not when compute finishes — pipelined timing measures the ack
    stream at a payload-independent rate hundreds of times faster than the
    hardware (benchmarks/RESULTS.md, round 2). Serialized one-at-a-time
    timing instead absorbs ~60 ms of per-program relay overhead. The slope
    excludes both.

    EVERY leaf of the carry is folded into the returned scalar. This is
    load-bearing (round-5 methodology correction #2): returning only one
    leaf lets XLA's while-loop simplifier delete the OTHER chains' carries
    — and with them their kernels — from the compiled loop entirely, so a
    "N independent chains" measurement silently times ONE chain while
    attributing N chains of samples (verified statically and dynamically,
    tools/probe_chain_dce.py: 1 vs 4 custom-calls in the optimized HLO,
    3.85x wall when all four chains are really live).
    """
    import jax
    import jax.numpy as jnp

    def make(k):
        @jax.jit
        def chain(c):
            c, _ = jax.lax.scan(lambda cc, _: (body(cc), None), c, None, length=k)
            leaves = jax.tree_util.tree_leaves(c)
            acc = jnp.int32(0)
            for l in leaves:
                acc = acc + jnp.asarray(l).ravel()[0].astype(jnp.int32)
            return acc

        return chain

    c1, c2 = make(k1), make(k2)
    for c in (c1, c2):
        r = c(carry0)
        jax.block_until_ready(r)
        _ = np.asarray(r)  # force real completion, not just the ack

    def best_time(c):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = c(carry0)
            jax.block_until_ready(r)
            _ = np.asarray(r)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (best_time(c2) - best_time(c1)) / (k2 - k1)
    return ThroughputStats(
        seconds_per_launch=dt,
        samples_per_second=samples_per_iteration / max(dt, 1e-12),
        launches=k2 - k1,
    )

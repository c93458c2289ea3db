#!/usr/bin/env python3
"""Single-stream LATENCY measurement: smallest-launch device time per chunk.

The throughput benches (bench.py, benchmarks/run_all.py) maximise samples per
second with 8192-frame launches; a realtime single-stream user instead cares
about the device time to produce ONE small chunk (an audio period). This tool
K-slope-measures the per-launch device time of the tiled kernel at small
n_out with shallow grids (fewer grid steps = less serialized per-step
latency), then reports the realtime duty cycle each configuration implies.

Context (docs/DEPLOYMENT.md "Realtime single stream"): the per-chunk numbers
are honest and unflattering vs one C core — a scalar CPU core computes 128
frames in ~3 us while any TPU launch pays a multi-microsecond dispatch +
per-grid-step latency floor. The TPU's win is batch throughput; this tool
quantifies exactly what a latency-bound deployment gets.

Run on the TPU: python tools/bench_latency.py
Fine grain/group sweep (round-4 micro-launch tune): python tools/bench_latency.py sweep
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.lowlevel import make_device_state
    from clownresampler_tpu.models import DEFAULT_MODEL, lanczos_kernel_table
    from clownresampler_tpu.ops.pallas_resample import (
        plan_uniform,
        resample_uniform_lanes_tiled,
        strided_table_device,
    )

    IN_RATE, OUT_RATE = 48000, 44100
    cfg = configure(IN_RATE, OUT_RATE, OUT_RATE)
    inc = fx.calculate_ratio(IN_RATE, OUT_RATE)
    plan = plan_uniform(inc, 64)
    max_taps = 8
    table = jnp.asarray(lanczos_kernel_table())
    tstr = strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                                cfg.kernel_step_size, max_taps)
    state = make_device_state(0, 0x4321, cfg, inc)
    rng = np.random.default_rng(0)

    def kslope(body, x0, k1, k2, reps=5):
        def make(k):
            @jax.jit
            def chain(x):
                x, _ = jax.lax.scan(lambda c, _: (body(c), None), x, None,
                                    length=k)
                return x[0, 0]

            return chain

        def best(c):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                r = c(x0)
                jax.block_until_ready(r)
                _ = np.asarray(r)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        c1, c2 = make(k1), make(k2)
        for c in (c1, c2):
            r = c(x0)
            jax.block_until_ready(r)
            _ = np.asarray(r)
        return (best(c2) - best(c1)) / (k2 - k1)

    results = []
    sweep = len(sys.argv) > 1 and sys.argv[1] == "sweep"
    if sweep:
        # Micro-launch tune: the per-launch floor at small chunks is
        # per-grid-step latency x steps, traded against per-step MAC volume
        # (8*group frames/step). Sweep every legal (n_out, group) at realtime
        # chunk sizes to find the floor's shape. At a few us/launch the
        # 64/320 chains are NOISE (round-5 rerun saw negative slopes), so
        # sweep mode uses long chains: the k2-k1=3584-launch delta is >=10 ms
        # even at 3 us/launch, well above relay jitter at min-of-9.
        cases = [(n, g) for n in (64, 128, 256, 512)
                 for g in (1, 2, 4, 8, 16, 32, 64) if n % (8 * g) == 0]
        k1, k2, reps = 512, 4096, 9
    else:
        # group=8 -> n_out/64 grid steps; the 64-frame launch is a SINGLE step.
        cases = [(64, 8), (128, 8), (256, 32), (1024, 32), (8192, 32)]
        k1, k2, reps = 64, 320, 5
    for n_out, group in cases:
        s = ((n_out * inc) >> 16) + 96
        s = -(-s // 16) * 16
        x0 = jnp.asarray(
            rng.integers(-32768, 32768, size=(s, 128)).astype(np.int32))
        jax.block_until_ready(x0)

        def body(x, n_out=n_out, group=group):
            out, _ = resample_uniform_lanes_tiled(
                table, x, state, max_taps=max_taps, n_out=n_out,
                d=plan["d"], cand=plan["cand"], group=group,
                table_strided=tstr)
            return x.at[0, 0].add(out[0, 0] & 1)

        # long chains: small launches need many iterations for a clean slope
        dt = kslope(body, x0, k1, k2, reps=reps)
        period_ms = n_out / OUT_RATE * 1e3       # realtime budget per chunk
        results.append({
            "n_out": n_out,
            "group": group,
            "grid_steps": n_out // (8 * group),
            "device_us_per_launch": round(dt * 1e6, 1),
            "realtime_period_ms": round(period_ms, 3),
            "duty_cycle_pct": round(dt / (period_ms / 1e3) * 100, 2),
            # one C core computes n_out frames at 37.4 Mframes/s
            "c_core_us": round(n_out / 37.4, 1),
            "vs_c_latency": round((n_out / 37.4) / (dt * 1e6), 3),
        })
        print(json.dumps(results[-1]), flush=True)

    best = min(results, key=lambda r: r["device_us_per_launch"])
    print(json.dumps({
        "metric": "single-stream 48k->44.1k smallest-launch device latency",
        "value": best["device_us_per_launch"], "unit": "us/launch",
        "config": {k: best[k] for k in ("n_out", "group", "grid_steps")},
        "note": "duty_cycle_pct is the fraction of each realtime period the "
                "device is busy; vs_c_latency > 1 would mean beating one C "
                "core on per-chunk latency",
    }), flush=True)


if __name__ == "__main__":
    main()

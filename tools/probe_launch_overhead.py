#!/usr/bin/env python3
"""Diagnose the config-5 gap: where does throughput go at small lane counts?

Measures the tiled kernel's pipelined per-sample rate at several lane widths,
the XLA precompute_launch alone, and a mixed-ratio round-robin — to separate
per-launch overhead (precompute gather, dispatch) from VPU work scaling.

Run on the TPU: python tools/probe_launch_overhead.py
"""

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
    from clownresampler_tpu.models import lanczos_kernel_table
    from clownresampler_tpu.ops.pallas_resample import (
        plan_uniform,
        precompute_launch,
        resample_uniform_lanes_tiled,
    )

    table = jnp.asarray(lanczos_kernel_table())
    rng = np.random.default_rng(0)
    N_OUT = 4096
    ITERS = 64

    def bench(fn, args_list):
        outs = [fn(*args_list[i % len(args_list)]) for i in range(8)]
        jax.block_until_ready(outs)
        best = float("inf")
        for _ in range(3):
            outs = []
            t0 = time.perf_counter()
            for i in range(ITERS):
                outs.append(fn(*args_list[i % len(args_list)]))
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best

    ratios = [(48000, 44100), (44100, 48000), (8000, 48000)]

    def make(in_rate, out_rate, lanes):
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        inc = fx.calculate_ratio(in_rate, out_rate)
        plan = plan_uniform(inc, N_OUT)
        taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        s = ((N_OUT * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
        s = -(-s // 16) * 16
        xs = [jnp.asarray(rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))
              for _ in range(2)]
        states = [make_device_state(0, f, cfg, inc) for f in range(8)]
        fn = lambda x, st: resample_uniform_lanes_tiled(
            table, x, st, max_taps=taps, n_out=N_OUT, d=plan["d"], cand=plan["cand"])[0]
        return fn, xs, states, taps

    # 1. lane scaling, single ratio
    for lanes in (128, 256, 512, 1024, 2048, 4096):
        fn, xs, states, _ = make(48000, 44100, lanes)
        dt = bench(fn, [(xs[i % 2], states[(3 * i + 1) % 8]) for i in range(16)])
        print(f"tiled 48k->44.1k lanes={lanes:5d}: {dt*1e6:8.1f} us/launch  "
              f"{N_OUT*lanes/dt/1e9:7.1f} Gsamples/s")

    # 2. precompute alone (XLA gather + reciprocal), jitted standalone
    import functools
    pre = jax.jit(functools.partial(precompute_launch, max_taps=8, n_out=N_OUT))
    cfg = configure(48000, 44100, 48000)
    inc = fx.calculate_ratio(48000, 44100)
    states = [make_device_state(0, f, cfg, inc) for f in range(8)]
    dt = bench(lambda st: pre(table, st), [(s,) for s in states])
    print(f"precompute_launch alone: {dt*1e6:8.1f} us/launch")

    # 3. mixed-ratio round-robin at 512 lanes (config-5 shape) vs same-ratio
    mixed = [make(r[0], r[1], 512) for r in ratios] + [make(96000, 48000, 512)[:3] + (None,)]
    mixed = mixed[:3]  # strided group excluded (different fn shape)
    args = []
    for g, (fn, xs, states, _) in enumerate(mixed):
        args.append(None)
    dt_groups = 0.0
    for fn, xs, states, _ in mixed:
        dt_groups += bench(fn, [(xs[i % 2], states[(3 * i + 1) % 8]) for i in range(16)])
    print(f"3 tiled groups 512 lanes, summed per-launch: {dt_groups*1e6:8.1f} us "
          f"-> {3*N_OUT*512/dt_groups/1e9:7.1f} Gsamples/s aggregate")

    # 4. round-robin interleaved (the run_all measurement style)
    fns = [make(r[0], r[1], 512) for r in ratios]
    outs = []
    for i in range(8):
        fn, xs, states, _ = fns[i % 3]
        outs.append(fn(xs[i % 2], states[(3 * i + 1) % 8]))
    jax.block_until_ready(outs)
    best = float("inf")
    for _ in range(3):
        outs = []
        t0 = time.perf_counter()
        for i in range(ITERS):
            fn, xs, states, _ = fns[i % 3]
            outs.append(fn(xs[i % 2], states[(3 * i + 1) % 8]))
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"round-robin 3 ratios 512 lanes: {best*1e6:8.1f} us/launch "
          f"-> {N_OUT*512/best/1e9:7.1f} Gsamples/s")


if __name__ == "__main__":
    main()

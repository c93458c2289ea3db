#!/usr/bin/env python3
"""BASELINE.json benchmark suite: one JSON line per config.

Configs (BASELINE.json):
  1. mono 48k->44.1k single stream (high-level usage shape)
  2. stereo 2:1 96k->48k (wide anti-alias kernel, strided path)
  3. integer-ratio 8k->48k mono upsample (pure interpolation, d=0)
  4. dynamic ratio sweep 0.5x->2.0x (per-chunk Adjust pitch bend)
  5. 1024-stream mixed-ratio stereo transcode farm

Methodology: steady-state pipelined dispatch of independent launches with
distinct (state, input) pairs, blocking on all results (see bench.py).
vs_baseline divides by the C reference's single-core Msamples/s for the
closest measured anchor (BASELINE.md).

Run on the TPU: python benchmarks/run_all.py
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
    from clownresampler_tpu.models import lanczos_kernel_table
    from clownresampler_tpu.ops.pallas_resample import (
        plan_uniform,
        resample_integer_stride,
        resample_uniform_lanes_general,
        resample_uniform_lanes_tiled,
    )

    table = jnp.asarray(lanczos_kernel_table())
    rng = np.random.default_rng(0)
    # 8192 frames/launch amortises the ~30 us per-program dispatch floor
    # (tools/probe_launch_overhead.py); 16384 exceeds the Mosaic VMEM budget.
    N_OUT = 8192

    def make_launch(in_rate, out_rate, lanes, lpf=None, n_out=None):
        n_out = n_out or N_OUT
        lpf = lpf or max(in_rate, out_rate)
        cfg = configure(in_rate, out_rate, lpf)
        inc = fx.calculate_ratio(in_rate, out_rate)
        plan = plan_uniform(inc, n_out)
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        s = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
        s = -(-s // 16) * 16
        xs = [
            jnp.asarray(rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))
            for _ in range(2)
        ]
        states = [make_device_state(0, f, cfg, inc) for f in range(8)]

        if plan["kernel"] == "tiled":
            fn = lambda x, st: resample_uniform_lanes_tiled(
                table, x, st, max_taps=max_taps, n_out=n_out,
                d=plan["d"], cand=plan["cand"])[0]
        elif plan["kernel"] == "strided":
            fn = lambda x, st: resample_integer_stride(
                table, x, st, max_taps=max_taps, n_out=n_out, d=plan["d"])[0]
        else:
            fn = lambda x, st: resample_uniform_lanes_general(
                table, x, st, max_taps=max_taps, n_out=n_out)[0]
        return fn, xs, states, n_out

    def pipeline_time(launches, iters=64):
        """launches: list of (fn, xs, states, n_out); round-robin pipelined."""
        outs = []
        for i in range(8):  # warm/compile
            fn, xs, states, _ = launches[i % len(launches)]
            outs.append(fn(xs[i % len(xs)], states[i % len(states)]))
        jax.block_until_ready(outs)
        outs = []
        t0 = time.perf_counter()
        for i in range(iters):
            fn, xs, states, _ = launches[i % len(launches)]
            outs.append(fn(xs[i % len(xs)], states[(i * 3 + 1) % len(states)]))
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / iters

    def report(name, lanes, dt, anchor_msps, n_out=None):
        msps = (n_out or N_OUT) * lanes / dt / 1e6
        print(json.dumps({
            "metric": name,
            "value": round(msps, 1),
            "unit": "Msamples/s",
            "vs_baseline": round(msps / anchor_msps, 2),
        }), flush=True)

    # 1. mono 48k->44.1k, one stream (lane-padded; latency-bound shape)
    dt = pipeline_time([make_launch(48000, 44100, 128)])
    report("config1 mono 48k->44.1k single-stream (128-lane padded)", 1, dt, 37.4)

    # 1b. The SAME config through the actual HighLevelResampler API
    # (BASELINE.json names the HighLevel API): host-driven 0x1000-buffer
    # streaming, array path (resample_stream), wall-clock end to end.
    from clownresampler_tpu.highlevel import HighLevelResampler

    hl_in = rng.integers(-32768, 32768, size=(1 << 20, 1)).astype(np.int16)
    for _ in range(2):  # first pass warms compilation caches
        rs = HighLevelResampler.init(1, 48000, 44100, 44100)
        cursor = 0

        def hl_cb(total_frames: int) -> np.ndarray:
            nonlocal cursor
            give = min(total_frames, hl_in.shape[0] - cursor)
            out = hl_in[cursor : cursor + give]
            cursor += give
            return out

        t0 = time.perf_counter()
        hl_out = rs.resample_stream(hl_cb)
        hl_dt = time.perf_counter() - t0
    msps = hl_out.size / hl_dt / 1e6
    print(json.dumps({
        "metric": "config1b mono 48k->44.1k via HighLevelResampler.resample_stream",
        "value": round(msps, 1), "unit": "Msamples/s",
        "vs_baseline": round(msps / 37.4, 2),
    }), flush=True)

    # 2. stereo 96k->48k, 1024 streams (strided)
    dt = pipeline_time([make_launch(96000, 48000, 2048)])
    report("config2 stereo 96k->48k 2:1 x1024 streams", 2048, dt, 54.0)

    # 3. mono 8k->48k, 1024 streams (tiled d=0)
    dt = pipeline_time([make_launch(8000, 48000, 1024)])
    report("config3 mono 8k->48k upsample x1024 streams", 1024, dt, 45.5)

    # 4. pitch bend: ONE farm whose ratio is adjusted EVERY chunk across the
    # 0.5x..2.0x sweep — the real Adjust duty cycle (increment/config rebuild
    # + kernel-plan switch per chunk, clownresampler.h:1052-1056). Device-side
    # measurement: the farm's staging stays resident, each iteration adjusts
    # and launches the re-planned kernels (transfers are benchmarked
    # separately in 4b — the axon tunnel's ~30 MB/s would otherwise swamp the
    # metric with environment-specific I/O).
    from clownresampler_tpu.farm import UniformStreamFarm
    from clownresampler_tpu.ops.pallas_resample import multi_resample

    sweep_rates = [int(44100 * r) for r in (0.5, 0.7, 0.9, 1.0, 1.2, 1.5, 1.8, 2.0)]
    farm = UniformStreamFarm(1024, 2, sweep_rates[0], 44100, 88200,
                             chunk_frames=8192, max_radius=6)
    chunk = rng.integers(-32768, 32768, size=(1024, 8192, 2)).astype(np.int16)
    farm._stage(chunk)

    def adjusted_launch(i):
        assert farm.adjust(sweep_rates[i % len(sweep_rates)], 44100, 88200)
        n_out = min(farm._natural_count(farm._fill - 2 * farm._radius_bound), 4096)
        specs = farm._launch_specs(n_out)
        return multi_resample(
            farm._table,
            tuple(farm._staging_device() for _ in specs),
            tuple(st for _, st, _ in specs),
            tuple(p for *_, p in specs),
        )

    outs = [adjusted_launch(i) for i in range(16)]  # compile all 8 plans
    jax.block_until_ready(outs)
    n_iters, out_samples = 64, 0
    outs = []
    t0 = time.perf_counter()
    for i in range(n_iters):
        o = adjusted_launch(i)
        out_samples += sum(int(np.prod(a.shape)) for a in o)
        outs.append(o)
    jax.block_until_ready(outs)
    dt4 = time.perf_counter() - t0
    msps = out_samples / dt4 / 1e6
    print(json.dumps({
        "metric": "config4 per-chunk pitch-bend sweep 0.5x-2.0x, 1024-stream farm (adjust+launch duty cycle)",
        "value": round(msps, 1), "unit": "Msamples/s",
        "vs_baseline": round(msps / 74.9, 2),
    }), flush=True)

    # 4b. the same farm end to end (process() incl. H2D upload, staging and
    # D2H download of every wide output through the relay tunnel).
    farm4b = UniformStreamFarm(1024, 2, sweep_rates[0], 44100, 88200,
                               chunk_frames=4096, max_radius=6)
    chunk4b = rng.integers(-32768, 32768, size=(1024, 4096, 2)).astype(np.int16)
    for i in range(2):
        assert farm4b.adjust(sweep_rates[i % len(sweep_rates)], 44100, 88200)
        farm4b.process(chunk4b)
    out_samples = 0
    t0 = time.perf_counter()
    for i in range(4):
        assert farm4b.adjust(sweep_rates[i % len(sweep_rates)], 44100, 88200)
        out_samples += farm4b.process(chunk4b).size
    dt4b = time.perf_counter() - t0
    msps = out_samples / dt4b / 1e6
    print(json.dumps({
        "metric": "config4b pitch-bend farm end-to-end incl. host transfers (tunnel-bound)",
        "value": round(msps, 1), "unit": "Msamples/s",
        "vs_baseline": round(msps / 74.9, 2),
    }), flush=True)

    # 5. mixed-ratio farm: 4 ratio groups x 256 stereo streams, every group's
    # launch fused into ONE device program (multi_resample) — one dispatch
    # floor instead of four (the round-1 config-5 gap).
    from clownresampler_tpu.ops.pallas_resample import multi_resample

    g_specs = []
    for in_rate, out_rate in [(48000, 44100), (44100, 48000),
                              (8000, 48000), (96000, 48000)]:
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        inc = fx.calculate_ratio(in_rate, out_rate)
        plan = plan_uniform(inc, N_OUT)
        taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        s = ((N_OUT * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
        s = -(-s // 16) * 16
        xs = [jnp.asarray(rng.integers(-32768, 32768, size=(s, 512)).astype(np.int32))
              for _ in range(2)]
        sts = [make_device_state(0, f, cfg, inc) for f in range(8)]
        g_specs.append((xs, sts,
                        (plan["kernel"], plan.get("d"), plan.get("cand"),
                         taps, N_OUT, False)))

    plans5 = tuple(p for _, _, p in g_specs)

    def combined(i):
        return multi_resample(
            table,
            tuple(g[0][i % 2] for g in g_specs),
            tuple(g[1][(3 * i + 1) % 8] for g in g_specs),
            plans5,
        )

    outs = [combined(i) for i in range(8)]
    jax.block_until_ready(outs)
    outs = []
    t0 = time.perf_counter()
    for i in range(64):
        outs.append(combined(i))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 64
    report("config5 mixed-ratio farm 4x256 stereo streams (one fused program)",
           4 * 512, dt, 74.9)

    # 6. wide non-integer downsample 44.1k->8k (general kernel, 40 taps)
    dt = pipeline_time([make_launch(44100, 8000, 2048, n_out=1024)])
    report("config6 stereo 44.1k->8k x1024 streams (general kernel)", 2048, dt, 27.0,
           n_out=1024)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""BASELINE.json benchmark suite: one JSON line per config.

Configs (BASELINE.json):
  1.  mono 48k->44.1k single stream (128-lane padded launch shape)
  1b. the same through the actual HighLevelResampler API (host-driven)
  2.  stereo 2:1 96k->48k (wide anti-alias kernel, strided path)
  3.  integer-ratio 8k->48k mono upsample (pure interpolation, d=0)
  4.  dynamic ratio sweep 0.5x->2.0x (per-chunk Adjust pitch bend)
  4b. the pitch-bend farm end-to-end incl. host transfers (tunnel-bound)
  5.  1024-stream mixed-ratio stereo transcode farm (one fused program)
  6.  wide non-integer downsample 44.1k->8k (general kernel)

Methodology: steady-state pipelined dispatch of independent launches with
distinct (state, input) pairs, blocking on all results (see bench.py).
vs_baseline divides by the C reference's single-core Msamples/s for the
closest measured anchor (BASELINE.md).

EACH CONFIG RUNS IN ITS OWN SUBPROCESS. The axon relay permanently degrades a
process's dispatch pipelining (~30 us -> ~1.5 ms per launch) once host
transfers are interleaved with the execution stream — ~20 execute->transfer
->execute cycles are enough, and neither idling nor clear_backends() heals
it (tools/probe_launch_overhead.py findings, round 2). Host-driven configs
(1b, 4b) inherently interleave transfers, so they must not share a process
with the launch-throughput configs; isolation also keeps every config's
number honest in the same way. Device-side measurement loops perform ALL
transfers (inputs, state scalars) before the first measured launch.

Run on the TPU: python benchmarks/run_all.py
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = ["1", "1b", "2", "3", "4", "4b", "5", "6"]


def _bench_common():
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
    n_out_default = 8192

    def make_launch(in_rate, out_rate, lanes, lpf=None, n_out=None):
        n_out = n_out or n_out_default
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
        import jax

        outs = []
        for i in range(8):  # warm/compile
            fn, xs, states, _ = launches[i % len(launches)]
            outs.append(fn(xs[i % len(xs)], states[i % len(states)]))
        jax.block_until_ready(outs)
        best = float("inf")
        for _ in range(3):
            outs = []
            t0 = time.perf_counter()
            for i in range(iters):
                fn, xs, states, _ = launches[i % len(launches)]
                outs.append(fn(xs[i % len(xs)], states[(i * 3 + 1) % len(states)]))
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    def report(name, lanes, dt, anchor_msps, n_out=None):
        msps = (n_out or n_out_default) * lanes / dt / 1e6
        print(json.dumps({
            "metric": name,
            "value": round(msps, 1),
            "unit": "Msamples/s",
            "vs_baseline": round(msps / anchor_msps, 2),
        }), flush=True)

    return locals()


def run_config(which: str) -> None:
    env = _bench_common()
    make_launch = env["make_launch"]
    pipeline_time = env["pipeline_time"]
    report = env["report"]
    rng = env["rng"]
    table = env["table"]
    n_out_default = env["n_out_default"]
    import jax

    if which == "1":
        # latency-bound shape: one real stream padded to the 128-lane tile
        dt = pipeline_time([make_launch(48000, 44100, 128)])
        report("config1 mono 48k->44.1k single-stream (128-lane padded)", 1, dt, 37.4)

    elif which == "1b":
        # the actual HighLevelResampler API: host-driven 0x1000-buffer
        # streaming (per-refill H2D + D2H — tunnel-bound in this environment)
        from clownresampler_tpu.highlevel import HighLevelResampler

        hl_in = rng.integers(-32768, 32768, size=(1 << 18, 1)).astype(np.int16)
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
            "metric": "config1b mono 48k->44.1k via HighLevelResampler.resample_stream (host-driven, tunnel-bound)",
            "value": round(msps, 3), "unit": "Msamples/s",
            "vs_baseline": round(msps / 37.4, 4),
        }), flush=True)

    elif which == "2":
        dt = pipeline_time([make_launch(96000, 48000, 2048)])
        report("config2 stereo 96k->48k 2:1 x1024 streams", 2048, dt, 54.0)

    elif which == "3":
        dt = pipeline_time([make_launch(8000, 48000, 1024)])
        report("config3 mono 8k->48k upsample x1024 streams", 1024, dt, 45.5)

    elif which == "4":
        # pitch bend: ONE farm whose ratio is adjusted EVERY chunk across the
        # 0.5x..2.0x sweep — the real Adjust duty cycle (increment/config
        # rebuild + kernel-plan switch per chunk, clownresampler.h:1052-1056).
        # All states/specs are prepared (and their scalars uploaded) BEFORE
        # the measured window so the launch stream stays transfer-free.
        from clownresampler_tpu.farm import UniformStreamFarm
        from clownresampler_tpu.ops.pallas_resample import multi_resample

        sweep_rates = [int(44100 * r) for r in (0.5, 0.7, 0.9, 1.0, 1.2, 1.5, 1.8, 2.0)]
        farm = UniformStreamFarm(1024, 2, sweep_rates[0], 44100, 88200,
                                 chunk_frames=8192, max_radius=6)
        chunk = rng.integers(-32768, 32768, size=(1024, 8192, 2)).astype(np.int16)
        farm._stage(chunk)

        prepared = []  # (specs, n_out) per sweep step — adjust happens here
        for rate in sweep_rates:
            assert farm.adjust(rate, 44100, 88200)
            n_out = min(farm._natural_count(farm._fill - 2 * farm._radius_bound), 4096)
            prepared.append((farm._launch_specs(n_out), n_out))
        x = farm._staging_device()

        def launch(i):
            specs, _ = prepared[i % len(prepared)]
            return multi_resample(
                farm._table,
                tuple(x for _ in specs),
                tuple(st for _, st, _ in specs),
                tuple(p for *_, p in specs),
            )

        outs = [launch(i) for i in range(16)]
        jax.block_until_ready(outs)
        best, samples = float("inf"), 0
        for _ in range(3):
            outs = []
            t0 = time.perf_counter()
            for i in range(64):
                outs.append(launch(i))
            jax.block_until_ready(outs)
            dt = time.perf_counter() - t0
            if dt < best:
                best = dt
                samples = sum(int(np.prod(a.shape)) for o in outs for a in o)
        msps = samples / best / 1e6
        print(json.dumps({
            "metric": "config4 per-chunk pitch-bend sweep 0.5x-2.0x, 1024-stream farm (adjust+launch duty cycle)",
            "value": round(msps, 1), "unit": "Msamples/s",
            "vs_baseline": round(msps / 74.9, 2),
        }), flush=True)

    elif which == "4b":
        # the same farm end to end: process() incl. H2D upload, staging and
        # D2H download of every wide output through the relay tunnel
        from clownresampler_tpu.farm import UniformStreamFarm

        sweep_rates = [int(44100 * r) for r in (0.5, 0.7, 0.9, 1.0, 1.2, 1.5, 1.8, 2.0)]
        farm = UniformStreamFarm(1024, 2, sweep_rates[0], 44100, 88200,
                                 chunk_frames=4096, max_radius=6)
        chunk = rng.integers(-32768, 32768, size=(1024, 4096, 2)).astype(np.int16)
        for i in range(2):
            assert farm.adjust(sweep_rates[i % len(sweep_rates)], 44100, 88200)
            farm.process(chunk)
        out_samples = 0
        t0 = time.perf_counter()
        for i in range(4):
            assert farm.adjust(sweep_rates[i % len(sweep_rates)], 44100, 88200)
            out_samples += farm.process(chunk).size
        msps = out_samples / (time.perf_counter() - t0) / 1e6
        print(json.dumps({
            "metric": "config4b pitch-bend farm end-to-end incl. host transfers (tunnel-bound)",
            "value": round(msps, 3), "unit": "Msamples/s",
            "vs_baseline": round(msps / 74.9, 4),
        }), flush=True)

    elif which == "5":
        # mixed-ratio farm: 4 ratio groups x 256 stereo streams, every
        # group's launch fused into ONE device program (multi_resample) —
        # one dispatch floor instead of four (the round-1 config-5 gap).
        from clownresampler_tpu import fixedpoint as fx
        from clownresampler_tpu.configure import configure
        from clownresampler_tpu.lowlevel import make_device_state
        from clownresampler_tpu.ops.pallas_resample import (
            multi_resample,
            plan_uniform,
        )
        import jax.numpy as jnp

        g_specs = []
        for in_rate, out_rate in [(48000, 44100), (44100, 48000),
                                  (8000, 48000), (96000, 48000)]:
            cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
            inc = fx.calculate_ratio(in_rate, out_rate)
            plan = plan_uniform(inc, n_out_default)
            taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
            s = ((n_out_default * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
            s = -(-s // 16) * 16
            xs = [jnp.asarray(rng.integers(-32768, 32768, size=(s, 512)).astype(np.int32))
                  for _ in range(2)]
            sts = [make_device_state(0, f, cfg, inc) for f in range(8)]
            g_specs.append((xs, sts,
                            (plan["kernel"], plan.get("d"), plan.get("cand"),
                             taps, n_out_default, False)))

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
        best = float("inf")
        for _ in range(3):
            outs = []
            t0 = time.perf_counter()
            for i in range(64):
                outs.append(combined(i))
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / 64)
        report("config5 mixed-ratio farm 4x256 stereo streams (one fused program)",
               4 * 512, best, 74.9)

    elif which == "6":
        # wide non-integer downsample: the general kernel's input block is
        # VMEM-resident and rows scale ~5.5x frames, capping n_out at ~2048
        # per sub-launch; pack 4 consecutive sub-launches (a real stream's
        # positions, the farm's steady-state shape) into ONE program to
        # amortise the dispatch floor.
        from clownresampler_tpu import fixedpoint as fx
        from clownresampler_tpu.configure import configure
        from clownresampler_tpu.lowlevel import make_device_state
        from clownresampler_tpu.ops.pallas_resample import multi_resample
        import jax.numpy as jnp

        n_sub, sub_frames, lanes = 4, 2048, 2048
        cfg = configure(44100, 8000, 44100)
        inc = fx.calculate_ratio(44100, 8000)
        taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        # per-sub-launch staging: rows must stay under the Mosaic VMEM bound
        # (farm.VMEM_SAFE_INPUT_ROWS), so each packed sub-launch owns its own
        # chunk buffer — 4 buffered chunks of the same 1024-stream fleet.
        s = ((sub_frames * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
        s = -(-s // 16) * 16
        xsets = [tuple(jnp.asarray(
                    rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))
                 for _ in range(n_sub)) for _ in range(2)]
        plans6 = tuple(("general", None, None, taps, sub_frames, False)
                       for _ in range(n_sub))
        state_sets = [tuple(make_device_state(0, (f0 * 7 + k) % 65536, cfg, inc)
                            for k in range(n_sub)) for f0 in range(8)]

        def launch6(i):
            return multi_resample(table, xsets[i % 2],
                                  state_sets[(3 * i + 1) % 8], plans6)

        outs = [launch6(i) for i in range(8)]
        jax.block_until_ready(outs)
        best = float("inf")
        for _ in range(3):
            outs = []
            t0 = time.perf_counter()
            for i in range(48):
                outs.append(launch6(i))
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / 48)
        report("config6 stereo 44.1k->8k x1024 streams (general kernel, 4 packed sub-launches)",
               lanes, best, 27.0, n_out=n_sub * sub_frames)

    else:
        raise SystemExit(f"unknown config {which}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--config":
        run_config(sys.argv[2])
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for which in CONFIGS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--config", which],
            cwd=repo, text=True, capture_output=True,
        )
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            print(json.dumps({"metric": f"config{which}", "error":
                              r.stderr.strip().splitlines()[-1][:300] if r.stderr else "failed"}),
                  flush=True)


if __name__ == "__main__":
    main()

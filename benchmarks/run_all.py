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
  7.  fused whole-stream scan 44.1k->8k (one lax.scan, zero host round-trips)
  7b. whole-stream bulk 44.1k->8k via closed-form segments (the
      resample_stream(bulk) route: independent launches, batch-speed)
  8.  wide-kernel domain 44.1k->132 (radius 1003, taps 2008): the DMA-based
      wide fast path vs the XLA gather oracle it replaced
  8c. widest accepted ratio 44.1k->44 (radius 3007, taps 6016): the blocked
      tap-grid path past the whole-window MAC boundary

Methodology: the K-SLOPE CHAIN (see bench.py docstring): K kernel iterations
chained inside one jitted lax.scan with data feedback (x[0,0] += out[0,0]&1),
timed at two chain lengths; the slope (T2-T1)/(K2-K1) is the true
per-iteration device time, cancelling this relay's fixed per-program overhead
(~60 ms) and immune to its ack-before-completion behavior (block_until_ready
lies here; pipelined-launch timing measures the ack stream, not the device —
the round-1 numbers produced that way were fiction). vs_baseline divides by
the C reference's single-core Msamples/s for the closest measured anchor
(BASELINE.md).

EACH CONFIG RUNS IN ITS OWN SUBPROCESS (clean relay connection; host-driven
configs 1b/4b interleave transfers, which would perturb other configs).

Run on the TPU: python benchmarks/run_all.py
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = ["1", "1b", "2", "3", "4", "4b", "5", "6", "7", "7b", "8", "8c", "9"]

K1, K2 = 8, 40


def _kslope(body, carry0, k1=K1, k2=K2, reps=4, min_delta=0.02):
    """Per-iteration seconds of `body` via the two-length chained scan.

    Adaptive: if the two chain lengths differ by less than ``min_delta``
    seconds of wall time, the slope is below this relay's timing jitter —
    quadruple both lengths and remeasure (kernels got fast enough this round
    that fixed K1/K2 produced negative slopes on the quickest configs).

    EVERY leaf of the carry feeds the returned scalar: materializing only
    one leaf lets XLA's while-loop simplifier DELETE the other chains (and
    their kernels) from the compiled loop — the round-5 DCE fiction that
    inflated every multi-chain config ~4x (benchmarks/RESULTS.md round-5
    methodology correction; tools/probe_chain_dce.py has the proof).
    """
    import jax
    import jax.numpy as jnp

    def make(k):
        @jax.jit
        def chain(c):
            c, _ = jax.lax.scan(lambda cc, _: (body(cc), None), c, None, length=k)
            leaves = jax.tree_util.tree_leaves(c)
            acc = jnp.int32(0)
            for leaf in leaves:
                acc = acc + jnp.asarray(leaf).ravel()[0].astype(jnp.int32)
            return acc

        return chain

    def best_time(c):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = c(carry0)
            jax.block_until_ready(r)
            _ = np.asarray(r)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    while True:
        c1, c2 = make(k1), make(k2)
        for c in (c1, c2):  # compile + warm; force real completion
            r = c(carry0)
            jax.block_until_ready(r)
            _ = np.asarray(r)
        t1, t2 = best_time(c1), best_time(c2)
        if t2 - t1 >= min_delta or k2 >= 2048:
            return (t2 - t1) / (k2 - k1)
        k1, k2 = k1 * 4, k2 * 4


def _report(name, samples_per_iter, dt, anchor_msps):
    msps = samples_per_iter / max(dt, 1e-9) / 1e6
    print(json.dumps({
        "metric": name,
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / anchor_msps, 2),
        "per_iter_ms": round(dt * 1e3, 3),
    }), flush=True)


def _bench_common():
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.lowlevel import make_device_state
    from clownresampler_tpu.models import lanczos_kernel_table
    from clownresampler_tpu.models import DEFAULT_MODEL
    from clownresampler_tpu.ops.pallas_resample import (
        choose_strided_plan,
        plan_uniform,
        resample_integer_stride,
        resample_strided_phases,
        resample_strided_phases_wide,
        resample_uniform_lanes_general,
        resample_uniform_lanes_tiled,
        strided_phase_padding,
        strided_table_device,
    )

    table = jnp.asarray(lanczos_kernel_table())
    rng = np.random.default_rng(0)
    n_out_default = 8192  # 16384-frame multi-lane inputs exceed Mosaic VMEM

    def input_rows(cfg, inc, plan, max_taps, n_out):
        """Rows a launch's input must provide (shared by every config)."""
        s = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
        if plan["kernel"] == "strided":
            s += strided_phase_padding(max_taps, plan["d"], 32)
        return -(-s // 16) * 16

    def make_body(in_rate, out_rate, lanes, lpf=None, n_out=None):
        """(body, x0, samples_per_iter) for one kernel class at one ratio."""
        n_out = n_out or n_out_default
        lpf = lpf or max(in_rate, out_rate)
        cfg = configure(in_rate, out_rate, lpf)
        inc = fx.calculate_ratio(in_rate, out_rate)
        plan = plan_uniform(inc, n_out)
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        s = input_rows(cfg, inc, plan, max_taps, n_out)
        x0 = jnp.asarray(
            rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32)
        )
        state = make_device_state(0, 0x4321, cfg, inc)
        jax.block_until_ready(x0)

        tstr = strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                                    cfg.kernel_step_size, max_taps)
        if plan["kernel"] == "tiled":
            # single-chain body: group=32 is ~27% faster (fleets prefer 8)
            grp_t = 32 if n_out % 256 == 0 else 8
            fn = lambda x: resample_uniform_lanes_tiled(
                table, x, state, max_taps=max_taps, n_out=n_out,
                d=plan["d"], cand=plan["cand"], table_strided=tstr,
                group=grp_t)[0]
        elif plan["kernel"] == "strided":
            choice = choose_strided_plan(s, plan["d"], n_out, max_taps)
            if choice is None:
                fn = lambda x: resample_integer_stride(
                    table, x, state, max_taps=max_taps, n_out=n_out,
                    d=plan["d"])[0]
            else:
                variant, grp = choice
                sfn = (resample_strided_phases if variant == "fused"
                       else resample_strided_phases_wide)
                fn = lambda x: sfn(
                    table, x, state, max_taps=max_taps, n_out=n_out,
                    d=plan["d"], group=grp)[0]
        else:
            fn = lambda x: resample_uniform_lanes_general(
                table, x, state, max_taps=max_taps, n_out=n_out,
                table_strided=tstr)[0]

        def body(x):
            out = fn(x)
            return x.at[0, 0].add(out[0, 0] & 1)

        return body, x0, n_out * lanes

    return locals()


def run_config(which: str) -> None:
    env = _bench_common()
    make_body = env["make_body"]
    rng = env["rng"]
    table = env["table"]
    n_out_default = env["n_out_default"]
    import jax
    import jax.numpy as jnp

    if which == "1":
        # latency-bound shape: one real stream padded to the 128-lane tile;
        # only that stream's samples are counted
        body, x0, _ = make_body(48000, 44100, 128)
        dt = _kslope(body, x0)
        _report("config1 mono 48k->44.1k single-stream (128-lane padded)",
                n_out_default * 1, dt, 37.4)

    elif which == "1b":
        # the actual HighLevelResampler API, both routes: the host-driven
        # 0x1000-buffer chunk loop (per-refill H2D + D2H — tunnel-bound in
        # this environment) and the bulk fused-scan path (ONE upload + ONE
        # lax.scan + ONE download; VERDICT r2 item 8)
        from clownresampler_tpu.highlevel import HighLevelResampler

        hl_in = rng.integers(-32768, 32768, size=(1 << 18, 1)).astype(np.int16)

        def make_cb():
            cursor = 0

            def hl_cb(total_frames: int) -> np.ndarray:
                nonlocal cursor
                give = min(total_frames, hl_in.shape[0] - cursor)
                out = hl_in[cursor : cursor + give]
                cursor += give
                return out

            return hl_cb

        for bulk, label in [(True, "bulk segmented"), (False, "host chunk loop")]:
            for _ in range(2):  # first pass warms compilation caches
                rs = HighLevelResampler.init(1, 48000, 44100, 44100)
                t0 = time.perf_counter()
                hl_out = rs.resample_stream(make_cb(), bulk=bulk)
                hl_dt = time.perf_counter() - t0
            msps = hl_out.size / hl_dt / 1e6
            print(json.dumps({
                "metric": f"config1b mono 48k->44.1k via HighLevelResampler.resample_stream ({label})",
                "value": round(msps, 3), "unit": "Msamples/s",
                "vs_baseline": round(msps / 37.4, 4),
            }), flush=True)

    elif which == "2":
        # polyphase strided Pallas kernel (fused variant). Round-5 honest
        # structure (tools/probe_headline_structure.py long chains): the
        # strided class runs two fused 1024-lane launches on independent
        # buffers at exactly 2x the mono-1024 time (0.365 ms vs mono-2048's
        # 0.495) — the farm's STRIDED_LANE_SPLIT staging.
        from clownresampler_tpu import fixedpoint as fx
        from clownresampler_tpu.configure import configure
        from clownresampler_tpu.lowlevel import make_device_state
        from clownresampler_tpu.ops.pallas_resample import (
            choose_strided_plan,
            multi_resample,
            strided_phase_padding,
        )

        cfg = configure(96000, 48000, 96000)
        inc = fx.calculate_ratio(96000, 48000)
        d = inc >> 16
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        n_out = 4096            # keeps the input inside the fused VMEM budget
        s = (n_out - 8 * 32) * d + strided_phase_padding(max_taps, d, 32) + 64
        s = -(-s // 16) * 16
        assert choose_strided_plan(s, d, n_out, max_taps) == ("fused", 32), (s, d)
        n_sub, split = 2, 1024
        xs0 = tuple(
            jnp.asarray(rng.integers(-32768, 32768, size=(s, split)).astype(np.int32))
            for _ in range(n_sub)
        )
        state = make_device_state(0, 0x4321, cfg, inc)
        jax.block_until_ready(xs0)
        plans = tuple(("strided", d, None, max_taps, n_out, False)
                      for _ in range(n_sub))
        states = tuple(state for _ in range(n_sub))

        def body(xs):
            outs = multi_resample(table, xs, states, plans)
            return tuple(x.at[0, 0].add(o[0, 0] & 1) for x, o in zip(xs, outs))

        _report("config2 stereo 96k->48k 2:1 x1024 streams (polyphase Pallas, 2x1024-lane fused launches)",
                n_out * n_sub * split, _kslope(body, xs0), 54.0)

    elif which == "3":
        # monolithic fleet launch (round-5 honest structure: split chains
        # have ~zero device overlap and strictly lose to one launch —
        # tools/probe_headline_structure.py); group 32 as the headline
        from clownresampler_tpu.ops.pallas_resample import (
            multi_resample,
            plan_uniform,
        )

        lanes3 = 1024
        from clownresampler_tpu import fixedpoint as fx
        from clownresampler_tpu.configure import configure
        from clownresampler_tpu.lowlevel import make_device_state
        cfg = configure(8000, 48000, 48000)
        inc = fx.calculate_ratio(8000, 48000)
        plan = plan_uniform(inc, n_out_default)
        taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        s3 = env["input_rows"](cfg, inc, plan, taps, n_out_default)
        x0 = jnp.asarray(
            rng.integers(-32768, 32768, size=(s3, lanes3)).astype(np.int32))
        state = make_device_state(0, 0x4321, cfg, inc)
        jax.block_until_ready(x0)
        plans = ((plan["kernel"], plan["d"], plan["cand"], taps,
                  n_out_default, False, None, 0, 32),)
        from clownresampler_tpu.models import DEFAULT_MODEL as _M
        from clownresampler_tpu.ops.pallas_resample import strided_table_device as _std
        tstrs3 = (_std(_M.radius, _M.resolution, cfg.kernel_step_size, taps),)

        def body(x):
            outs = multi_resample(table, (x,), (state,), plans, tstrs=tstrs3)
            return x.at[0, 0].add(outs[0][0, 0] & 1)

        _report("config3 mono 8k->48k upsample x1024 streams (one monolithic launch)",
                n_out_default * lanes3, _kslope(body, x0), 45.5)

    elif which == "4":
        # pitch bend: ONE farm whose ratio is adjusted EVERY chunk across the
        # 0.5x..2.0x sweep — the real Adjust duty cycle (increment/config
        # rebuild + kernel-plan switch, clownresampler.h:1052-1056). One scan
        # iteration = a full 8-rate sweep cycle, each rate's re-planned
        # launch chained by feedback.
        import jax.numpy as jnp

        from clownresampler_tpu.farm import UniformStreamFarm
        from clownresampler_tpu.ops.pallas_resample import multi_resample

        sweep_rates = [int(44100 * r) for r in (0.5, 0.7, 0.9, 1.0, 1.2, 1.5, 1.8, 2.0)]
        farm = UniformStreamFarm(1024, 2, sweep_rates[0], 44100, 88200,
                                 chunk_frames=8192, max_radius=6)
        chunk = rng.integers(-32768, 32768, size=(1024, 8192, 2)).astype(np.int16)
        farm._stage(chunk)

        prepared = []  # the adjust work happens here, per sweep step
        total_samples = 0
        for rate in sweep_rates:
            assert farm.adjust(rate, 44100, 88200)
            # Emit the chunk's FULL natural count, as farm._emit does (the
            # farm frame-tiles internally at <= 2^14); the old 4096 cap
            # under-filled the upsample sweep steps' launches by 2-4x.
            n_out = min(farm._natural_count(farm._fill - 2 * farm._radius_bound),
                        1 << 14)
            specs, _splits = farm._launch_specs(n_out)
            prepared.append((
                tuple(si for _, si, _, _ in specs),
                tuple(st for _, _, st, _ in specs),
                tuple(p for *_, p in specs),
                farm._spec_tstr(specs),
            ))
            total_samples += sum(
                p[4] * farm._lane_slices[si][0] for _, si, _, p in specs
            )

        x0 = tuple(farm._staging) if farm._device_staging else (
            jnp.asarray(farm._staging),)

        def body(xs):
            for sidx, states_r, plans_r, tstrs_r in prepared:  # unrolled sweep
                outs = multi_resample(
                    farm._table, tuple(xs[si] for si in sidx), states_r, plans_r,
                    tstrs=tstrs_r)
                new = list(xs)
                for k, si in enumerate(sidx):
                    new[si] = new[si].at[0, 0].add(outs[k][0, 0] & 1)
                xs = tuple(new)
            return xs

        dt = _kslope(body, x0, k1=2, k2=6)
        _report("config4 per-chunk pitch-bend sweep 0.5x-2.0x, 1024-stream farm (adjust duty cycle)",
                total_samples, dt, 74.9)

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
        # group's launch fused into ONE device program (multi_resample)
        from clownresampler_tpu import fixedpoint as fx
        from clownresampler_tpu.configure import configure
        from clownresampler_tpu.lowlevel import make_device_state
        from clownresampler_tpu.ops.pallas_resample import (
            multi_resample,
            plan_uniform,
            strided_phase_padding,
        )

        from clownresampler_tpu.models import DEFAULT_MODEL as _M
        from clownresampler_tpu.ops.pallas_resample import strided_table_device as _std
        xs0, states, plans, tstrs5 = [], [], [], []
        for in_rate, out_rate in [(48000, 44100), (44100, 48000),
                                  (8000, 48000), (96000, 48000)]:
            cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
            inc = fx.calculate_ratio(in_rate, out_rate)
            plan = plan_uniform(inc, n_out_default)
            taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
            s = ((n_out_default * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
            if plan["kernel"] == "strided":
                s += strided_phase_padding(taps, plan["d"], 32)
            s = -(-s // 16) * 16
            xs0.append(jnp.asarray(
                rng.integers(-32768, 32768, size=(s, 512)).astype(np.int32)))
            states.append(make_device_state(0, 0x4321, cfg, inc))
            # mirror the farm dispatchers' plan policy: tiled launches pin
            # group 32 whenever the tile carries it (round-5 honest sweep)
            if plan["kernel"] == "tiled" and n_out_default % (8 * 32) == 0:
                plans.append((plan["kernel"], plan.get("d"), plan.get("cand"),
                              taps, n_out_default, False, None, 0, 32))
            else:
                plans.append((plan["kernel"], plan.get("d"), plan.get("cand"),
                              taps, n_out_default, False))
            tstrs5.append(
                _std(_M.radius, _M.resolution, cfg.kernel_step_size, taps)
                if plan["kernel"] in ("tiled", "general") else None)
        states, plans, tstrs5 = tuple(states), tuple(plans), tuple(tstrs5)
        jax.block_until_ready(xs0)

        def body(xs):
            outs = multi_resample(table, xs, states, plans, tstrs=tstrs5)
            return tuple(x.at[0, 0].add(o[0, 0] & 1) for x, o in zip(xs, outs))

        dt = _kslope(body, tuple(xs0))
        _report("config5 mixed-ratio farm 4x256 stereo streams (one fused program)",
                4 * n_out_default * 512, dt, 74.9)

    elif which == "6":
        # wide non-integer downsample through the general kernel; the
        # VMEM-resident input caps frames at ~2048 per sub-launch for this
        # ratio, so one iteration = 4 packed sub-launches (buffered chunks)
        from clownresampler_tpu import fixedpoint as fx
        from clownresampler_tpu.configure import configure
        from clownresampler_tpu.lowlevel import make_device_state
        from clownresampler_tpu.ops.pallas_resample import multi_resample

        n_sub, sub_frames, lanes = 4, 2048, 2048
        cfg = configure(44100, 8000, 44100)
        inc = fx.calculate_ratio(44100, 8000)
        taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        s = ((sub_frames * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
        s = -(-s // 16) * 16
        xs0 = tuple(jnp.asarray(
            rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))
            for _ in range(n_sub))
        plans6 = tuple(("general", None, None, taps, sub_frames, False)
                       for _ in range(n_sub))
        states6 = tuple(make_device_state(0, (7 * k + 3) % 65536, cfg, inc)
                        for k in range(n_sub))
        from clownresampler_tpu.models import DEFAULT_MODEL as _M
        from clownresampler_tpu.ops.pallas_resample import strided_table_device as _std
        tstrs6 = tuple(_std(_M.radius, _M.resolution, cfg.kernel_step_size, taps)
                       for _ in range(n_sub))
        jax.block_until_ready(list(xs0))

        def body(xs):
            outs = multi_resample(table, xs, states6, plans6, tstrs=tstrs6)
            return tuple(x.at[0, 0].add(o[0, 0] & 1) for x, o in zip(xs, outs))

        dt = _kslope(body, xs0)
        _report("config6 stereo 44.1k->8k x1024 streams (general kernel, 4 packed sub-launches)",
                n_sub * sub_frames * lanes, dt, 27.0)

    elif which == "7":
        # fused whole-stream scan (resample_scan_fused): the entire chunked
        # stream pipeline — halo carry, natural counts, position carry — as
        # ONE lax.scan on device, any ratio class (VERDICT r1 item 4's
        # 44.1k->8k case: general kernel, ~40 taps). Scan steps serialize by
        # construction, so the K-slope is over the CHUNK COUNT.
        from clownresampler_tpu import fixedpoint as fx
        from clownresampler_tpu.configure import configure
        from clownresampler_tpu.lowlevel import make_device_state, resample_scan_fused
        from clownresampler_tpu.models import DEFAULT_MODEL
        from clownresampler_tpu.ops.pallas_resample import strided_table_device

        in_rate, out_rate, lanes, n_in = 44100, 8000, 2048, 8192
        # Round-5 honest split x pipeline matrix: all six points inside
        # 4,029-4,432 Msamples/s (145-164x) with no coherent ordering —
        # scan structure is window noise, so the library defaults to the
        # simplest form (split=1). CR_SCAN_SPLIT/CR_SCAN_PIPELINE override
        # for probes.
        split = int(os.environ.get("CR_SCAN_SPLIT", "1"))
        pipeline = os.environ.get("CR_SCAN_PIPELINE", "1") != "0"
        cfg = configure(in_rate, out_rate, in_rate)
        inc = fx.calculate_ratio(in_rate, out_rate)
        radius = cfg.integer_stretched_kernel_radius
        taps = -(-2 * radius // 8) * 8
        n_cap = -(-(((n_in + 2 * radius) << 16) // inc + 8) // 128) * 128
        tstr = strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                                    cfg.kernel_step_size, taps)
        state = make_device_state(0, 0, cfg, inc)

        def run_k(k):
            chunks = jnp.asarray(rng.integers(
                -32768, 32768, size=(k, n_in, lanes)).astype(np.int16))
            jax.block_until_ready(chunks)

            @jax.jit
            def go(ch, st):
                outs, produced, st2, backlog = resample_scan_fused(
                    table, ch, st, max_taps=taps, n_out=n_cap, radius=radius,
                    increment=inc, table_strided=tstr, split=split,
                    pipeline=pipeline)
                # materialize EVERY step x EVERY lane (frame 0 of each
                # chunk): a single outs[-1, 0, 0] leaf lets XLA delete the
                # other sub-fleets' engines — and every step's output writes
                # but the last — from the loop (the round-5 DCE fiction)
                return jnp.sum(outs[:, 0, :]), jnp.sum(produced), backlog

            r = go(chunks, state)
            jax.block_until_ready(r)
            best, produced = None, int(np.asarray(r[1]))
            assert not bool(np.asarray(r[2])), "scan backlog"
            for _ in range(4):
                t0 = time.perf_counter()
                rr = go(chunks, state)
                jax.block_until_ready(rr)
                _ = np.asarray(rr[0])
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best, produced

        k1, k2 = 8, 40
        t1, p1 = run_k(k1)
        t2, p2 = run_k(k2)
        dt_chunk = (t2 - t1) / (k2 - k1)
        samples_chunk = (p2 - p1) / (k2 - k1) * lanes
        _report(f"config7 fused whole-stream scan 44.1k->8k x1024 stereo (one lax.scan, split={split}, pipeline={int(pipeline)})",
                samples_chunk, dt_chunk, 27.0)

    elif which == "7b":
        # whole-stream BULK route (resample_stream(bulk) / the LowLevel
        # batched tile dispatch): with the full stream in hand, every
        # segment's window row and phase are closed-form host ints, so the
        # reference's sequential chunk loop becomes INDEPENDENT batch
        # launches that overlap on device — no scan serialization at all.
        # Measured through the REAL fused program the dispatch runs
        # (_grouped_packed_launch): int16 ch-lane windows widened/lane-padded
        # ON DEVICE, TILE_LAUNCH_GROUP independent launches, outputs trimmed
        # back to ch lanes — so the number includes the packing work the
        # library's program actually performs, not just the bare kernels.
        from clownresampler_tpu import fixedpoint as fx
        from clownresampler_tpu.configure import configure
        from clownresampler_tpu.lowlevel import (
            TILE_LAUNCH_GROUP,
            _grouped_packed_launch,
            make_device_state,
        )
        from clownresampler_tpu.models import DEFAULT_MODEL
        from clownresampler_tpu.ops.pallas_resample import strided_table_device

        in_rate, out_rate, lanes, seg_out = 44100, 8000, 2048, 2048
        cfg = configure(in_rate, out_rate, in_rate)
        inc = fx.calculate_ratio(in_rate, out_rate)
        taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        rows = ((seg_out * inc) >> 16) + taps + 128
        rows = -(-rows // 16) * 16
        g = TILE_LAUNCH_GROUP
        xs0 = tuple(jnp.asarray(
            rng.integers(-32768, 32768, size=(rows, lanes)).astype(np.int16))
            for _ in range(g))
        f0s = jnp.asarray(
            np.array([(j * seg_out * inc) & 0xFFFF for j in range(g)], np.int32))
        cfg_scalars = make_device_state(0, 0, cfg, inc).cfg
        plans = tuple(("general", None, None, taps, seg_out, False)
                      for _ in range(g))
        tstrs = tuple(strided_table_device(
            DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
            cfg.kernel_step_size, taps) for _ in range(g))
        jax.block_until_ready(list(xs0))

        def body(xs):
            outs = _grouped_packed_launch(
                table, xs, f0s, cfg_scalars, plans, tstrs, lanes)
            return tuple(
                x.at[0, 0].add((o[0, 0] & 1).astype(jnp.int16))
                for x, o in zip(xs, outs)
            )

        _report("config7b whole-stream bulk 44.1k->8k x1024 stereo (closed-form segments, 4 grouped launches)",
                g * seg_out * lanes, _kslope(body, xs0), 27.0)

    elif which == "8":
        # wide-kernel domain (VERDICT r2 item 5): radius 1003 / taps 2008 —
        # past FAST_KERNEL_MAX_TAPS every dispatcher used to fall back to the
        # XLA gather oracle; the DMA-based resample_wide_taps keeps the input
        # in HBM (no VMEM row budget) with one double-buffered DMA per frame.
        # C anchor: the scalar loop at ~33 taps does 13.5 Mframes/s, so at
        # 2008 taps it scales to ~13.5*33/2008 = 0.222 Mframes/s = 0.222
        # Msamples/s mono (tap count is the inner loop length).
        from clownresampler_tpu import fixedpoint as fx
        from clownresampler_tpu.configure import configure
        from clownresampler_tpu.lowlevel import make_device_state
        from clownresampler_tpu.models import DEFAULT_MODEL
        from clownresampler_tpu.ops.convolve import convolve_frames
        from clownresampler_tpu.ops.pallas_resample import (
            resample_wide_taps,
            strided_table_device,
        )

        cfg = configure(44100, 132, 44100)
        inc = fx.calculate_ratio(44100, 132)
        taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        assert taps > 1024, taps
        n_out, lanes = 64, 1024
        s = ((n_out * inc) >> 16) + taps + 64
        s = -(-s // 16) * 16
        x0 = jnp.asarray(
            rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))
        state = make_device_state(0, 0x4321, cfg, inc)
        tstr = strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                                    cfg.kernel_step_size, taps)
        jax.block_until_ready(x0)

        def body_wide(x):
            out, _ = resample_wide_taps(
                table, x, state, max_taps=taps, n_out=n_out, d=inc >> 16,
                table_strided=tstr)
            return x.at[0, 0].add(out[0, 0] & 1)

        _report("config8 wide kernel 44.1k->132 radius 1003 x512 stereo (DMA fast path)",
                n_out * lanes, _kslope(body_wide, x0), 0.222)

        # the oracle it replaced, at a footprint it can stand (the gather
        # materialises (n_out, taps, L) windows)
        lanes_o = 128
        x1 = jnp.asarray(
            rng.integers(-32768, 32768, size=(s, lanes_o)).astype(np.int32))
        n = jnp.arange(n_out, dtype=jnp.int32)
        pos, frac = fx.positions_from_state(
            state.position_integer, state.position_fractional,
            state.cfg.increment_hi, state.cfg.increment_lo, n)
        jax.block_until_ready(x1)

        import functools

        @functools.partial(jax.jit)
        def body_oracle(x):
            out = convolve_frames(table, x, pos, frac, state.cfg, taps)
            return x.at[0, 0].add(out[0, 0] & 1)

        _report("config8b wide-kernel oracle fallback (XLA gather) same ratio x64 stereo",
                n_out * lanes_o, _kslope(body_oracle, x1), 0.222)

    elif which == "8c":
        # the de facto WIDEST accepted ratio (44100->44, radius 3007 /
        # taps 6016): the whole-window MAC hybrid exceeds the Mosaic stack
        # here, so this exercises the 512-row blocked tap-grid path — the
        # slowest point of the accepted domain, on record. C anchor scales
        # the 33-tap scalar loop by tap count: 13.5 * 33/6016 = 0.0741
        # Msamples/s.
        from clownresampler_tpu import fixedpoint as fx
        from clownresampler_tpu.configure import configure
        from clownresampler_tpu.lowlevel import make_device_state
        from clownresampler_tpu.models import DEFAULT_MODEL
        from clownresampler_tpu.ops.pallas_resample import (
            resample_wide_taps,
            strided_table_device,
        )

        cfg = configure(44100, 44, 44100)
        inc = fx.calculate_ratio(44100, 44)
        taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        assert taps > 3072, taps  # past WIDE_WHOLE_MAC_MAX_W: blocked path
        n_out, lanes = 64, 256
        s = ((n_out * inc) >> 16) + taps + 64
        s = -(-s // 16) * 16
        x0 = jnp.asarray(
            rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))
        state = make_device_state(0, 0x4321, cfg, inc)
        tstr = strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                                    cfg.kernel_step_size, taps)
        jax.block_until_ready(x0)

        def body_widest(x):
            out, _ = resample_wide_taps(
                table, x, state, max_taps=taps, n_out=n_out, d=inc >> 16,
                table_strided=tstr)
            return x.at[0, 0].add(out[0, 0] & 1)

        _report("config8c widest ratio 44.1k->44 radius 3007 x128 stereo (blocked tap-grid)",
                n_out * lanes, _kslope(body_widest, x0), 0.0741)

    elif which == "9":
        # MEDIUM-width band (taps 1016 — the top of the in-guard band, where
        # the roll-path general kernel is weakest): both dispatch candidates
        # at dispatch-realistic shapes, the measurement behind
        # WIDE_DISPATCH_MIN_TAPS (see tools/probe_midwide.py for the sweep).
        # C anchor: 13.5 Mfps x 33/1016 taps = 0.4385 Msamples/s mono.
        from clownresampler_tpu import fixedpoint as fx
        from clownresampler_tpu.configure import configure
        from clownresampler_tpu.lowlevel import make_device_state
        from clownresampler_tpu.models import DEFAULT_MODEL
        from clownresampler_tpu.ops.pallas_resample import (
            general_w_load,
            resample_uniform_lanes_general,
            resample_wide_taps,
            strided_table_device,
        )

        cfg = configure(44100, 262, 44100)
        inc = fx.calculate_ratio(44100, 262)
        taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        assert 504 < taps <= 1024, taps
        lanes = 1024
        state = make_device_state(0, 0x4321, cfg, inc)
        tstr = strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                                    cfg.kernel_step_size, taps)

        # (a) the roll-path general kernel at the dispatcher's launch shape:
        # the VMEM input-row budget caps REAL frames below the 128-frame
        # grain (padding frames MAC clamped junk at identical cost), so the
        # honest rate counts only the real frames a dispatch launch emits.
        n_gen = 128
        w_load, shift = general_w_load(taps)
        assert not shift, "config 9 must exercise the roll path"
        # Multi-lane-tile ceiling of the measured compile envelope at this
        # width (general_launch_fits: s=12288 never compiles past w_load 136).
        s = 8192
        real = min(n_gen, ((s - taps - w_load) << 16) // inc)
        x0 = jnp.asarray(
            rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))
        jax.block_until_ready(x0)

        def body_gen(x):
            out, _ = resample_uniform_lanes_general(
                table, x, state, max_taps=taps, n_out=n_gen,
                table_strided=tstr)
            return x.at[0, 0].add(out[0, 0] & 1)

        _report(f"config9a medium band 44.1k->262 taps 1016 general roll path "
                f"({real}/{n_gen} real frames) x512 stereo",
                real * lanes, _kslope(body_gen, x0), 0.4385)

        # (b) the DMA wide kernel at its dispatch grain (64-frame launches)
        n_w = 64
        s_w = ((n_w * inc) >> 16) + taps + 64
        s_w = -(-s_w // 16) * 16
        x1 = jnp.asarray(
            rng.integers(-32768, 32768, size=(s_w, lanes)).astype(np.int32))
        jax.block_until_ready(x1)

        def body_wide9(x):
            out, _ = resample_wide_taps(
                table, x, state, max_taps=taps, n_out=n_w, d=inc >> 16,
                table_strided=tstr)
            return x.at[0, 0].add(out[0, 0] & 1)

        _report("config9b medium band 44.1k->262 taps 1016 wide DMA kernel x512 stereo",
                n_w * lanes, _kslope(body_wide9, x1), 0.4385)

    else:
        raise SystemExit(f"unknown config {which}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--config":
        run_config(sys.argv[2])
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from bench import _wait_for_backend

    if not _wait_for_backend():
        print(json.dumps({"metric": "suite",
                          "error": "accelerator backend unavailable"}),
              flush=True)
        return
    for which in CONFIGS:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--config", which],
                cwd=repo, text=True, capture_output=True, timeout=1200,
            )
        except subprocess.TimeoutExpired:
            print(json.dumps({"metric": f"config{which}",
                              "error": "timeout (1200s)"}), flush=True)
            continue
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            print(json.dumps({"metric": f"config{which}", "error":
                              r.stderr.strip().splitlines()[-1][:300] if r.stderr else "failed"}),
                  flush=True)


if __name__ == "__main__":
    main()

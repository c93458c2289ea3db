#!/usr/bin/env python3
"""Compare resampling kernel variants on the current backend (dev tool).

Uses the honest K-slope chained methodology (utils.profiling
measure_kernel_time): on the relay-tunneled device, pipelined-launch timing
measures the ack stream, not the hardware (benchmarks/RESULTS.md).

Usage: python tools/bench_kernels.py [lanes] [n_out]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.lowlevel import make_device_state
    from clownresampler_tpu.models import DEFAULT_MODEL, lanczos_kernel_table
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
    from clownresampler_tpu.utils.profiling import measure_kernel_time

    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_out = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    table = jnp.asarray(lanczos_kernel_table())
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} lanes={lanes} n_out={n_out}", flush=True)

    def measure(name, body, x, samples):
        stats = measure_kernel_time(body, x, samples, k1=16, k2=96)
        print(f"{name}: {stats.seconds_per_launch*1e3:.3f} ms -> "
              f"{stats.samples_per_second/1e9:.2f} Gsamples/s", flush=True)

    def setup(in_rate, out_rate):
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        inc = fx.calculate_ratio(in_rate, out_rate)
        state = make_device_state(0, 0x4321, cfg, inc)
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        plan = plan_uniform(inc, n_out)
        s = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
        if plan["kernel"] == "strided":
            s += strided_phase_padding(max_taps, plan["d"], 32)
        s = -(-s // 16) * 16
        x = jnp.asarray(rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))
        tstr = strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                                    cfg.kernel_step_size, max_taps)
        return cfg, inc, state, max_taps, plan, x, tstr

    # Tiled kernel classes
    for in_rate, out_rate, label in [(48000, 44100, "tiled d=1 48k->44.1k"),
                                     (8000, 44100, "tiled d=0  8k->44.1k")]:
        cfg, inc, st, taps, plan, x, tstr = setup(in_rate, out_rate)

        def body(c, st=st, taps=taps, plan=plan, tstr=tstr):
            out, _ = resample_uniform_lanes_tiled(
                table, c, st, max_taps=taps, n_out=n_out,
                d=plan["d"], cand=plan["cand"], table_strided=tstr)
            return c.at[0, 0].add(out[0, 0] & 1)

        measure(label, body, x, n_out * lanes)

    # Strided: polyphase variants + XLA fallback
    cfg, inc, st, taps, plan, x, _ = setup(96000, 48000)
    d = plan["d"]
    variants = [("strided XLA  96k->48k",
                 lambda c: resample_integer_stride(
                     table, c, st, max_taps=taps, n_out=n_out, d=d)[0])]
    choice = choose_strided_plan(x.shape[0], d, n_out, taps)
    if choice:
        grp = choice[1]
        variants += [
            ("strided fused 96k->48k",
             lambda c: resample_strided_phases(
                 table, c, st, max_taps=taps, n_out=n_out, d=d, group=grp)[0]),
            ("strided wide  96k->48k",
             lambda c: resample_strided_phases_wide(
                 table, c, st, max_taps=taps, n_out=n_out, d=d, group=grp)[0]),
        ]
    for label, fn in variants:
        def body(c, fn=fn):
            out = fn(c)
            return c.at[0, 0].add(out[0, 0] & 1)
        measure(label, body, x, n_out * lanes)

    # General kernel (wide non-integer downsample). Its (rows, 128) input
    # block is VMEM-resident, so cap frames to keep rows inside the budget.
    cfg = configure(44100, 8000, 44100)
    inc = fx.calculate_ratio(44100, 8000)
    taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
    n_gen = min(n_out, ((12288 - taps - 192) << 16) // inc) // 128 * 128
    s = -(-(((n_gen * inc) >> 16) + taps + 128) // 16) * 16
    x = jnp.asarray(rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))
    st = make_device_state(0, 0x4321, cfg, inc)
    tstr = strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                                cfg.kernel_step_size, taps)

    def body_gen(c):
        out, _ = resample_uniform_lanes_general(
            table, c, st, max_taps=taps, n_out=n_gen, table_strided=tstr)
        return c.at[0, 0].add(out[0, 0] & 1)

    measure(f"general 44.1k->8k (n_out={n_gen})", body_gen, x, n_gen * lanes)


if __name__ == "__main__":
    main()

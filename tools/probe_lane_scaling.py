#!/usr/bin/env python3
"""HONEST lane/structure scaling for the three VMEM kernel classes.

Round-5 methodology correction #2 (tools/probe_chain_dce.py): independent
pallas programs have ~ZERO device overlap (4 live chains cost 3.85x one),
and every "N split chains" benchmark materialized only chain 0, letting
XLA's while-loop simplifier delete the rest — so the split-chain structure
itself was never honestly compared against monolithic launches.

What IS real (honest round-2 measurements): grid-step pipelining INSIDE one
launch — per-kernel time was near-lane-count-flat at 128..2048 lanes
because the lane-tile axis rides the grid. So the honest optimum is
plausibly ONE launch with every lane aboard, not N split launches. This
probe settles it per kernel class at the production bench shapes:

  tiled   (headline 48k->44.1k, taps 8, n_out 8192)
  strided (config 2 96k->48k, taps 16, n_out 4096)
  general (config 6 44.1k->8k, taps 40, n_out 2048)

For each: monolithic single-chain launches at lanes 512..4096, and the
4 x 512-lane fused multi-launch (all chains LIVE) the old benches used.

Run on the TPU: python tools/probe_lane_scaling.py [tiled|strided|general|all]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(which: str) -> None:
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.lowlevel import make_device_state
    from clownresampler_tpu.models import DEFAULT_MODEL, lanczos_kernel_table
    from clownresampler_tpu.ops.pallas_resample import (
        choose_strided_plan,
        multi_resample,
        plan_uniform,
        resample_strided_phases,
        resample_uniform_lanes_general,
        resample_uniform_lanes_tiled,
        strided_phase_padding,
        strided_table_device,
    )
    from clownresampler_tpu.utils.profiling import measure_kernel_time

    table = jnp.asarray(lanczos_kernel_table())
    rng = np.random.default_rng(5)
    print(f"backend={jax.default_backend()}", flush=True)

    def run(label, body, carry0, samples):
        st = measure_kernel_time(body, carry0, samples, k1=8, k2=40)
        print(f"{label:26s} {st.seconds_per_launch*1e3:8.3f} ms/step  "
              f"{st.samples_per_second/1e9:7.2f} Gsamples/s", flush=True)

    def sweep(name, make_fn, s_rows, n_out, plan_tuple, tstr_of, state,
              lane_points=(512, 1024, 2048, 4096)):
        print(f"--- {name}", flush=True)
        for lanes in lane_points:
            x0 = jnp.asarray(rng.integers(
                -32768, 32768, size=(s_rows, lanes)).astype(np.int32))
            jax.block_until_ready(x0)
            fn = make_fn(lanes)

            def body(x, fn=fn):
                out = fn(x)
                return x.at[0, 0].add(out[0, 0] & 1)

            run(f"mono {lanes} lanes", body, x0, n_out * lanes)
        # split structures, all chains LIVE: n_sub independent w-lane buffers,
        # one fused multi_resample program per step (4x512 = the old bench)
        for n_sub, w in ((4, 512), (2, 1024), (4, 1024)):
            xs0 = tuple(jnp.asarray(rng.integers(
                -32768, 32768, size=(s_rows, w)).astype(np.int32))
                for _ in range(n_sub))
            jax.block_until_ready(xs0)
            plans = tuple(plan_tuple for _ in range(n_sub))
            states = tuple(state for _ in range(n_sub))
            tstrs = tuple(tstr_of for _ in range(n_sub)) \
                if tstr_of is not None else None

            def body_split(xs, plans=plans, states=states, tstrs=tstrs):
                outs = multi_resample(table, xs, states, plans, tstrs=tstrs)
                return tuple(x.at[0, 0].add(o[0, 0] & 1)
                             for x, o in zip(xs, outs))

            run(f"split {n_sub}x{w} (live)", body_split, xs0,
                n_out * n_sub * w)

    if which in ("tiled", "all"):
        cfg = configure(48000, 44100, 44100)
        inc = fx.calculate_ratio(48000, 44100)
        plan = plan_uniform(inc, 8192)
        taps, n_out = 8, 8192
        s = -(-(((n_out * inc) >> 16) + 96) // 16) * 16
        state = make_device_state(0, 0x4321, cfg, inc)
        tstr = strided_table_device(DEFAULT_MODEL.radius,
                                    DEFAULT_MODEL.resolution,
                                    cfg.kernel_step_size, taps)

        def make_tiled(lanes):
            grp = 32 if n_out % 256 == 0 else 8
            return lambda x: resample_uniform_lanes_tiled(
                table, x, state, max_taps=taps, n_out=n_out, d=plan["d"],
                cand=plan["cand"], table_strided=tstr, group=grp)[0]

        sweep("tiled headline 48k->44.1k", make_tiled, s, n_out,
              ("tiled", plan["d"], plan["cand"], taps, n_out, False),
              tstr, state)
        # group sweep at the fleet width: does a smaller frame group change
        # the 2048-lane regime (more grid steps, more pipelining)?
        for grp in (8, 16):
            x0 = jnp.asarray(rng.integers(
                -32768, 32768, size=(s, 2048)).astype(np.int32))
            jax.block_until_ready(x0)

            def body(x, grp=grp):
                out = resample_uniform_lanes_tiled(
                    table, x, state, max_taps=taps, n_out=n_out, d=plan["d"],
                    cand=plan["cand"], table_strided=tstr, group=grp)[0]
                return x.at[0, 0].add(out[0, 0] & 1)

            run(f"mono 2048 grp {grp}", body, x0, n_out * 2048)

    if which in ("strided", "all"):
        cfg = configure(96000, 48000, 96000)
        inc = fx.calculate_ratio(96000, 48000)
        d = inc >> 16
        taps, n_out = 16, 4096
        s = (n_out - 8 * 32) * d + strided_phase_padding(taps, d, 32) + 64
        s = -(-s // 16) * 16
        assert choose_strided_plan(s, d, n_out, taps) == ("fused", 32)
        state = make_device_state(0, 0x4321, cfg, inc)

        def make_strided(lanes):
            return lambda x: resample_strided_phases(
                table, x, state, max_taps=taps, n_out=n_out, d=d,
                group=32)[0]

        sweep("strided config2 96k->48k", make_strided, s, n_out,
              ("strided", d, None, taps, n_out, False), None, state)

    if which in ("general", "all"):
        cfg = configure(44100, 8000, 44100)
        inc = fx.calculate_ratio(44100, 8000)
        taps, n_out = 40, 2048
        s = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
        s = -(-s // 16) * 16
        state = make_device_state(0, 0x4321, cfg, inc)
        tstr = strided_table_device(DEFAULT_MODEL.radius,
                                    DEFAULT_MODEL.resolution,
                                    cfg.kernel_step_size, taps)

        def make_general(lanes):
            return lambda x: resample_uniform_lanes_general(
                table, x, state, max_taps=taps, n_out=n_out,
                table_strided=tstr)[0]

        sweep("general config6 44.1k->8k", make_general, s, n_out,
              ("general", None, None, taps, n_out, False), tstr, state)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")

#!/usr/bin/env python3
"""Do independent wide-kernel (DMA) launches overlap on device?

Expected answer per the final round-5 roofline (tools/roofline.py,
docs/ROOFLINE.md): NO — the calibration overlap sweep is perfectly flat
(N whole programs cost exactly N x one from 2 to 16 chains; the early
"1.4 T overlap aggregate" reading was itself a dead-carry artifact), so
mono should match the summed split structures. This probe exists to
confirm that device-wide fact holds for the DMA wide kernel specifically
(whose launches interleave grid MAC blocks with inter-group DMA waits —
the one kernel class where a scheduler COULD in principle fill another
program's stalls), so the "no wide-fleet splitting" farm policy
(compute_lane_slices) rests on a measurement, not an extrapolation.

This probe measures, per wide shape, the three candidate structures:

  mono          one launch over all lanes per chain step (today's bench/farm)
  shared xN     N launches over zero-copy COLUMN SLICES of the SAME buffer
                inside each chain step (the farm's fused multi-launch form:
                one staging buffer, intra-step overlap only)
  indep xN      N fully independent (buffer, chain) pairs (the config-2/3
                bench structure: inter-step overlap too)

Usage: python tools/probe_wide_overlap.py [8c|8|both]
"""

import os
import sys
import time

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
        resample_wide_taps,
        strided_table_device,
        wide_max_launch_frames,
    )
    from clownresampler_tpu.utils.profiling import measure_kernel_time

    table = jnp.asarray(lanczos_kernel_table())
    rng = np.random.default_rng(3)
    print(f"backend={jax.default_backend()}", flush=True)

    shapes = []
    if which in ("8c", "both"):
        shapes.append((44100, 44, 256))     # taps 6016, bench config 8c
    if which in ("8", "both"):
        shapes.append((44100, 132, 1024))   # taps 2008, bench config 8

    for in_rate, out_rate, lanes_total in shapes:
        cfg = configure(in_rate, out_rate, in_rate)
        inc = fx.calculate_ratio(in_rate, out_rate)
        taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        n_out = wide_max_launch_frames(taps)
        d = inc >> 16
        s = ((n_out * inc) >> 16) + taps + 64
        s = -(-s // 16) * 16
        state = make_device_state(0, 0x4321, cfg, inc)
        tstr = strided_table_device(
            DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
            cfg.kernel_step_size, taps)
        print(f"--- {in_rate}->{out_rate} taps={taps} n_out={n_out} "
              f"s={s} lanes_total={lanes_total}", flush=True)

        def fresh(lanes):
            return jnp.asarray(rng.integers(
                -32768, 32768, size=(s, lanes)).astype(np.int32))

        def run(label, body, carry0, samples):
            st = measure_kernel_time(body, carry0, samples, k1=8, k2=40)
            print(f"{label:14s} {st.seconds_per_launch*1e3:7.3f} ms/step  "
                  f"{st.samples_per_second/1e9:6.2f} Gsamples/s", flush=True)

        # mono: one launch over all lanes
        x0 = fresh(lanes_total)
        jax.block_until_ready(x0)

        def body_mono(x):
            out, _ = resample_wide_taps(
                table, x, state, max_taps=taps, n_out=n_out, d=d,
                table_strided=tstr)
            return x.at[0, 0].add(out[0, 0] & 1)

        run("mono", body_mono, x0, n_out * lanes_total)

        # shared xN: zero-copy column-slice launches of one buffer per step
        for n_chains in (2, 4, 8):
            w = lanes_total // n_chains
            if w < 128:
                continue

            def body_shared(x, n_chains=n_chains, w=w):
                outs = [
                    resample_wide_taps(
                        table, x, state, max_taps=taps, n_out=n_out, d=d,
                        table_strided=tstr, lanes=w, lane_offset=i * w)[0]
                    for i in range(n_chains)
                ]
                acc = outs[0][0, 0]
                for o in outs[1:]:
                    acc = acc + o[0, 0]
                return x.at[0, 0].add(acc & 1)

            run(f"shared x{n_chains}", body_shared, x0,
                n_out * lanes_total)

        # indep xN: N independent (buffer, chain) pairs, same total lanes
        for n_chains in (2, 4, 8):
            w = lanes_total // n_chains
            if w < 128:
                continue
            xs0 = tuple(fresh(w) for _ in range(n_chains))
            jax.block_until_ready(xs0)

            def body_indep(xs):
                outs = [
                    resample_wide_taps(
                        table, x, state, max_taps=taps, n_out=n_out, d=d,
                        table_strided=tstr)[0]
                    for x in xs
                ]
                return tuple(
                    x.at[0, 0].add(o[0, 0] & 1) for x, o in zip(xs, outs))

            run(f"indep x{n_chains}", body_indep, xs0, n_out * lanes_total)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "both")

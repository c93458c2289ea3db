#!/usr/bin/env python3
"""Map the TILED kernel's frame-group compile envelope on hardware (round 5).

The round-5 honest structure sweep pinned the tiled class at group 32 — but
never probed ABOVE it. Timed points (tools/probe_headline_structure.py, long
chains, one point per subprocess) at the headline shape (s=9024, 2048 lanes):

    grp 32: 0.625 ms/step   grp 64: 0.580   grp 128: 0.565   grp 256: VMEM OOM

i.e. larger frame groups keep amortising the per-grid-step meta/kv/out block
DMAs until the scoped-vmem stack runs out (grp 256 at s=9024 reports 16.45M
vs the 16M limit). This tool AOT-compiles the tiled kernel per (d-class,
lane tiles, group, s) — no execution, so no relay poisoning — to find where
group 64/128 are legal; `tiled_pick_group` in ops/pallas_resample.py encodes
the result and tests/test_pallas.py pins every probed point.

Reference workload: clownresampler.h:986-1092 at batch scale.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
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

    table = jnp.asarray(lanczos_kernel_table())
    n_out = 8192
    # d=1 (headline 48k->44.1k) and d=0 (config-3 8k->48k upsample): the two
    # tiled sub-classes; cand differs (window select depth).
    for in_rate, out_rate in ((48000, 44100), (8000, 48000)):
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        inc = fx.calculate_ratio(in_rate, out_rate)
        plan = plan_uniform(inc, n_out)
        taps = 8
        state = make_device_state(0, 0x4321, cfg, inc)
        tstr = strided_table_device(
            DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
            cfg.kernel_step_size, taps,
        )
        for lanes in (256, 128):
            for group in (256, 128, 64, 32):
                for s in (13312, 12288, 11264, 10240, 9024):
                    x = jnp.zeros((s, lanes), jnp.int32)
                    try:
                        resample_uniform_lanes_tiled.lower(
                            table, x, state, max_taps=taps, n_out=n_out,
                            d=plan["d"], cand=plan["cand"], group=group,
                            table_strided=tstr,
                        ).compile()
                        verdict = "PASS"
                    except Exception as e:
                        msg = str(e)
                        i = msg.find("Scoped allocation with size")
                        verdict = ("FAIL " + msg[i : i + 60].split(".  ")[0]
                                   if i >= 0 else
                                   f"FAIL {type(e).__name__}: {msg[:80]}")
                    print(f"d={plan['d']} cand={plan['cand']} lanes={lanes} "
                          f"group={group} s={s}: {verdict}", flush=True)
                    if verdict == "PASS":
                        break   # smaller s only gets cheaper


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Measure the tiled kernel's eps-fold variant (round 5 session 4).

The tiled kernel's Bresenham jitter historically cost, per tap, a SECOND
window slice assembly per candidate plus a vector select; _eps_shift_kvals
folds the jitter into the kernel columns in XLA (cand-1 extra zero-tap MAC
columns instead). This probe times both forms at production dispatch shapes
with the honest K-slope harness (one point per subprocess, long chains,
every carry leaf materialized — RESULTS.md methodology correction #2).

Usage:
  python tools/probe_eps_fold.py                 # full sweep (subprocesses)
  python tools/probe_eps_fold.py headline:fold   # one point, in-process
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name -> (in_rate, out_rate, lanes, n_out, group)
SHAPES = {
    "headline": (48000, 44100, 2048, 8192, 32),   # d=1 cand=2 (bench headline)
    "config3": (8000, 48000, 1024, 8192, 32),     # d=0 cand=3 (upsample)
    "hicand": (44100, 24000, 1024, 8192, 32),     # d=1 cand=7 (worst jitter)
}

POINTS = tuple(f"{s}:{v}" for s in SHAPES for v in ("base", "fold"))


def run_point(point: str) -> None:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.lowlevel import make_device_state
    from clownresampler_tpu.models import DEFAULT_MODEL, lanczos_kernel_table
    from clownresampler_tpu.ops.pallas_resample import (
        plan_uniform,
        resample_uniform_lanes_tiled,
        strided_table_device,
        window_rows_needed,
    )

    shape, variant = point.split(":")
    in_rate, out_rate, lanes, n_out, group = SHAPES[shape]
    cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
    inc = fx.calculate_ratio(in_rate, out_rate)
    taps = 8
    plan = plan_uniform(inc, n_out)
    assert plan["kernel"] == "tiled", plan
    d, cand = plan["d"], plan["cand"]
    s = ((n_out * inc) >> 16) + window_rows_needed(taps, d, cand) + 32
    s = -(-s // 16) * 16
    state = make_device_state(0, 0x4321, cfg, inc)
    table = jnp.asarray(lanczos_kernel_table())
    tstr = strided_table_device(
        DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution, cfg.kernel_step_size, taps
    )
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))

    def body(x):
        out, _ = resample_uniform_lanes_tiled(
            table, x, state, max_taps=taps, n_out=n_out, d=d, cand=cand,
            group=group, table_strided=tstr, eps_fold=(variant == "fold"),
        )
        return x.at[0, 0].add(out[0, 0] & 1)

    jax.block_until_ready(x0)

    def make(k):
        @jax.jit
        def chain(c):
            c, _ = jax.lax.scan(lambda cc, _: (body(cc), None), c, None, length=k)
            return c.ravel()[0].astype(jnp.int32)

        return chain

    def best(c, reps=6):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = c(x0)
            jax.block_until_ready(r)
            _ = np.asarray(r)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    k1, k2 = 32, 160
    while True:
        c1, c2 = make(k1), make(k2)
        for c in (c1, c2):
            r = c(x0)
            jax.block_until_ready(r)
            _ = np.asarray(r)
        t1, t2 = best(c1), best(c2)
        if t2 - t1 >= 0.06 or k2 >= 2560:
            break
        k1, k2 = k1 * 4, k2 * 4
    dt = (t2 - t1) / (k2 - k1)
    rate = n_out * lanes / dt / 1e9
    print(
        f"{shape}:{variant:5s} d={d} cand={cand} lanes={lanes} grp={group} "
        f"k={k1}/{k2}  {dt*1e3:7.3f} ms/step  {rate:7.2f} Gsamples/s",
        flush=True,
    )


def main() -> None:
    args = sys.argv[1:]
    if args:
        run_point(args[0])
        return
    for p in POINTS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), p],
            capture_output=True, text=True, timeout=2400)
        out = [l for l in (r.stdout + r.stderr).splitlines()
               if "Gsamples" in l or "Error" in l or "error" in l.lower()]
        print("\n".join(out) if out else f"{p}: rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()

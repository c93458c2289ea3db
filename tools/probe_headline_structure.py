#!/usr/bin/env python3
"""Decide the headline bench launch structure HONESTLY (round 5).

One point per subprocess (relay-poisoning rule), LONG chains (the 8/40
chains behind tools/probe_lane_scaling.py's first pass produced deltas of
5-15 ms — inside relay jitter; points moved 1.5-1.9x between runs). Here
k1/k2 scale until the slope delta clears 60 ms of wall.

Point syntax:  mono:<lanes>[:grp<G>]   |   split:<n>x<w>
Driver mode (no args): runs the candidate set, each in a subprocess,
and prints a table.

Usage:
  python tools/probe_headline_structure.py                    # tiled sweep
  python tools/probe_headline_structure.py mono:1024          # one point
  python tools/probe_headline_structure.py strided            # strided sweep
  python tools/probe_headline_structure.py mono:2048 strided  # one point
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = (
    "mono:512", "mono:1024", "mono:2048", "mono:4096",
    "split:4x512", "split:2x1024",
)


def run_point(point: str, cls: str = "tiled") -> None:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.lowlevel import make_device_state
    from clownresampler_tpu.models import DEFAULT_MODEL, lanczos_kernel_table
    from clownresampler_tpu.ops.pallas_resample import (
        multi_resample,
        plan_uniform,
        strided_phase_padding,
        strided_table_device,
    )

    # Point tokens: kind:spec[:grp<G>][:n<N>] — grp sets the frame group,
    # n<N> overrides n_out (launch frames; must stay a multiple of 8*grp).
    toks = point.split(":")
    kind, spec = toks[0], toks[1]
    grp, n_out = 32, 8192
    for t in toks[2:]:
        if t.startswith("grp"):
            grp = int(t[3:])
        elif t.startswith("n"):
            n_out = int(t[1:])
        else:
            raise SystemExit(f"unknown point token {t!r}")

    if cls == "tiled":
        cfg = configure(48000, 44100, 44100)
        inc = fx.calculate_ratio(48000, 44100)
        taps = 8
        plan = plan_uniform(inc, n_out)
        s = -(-((((n_out * inc) >> 16) + 96)) // 16) * 16
        plan_t = ("tiled", plan["d"], plan["cand"], taps, n_out, False)
    else:  # strided (config 2 shape)
        cfg = configure(96000, 48000, 96000)
        inc = fx.calculate_ratio(96000, 48000)
        d = inc >> 16
        n_out, taps = 4096, 16
        s = (n_out - 8 * 32) * d + strided_phase_padding(taps, d, 32) + 64
        s = -(-s // 16) * 16
        plan_t = ("strided", d, None, taps, n_out, False)
    state = make_device_state(0, 0x4321, cfg, inc)
    table = jnp.asarray(lanczos_kernel_table())
    tstr = (strided_table_device(DEFAULT_MODEL.radius,
                                 DEFAULT_MODEL.resolution,
                                 cfg.kernel_step_size, taps)
            if cls == "tiled" else None)
    rng = np.random.default_rng(7)
    shared_offsets = None
    if kind == "mono":
        lanes = int(spec)
        xs0 = (jnp.asarray(rng.integers(
            -32768, 32768, size=(s, lanes)).astype(np.int32)),)
        n_sub, w = 1, lanes
    elif kind == "shared":
        # n_sub zero-copy COLUMN SLICES of one shared buffer, fused into one
        # program via the plan's (lanes, lane_offset) fields
        n_sub, w = (int(v) for v in spec.split("x"))
        buf = jnp.asarray(rng.integers(
            -32768, 32768, size=(s, n_sub * w)).astype(np.int32))
        xs0 = tuple(buf for _ in range(n_sub))
        shared_offsets = tuple(i * w for i in range(n_sub))
    else:
        n_sub, w = (int(v) for v in spec.split("x"))
        xs0 = tuple(jnp.asarray(rng.integers(
            -32768, 32768, size=(s, w)).astype(np.int32))
            for _ in range(n_sub))
    plans = tuple(
        (plan_t[:6]
         + ((w, shared_offsets[i]) if shared_offsets is not None
            else (None, 0))
         + ((grp,) if cls == "tiled" else ()))
        for i in range(n_sub)
    )
    states = tuple(state for _ in range(n_sub))
    tstrs = tuple(tstr for _ in range(n_sub)) if tstr is not None else None

    def body(xs):
        outs = multi_resample(table, xs, states, plans, tstrs=tstrs)
        return tuple(x.at[0, 0].add(o[0, 0] & 1)
                     for x, o in zip(xs, outs))

    carry0, total_lanes = xs0, n_sub * w
    jax.block_until_ready(jax.tree_util.tree_leaves(carry0))

    def make(k):
        @jax.jit
        def chain(c):
            c, _ = jax.lax.scan(lambda cc, _: (body(cc), None), c, None,
                                length=k)
            leaves = jax.tree_util.tree_leaves(c)
            acc = jnp.int32(0)
            for leaf in leaves:
                acc = acc + jnp.asarray(leaf).ravel()[0].astype(jnp.int32)
            return acc

        return chain

    def best(c, reps=6):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = c(carry0)
            jax.block_until_ready(r)
            _ = np.asarray(r)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    k1, k2 = 32, 160
    while True:
        c1, c2 = make(k1), make(k2)
        for c in (c1, c2):
            r = c(carry0)
            jax.block_until_ready(r)
            _ = np.asarray(r)
        t1, t2 = best(c1), best(c2)
        if t2 - t1 >= 0.06 or k2 >= 2560:
            break
        k1, k2 = k1 * 4, k2 * 4
    dt = (t2 - t1) / (k2 - k1)
    rate = n_out * total_lanes / dt / 1e9
    anchor = 74.9 if cls == "tiled" else 54.0
    print(f"{cls}:{point:18s} k={k1}/{k2}  {dt*1e3:7.3f} ms/step  "
          f"{rate:7.2f} Gsamples/s  ({rate*1e3/anchor:6.0f}x C)", flush=True)


def main() -> None:
    args = sys.argv[1:]
    cls = "tiled"
    if args and args[-1] in ("tiled", "strided"):
        cls = args[-1]
        args = args[:-1]
    if args:
        run_point(args[0], cls)
        return
    for p in POINTS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), p, cls],
            capture_output=True, text=True, timeout=2400)
        out = [l for l in (r.stdout + r.stderr).splitlines()
               if "Gsamples" in l or "Error" in l or "error" in l.lower()]
        print("\n".join(out) if out else f"{p}: rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()

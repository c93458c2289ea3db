#!/usr/bin/env python3
"""Is the multi-chain K-slope measurement structure DCE-proof?

The round-5 roofline overlap sweep scaled PERFECTLY linearly from 1 to 16
chains with per-step wall time flat at ~6 ms — physically impossible for a
VPU-bound kernel on one core, and the smoking gun for dead-code
elimination: `utils.profiling.measure_kernel_time` materializes
`tree_leaves(carry)[0]` ONLY, so if the jitted scan's other chains' carries
never reach the returned value, XLA's while-loop simplifier may delete
those chains' pallas calls entirely — the measurement then attributes
N chains of samples to a program that ran ONE.

This probe decides it two ways, on the calibration kernel at N=4 chains:

  1. STATIC: count `custom-call` occurrences in the OPTIMIZED HLO of the
     k-step chain for (a) chain-0-only materialization (the suspect form),
     (b) all-chains-summed materialization.
  2. DYNAMIC: K-slope both forms. If (a) ~= (b)/N per step, DCE was eating
     the other chains and every multi-chain number measured with form (a)
     is inflated ~N x.

Also compiles bench.py's exact chain structure (multi_resample over 4
sub-fleet buffers, returning xs[0][0,0] + outs[0]-derived ys) and counts
its custom calls — the headline's liveness, settled statically.

Run on the TPU: python tools/probe_chain_dce.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def count_custom_calls(compiled) -> int:
    txt = compiled.as_text()
    return len(re.findall(r"custom-call", txt))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu.utils.profiling import measure_kernel_time
    from tools.roofline import _make_launch

    launch, taps = _make_launch(iters=128, unroll=8)
    rows = 256
    rng = np.random.default_rng(0)

    def fresh_x():
        return jnp.asarray(rng.integers(
            -(2 ** 30), 2 ** 30, size=(rows, 128)).astype(np.int32))

    N, K = 4, 16
    xs0 = tuple(fresh_x() for _ in range(N))
    print(f"backend={jax.default_backend()} chains={N} k={K}", flush=True)

    def body(xs):
        outs = [launch(x) for x in xs]
        return tuple(x.at[0, 0].add(o[0, 0] & 1) for x, o in zip(xs, outs))

    # (a) chain-0-only materialization (measure_kernel_time's form)
    @jax.jit
    def chain_dead(xs):
        xs, _ = jax.lax.scan(lambda c, _: (body(c), None), xs, None, length=K)
        return xs[0].ravel()[0]

    # (b) all chains live
    @jax.jit
    def chain_live(xs):
        xs, _ = jax.lax.scan(lambda c, _: (body(c), None), xs, None, length=K)
        acc = xs[0].ravel()[0]
        for x in xs[1:]:
            acc = acc + x.ravel()[0]
        return acc

    for name, fn in (("dead (chain-0 only)", chain_dead),
                     ("live (all summed)", chain_live)):
        c = fn.lower(xs0).compile()
        print(f"{name}: custom-calls in optimized HLO = "
              f"{count_custom_calls(c)} (expect {N * K} if all chains run)",
              flush=True)

    # dynamic confirmation: K-slope both forms
    import time

    def slope(ret_all):
        def make(k):
            @jax.jit
            def chain(xs):
                xs, _ = jax.lax.scan(lambda c, _: (body(c), None), xs, None,
                                     length=k)
                if ret_all:
                    acc = xs[0].ravel()[0]
                    for x in xs[1:]:
                        acc = acc + x.ravel()[0]
                    return acc
                return xs[0].ravel()[0]

            return chain

        c1, c2 = make(8), make(40)
        for c in (c1, c2):
            r = c(xs0)
            jax.block_until_ready(r)
            _ = np.asarray(r)

        def best(c):
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                r = c(xs0)
                jax.block_until_ready(r)
                _ = np.asarray(r)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(c2) - best(c1)) / 32

    dt_dead = slope(False)
    dt_live = slope(True)
    print({"dead_ms_per_step": round(dt_dead * 1e3, 3),
           "live_ms_per_step": round(dt_live * 1e3, 3),
           "ratio_live_over_dead": round(dt_live / max(dt_dead, 1e-12), 2)},
          flush=True)

    # ---- bench.py's exact structure, statically ---------------------------
    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.lowlevel import make_device_state
    from clownresampler_tpu.models import DEFAULT_MODEL, lanczos_kernel_table
    from clownresampler_tpu.ops.pallas_resample import (
        multi_resample, plan_uniform, strided_table_device)

    B, CH = 1024, 2
    IN_RATE, OUT_RATE = 48000, 44100
    N_OUT, SPLIT = 8192, 512
    cfg = configure(IN_RATE, OUT_RATE, OUT_RATE)
    inc = fx.calculate_ratio(IN_RATE, OUT_RATE)
    plan = plan_uniform(inc, N_OUT)
    max_taps = 8
    s = -(-(((N_OUT * inc) >> 16) + 96) // 16) * 16
    table = jnp.asarray(lanczos_kernel_table())
    n_sub = B * CH // SPLIT
    xs0b = tuple(
        jnp.asarray(rng.integers(-32768, 32768,
                                 size=(s, SPLIT)).astype(np.int32))
        for _ in range(n_sub))
    state = make_device_state(0, 0x4321, cfg, inc)
    plans = tuple(("tiled", plan["d"], plan["cand"], max_taps, N_OUT, False)
                  for _ in range(n_sub))
    states = tuple(state for _ in range(n_sub))
    tstrs = tuple(strided_table_device(
        DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
        cfg.kernel_step_size, max_taps) for _ in range(n_sub))

    def bench_body(xs, _):
        outs = multi_resample(table, xs, states, plans, tstrs=tstrs)
        return tuple(x.at[0, 0].add(o[0, 0] & 1)
                     for x, o in zip(xs, outs)), outs[0][0, 0]

    KB = 16

    @jax.jit
    def bench_chain(xs):
        xs, lasts = jax.lax.scan(bench_body, xs, None, length=KB)
        return xs[0][0, 0], lasts

    c = bench_chain.lower(xs0b).compile()
    print(f"bench.py chain (K={KB}, {n_sub} sub-fleets): custom-calls = "
          f"{count_custom_calls(c)} (expect >= {n_sub * KB} if all "
          f"sub-fleets run)", flush=True)


if __name__ == "__main__":
    main()

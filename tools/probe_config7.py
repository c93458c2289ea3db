#!/usr/bin/env python3
"""Decompose the config-7 fused-scan step on hardware (VERDICT r4 item 6).

Config 7 (44.1k->8k x 1024 stereo, split=4, pipelined staging) runs at 826x
vs the bulk route's 965x on the same ratio/lanes. This probe measures what
binds the residual by timing scan variants that each REMOVE one step
component, on the exact config-7 shape (n_in 8192, 2048 lanes, 4 x 512-lane
sub-fleets, general kernel taps 40, n_out 1536):

  full       the production structure (stage pipeline + engine + produced
             mask + stacked ys) — rebuilt here minimally, should track the
             recorded 22.3 Gsamples/s
  nomask     `jnp.where(n < produced)` dropped (outs stacked raw)
  noys       no stacked output at all: the step returns only a carried
             checksum (out[0,0]), so the scan writes no (K, n_out, L) HBM ys
             and the where+stack read/write disappears
  nostage    engines run on a FIXED pre-staged buffer every step (carry is
             state only): isolates the staging copy that the round-4
             pipeline is supposed to hide
  indep      4 INDEPENDENT single-fleet scans inside one jit, no cross-fleet
             step barrier: lax.scan iterations still serialize per fleet,
             but fleet A's step t+1 no longer waits for fleet B's step t —
             isolates the split-barrier cost vs bulk's free-running chains

Usage: python tools/probe_config7.py [k1 k2]   (default 8 40)
"""

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
    from clownresampler_tpu.lowlevel import make_device_state, DeviceState
    from clownresampler_tpu.models import DEFAULT_MODEL, lanczos_kernel_table
    from clownresampler_tpu.ops.pallas_resample import (
        general_pick_group,
        general_w_load,
        resample_uniform_lanes_general,
        strided_table_device,
    )

    k1, k2 = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (8, 40)

    in_rate, out_rate, lanes, n_in, split = 44100, 8000, 2048, 8192, 4
    cfg = configure(in_rate, out_rate, in_rate)
    inc = fx.calculate_ratio(in_rate, out_rate)
    radius = cfg.integer_stretched_kernel_radius
    taps = -(-2 * radius // 8) * 8
    n_out = -(-(((n_in + 2 * radius) << 16) // inc + 8) // 128) * 128
    l_sub = lanes // split
    slack = general_w_load(taps)[0] + 8
    s_buf = 2 * radius + n_in + slack
    grp = general_pick_group(n_out, s_buf, l_sub, taps)
    assert grp is not None

    table = jnp.asarray(lanczos_kernel_table())
    tstr = strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                                cfg.kernel_step_size, taps)
    state0 = make_device_state(radius, 0, cfg, inc)   # radius-biased, as the scan does
    print(f"backend={jax.default_backend()} taps={taps} n_out={n_out} "
          f"s_buf={s_buf} grp={grp} split={split} l_sub={l_sub}", flush=True)

    rng = np.random.default_rng(7)
    K = k2

    def fresh_chunks():
        return jnp.asarray(rng.integers(
            -32768, 32768, size=(K, n_in, lanes)).astype(np.int16))

    zeros_slack = jnp.zeros((slack, l_sub), jnp.int32)
    halo0 = jnp.zeros((2 * radius, l_sub), jnp.int32)

    def stage(halo, chunk):
        return jnp.concatenate([halo, chunk.astype(jnp.int32), zeros_slack],
                               axis=0)

    def engine(buffer, st):
        out, _ = resample_uniform_lanes_general(
            table, buffer, st, max_taps=taps, n_out=n_out,
            table_strided=tstr, group=grp)
        return out

    def advance(st, produced):
        p_after, f_after = fx.positions_from_state(
            st.position_integer, st.position_fractional,
            st.cfg.increment_hi, st.cfg.increment_lo, produced)
        delta = jnp.minimum(p_after, jnp.int32(n_in))
        return DeviceState(position_integer=p_after - delta,
                           position_fractional=f_after, cfg=st.cfg)

    from clownresampler_tpu.lowlevel import natural_output_count

    def run_engine(st, buffer, mask):
        natural = natural_output_count(
            st.position_integer, st.position_fractional,
            st.cfg.increment_hi, st.cfg.increment_lo, jnp.int32(n_in))
        produced = jnp.minimum(natural, jnp.int32(n_out))
        out = engine(buffer, st)
        if mask:
            n = jnp.arange(n_out, dtype=jnp.int32)
            out = jnp.where((n < produced)[:, None], out, 0)
        return advance(st, produced), out

    # -------- scan builders (pipelined staging, as production defaults) ----
    def make_scan(mask=True, ys=True, restage=True, chunk_cols=None):
        def step(carry, t):
            sts, bufs = carry
            outs, sts2 = [], []
            for st, buf in zip(sts, bufs):
                st2, out = run_engine(st, buf, mask)
                sts2.append(st2)
                outs.append(out)
            if restage:
                t_next = jnp.minimum(t + 1, jnp.int32(K - 1))
                bufs2 = tuple(
                    stage(jax.lax.slice_in_dim(buf, n_in, n_in + 2 * radius,
                                               axis=0),
                          jax.lax.dynamic_index_in_dim(
                              cc, t_next, 0, keepdims=False))
                    for buf, cc in zip(bufs, chunk_cols))
            else:
                bufs2 = bufs
            y = (tuple(outs) if ys
                 else sum(o[0, 0] for o in outs))
            return (tuple(sts2), bufs2), y

        return step

    chunks = fresh_chunks()
    jax.block_until_ready(chunks)

    def cols_of(ch):
        return tuple(
            jax.lax.slice_in_dim(ch, i * l_sub, (i + 1) * l_sub, axis=2)
            for i in range(split))

    def timed(go, k):
        run = jax.jit(lambda ch: go(k, ch))
        r = run(chunks)
        jax.block_until_ready(r)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            r = run(chunks)
            jax.block_until_ready(r)
            _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results = {}

    def measure(label, mask=True, ys=True, restage=True):
        def go(k, ch):
            chunk_cols = cols_of(ch)
            step = make_scan(mask=mask, ys=ys, restage=restage,
                             chunk_cols=chunk_cols)
            bufs0 = tuple(
                stage(halo0, jax.lax.index_in_dim(cc, 0, 0, keepdims=False))
                for cc in chunk_cols)
            carry0 = (tuple(state0 for _ in range(split)), bufs0)
            carry, y = jax.lax.scan(step, carry0,
                                    jnp.arange(k, dtype=jnp.int32))
            # materialize EVERY fleet x EVERY step (frame 0 of each chunk,
            # all lanes) — a single-leaf return lets XLA delete the other
            # fleets' engines and all steps' writes but one (the round-5
            # dead-carry fiction this probe exists to unwind)
            pos = sum(c.position_integer for c in carry[0])
            if ys:
                return sum(jnp.sum(yy[:, 0, :]) for yy in y) + pos
            return jnp.sum(y) + pos

        t1 = timed(go, k1)
        t2 = timed(go, k2)
        dt = (t2 - t1) / (k2 - k1)
        # useful samples per step: the natural count at steady state
        nat = (n_in << 16) // inc
        rate = nat * lanes / dt / 1e9
        results[label] = (dt, rate)
        print(f"{label:10s} {dt*1e3:7.3f} ms/step  {rate:7.2f} Gsamples/s",
              flush=True)

    measure("full")
    measure("nomask", mask=False)
    measure("noys", ys=False)
    measure("nostage", restage=False)
    measure("nostage+noys", restage=False, ys=False)

    # -------- indep: 4 single-fleet scans, no cross-fleet barrier ----------
    def go_indep(k, ch):
        chunk_cols = cols_of(ch)

        def make_single(i):
            def step(carry, t):
                st, buf = carry
                st2, out = run_engine(st, buf, True)
                t_next = jnp.minimum(t + 1, jnp.int32(K - 1))
                buf2 = stage(
                    jax.lax.slice_in_dim(buf, n_in, n_in + 2 * radius, axis=0),
                    jax.lax.dynamic_index_in_dim(chunk_cols[i], t_next, 0,
                                                 keepdims=False))
                return (st2, buf2), out

            return step

        total = jnp.int32(0)
        for i in range(split):
            buf0 = stage(halo0, jax.lax.index_in_dim(chunk_cols[i], 0, 0,
                                                     keepdims=False))
            carry, y = jax.lax.scan(make_single(i), (state0, buf0),
                                    jnp.arange(k, dtype=jnp.int32))
            # every step x every lane of THIS fleet stays live
            total = total + carry[0].position_integer + jnp.sum(y[:, 0, :])
        return total

    t1 = timed(go_indep, k1)
    t2 = timed(go_indep, k2)
    dt = (t2 - t1) / (k2 - k1)
    nat = (n_in << 16) // inc
    print(f"{'indep':10s} {dt*1e3:7.3f} ms/step  "
          f"{nat * lanes / dt / 1e9:7.2f} Gsamples/s", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Probe: roll-path general kernel vs the wide DMA kernel at MEDIUM tap
widths (249..1016 — inside FAST_KERNEL_MAX_TAPS but past the roll-free
kv-shift guard GENERAL_SHIFT_MAX_WLOAD).

The general kernel serves these widths with a per-frame power-of-two aligned
load + roll (the roll-free body blows the Mosaic scoped-vmem stack here,
benchmarks/RESULTS.md round 3), and its VMEM-resident input block caps real
frames well below the 128-frame n_out grain — padding frames MAC clamped
junk. The wide DMA kernel (taps > 1024 today) has neither cost: roll-free
phase-shifted kv, whole-window MAC (w <= 3072), 8-frame launch grain, input
in HBM. This probe measures both on the same ratios to find the true
crossover for the dispatch boundary.

Usage:
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/probe_midwide.py exact
  python tools/probe_midwide.py time [lanes]     # on the real TPU
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# taps ~272 / ~384 / 512 / 760 / 1016 at the default model (radius 3,
# resolution 0x400) — the whole roll-path band (249..1016)
RATIOS = [(44100, 991), (44100, 689), (44100, 517), (44100, 349), (44100, 262)]


def _setup(in_rate, out_rate, p0=5, f0=0x4321):
    import jax.numpy as jnp

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.lowlevel import make_device_state
    from clownresampler_tpu.models import lanczos_kernel_table

    table = jnp.asarray(lanczos_kernel_table())
    cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
    inc = fx.calculate_ratio(in_rate, out_rate)
    state = make_device_state(p0, f0, cfg, inc)
    taps = fx.round_up(2 * cfg.integer_stretched_kernel_radius, 8)
    return table, cfg, inc, state, taps


def exact():
    """Bit-exactness of resample_wide_taps at medium widths vs the oracle."""
    import jax.numpy as jnp

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.ops.convolve import convolve_frames
    from clownresampler_tpu.ops.pallas_resample import resample_wide_taps

    rng = np.random.default_rng(7)
    n_out = 16
    for in_rate, out_rate in RATIOS:
        table, cfg, inc, state, taps = _setup(in_rate, out_rate)
        s = 5 + ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 64
        s = -(-s // 16) * 16
        x = jnp.asarray(rng.integers(-32768, 32768, size=(s, 128)).astype(np.int32))
        n = jnp.arange(n_out, dtype=jnp.int32)
        pos, frac = fx.positions_from_state(
            state.position_integer, state.position_fractional,
            state.cfg.increment_hi, state.cfg.increment_lo, n,
        )
        want = convolve_frames(table, x, pos, frac, state.cfg, taps)
        got, _ = resample_wide_taps(
            table, x, state, max_taps=taps, n_out=n_out, d=inc >> 16,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        modes = "interpret"
        import jax
        if jax.default_backend() == "tpu":
            got_c, _ = resample_wide_taps(
                table, x, state, max_taps=taps, n_out=n_out, d=inc >> 16,
            )
            np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want))
            modes += " + compiled"
        print(f"{in_rate}->{out_rate} taps={taps}: wide kernel bit-exact "
              f"({modes})", flush=True)


def timing(lanes=2048):
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu.models import DEFAULT_MODEL
    from clownresampler_tpu.ops.pallas_resample import (
        general_w_load,
        resample_uniform_lanes_general,
        resample_wide_taps,
        strided_table_device,
    )
    from clownresampler_tpu.utils.profiling import measure_kernel_time

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} lanes={lanes}", flush=True)

    for in_rate, out_rate in RATIOS:
        table, cfg, inc, state, taps = _setup(in_rate, out_rate, p0=0)
        d = inc >> 16
        tstr = strided_table_device(
            DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
            cfg.kernel_step_size, taps,
        )
        w_load, shift = general_w_load(taps)
        assert not shift, "case must exercise the roll path"

        # --- general kernel at the dispatcher's launch shape: n_out=128,
        # input block capped at the VMEM budget; frames whose windows
        # exceed it clamp (junk results, identical MAC cost) — exactly the
        # padding waste the real dispatch pays. The roll classes only
        # COMPILE single-lane-tile at full budget (envelope round 4), so
        # the crossover is measured at lanes<=128 with s=16384 (the
        # lowlevel bucket) and wider runs use the multi-tile ceiling.
        n_gen = 128
        s = 16384 if lanes <= 128 else 8192
        real = min(n_gen, ((s - taps - w_load) << 16) // inc)
        x = jnp.asarray(
            rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))

        def body_gen(c, state=state, taps=taps, tstr=tstr, n_gen=n_gen):
            out, _ = resample_uniform_lanes_general(
                table, c, state, max_taps=taps, n_out=n_gen,
                table_strided=tstr)
            return c.at[0, 0].add(out[0, 0] & 1)

        g = measure_kernel_time(body_gen, x, n_gen * lanes, k1=16, k2=96)
        g_real = real * lanes / g.seconds_per_launch
        print(f"{in_rate}->{out_rate} taps={taps} general(roll,w_load={w_load}):"
              f" {g.seconds_per_launch*1e3:.3f} ms/launch "
              f"raw {g.samples_per_second/1e9:.2f} G, dispatch-real "
              f"({real}/{n_gen} frames) {g_real/1e9:.2f} G", flush=True)

        # --- wide DMA kernel, 64-frame launches (its dispatch grain)
        n_w = 64
        s_w = ((n_w * inc) >> 16) + taps + 64
        s_w = -(-s_w // 16) * 16
        xw = jnp.asarray(
            rng.integers(-32768, 32768, size=(s_w, lanes)).astype(np.int32))

        def body_wide(c, state=state, taps=taps, tstr=tstr, d=d, n_w=n_w):
            out, _ = resample_wide_taps(
                table, c, state, max_taps=taps, n_out=n_w, d=d,
                table_strided=tstr)
            return c.at[0, 0].add(out[0, 0] & 1)

        wst = measure_kernel_time(body_wide, xw, n_w * lanes, k1=16, k2=96)
        print(f"{in_rate}->{out_rate} taps={taps} wide(DMA, whole-window):"
              f" {wst.seconds_per_launch*1e3:.3f} ms/launch "
              f"{wst.samples_per_second/1e9:.2f} G "
              f"(x{wst.samples_per_second/g_real:.2f} vs general real)",
              flush=True)


def envelope():
    """Compile envelope of the general kernel at PRODUCTION dispatch shapes.

    The round-4 campaign found the roll-path general kernel blows the 16M
    Mosaic scoped-vmem stack at (taps 1016, s 12288, 8 lane tiles): 18.53M
    requested. The dispatchers' row budgets (lowlevel rows_budget=16384,
    farm VMEM_SAFE_INPUT_ROWS=12288) were calibrated on the TILED kernel
    (taps 8, tiny temporaries) — this maps where the GENERAL kernel's
    envelope actually is, per (w_load class, lane tiles, group), by AOT
    compiling each shape on the chip (no execution, so no relay poisoning).
    """
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu.models import DEFAULT_MODEL
    from clownresampler_tpu.ops.pallas_resample import (
        general_w_load,
        resample_uniform_lanes_general,
        strided_table_device,
    )

    # (ratio giving the taps, expected w_load class)
    cases = [(44100, 1067), (44100, 991), (44100, 262)]  # taps 248/272/1016
    n_out = 256
    for in_rate, out_rate in cases:
        table, cfg, inc, state, taps = _setup(in_rate, out_rate, p0=0)
        w_load, shift = general_w_load(taps)
        tstr = strided_table_device(
            DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
            cfg.kernel_step_size, taps,
        )
        for lanes in (128, 512):
            for group in (16, 32):
                for s in (16384, 12288, 8192, 4096):
                    x = jnp.zeros((s, lanes), jnp.int32)
                    try:
                        resample_uniform_lanes_general.lower(
                            table, x, state, max_taps=taps, n_out=n_out,
                            group=group, table_strided=tstr,
                        ).compile()
                        verdict = "PASS"
                    except Exception as e:
                        msg = str(e)
                        i = msg.find("Scoped allocation with size")
                        verdict = ("FAIL " + msg[i : i + 60].split(".  ")[0]
                                   if i >= 0 else
                                   f"FAIL {type(e).__name__}: {msg[:80]}")
                    print(f"taps={taps} w_load={w_load} shift={shift} "
                          f"lanes={lanes} group={group} s={s}: {verdict}",
                          flush=True)
                    if verdict == "PASS":
                        break   # smaller s only gets cheaper


def envelope2():
    """Targeted second round of `envelope`: the small-w_load classes the
    first sweep skipped (production config 6 measurably runs taps 40 at
    lanes 2048 / s 12288 / group 32, so the envelope's medium-width FAILs
    must start somewhere between w_load 48 and 256), plus lanes-2048 and
    farm-shaped (s 12288) points for the medium classes. Feeds the
    general_launch_fits() production guard."""
    import jax.numpy as jnp

    from clownresampler_tpu.models import DEFAULT_MODEL
    from clownresampler_tpu.ops.pallas_resample import (
        general_w_load,
        resample_uniform_lanes_general,
        strided_table_device,
    )

    # (out_rate, [(lanes, group, s), ...]) at 44100 in; taps per _setup.
    cases = [
        # taps 40, w_load 48 (config 6's class): confirm the measured-working
        # production shapes compile, and find its s ceiling.
        (8000, [(2048, 32, 12288), (2048, 32, 16384), (2048, 16, 16384),
                (512, 32, 16384)]),
        # taps ~128, w_load ~136: the unknown middle of the shift band.
        (2200, [(512, 16, 16384), (512, 16, 12288), (512, 32, 12288),
                (512, 32, 8192), (2048, 16, 12288), (2048, 32, 12288)]),
        # taps 248, w_load 256 (top of the shift band): lanes-2048 points.
        (1067, [(2048, 16, 8192), (2048, 16, 12288)]),
        # taps 272 / 1016 (roll classes) at lanes 2048, the s=8192 level the
        # lanes-512 sweep passed.
        (991, [(2048, 16, 8192)]),
        (262, [(2048, 16, 8192)]),
    ]
    n_out = 256
    for out_rate, combos in cases:
        table, cfg, inc, state, taps = _setup(44100, out_rate, p0=0)
        w_load, shift = general_w_load(taps)
        tstr = strided_table_device(
            DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
            cfg.kernel_step_size, taps,
        )
        for lanes, group, s in combos:
            x = jnp.zeros((s, lanes), jnp.int32)
            try:
                resample_uniform_lanes_general.lower(
                    table, x, state, max_taps=taps, n_out=n_out,
                    group=group, table_strided=tstr,
                ).compile()
                verdict = "PASS"
            except Exception as e:
                msg = str(e)
                i = msg.find("Scoped allocation with size")
                verdict = ("FAIL " + msg[i : i + 60].split(".  ")[0]
                           if i >= 0 else
                           f"FAIL {type(e).__name__}: {msg[:80]}")
            print(f"taps={taps} w_load={w_load} shift={shift} "
                  f"lanes={lanes} group={group} s={s}: {verdict}",
                  flush=True)


def envelope3():
    """Round-5 interior probe (VERDICT r4 item 8): group-32 multi-lane-tile
    points in the w_load 144..248 shift band, where general_launch_fits is
    conservative by construction (returns False without a measurement —
    round 4 probed w_load 48 PASS at s 12288 and w_load 256 FAIL everywhere
    multi, nothing between). If group 32 compiles anywhere here, the
    dispatchers gain its ~12%/step on mid-shift-band multi-lane launches."""
    import jax.numpy as jnp

    from clownresampler_tpu.models import DEFAULT_MODEL
    from clownresampler_tpu.ops.pallas_resample import (
        general_w_load,
        resample_uniform_lanes_general,
        strided_table_device,
    )

    # out rates giving taps 136/168/200/240 -> w_load 144/176/208/248
    cases = [
        (2010, [(512, 32, 12288), (512, 32, 8192), (512, 32, 4096),
                (2048, 32, 8192)]),
        (1594, [(512, 32, 8192), (512, 32, 4096), (2048, 32, 8192)]),
        (1350, [(512, 32, 8192), (512, 32, 4096), (2048, 32, 8192)]),
        (1110, [(512, 32, 8192), (512, 32, 4096), (2048, 32, 4096)]),
    ]
    n_out = 256
    for out_rate, combos in cases:
        table, cfg, inc, state, taps = _setup(44100, out_rate, p0=0)
        w_load, shift = general_w_load(taps)
        tstr = strided_table_device(
            DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
            cfg.kernel_step_size, taps,
        )
        for lanes, group, s in combos:
            x = jnp.zeros((s, lanes), jnp.int32)
            try:
                resample_uniform_lanes_general.lower(
                    table, x, state, max_taps=taps, n_out=n_out,
                    group=group, table_strided=tstr,
                ).compile()
                verdict = "PASS"
            except Exception as e:
                msg = str(e)
                i = msg.find("Scoped allocation with size")
                verdict = ("FAIL " + msg[i : i + 60].split(".  ")[0]
                           if i >= 0 else
                           f"FAIL {type(e).__name__}: {msg[:80]}")
            print(f"taps={taps} w_load={w_load} shift={shift} "
                  f"lanes={lanes} group={group} s={s}: {verdict}",
                  flush=True)


def dma_split(lanes=1024):
    """Estimate the wide kernel's DMA share: time the real launch vs one
    called with d=0, which shrinks the per-group union-window DMA span from
    7d+w+16 to w+16 rows with IDENTICAL MAC volume (outputs are garbage —
    group windows get clamped — but the dependence chain still consumes
    them, so nothing is DCE'd). The time delta over the span delta prices
    DMA bytes; decides whether double-buffering the group DMA (overlapping
    group j+1's copy with group j's MACs) is worth building."""
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu.models import DEFAULT_MODEL
    from clownresampler_tpu.ops.pallas_resample import (
        resample_wide_taps,
        strided_table_device,
    )
    from clownresampler_tpu.utils.profiling import measure_kernel_time

    rng = np.random.default_rng(1)
    print(f"backend={jax.default_backend()} lanes={lanes}", flush=True)
    # taps 2008 / 1016 (whole-window MAC band) and the WIDEST accepted ratio
    # 44100->44 (taps 6016, the BLOCKED tap-grid path whose pipeline config
    # 8c measures) — round-5 VERDICT item 5: is the pipelined blocked path
    # now MAC-volume-bound (DMA hidden)?
    for in_rate, out_rate in [(44100, 132), (44100, 262), (44100, 44)]:
        table, cfg, inc, state, taps = _setup(in_rate, out_rate, p0=0)
        d = inc >> 16
        tstr = strided_table_device(
            DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
            cfg.kernel_step_size, taps,
        )
        n_w = 64
        s_w = ((n_w * inc) >> 16) + taps + 64
        s_w = -(-s_w // 16) * 16
        x = jnp.asarray(
            rng.integers(-32768, 32768, size=(s_w, lanes)).astype(np.int32))

        for pipe in (None, False, True):
            results = {}
            for label, dd in (("real-d", d), ("d=0 (DMA-starved)", 0)):
                def body(c, dd=dd, pipe=pipe):
                    out, _ = resample_wide_taps(
                        table, c, state, max_taps=taps, n_out=n_w, d=dd,
                        table_strided=tstr, pipeline=pipe)
                    return c.at[0, 0].add(out[0, 0] & 1)

                st = measure_kernel_time(body, x, n_w * lanes, k1=16, k2=96)
                results[label] = st.seconds_per_launch
                print(f"{in_rate}->{out_rate} taps={taps} pipeline={pipe} "
                      f"{label}: {st.seconds_per_launch*1e3:.3f} ms/launch",
                      flush=True)
            a, b = results["real-d"], results["d=0 (DMA-starved)"]
            w = taps + 8
            span_full = 7 * d + w + 16
            print(f"  -> span {span_full} vs {w + 16} rows; DMA share of the "
                  f"span delta: {(a - b) / a * 100:.1f}% of launch time",
                  flush=True)


def pipeline_timing(lanes=1024):
    """Single-buffer vs double-buffered (pipelined) wide kernel. Run after
    `dmasplit` says the DMA share is worth hiding; also proves the
    predicated-DMA kernel compiles on the chip."""
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu.models import DEFAULT_MODEL
    from clownresampler_tpu.ops.pallas_resample import (
        resample_wide_taps,
        strided_table_device,
    )
    from clownresampler_tpu.utils.profiling import measure_kernel_time

    rng = np.random.default_rng(2)
    print(f"backend={jax.default_backend()} lanes={lanes}", flush=True)
    # taps 2008 (config 8), 1016 (medium top), 6016 (widest, big 2x span)
    for in_rate, out_rate in [(44100, 132), (44100, 262), (44100, 44)]:
        table, cfg, inc, state, taps = _setup(in_rate, out_rate, p0=0)
        d = inc >> 16
        tstr = strided_table_device(
            DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
            cfg.kernel_step_size, taps,
        )
        n_w = 64
        s_w = ((n_w * inc) >> 16) + taps + 64
        s_w = -(-s_w // 16) * 16
        x = jnp.asarray(
            rng.integers(-32768, 32768, size=(s_w, lanes)).astype(np.int32))
        base = None
        for pipe in (False, True):
            def body(c, pipe=pipe):
                out, _ = resample_wide_taps(
                    table, c, state, max_taps=taps, n_out=n_w, d=d,
                    table_strided=tstr, pipeline=pipe)
                return c.at[0, 0].add(out[0, 0] & 1)

            try:
                st = measure_kernel_time(body, x, n_w * lanes, k1=16, k2=96)
            except Exception as e:
                print(f"{in_rate}->{out_rate} taps={taps} pipeline={pipe}: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            extra = ""
            if pipe and base:
                extra = f" (x{base / st.seconds_per_launch:.2f} vs single)"
            else:
                base = st.seconds_per_launch
            print(f"{in_rate}->{out_rate} taps={taps} pipeline={pipe}: "
                  f"{st.seconds_per_launch*1e3:.3f} ms/launch "
                  f"{st.samples_per_second/1e9:.2f} G{extra}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "exact"
    if mode == "exact":
        exact()
    elif mode == "envelope":
        envelope()
    elif mode == "envelope2":
        envelope2()
    elif mode == "envelope3":
        envelope3()
    elif mode == "dmasplit":
        dma_split(int(sys.argv[2]) if len(sys.argv) > 2 else 1024)
    elif mode == "pipeline":
        pipeline_timing(int(sys.argv[2]) if len(sys.argv) > 2 else 1024)
    else:
        timing(int(sys.argv[2]) if len(sys.argv) > 2 else 2048)

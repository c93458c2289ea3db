#!/usr/bin/env python3
"""On-hardware verification: golden bit-exactness through the COMPILED kernels.

The pytest suite proves bit-exactness on the CPU mesh (Pallas in interpreter
mode); this tool re-proves it on the real TPU with compiled kernels — the
configuration the benchmarks run. Prints one PASS/FAIL line per check.

Run under the default (axon TPU) environment: python tools/verify_tpu.py
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GOLDEN = {
    (8000, 44100): "949de6c35cf5bd547e5a1e9a04233c14",
    (44100, 8000): "470b7980951007f7074affc666424004",
}


def main() -> int:
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.farm import UniformStreamFarm
    from clownresampler_tpu.lowlevel import make_device_state
    from clownresampler_tpu.models import lanczos_kernel_table
    from clownresampler_tpu.ops.convolve import convolve_frames
    from clownresampler_tpu.ops.pallas_resample import (
        plan_uniform,
        resample_integer_stride,
        resample_strided_phases,
        resample_strided_phases_wide,
        resample_uniform_lanes_general,
        resample_uniform_lanes_tiled,
        strided_phase_padding,
    )

    fixtures = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    pcm = np.fromfile(os.path.join(fixtures, "test_pcm_s16le.raw"), dtype="<i2").reshape(-1, 2)
    failures = 0

    # 0. Golden configs through resample_array (the public one-shot API,
    # which routes through the fused kernels on TPU).
    from clownresampler_tpu import resample_array

    for (in_rate, out_rate), md5_want in GOLDEN.items():
        out = resample_array(pcm, in_rate, out_rate, max(in_rate, out_rate))
        md5 = hashlib.md5(np.asarray(out, dtype="<i4").tobytes()).hexdigest()
        ok = md5 == md5_want
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'} one-shot golden {in_rate}->{out_rate} md5={md5}")

    # 1. Golden configs through the farm (compiled Pallas/general paths).
    for (in_rate, out_rate), md5_want in GOLDEN.items():
        farm = UniformStreamFarm(4, 2, in_rate, out_rate, max(in_rate, out_rate))
        data = np.broadcast_to(pcm, (4, *pcm.shape)).copy()
        outs = []
        for off in range(0, pcm.shape[0], 4096):
            outs.append(farm.process(data[:, off : off + 4096]))
        outs.append(farm.flush())
        got = np.concatenate(outs, axis=1)
        md5 = hashlib.md5(np.asarray(got[2], dtype="<i4").tobytes()).hexdigest()
        ok = md5 == md5_want
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'} farm golden {in_rate}->{out_rate} md5={md5}")

    # 2. Compiled kernels vs oracle across ratio classes: the four curated
    # BASELINE ratios plus randomized draws per class (fresh each run is
    # deliberate — this tool exists to catch compiled-on-hardware surprises).
    table = jnp.asarray(lanczos_kernel_table())
    rng = np.random.default_rng(7)
    ratios = [(48000, 44100), (8000, 44100), (96000, 48000), (44100, 8000)]
    draw = np.random.default_rng()
    for _ in range(3):  # tiled class: near-unity / upsample
        o = int(draw.integers(8000, 192000))
        i = int(draw.integers(max(1000, o // 8), 2 * o - 1))
        ratios.append((i, o))
    for _ in range(2):  # strided class: exact integer stride
        o = int(draw.integers(4000, 48000))
        ratios.append((int(draw.integers(2, 9)) * o, o))
    for _ in range(2):  # general class: wide non-integer downsample
        o = int(draw.integers(4000, 16000))
        i = int(draw.integers(2 * o + 1, 10 * o))
        if (i << 16) % o == 0:
            i += 1
        ratios.append((i, o))
    for in_rate, out_rate in ratios:
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        inc = fx.calculate_ratio(in_rate, out_rate)
        state = make_device_state(0, 0x4321, cfg, inc)
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        n_out = 512
        plan = plan_uniform(inc, n_out)
        s = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 96
        if plan["kernel"] == "strided":
            s += strided_phase_padding(max_taps, plan["d"], 32)
        s = -(-s // 16) * 16
        x = jnp.asarray(rng.integers(-32768, 32768, size=(s, 256)).astype(np.int32))
        if plan["kernel"] == "tiled":
            got, _ = resample_uniform_lanes_tiled(
                table, x, state, max_taps=max_taps, n_out=n_out,
                d=plan["d"], cand=plan["cand"])
        elif plan["kernel"] == "strided":
            # verify all three strided implementations compiled on hardware
            got, _ = resample_strided_phases(
                table, x, state, max_taps=max_taps, n_out=n_out, d=plan["d"],
                group=32)
            got_wide, _ = resample_strided_phases_wide(
                table, x, state, max_taps=max_taps, n_out=n_out, d=plan["d"],
                group=32)
            got_xla, _ = resample_integer_stride(
                table, x, state, max_taps=max_taps, n_out=n_out, d=plan["d"])
            agree = (np.array_equal(np.asarray(got), np.asarray(got_wide))
                     and np.array_equal(np.asarray(got), np.asarray(got_xla)))
            failures += not agree
            print(f"{'PASS' if agree else 'FAIL'} strided variants agree {in_rate}->{out_rate}")
        else:
            got, _ = resample_uniform_lanes_general(
                table, x, state, max_taps=max_taps, n_out=n_out)
        n = jnp.arange(n_out, dtype=jnp.int32)
        pos, frac = fx.positions_from_state(
            state.position_integer, state.position_fractional,
            state.cfg.increment_hi, state.cfg.increment_lo, n)
        want = convolve_frames(table, x, pos, frac, state.cfg, max_taps)
        ok = np.array_equal(np.asarray(got), np.asarray(want))
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'} compiled {plan['kernel']} kernel {in_rate}->{out_rate}")

    # 3. Wide in-guard kernel (radius ~504, taps 1016 <= FAST_KERNEL_MAX_TAPS):
    # the compiled general kernel at its widest allowed window. The ratio
    # keeps d small (2.18x downsample with a deep low-pass stretch) so the
    # input block stays inside the VMEM budget the dispatchers enforce —
    # a 44.1k->262 launch at n_out=128 needs a ~24.7k-row block, which is
    # beyond the documented Mosaic budget and something no dispatcher emits
    # (the farm caps capacity at VMEM_SAFE_INPUT_ROWS; LowLevelResampler
    # tiles by output frames against the same budget).
    in_rate, out_rate, lpf = 24000, 11000, 143
    cfg = configure(in_rate, out_rate, lpf)
    inc = fx.calculate_ratio(in_rate, out_rate)
    state = make_device_state(0, 0x4321, cfg, inc)
    max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
    assert max_taps > 1000, max_taps
    n_out = 128
    s = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 2048 + 96
    s = -(-s // 16) * 16
    x = jnp.asarray(rng.integers(-32768, 32768, size=(s, 128)).astype(np.int32))
    got, _ = resample_uniform_lanes_general(
        table, x, state, max_taps=max_taps, n_out=n_out)
    n = jnp.arange(n_out, dtype=jnp.int32)
    pos, frac = fx.positions_from_state(
        state.position_integer, state.position_fractional,
        state.cfg.increment_hi, state.cfg.increment_lo, n)
    want = convolve_frames(table, x, pos, frac, state.cfg, max_taps)
    ok = np.array_equal(np.asarray(got), np.asarray(want))
    failures += not ok
    print(f"{'PASS' if ok else 'FAIL'} compiled general kernel wide (radius "
          f"{cfg.integer_stretched_kernel_radius}, taps {max_taps})")

    # 3b. Shard-mapped compiled launch on a real dp=1 TPU mesh: the
    # shard_map -> Mosaic compile path exercised on a chip, not only
    # interpreted on the CPU mesh (VERDICT r2 item 4). Output must match the
    # plain (non-shard-mapped) farm bit-for-bit.
    from jax.sharding import Mesh
    from clownresampler_tpu.parallel import ShardedStreamFarm

    try:
        mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
        sh_farm = ShardedStreamFarm(mesh, 8, 2, 48000, 44100,
                                    chunk_frames=1024, interpret=False)
        ref_farm = UniformStreamFarm(8, 2, 48000, 44100, chunk_frames=1024,
                                     split_lanes=False)
        chunk = rng.integers(-32768, 32768, (8, 1024, 2)).astype(np.int16)
        got_sh = np.concatenate([sh_farm.process(chunk), sh_farm.flush()], axis=1)
        want_sh = np.concatenate([ref_farm.process(chunk), ref_farm.flush()], axis=1)
        ok = np.array_equal(got_sh, want_sh)
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'} shard-mapped compiled farm (dp=1 TPU mesh)")
    except Exception as e:  # a Mosaic-under-shard_map surprise must not ship
        failures += 1
        print(f"FAIL shard-mapped compiled farm (dp=1 TPU mesh): {type(e).__name__}: {e}")

    # 3c. DMA wide kernel (taps > FAST_KERNEL_MAX_TAPS) either side of the
    # whole-window MAC hybrid boundary (WIDE_WHOLE_MAC_MAX_W): 44100->87
    # gives w=3056 (whole-window MAC, the stack-safety frontier) and
    # 44100->86 gives w=3088 (tap-grid blocks). Scoped-vmem OOMs surface
    # only at compile time, so both forms must compile on the chip.
    from clownresampler_tpu.ops.pallas_resample import (
        WIDE_WHOLE_MAC_MAX_W,
        resample_wide_taps,
        strided_table_device,
    )
    from clownresampler_tpu.models import DEFAULT_MODEL

    for out_rate in (87, 86):
        cfg = configure(44100, out_rate, 44100)
        inc = fx.calculate_ratio(44100, out_rate)
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        w = max_taps + 8
        mode = "whole" if w <= WIDE_WHOLE_MAC_MAX_W else "block"
        n_out = 32
        s = ((n_out * inc) >> 16) + max_taps + 64
        s = -(-s // 16) * 16
        x = jnp.asarray(rng.integers(-32768, 32768, size=(s, 128)).astype(np.int32))
        state = make_device_state(0, 0x1234, cfg, inc)
        tstr = strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                                    cfg.kernel_step_size, max_taps)
        got, _ = resample_wide_taps(table, x, state, max_taps=max_taps,
                                    n_out=n_out, d=inc >> 16, table_strided=tstr)
        n = jnp.arange(n_out, dtype=jnp.int32)
        pos, frac = fx.positions_from_state(
            state.position_integer, state.position_fractional,
            state.cfg.increment_hi, state.cfg.increment_lo, n)
        want = convolve_frames(table, x, pos, frac, state.cfg, max_taps)
        ok = np.array_equal(np.asarray(got), np.asarray(want))
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'} compiled wide kernel {mode}-MAC "
              f"boundary (44100->{out_rate}, w={w})")
        # The double-buffered group-DMA variant must stay bit-exact COMPILED
        # (the prefetch schedule is timing-sensitive by construction;
        # interpret mode cannot catch a real DMA/MAC overlap hazard). Only
        # at shapes whose doubled scratch fits the scoped-vmem budget — the
        # same predicate the production auto gate applies.
        from clownresampler_tpu.ops.pallas_resample import (
            WIDE_MAC_BLOCK,
            wide_pipeline_auto,
            wide_pipeline_fits,
        )

        mac_block = w if w <= WIDE_WHOLE_MAC_MAX_W else WIDE_MAC_BLOCK
        d_ = inc >> 16
        span = min(-(-(7 * d_ + w + 16) // 8) * 8, (s // 8) * 8)
        if not wide_pipeline_auto(w, mac_block, span):
            print(f"SKIP compiled wide kernel {mode}-MAC PIPELINED "
                  f"(44100->{out_rate}, w={w}): the production auto gate "
                  "never picks the pipelined form here (blocked path only)")
        else:
            try:
                got_p, _ = resample_wide_taps(
                    table, x, state, max_taps=max_taps, n_out=n_out,
                    d=d_, table_strided=tstr, pipeline=True)
                ok = np.array_equal(np.asarray(got_p), np.asarray(want))
            except Exception as e:
                ok = False
                print(f"  pipelined raised {type(e).__name__}: {str(e)[:160]}")
            failures += not ok
            print(f"{'PASS' if ok else 'FAIL'} compiled wide kernel {mode}-MAC "
                  f"PIPELINED (44100->{out_rate}, w={w})")

    # 3d. DMA wide kernel at MEDIUM widths (inside FAST_KERNEL_MAX_TAPS):
    # the band the WIDE_DISPATCH_MIN_TAPS crossover can route here
    # (tools/probe_midwide.py). Must compile and match the oracle on the chip.
    for out_rate in (517, 262):   # taps 512 / 1016
        cfg = configure(44100, out_rate, 44100)
        inc = fx.calculate_ratio(44100, out_rate)
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        assert max_taps <= 1024, max_taps
        n_out = 64
        s = ((n_out * inc) >> 16) + max_taps + 64
        s = -(-s // 16) * 16
        x = jnp.asarray(rng.integers(-32768, 32768, size=(s, 128)).astype(np.int32))
        state = make_device_state(0, 0x2345, cfg, inc)
        tstr = strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                                    cfg.kernel_step_size, max_taps)
        got, _ = resample_wide_taps(table, x, state, max_taps=max_taps,
                                    n_out=n_out, d=inc >> 16, table_strided=tstr)
        n = jnp.arange(n_out, dtype=jnp.int32)
        pos, frac = fx.positions_from_state(
            state.position_integer, state.position_fractional,
            state.cfg.increment_hi, state.cfg.increment_lo, n)
        want = convolve_frames(table, x, pos, frac, state.cfg, max_taps)
        ok = np.array_equal(np.asarray(got), np.asarray(want))
        failures += not ok
        print(f"{'PASS' if ok else 'FAIL'} compiled wide kernel medium width "
              f"(44100->{out_rate}, taps={max_taps})")
        w = max_taps + 8
        span = min(-(-(7 * (inc >> 16) + w + 16) // 8) * 8, (s // 8) * 8)
        # Medium widths run the whole-window MAC, where the auto gate never
        # pipelines (measured 0.99x) — but keep the explicit-knob compile
        # check: a user can still pass pipeline=True, and these shapes
        # compiled + matched on hardware (round-4 campaign).
        if wide_pipeline_fits(w, w, span):
            got_p, _ = resample_wide_taps(
                table, x, state, max_taps=max_taps, n_out=n_out,
                d=inc >> 16, table_strided=tstr, pipeline=True)
            ok = np.array_equal(np.asarray(got_p), np.asarray(want))
            failures += not ok
            print(f"{'PASS' if ok else 'FAIL'} compiled wide kernel medium "
                  f"width PIPELINED (44100->{out_rate}, taps={max_taps})")

    # 4. Full ratio domain on hardware: replay the C-oracle wide-kernel
    # streaming scripts (radius 1003 / 3007 — the oracle-fallback path the
    # width guard routes to on TPU) plus the medium-width script bit-for-bit.
    from tests import oracle
    from tests.test_lowlevel import _replay

    for script in oracle.scripts("lowlevel"):
        if script[0] not in ("ll_wide", "ll_ultrawide", "ll_midwide"):
            continue
        try:
            _replay(*script)
            print(f"PASS oracle script {script[0]} on TPU")
        except AssertionError as e:
            failures += 1
            print(f"FAIL oracle script {script[0]} on TPU: {e}")

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

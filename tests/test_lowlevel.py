"""Low-level streaming parity: replay the C-oracle scripts step by step.

Each script drives ClownResampler_LowLevel_* in the C harness
(tools/gen_oracle_vectors.c) and records outputs, return values, consumed
counts and full state after every op. Replaying through LowLevelResampler must
match everything bit-for-bit: chunked feeds with position carry
(clownresampler.h:1063-1068), output-full rewind (1084-1088), mid-stream
Adjust pitch bends (1052-1056), integer ratios and unity passthrough.
"""

import numpy as np
import pytest

from clownresampler_tpu.lowlevel import LowLevelResampler
from tests import oracle


def _replay(name, meta, ops, expected_out, stream):
    ch = meta["channels"]
    in_rate, out_rate, lpf = meta["rates"]
    pad = meta["pad"]
    stream_frames = meta["stream_frames"]
    stream = stream.reshape(-1, ch)

    rs = LowLevelResampler.init(ch, in_rate, out_rate, lpf)
    assert rs is not None

    produced_frames = []
    cursor = 0
    for row in ops:
        op, a0, a1, a2 = (int(v) for v in row[:4])
        exp_ret, exp_remaining, exp_produced = (int(v) for v in row[4:7])
        exp_state = tuple(int(v) for v in row[7:14])

        if op == 1:
            n = min(a0, stream_frames - cursor)
            radius = rs.config.integer_stretched_kernel_radius
            start = pad + cursor - radius
            window = stream[start : pad + cursor + n + radius]
            ret, remaining, frames = rs.resample(window, n, output_limit=a1)
            assert ret == bool(exp_ret), (name, row)
            assert remaining == exp_remaining, (name, row)
            assert frames.shape[0] == exp_produced, (name, row)
            produced_frames.append(frames)
            cursor += n - remaining
        elif op == 2:
            ret = rs.adjust(a0, a1, a2)
            assert ret == bool(exp_ret), (name, row)
        else:
            raise AssertionError(f"unknown op {op}")

        assert rs.state_tuple() == exp_state, (name, row)

    got = np.concatenate(produced_frames, axis=0).ravel() if produced_frames else np.zeros(0)
    np.testing.assert_array_equal(got, expected_out, err_msg=name)


@pytest.mark.parametrize(
    "script", list(oracle.scripts("lowlevel")), ids=lambda s: s[0]
)
def test_lowlevel_script(script):
    _replay(*script)


@pytest.mark.parametrize("in_rate,out_rate,ch,n_in", [
    (48000, 44100, 2, 2600),    # tiled engine
    (96000, 48000, 1, 5200),    # polyphase strided engine
    (44100, 8000, 2, 14000),    # general engine
])
def test_batched_tile_dispatch_bit_exact(monkeypatch, in_rate, out_rate, ch, n_in):
    """The grouped multi-tile device dispatch (_compute_frames_batched: all
    windows uploaded first, TILE_LAUNCH_GROUP independent launches fused per
    program, downloads last) must be bit-equal to the XLA gather oracle.
    MAX_CHUNK_OUTPUT_FRAMES is shrunk so a moderate stream spans many tiles,
    exercising the grouping, the tail-tile shape change, and the device-side
    int16->int32 lane packing."""
    from clownresampler_tpu import lowlevel

    monkeypatch.setattr(lowlevel, "MAX_CHUNK_OUTPUT_FRAMES", 512)

    rng = np.random.default_rng(101)
    data = rng.integers(-32768, 32768, size=(n_in, ch)).astype(np.int16)

    fast = LowLevelResampler.init(ch, in_rate, out_rate,
                                  max(in_rate, out_rate), interpret=True)
    oracle_rs = LowLevelResampler.init(ch, in_rate, out_rate,
                                       max(in_rate, out_rate))
    r = fast.config.integer_stretched_kernel_radius
    padded = np.zeros((n_in + 2 * r, ch), np.int16)
    padded[r : r + n_in] = data

    _, _, got = fast.resample(padded, n_in)
    _, _, want = oracle_rs.resample(padded, n_in)
    assert got.shape[0] > 512, "stream too short to exercise multiple tiles"
    np.testing.assert_array_equal(got, want)


def test_batched_tile_dispatch_wide_kernel():
    """Wide kernels (taps > FAST_KERNEL_MAX_TAPS) through the same batched
    dispatch: several WIDE_MAX_LAUNCH_FRAMES tiles grouped per program,
    bit-equal to the gather oracle (the bulk path no longer declines wide
    ratios)."""
    rng = np.random.default_rng(103)
    in_rate, out_rate, ch = 44100, 132, 1      # radius 1003, taps 2008
    n_in = 60000                                # ~180 output frames, 3 tiles

    data = rng.integers(-32768, 32768, size=(n_in, ch)).astype(np.int16)
    fast = LowLevelResampler.init(ch, in_rate, out_rate, in_rate,
                                  interpret=True)
    assert fast._max_taps > 1024
    oracle_rs = LowLevelResampler.init(ch, in_rate, out_rate, in_rate)
    r = fast.config.integer_stretched_kernel_radius
    padded = np.zeros((n_in + 2 * r, ch), np.int16)
    padded[r : r + n_in] = data

    _, _, got = fast.resample(padded, n_in)
    _, _, want = oracle_rs.resample(padded, n_in)
    assert got.shape[0] >= 128
    np.testing.assert_array_equal(got, want)


def test_wide_serves_lane_aware_crossover():
    """The medium-width dispatch boundary is LANE-DEPENDENT (measured,
    tools/probe_midwide.py round 4): multi-lane-tile launches route the
    whole roll band (taps > 248) to the DMA wide kernel; single-tile
    launches keep the general roll kernel through taps 392. The shift band
    and non-general classes never cross."""
    from clownresampler_tpu.ops import pallas_resample as pr

    assert not pr.wide_serves("general", 248, lanes=2048)   # shift band
    assert pr.wide_serves("general", 272, lanes=2048)       # roll band, multi
    assert not pr.wide_serves("general", 272, lanes=128)    # single tile
    assert not pr.wide_serves("general", 392, lanes=128)
    assert pr.wide_serves("general", 512, lanes=128)
    assert pr.wide_serves("general", 272)                   # default: multi
    assert not pr.wide_serves("tiled", 2000, lanes=2048)
    assert not pr.wide_serves("strided", 2000, lanes=2048)


@pytest.mark.parametrize("in_rate,out_rate,threshold", [
    (44100, 349, 504),   # taps 760 through a mid-band crossover
    (44100, 991, 248),   # taps 272 — the bottom of the roll-path band
])
def test_medium_width_wide_dispatch_bit_exact(monkeypatch, in_rate, out_rate,
                                              threshold):
    """With the medium-width crossover lowered (WIDE_DISPATCH_MIN_TAPS),
    general-class launches in the band route to the DMA wide kernel and stay
    bit-equal to the gather oracle. Guards the dispatch plumbing so flipping
    the measured crossover constant is behavior-safe."""
    from clownresampler_tpu.ops import pallas_resample as pr

    monkeypatch.setattr(pr, "WIDE_DISPATCH_MIN_TAPS", threshold)
    calls = []
    real_wide = pr.resample_wide_taps

    def counting_wide(*args, **kwargs):
        calls.append(kwargs.get("max_taps"))
        return real_wide(*args, **kwargs)

    monkeypatch.setattr(pr, "resample_wide_taps", counting_wide)

    rng = np.random.default_rng(107)
    ch = 2
    n_in = 30000

    data = rng.integers(-32768, 32768, size=(n_in, ch)).astype(np.int16)
    fast = LowLevelResampler.init(ch, in_rate, out_rate, in_rate,
                                  interpret=True)
    assert threshold < fast._max_taps <= 1024
    oracle_rs = LowLevelResampler.init(ch, in_rate, out_rate, in_rate)
    r = fast.config.integer_stretched_kernel_radius
    padded = np.zeros((n_in + 2 * r, ch), np.int16)
    padded[r : r + n_in] = data

    _, _, got = fast.resample(padded, n_in)
    _, _, want = oracle_rs.resample(padded, n_in)
    assert got.shape[0] >= 128
    assert calls and all(t == fast._max_taps for t in calls), calls
    np.testing.assert_array_equal(got, want)


def test_pack_super_groups_shapes():
    """The cycle packer's unit contract: same-shape runs become
    TILE_LAUNCH_GROUP-capped groups; cycles split exactly when the next
    group's resident+transient footprint exceeds the budget, carrying the
    PREVIOUS groups' resident arrays (windows+outputs) but not their
    transients."""
    from clownresampler_tpu.lowlevel import TILE_LAUNCH_GROUP, _pack_super_groups

    # (tile, n_pad, rows, p0, f0): packing keys on n_pad/rows only
    mk = lambda n_pad, rows: (n_pad, n_pad, rows, 0, 0)
    ch = 2
    res = lambda n_pad, rows: rows * ch * 2 + n_pad * ch * 4
    tmp = lambda n_pad, rows: (rows + n_pad) * 128 * 4

    # 6 same-shape tiles -> groups of 4 + 2; a shape change breaks a run
    descs = [mk(512, 1024)] * 6 + [mk(256, 1024)]
    sg = _pack_super_groups(descs, ch, 10 << 30)
    assert TILE_LAUNCH_GROUP == 4
    assert sg == [[(0, 4), (4, 6), (6, 7)]]   # one cycle, 3 groups

    # budget tuned so the FIRST cycle holds exactly two groups, then splits:
    # after groups 1+2 are resident, group 3's check is
    # resident(g1+g2) + res(g3) + tmp(g3) > budget.
    g_res = 4 * res(512, 1024)
    g_tmp = 4 * tmp(512, 1024)
    budget = 2 * g_res + g_tmp          # fits g1, then g2; g3 tips over
    descs = [mk(512, 1024)] * 12
    sg = _pack_super_groups(descs, ch, budget)
    assert sg == [[(0, 4), (4, 8)], [(8, 12)]]

    # a budget below one group still yields one group per cycle (never empty)
    sg = _pack_super_groups(descs, ch, 1)
    assert sg == [[(0, 4)], [(4, 8)], [(8, 12)]]

    # channels > 128: the transient charge is round_up(ch, 128) lanes (256
    # here), matching what _grouped_packed_launch actually allocates — a
    # 128-lane charge would undercount 2x and let a cycle bust the budget
    ch2 = 130
    res2 = lambda n_pad, rows: rows * ch2 * 2 + n_pad * ch2 * 4
    tmp2 = lambda n_pad, rows: (rows + n_pad) * 256 * 4
    g_res2 = 4 * res2(512, 1024)
    g_tmp2 = 4 * tmp2(512, 1024)
    budget2 = 2 * g_res2 + g_tmp2
    assert _pack_super_groups(descs, ch2, budget2) == [[(0, 4), (4, 8)], [(8, 12)]]
    # one byte less must tip the second group out — only true when the
    # transient is charged at the full 256 lanes
    assert _pack_super_groups(descs, ch2, budget2 - 1) == [
        [(0, 4)], [(4, 8)], [(8, 12)]]


def test_sequential_wide_tile_many_channels():
    """A single-tile stream (the sequential dispatch path, <= 64 wide output
    frames) through the wide kernel at channels > 128: the staging window
    must widen to round_up(ch, 128) lanes exactly like the fast and batched
    paths (a hardcoded 128-lane window raised on ch > 128 here while longer
    streams of the same config succeeded through the batched dispatch)."""
    rng = np.random.default_rng(109)
    in_rate, out_rate, ch = 44100, 132, 130    # radius 1003, taps 2008
    n_in = 12000                               # ~35 output frames: ONE tile

    data = rng.integers(-32768, 32768, size=(n_in, ch)).astype(np.int16)
    fast = LowLevelResampler.init(ch, in_rate, out_rate, in_rate,
                                  interpret=True)
    assert fast._max_taps > 1024
    oracle_rs = LowLevelResampler.init(ch, in_rate, out_rate, in_rate)
    r = fast.config.integer_stretched_kernel_radius
    padded = np.zeros((n_in + 2 * r, ch), np.int16)
    padded[r : r + n_in] = data

    _, _, got = fast.resample(padded, n_in)
    _, _, want = oracle_rs.resample(padded, n_in)
    assert 0 < got.shape[0] <= 64, "stream must stay a single wide tile"
    np.testing.assert_array_equal(got, want)


def test_batched_tile_dispatch_super_groups(monkeypatch):
    """Streams past BATCH_DEVICE_BUDGET_BYTES split into several sequential
    upload->launch->download cycles (bounded device residency for direct
    resample() calls of any length); the cycle boundaries — including a
    cycle holding SEVERAL groups followed by a split, which exercises the
    windows[i-lo:j-lo] cycle-relative slicing — must not change a byte vs
    the oracle."""
    from clownresampler_tpu import lowlevel
    from clownresampler_tpu.lowlevel import _pack_super_groups

    monkeypatch.setattr(lowlevel, "MAX_CHUNK_OUTPUT_FRAMES", 512)

    rng = np.random.default_rng(107)
    in_rate, out_rate, ch, n_in = 48000, 44100, 2, 7000
    data = rng.integers(-32768, 32768, size=(n_in, ch)).astype(np.int16)

    fast = LowLevelResampler.init(ch, in_rate, out_rate,
                                  max(in_rate, out_rate), interpret=True)
    # Capture the descs the dispatch actually builds, then pick a budget that
    # provably packs them as >=2 cycles with some cycle holding >=2 groups
    # (a fixed byte count would silently stop exercising the multi-group
    # cycle whenever the geometry formulas move).
    captured = {}
    orig = lowlevel.LowLevelResampler._compute_frames_batched

    def spy(self, padded_input, descs, kind, table, tstr, taps, cand=None):
        captured["descs"] = descs
        return orig(self, padded_input, descs, kind, table, tstr, taps, cand)

    monkeypatch.setattr(
        lowlevel.LowLevelResampler, "_compute_frames_batched", spy
    )

    oracle_rs = LowLevelResampler.init(ch, in_rate, out_rate,
                                       max(in_rate, out_rate))
    r = fast.config.integer_stretched_kernel_radius
    padded = np.zeros((n_in + 2 * r, ch), np.int16)
    padded[r : r + n_in] = data

    probe = LowLevelResampler.init(ch, in_rate, out_rate,
                                   max(in_rate, out_rate), interpret=True)
    _, _, _ = probe.resample(padded, n_in)
    descs = captured["descs"]
    budget = None
    # step must undercut the ~g_res-wide budget window in which a cycle
    # holds >=2 groups before splitting (g_res is tens of KB here)
    for cand_budget in range(1 << 20, 64 << 20, 1 << 14):
        sg = _pack_super_groups(descs, ch, cand_budget)
        if len(sg) >= 2 and any(len(cycle) >= 2 for cycle in sg):
            budget = cand_budget
            break
    assert budget is not None, "no budget packs >=2 cycles with a multi-group cycle"
    fast.BATCH_DEVICE_BUDGET_BYTES = budget

    _, _, got = fast.resample(padded, n_in)
    _, _, want = oracle_rs.resample(padded, n_in)
    assert got.shape[0] > 1024, "stream too short to span several cycles"
    np.testing.assert_array_equal(got, want)


def test_multilane_general_dispatch_bit_exact():
    """channels > 128 make general-class launches multi-lane-tile, where the
    measured compile envelope caps the row budget at 12288 (the (S, 128)
    input block is double-buffered per lane tile). The dispatcher must cap
    rows_budget accordingly — `general_pick_group(...) or 16` used to force
    an envelope-violating group here (ADVICE r4) — and the capped tile
    geometry must stay bit-equal to the gather oracle."""
    from clownresampler_tpu.ops.pallas_resample import general_launch_fits

    ch, n_in = 136, 26000            # lanes_pad 256; ~4.7k output frames
    in_rate, out_rate = 44100, 8000  # general class (d=5, frac != 0)

    fast = LowLevelResampler.init(ch, in_rate, out_rate, 44100,
                                  interpret=True)
    # the premise: the envelope rejects the tiled-calibrated 16384-row
    # budget at this lane count but accepts 12288
    assert not general_launch_fits(16384, 256, 16, fast._max_taps)
    assert general_launch_fits(12288, 256, 16, fast._max_taps)
    oracle_rs = LowLevelResampler.init(ch, in_rate, out_rate, 44100)
    rng = np.random.default_rng(211)
    data = rng.integers(-32768, 32768, size=(n_in, ch)).astype(np.int16)
    r = fast.config.integer_stretched_kernel_radius
    padded = np.zeros((n_in + 2 * r, ch), np.int16)
    padded[r : r + n_in] = data

    _, _, got = fast.resample(padded, n_in)
    _, _, want = oracle_rs.resample(padded, n_in)
    assert got.shape[0] > 2200, "stream too short to exercise multiple tiles"
    np.testing.assert_array_equal(got, want)


def test_small_chunk_micro_launch_dispatch_bit_exact(monkeypatch):
    """<=128-frame tiled launches dispatch at group 8 (the measured
    micro-launch latency policy — benchmarks/RESULTS.md round-5 latency
    sweep: group 8 is fastest at 64/128 frames; a round-4 noise artifact
    briefly shipped group 4 here): pin that the micro-launch branch is
    actually taken and stays bit-exact."""
    from clownresampler_tpu.ops import pallas_resample as pr

    groups = []
    real = pr.resample_uniform_lanes_tiled

    def spy(*args, **kwargs):
        groups.append(kwargs.get("group"))
        return real(*args, **kwargs)

    monkeypatch.setattr(pr, "resample_uniform_lanes_tiled", spy)

    ch, n_in = 2, 120                 # ~110 output frames -> n_pad 128
    fast = LowLevelResampler.init(ch, 48000, 44100, 48000, interpret=True)
    oracle_rs = LowLevelResampler.init(ch, 48000, 44100, 48000)
    rng = np.random.default_rng(307)
    data = rng.integers(-32768, 32768, size=(n_in, ch)).astype(np.int16)
    r = fast.config.integer_stretched_kernel_radius
    padded = np.zeros((n_in + 2 * r, ch), np.int16)
    padded[r : r + n_in] = data

    _, _, got = fast.resample(padded, n_in)
    _, _, want = oracle_rs.resample(padded, n_in)
    assert groups == [8], groups      # the micro-launch branch was taken
    np.testing.assert_array_equal(got, want)


def test_wide_reserve_narrow_ratio_fast_kernel_dispatch():
    """A stream whose RESERVE is past FAST_KERNEL_MAX_TAPS but whose current
    ratio is narrow dispatches at the current width class (round 5): the
    fast VMEM kernels serve it (previously the wide DMA kernel read the full
    reserved window per frame), bit-exact vs the gather oracle."""
    from clownresampler_tpu.ops import pallas_resample as pr

    calls = []
    real = pr.resample_uniform_lanes_general

    def spy(*args, **kwargs):
        calls.append(kwargs.get("max_taps"))
        return real(*args, **kwargs)

    rng = np.random.default_rng(113)
    ch, n_in = 2, 9000
    fast = LowLevelResampler.init(ch, 44100, 8000, 44100, max_radius=1003,
                                  interpret=True)
    assert fast._max_taps > 1024      # reserve past the fast-kernel guard
    oracle_rs = LowLevelResampler.init(ch, 44100, 8000, 44100)
    data = rng.integers(-32768, 32768, size=(n_in, ch)).astype(np.int16)
    r = fast.config.integer_stretched_kernel_radius
    padded = np.zeros((n_in + 2 * r, ch), np.int16)
    padded[r : r + n_in] = data

    import unittest.mock
    with unittest.mock.patch.object(
        pr, "resample_uniform_lanes_general", spy
    ):
        _, _, got = fast.resample(padded, n_in)
    _, _, want = oracle_rs.resample(padded, n_in)
    assert calls and all(t == 40 for t in calls), calls
    np.testing.assert_array_equal(got, want)

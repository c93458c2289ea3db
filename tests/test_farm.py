"""Transcode farm: per-stream bit-exactness against the host low-level path.

Each stream pushed through UniformStreamFarm (chunked, Pallas/strided/oracle
dispatch, native staging) must produce exactly what the reference produces for
that stream's whole input (the host LowLevelResampler is already proven
bit-exact against the C oracle).
"""

import numpy as np
import pytest

from clownresampler_tpu.farm import UniformStreamFarm
from clownresampler_tpu.lowlevel import LowLevelResampler

RATIOS = [
    (48000, 44100),   # tiled d=1
    (8000, 44100),    # tiled d=0
    (96000, 48000),   # strided d=2
    (44100, 8000),    # oracle (d=5, lo != 0)
    (44100, 44100),   # unity
]


def _host_reference(data, channels, in_rate, out_rate, lpf):
    rs = LowLevelResampler.init(channels, in_rate, out_rate, lpf)
    r = rs.config.integer_stretched_kernel_radius
    padded = np.concatenate(
        [np.zeros((r, channels), np.int16), data, np.zeros((r, channels), np.int16)]
    )
    _, _, frames = rs.resample(padded, data.shape[0])
    return frames


@pytest.mark.parametrize("in_rate,out_rate", RATIOS)
def test_farm_matches_host(in_rate, out_rate):
    rng = np.random.default_rng(21)
    b, ch, total = 4, 2, 700
    lpf = max(in_rate, out_rate)
    data = rng.integers(-32768, 32768, size=(b, total, ch)).astype(np.int16)

    farm = UniformStreamFarm(
        b, ch, in_rate, out_rate, lpf, chunk_frames=256, interpret=True
    )
    outs = []
    cursor = 0
    for size in (100, 17, 256, 9, 200, 118):
        outs.append(farm.process(data[:, cursor : cursor + size]))
        cursor += size
    assert cursor == total
    outs.append(farm.flush())
    got = np.concatenate(outs, axis=1)

    for i in range(b):
        want = _host_reference(data[i], ch, in_rate, out_rate, lpf)
        np.testing.assert_array_equal(
            got[i], want, err_msg=f"stream {i} ratio {in_rate}->{out_rate}"
        )


def test_farm_pitch_bend_matches_host():
    """adjust() between chunks == LowLevel_Adjust between chunked resamples."""
    rng = np.random.default_rng(5)
    b, ch, total = 2, 2, 600
    data = rng.integers(-32768, 32768, size=(b, total, ch)).astype(np.int16)
    rates = [(22050, 44100), (33075, 44100), (44100, 44100), (66150, 44100)]

    farm = UniformStreamFarm(
        b, ch, rates[0][0], rates[0][1], 44100, chunk_frames=256,
        max_radius=6, interpret=True,
    )
    outs = []
    cursor = 0
    for i, size in enumerate((150, 150, 150, 150)):
        if i > 0:
            assert farm.adjust(rates[i][0], rates[i][1], 44100)
        outs.append(farm.process(data[:, cursor : cursor + size]))
        cursor += size
    outs.append(farm.flush())
    got = np.concatenate(outs, axis=1)

    # Host mirror: chunked low-level resampling replaying the farm's exact
    # schedule — after each chunk the farm resamples against all received
    # frames minus a trailing hold-back of R_BOUND (its max-radius halo);
    # flush appends R_BOUND zero frames. The adjust points land at the same
    # stream phase iff the visible-frame schedule matches.
    r_bound = 6
    for s in range(b):
        rs = LowLevelResampler.init(ch, rates[0][0], rates[0][1], 44100, max_radius=r_bound)
        padded = np.concatenate(
            [np.zeros((r_bound, ch), np.int16), data[s], np.zeros((r_bound, ch), np.int16)]
        )
        host_frames = []
        consumed = 0
        received = 0
        for i, size in enumerate((150, 150, 150, 150)):
            if i > 0:
                assert rs.adjust(rates[i][0], rates[i][1], 44100)
            received += size
            n_visible = received - consumed - r_bound
            if n_visible <= 0:
                continue
            r = rs.config.integer_stretched_kernel_radius
            start_row = r_bound + consumed - r
            window = padded[start_row : start_row + n_visible + 2 * r]
            _, remaining, frames = rs.resample(window, n_visible)
            host_frames.append(frames)
            consumed += n_visible - remaining
        # flush: the hold-back plus r_bound zeros become visible
        n_visible = (received + r_bound) - consumed - r_bound
        r = rs.config.integer_stretched_kernel_radius
        start_row = r_bound + consumed - r
        window = padded[start_row : start_row + n_visible + 2 * r]
        _, _, frames = rs.resample(window, n_visible)
        host_frames.append(frames)
        want = np.concatenate(host_frames, axis=0)
        np.testing.assert_array_equal(got[s], want, err_msg=f"stream {s}")


def test_farm_rejects_bad_adjust():
    farm = UniformStreamFarm(2, 2, 44100, 44100, 44100, chunk_frames=128, interpret=True)
    assert not farm.adjust(192000, 8000)      # radius beyond bound
    assert farm.adjust(44100, 48000)          # fine


def test_mixed_farm_matches_host():
    from clownresampler_tpu.farm import MixedStreamFarm

    rng = np.random.default_rng(33)
    ch, total = 2, 512
    specs = [(48000, 44100), (8000, 44100), (48000, 44100), (96000, 48000)]
    data = [rng.integers(-32768, 32768, size=(total, ch)).astype(np.int16) for _ in specs]

    farm = MixedStreamFarm(specs, ch, chunk_frames=256, interpret=True)
    outs = [[] for _ in specs]
    for off in (0, 256):
        res = farm.process([d[off : off + 256] for d in data])
        for i, r in enumerate(res):
            outs[i].append(r)
    for i, r in enumerate(farm.flush()):
        outs[i].append(r)

    for i, (in_rate, out_rate) in enumerate(specs):
        got = np.concatenate(outs[i], axis=0)
        want = _host_reference(data[i], ch, in_rate, out_rate, max(in_rate, out_rate))
        np.testing.assert_array_equal(got, want, err_msg=f"stream {i}")


def test_farm_strided_extreme_downsample():
    """Review regression: strided path with d=4 must fit staging capacity
    (previously crashed with a slice past the staging buffer)."""
    rng = np.random.default_rng(41)
    data = rng.integers(-32768, 32768, size=(1, 256, 1)).astype(np.int16)
    farm = UniformStreamFarm(1, 1, 192000, 48000, chunk_frames=256, interpret=True)
    out = np.concatenate([farm.process(data), farm.flush()], axis=1)
    want = _host_reference(data[0], 1, 192000, 48000, 192000)
    np.testing.assert_array_equal(out[0], want)


def test_farm_launch_tiling_matches_host(monkeypatch):
    """_launch tiles into sub-launches; tiled output == single-launch output.

    Cheap multi-tile exercise: force tiny tiles so one process() crosses many
    sub-launch boundaries (host-side p0/f0 re-derivation between tiles)."""
    from clownresampler_tpu import farm as farm_mod

    monkeypatch.setattr(farm_mod, "MAX_LAUNCH_OUTPUT_FRAMES", 64)
    rng = np.random.default_rng(13)
    for in_rate, out_rate in [(44100, 48000), (8000, 44100), (96000, 48000)]:
        data = rng.integers(-32768, 32768, size=(2, 500, 2)).astype(np.int16)
        farm = UniformStreamFarm(2, 2, in_rate, out_rate, chunk_frames=512,
                                 interpret=True)
        got = np.concatenate([farm.process(data), farm.flush()], axis=1)
        for i in range(2):
            want = _host_reference(data[i], 2, in_rate, out_rate,
                                   max(in_rate, out_rate))
            np.testing.assert_array_equal(got[i], want,
                                          err_msg=f"{in_rate}->{out_rate} s{i}")


def test_farm_lane_split_matches_host(monkeypatch):
    """Wide fleets split into lane-sliced sub-launches (zero-copy column
    slices in one fused program); output must be identical to unsplit."""
    from clownresampler_tpu import farm as farm_mod

    monkeypatch.setattr(farm_mod, "LANE_SPLIT", 128)
    rng = np.random.default_rng(23)
    b, ch, total = 96, 2, 300                 # 192 lanes -> 2 splits of 128
    data = rng.integers(-32768, 32768, size=(b, total, ch)).astype(np.int16)
    farm = UniformStreamFarm(b, ch, 48000, 44100, chunk_frames=256, interpret=True)
    got = np.concatenate(
        [farm.process(data[:, :256]), farm.process(data[:, 256:]), farm.flush()],
        axis=1,
    )
    for i in (0, 63, 95):
        want = _host_reference(data[i], ch, 48000, 44100, 48000)
        np.testing.assert_array_equal(got[i], want, err_msg=f"stream {i}")


def test_farm_large_chunk_int32_safe():
    """Advisor regression: one huge process() must not wrap int32 positions.

    At 44.1k->48k (inc_lo=60211) frame 35665's f0 + n*inc_lo exceeds 2^31;
    the untiled farm silently emitted corrupt audio past that frame."""
    rng = np.random.default_rng(17)
    n = 36000
    data = rng.integers(-32768, 32768, size=(1, n, 1)).astype(np.int16)
    farm = UniformStreamFarm(1, 1, 44100, 48000, chunk_frames=n, interpret=True)
    got = np.concatenate([farm.process(data), farm.flush()], axis=1)
    want = _host_reference(data[0], 1, 44100, 48000, 48000)
    np.testing.assert_array_equal(got[0], want)


def test_farm_device_staging_matches_host_staging():
    """device_staging=True (device-resident buffer) == native host staging."""
    rng = np.random.default_rng(71)
    b, ch, total = 3, 2, 600
    data = rng.integers(-32768, 32768, size=(b, total, ch)).astype(np.int16)

    outs = {}
    for dev in (False, True):
        farm = UniformStreamFarm(
            b, ch, 44100, 48000, 48000, chunk_frames=256,
            interpret=True, device_staging=dev,
        )
        parts = []
        for off in (0, 256, 512):
            parts.append(farm.process(data[:, off : off + min(256, total - off)]))
        parts.append(farm.flush())
        outs[dev] = np.concatenate(parts, axis=1)
    np.testing.assert_array_equal(outs[True], outs[False])

    want = _host_reference(data[1], ch, 44100, 48000, 48000)
    np.testing.assert_array_equal(outs[True][1], want)


def test_farm_clamp_s16_output():
    """clamp_s16 farms emit int16 == clipped wide output, every kernel class."""
    rng = np.random.default_rng(91)
    for in_rate, out_rate in [(48000, 44100), (96000, 48000), (44100, 8000)]:
        data = rng.integers(-32768, 32768, size=(2, 300, 2)).astype(np.int16)
        wide = UniformStreamFarm(2, 2, in_rate, out_rate, chunk_frames=256, interpret=True)
        clamped = UniformStreamFarm(2, 2, in_rate, out_rate, chunk_frames=256,
                                    interpret=True, clamp_s16=True)
        w = np.concatenate([wide.process(data[:, :256]), wide.process(data[:, 256:]),
                            wide.flush()], axis=1)
        c = np.concatenate([clamped.process(data[:, :256]), clamped.process(data[:, 256:]),
                            clamped.flush()], axis=1)
        assert c.dtype == np.int16
        np.testing.assert_array_equal(
            c, np.clip(w, -0x7FFF, 0x7FFF).astype(np.int16), err_msg=str((in_rate, out_rate))
        )


def test_mixed_farm_per_stream_adjust():
    """adjust_stream re-rates ONE stream mid-stream (its position carries,
    clownresampler.h:1052-1056); every stream still matches a per-stream
    UniformStreamFarm driven with the same adjust schedule."""
    from clownresampler_tpu.farm import MixedStreamFarm

    rng = np.random.default_rng(41)
    ch, chunk, n_chunks = 2, 256, 4
    specs = [(48000, 44100), (48000, 44100), (8000, 44100)]
    data = [
        rng.integers(-32768, 32768, size=(n_chunks * chunk, ch)).astype(np.int16)
        for _ in specs
    ]
    # stream 1 re-rates to 96k->48k before chunk 2, then to 32k->48k before
    # chunk 3 (second adjust lands on its private farm); max_radius reserves
    # the widest radius the schedule reaches.
    farm = MixedStreamFarm(specs, ch, chunk_frames=chunk, interpret=True,
                           max_radius=8)
    outs = [[] for _ in specs]
    for k in range(n_chunks):
        if k == 2:
            assert farm.adjust_stream(1, 96000, 48000)
        if k == 3:
            assert farm.adjust_stream(1, 32000, 48000)
        res = farm.process([d[k * chunk : (k + 1) * chunk] for d in data])
        for i, r in enumerate(res):
            outs[i].append(r)
    for i, r in enumerate(farm.flush()):
        outs[i].append(r)

    # per-stream references with the same schedule
    for i, (in_rate, out_rate) in enumerate(specs):
        ref = UniformStreamFarm(1, ch, in_rate, out_rate, chunk_frames=chunk,
                                interpret=True, max_radius=8)
        want = []
        for k in range(n_chunks):
            if i == 1 and k == 2:
                assert ref.adjust(96000, 48000)
            if i == 1 and k == 3:
                assert ref.adjust(32000, 48000)
            want.append(ref.process(data[i][None, k * chunk : (k + 1) * chunk]))
        want.append(ref.flush())
        want_cat = np.concatenate([w[0] for w in want], axis=0)
        got = np.concatenate(outs[i], axis=0)
        np.testing.assert_array_equal(got, want_cat, err_msg=f"stream {i}")


def test_wide_bound_farm_narrow_ratio_bit_exact():
    """A farm whose reserved radius exceeds the fast-kernel guard routes ALL
    its launches through the wide DMA kernel — including launches at narrow
    current ratios (d<=1), where consecutive frames' windows nearly
    coincide. Must match the C-exact host path bit-for-bit at every kernel
    classes a reserved-wide farm can run (upsample d=0 and the headline
    d=1)."""
    rng = np.random.default_rng(67)
    ch, chunk = 1, 128
    data = rng.integers(-32768, 32768, size=(2, chunk, ch)).astype(np.int16)

    for in_rate, out_rate in [(8000, 44100), (48000, 44100)]:
        farm = UniformStreamFarm(2, ch, in_rate, out_rate,
                                 max(in_rate, out_rate), chunk_frames=chunk,
                                 interpret=True, max_radius=520)
        assert farm._max_taps > 1024, "farm must sit in the wide-dispatch regime"
        got = np.concatenate([farm.process(data), farm.flush()], axis=1)
        for i in range(2):
            want = _host_reference(data[i], ch, in_rate, out_rate,
                                   max(in_rate, out_rate))
            np.testing.assert_array_equal(
                got[i], want, err_msg=f"{in_rate}->{out_rate} stream {i}")


def test_medium_width_farm_wide_dispatch_bit_exact(monkeypatch):
    """With the medium-width crossover lowered (WIDE_DISPATCH_MIN_TAPS),
    general-class farm launches in the band run the DMA wide kernel. Two
    regimes: (a) the farm's ratio IS medium-width (taps 760) -> wide
    dispatch; (b) the reserve-gap — a medium RESERVED width over a narrow
    current ratio. Since round 5 the farm launches at the CURRENT width
    class, so regime (b) dispatches the narrow-class kernel at taps 40
    (reading 40-tap windows against the 380-radius staging halo — the
    halo_shift geometry the round-3 reserve-gap trap was about), and must
    stay bit-exact."""
    from clownresampler_tpu.ops import pallas_resample as pr

    monkeypatch.setattr(pr, "WIDE_DISPATCH_MIN_TAPS", 504)

    rng = np.random.default_rng(71)
    ch, chunk = 1, 2048
    data = rng.integers(-32768, 32768, size=(2, 2 * chunk, ch)).astype(np.int16)

    for in_rate, out_rate, max_radius, want_kind, want_taps in [
        (44100, 349, None, "wide", 760),   # (a) medium-width ratio
        (44100, 8000, 380, "general", 40),  # (b) narrow under medium reserve
    ]:
        farm = UniformStreamFarm(2, ch, in_rate, out_rate,
                                 max(in_rate, out_rate), chunk_frames=chunk,
                                 interpret=True, max_radius=max_radius)
        assert 504 < farm._max_taps <= 1024, "farm must sit in the medium band"
        specs, _ = farm._launch_specs(8)
        assert specs[0][3][0] == want_kind, specs[0][3]
        assert specs[0][3][3] == want_taps, specs[0][3]
        chunks = data[:, :chunk], data[:, chunk:]
        got = np.concatenate(
            [farm.process(np.ascontiguousarray(c)) for c in chunks]
            + [farm.flush()], axis=1)
        for i in range(2):
            want = _host_reference(data[i], ch, in_rate, out_rate,
                                   max(in_rate, out_rate))
            np.testing.assert_array_equal(
                got[i], want, err_msg=f"{in_rate}->{out_rate} stream {i}")


def test_mixed_farm_adjust_stream_capacity_drift():
    """Round-2 advisor repro: with chunk_frames=8192 and max_radius=30 the
    strided-slack reservation depends on the PRIMARY ratio, so migrating a
    stream between a tiled-primary group and a strided-primary solo farm used
    to crash with 'capacity drift between farms' (8566 vs 16108 rows). The
    solo farm now inherits the source capacity; outputs stay bit-exact."""
    from clownresampler_tpu.farm import MixedStreamFarm

    rng = np.random.default_rng(53)
    ch, chunk, n_chunks = 1, 512, 3
    for specs, new_rate in [
        # tiled-primary group, stream 0 re-rates to an integer stride
        ([(48000, 44100), (48000, 44100)], (96000, 48000)),
        # strided-primary group (capacity past the VMEM budget), stream 0
        # re-rates OUT to a tiled ratio
        ([(96000, 48000), (96000, 48000)], (48000, 44100)),
    ]:
        data = [
            rng.integers(-32768, 32768, size=(n_chunks * chunk, ch)).astype(np.int16)
            for _ in specs
        ]
        farm = MixedStreamFarm(specs, ch, chunk_frames=8192, interpret=True,
                               max_radius=30)
        outs = [[] for _ in specs]
        for k in range(n_chunks):
            if k == 1:
                assert farm.adjust_stream(0, *new_rate)
            res = farm.process([d[k * chunk : (k + 1) * chunk] for d in data])
            for i, r in enumerate(res):
                outs[i].append(r)
        for i, r in enumerate(farm.flush()):
            outs[i].append(r)
        for i, (in_rate, out_rate) in enumerate(specs):
            ref = UniformStreamFarm(1, ch, in_rate, out_rate, chunk_frames=8192,
                                    interpret=True, max_radius=30)
            want = []
            for k in range(n_chunks):
                if i == 0 and k == 1:
                    assert ref.adjust(*new_rate)
                want.append(ref.process(data[i][None, k * chunk : (k + 1) * chunk]))
            want.append(ref.flush())
            np.testing.assert_array_equal(
                np.concatenate(outs[i], axis=0),
                np.concatenate([w[0] for w in want], axis=0),
                err_msg=f"specs={specs} stream {i}")


def test_mixed_farm_adjust_stream_rejects_and_rolls_back():
    from clownresampler_tpu.farm import MixedStreamFarm

    rng = np.random.default_rng(43)
    ch, chunk = 1, 256
    specs = [(48000, 44100), (48000, 44100)]
    data = [rng.integers(-32768, 32768, size=(2 * chunk, ch)).astype(np.int16)
            for _ in specs]
    farm = MixedStreamFarm(specs, ch, chunk_frames=chunk, interpret=True)
    farm.process([d[:chunk] for d in data])
    # radius growth past the construction bound fails, nothing changes
    assert not farm.adjust_stream(0, 44100, 8000)
    assert len(farm._groups) == 1 and farm._groups[0][1] == [0, 1]
    res = farm.process([d[chunk:] for d in data])
    ref = UniformStreamFarm(2, ch, 48000, 44100, chunk_frames=chunk,
                            interpret=True)
    a = ref.process(np.stack([d[:chunk] for d in data]))
    b = ref.process(np.stack([d[chunk:] for d in data]))
    np.testing.assert_array_equal(
        np.concatenate(res, axis=0).reshape(2, -1, ch)[0], b[0],
        err_msg="post-reject chunk")


def test_mixed_farm_clamp_s16():
    from clownresampler_tpu.farm import MixedStreamFarm

    rng = np.random.default_rng(47)
    ch, chunk = 1, 256
    specs = [(48000, 44100), (8000, 44100)]
    data = [rng.integers(-32768, 32768, size=(chunk, ch)).astype(np.int16)
            for _ in specs]
    wide = MixedStreamFarm(specs, ch, chunk_frames=chunk, interpret=True)
    clamped = MixedStreamFarm(specs, ch, chunk_frames=chunk, interpret=True,
                              clamp_s16=True)
    a = wide.process(data)
    b = clamped.process(data)
    for i in range(2):
        assert b[i].dtype == np.int16
        np.testing.assert_array_equal(
            b[i], np.clip(a[i], -0x7FFF, 0x7FFF).astype(np.int16))


def test_farm_large_max_radius_keeps_fast_kernel():
    """Regression: the strided-slack reservation must not balloon capacity
    past the VMEM budget and silently reroute every launch to the gather
    oracle (round-2 advisor finding)."""
    from clownresampler_tpu.farm import VMEM_SAFE_INPUT_ROWS

    farm = UniformStreamFarm(4, 2, 48000, 44100, chunk_frames=4096,
                             interpret=True, max_radius=30)
    assert farm._capacity <= VMEM_SAFE_INPUT_ROWS
    specs, _ = farm._launch_specs(256)
    assert specs[0][3][0] == "tiled", specs[0][3]


def test_farm_strided_xla_downgrade_bit_exact():
    """A strided farm whose staging lacks the polyphase over-read padding
    downgrades to the XLA path (kind strided_xla) and stays bit-exact."""
    rng = np.random.default_rng(59)
    ch, chunk = 2, 512
    data = rng.integers(-32768, 32768, size=(3, 2 * chunk, ch)).astype(np.int16)

    farm = UniformStreamFarm(3, ch, 96000, 48000, chunk_frames=chunk,
                             interpret=True)
    # Sabotage the reserved slack so the phases contract cannot hold: shrink
    # the staging buffer to the bare strided-XLA requirement.
    specs, _ = farm._launch_specs(chunk // 2)
    assert specs[0][3][0] == "strided"      # normally the polyphase kernels
    import numpy as _np
    cap = farm._capacity
    farm._capacity = 2 * farm._radius_bound + chunk + farm._max_taps + 32
    farm._staging = _np.zeros((farm._capacity, farm._lanes), _np.int32)
    specs, _ = farm._launch_specs(chunk // 2)
    assert specs[0][3][0] == "strided_xla", specs[0][3]

    outs = [farm.process(data[:, :chunk]), farm.process(data[:, chunk:]),
            farm.flush()]
    got = np.concatenate(outs, axis=1)
    for i in range(3):
        want = _host_reference(data[i], ch, 96000, 48000, 96000)
        np.testing.assert_array_equal(got[i], want, err_msg=f"stream {i}")


def test_farm_large_chunk_strided_keeps_polyphase():
    """A strided-primary farm whose capacity exceeds the fused-kernel VMEM
    budget still reserves the polyphase padding (the WIDE variant only needs
    capacity/d rows per block) and stays bit-exact (round-2 review
    finding)."""
    from clownresampler_tpu.farm import VMEM_SAFE_INPUT_ROWS

    rng = np.random.default_rng(61)
    ch, chunk = 1, 13000
    farm = UniformStreamFarm(2, ch, 96000, 48000, chunk_frames=chunk,
                             interpret=True)
    assert farm._capacity > VMEM_SAFE_INPUT_ROWS
    specs, _ = farm._launch_specs(4096)
    assert specs[0][3][0] == "strided", specs[0][3]

    data = rng.integers(-32768, 32768, size=(2, chunk, ch)).astype(np.int16)
    got = np.concatenate([farm.process(data), farm.flush()], axis=1)
    for i in range(2):
        want = _host_reference(data[i], ch, 96000, 48000, 96000)
        np.testing.assert_array_equal(got[i], want, err_msg=f"stream {i}")


def test_general_envelope_failure_dispatch_policy():
    """A general-class farm whose staging shape has NO legal frame group in
    the measured compile envelope (multi-lane, capacity > the 12288-row
    group-16 ceiling) must route to the DMA wide kernel, not the gather
    oracle (VERDICT r4 item 7: the wide kernel measured ~6x the oracle in
    exactly this band). Cheap policy pin — the bit-exact replay is the slow
    test below."""
    from clownresampler_tpu.ops.pallas_resample import general_pick_group

    # 44.1k->8k is general class (d=5, frac != 0) with shift-band taps;
    # 260 lanes -> multi-lane tiles; chunk_frames pushes capacity past the
    # multi-lane group-16 envelope ceiling.
    farm = UniformStreamFarm(260, 1, 44100, 8000, 44100,
                             chunk_frames=12500, interpret=True)
    lane_w = max(w for w, _ in farm._lane_slices)
    assert lane_w > 128 and farm._capacity > 12288, (
        lane_w, farm._capacity)   # the premise: the envelope must fail here
    assert general_pick_group(256, farm._capacity, lane_w,
                              farm._max_taps) is None
    specs, _ = farm._launch_specs(8)
    assert specs[0][3][0] == "wide", specs[0][3]


def test_general_envelope_failure_wide_route_bit_exact():
    """Bit-exactness of the envelope-failure reroute: shift-band taps (~40)
    through the DMA wide kernel via the farm dispatcher — a width band the
    wide kernel never served before round 5."""
    rng = np.random.default_rng(97)
    ch, feed = 1, 2000
    farm = UniformStreamFarm(260, ch, 44100, 8000, 44100,
                             chunk_frames=12500, interpret=True)
    specs, _ = farm._launch_specs(8)
    assert specs[0][3][0] == "wide", specs[0][3]
    data = rng.integers(-32768, 32768, size=(260, 2 * feed, ch)).astype(np.int16)
    got = np.concatenate(
        [farm.process(np.ascontiguousarray(data[:, :feed])),
         farm.process(np.ascontiguousarray(data[:, feed:])),
         farm.flush()], axis=1)
    for i in (0, 1, 259):   # spot-check streams (the host loop is per-stream)
        want = _host_reference(data[i], ch, 44100, 8000, 44100)
        np.testing.assert_array_equal(got[i], want, err_msg=f"stream {i}")

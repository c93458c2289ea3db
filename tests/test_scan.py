"""On-device scan pipeline: one jitted scan == the host streaming path."""

import jax.numpy as jnp
import numpy as np
import pytest

from clownresampler_tpu import fixedpoint as fx
from clownresampler_tpu.configure import configure
from clownresampler_tpu.lowlevel import (
    LowLevelResampler,
    make_device_state,
    resample_scan,
    resample_scan_fused,
)
from clownresampler_tpu.models import lanczos_kernel_table


@pytest.mark.parametrize("in_rate,out_rate", [(48000, 44100), (8000, 44100), (44100, 8000)])
def test_scan_matches_host(in_rate, out_rate):
    rng = np.random.default_rng(31)
    lanes, n_in, k = 4, 128, 6
    lpf = max(in_rate, out_rate)
    cfg = configure(in_rate, out_rate, lpf)
    inc = fx.calculate_ratio(in_rate, out_rate)
    r = cfg.integer_stretched_kernel_radius
    max_taps = -(-2 * r // 8) * 8
    # per-step cap: steady n_in frames of input plus the initial
    # radius-bias backlog that can spill into any one step
    n_out_cap = ((n_in + 2 * r) * 65536) // inc + 16

    data = rng.integers(-32768, 32768, size=(k * n_in, lanes)).astype(np.int16)
    chunks = jnp.asarray(data.reshape(k, n_in, lanes))
    # Flush: one extra all-zero chunk drains at least the radius tail.
    chunks = jnp.concatenate([chunks, jnp.zeros((1, n_in, lanes), jnp.int16)])

    table = jnp.asarray(lanczos_kernel_table())
    state = make_device_state(0, 0, cfg, inc)
    outputs, produced, _, backlog = resample_scan(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r
    )
    assert not bool(backlog)
    outputs = np.asarray(outputs)
    produced = np.asarray(produced)
    got = np.concatenate(
        [outputs[i, : produced[i]] for i in range(k + 1)], axis=0
    )

    # Host reference over the whole stream + the same zero-chunk tail.
    rs = LowLevelResampler.init(lanes, in_rate, out_rate, lpf)
    full = np.concatenate([data, np.zeros((n_in, lanes), np.int16)])
    padded = np.concatenate(
        [np.zeros((r, lanes), np.int16), full, np.zeros((r, lanes), np.int16)]
    )
    _, _, want = rs.resample(padded, full.shape[0])

    np.testing.assert_array_equal(got, want[: got.shape[0]], err_msg=str((in_rate, out_rate)))
    # The scan drains everything except up to `radius` input frames of the
    # zero-flush tail (the position bias holds them back); those frames are
    # all-zero windows, i.e. trailing silence.
    tol = (r * 65536) // inc + 3
    assert got.shape[0] >= want.shape[0] - tol, (got.shape, want.shape)
    assert not want[got.shape[0] :].any(), "undrained frames must be silence"


FUSED_RATIOS = [
    (48000, 44100),   # tiled d=0 (sub-2x)
    (44100, 48000),   # tiled d=0 upsample
    (96000, 48000),   # strided d=2
    (192000, 48000),  # strided d=4
    (44100, 8000),    # general (d=5, lo != 0) — the wide-downsample golden ratio
    (40000, 11025),   # general d=3
]


@pytest.mark.parametrize("in_rate,out_rate", FUSED_RATIOS)
def test_scan_fused_matches_oracle_scan(in_rate, out_rate):
    """The fused scan == the oracle scan for every kernel class, chunk for
    chunk (VERDICT r1 item 4: whole-stream streaming for ANY ratio,
    clownresampler.h:1138-1173 as one device computation)."""
    rng = np.random.default_rng(55)
    cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
    inc = fx.calculate_ratio(in_rate, out_rate)
    r = cfg.integer_stretched_kernel_radius
    max_taps = -(-2 * r // 8) * 8
    lanes, n_in, k = 128, 256, 5
    n_out_cap = -(-(((n_in + 2 * r) * 65536) // inc + 16) // 128) * 128

    data = rng.integers(-32768, 32768, size=(k, n_in, lanes)).astype(np.int32)
    chunks = jnp.asarray(data)
    table = jnp.asarray(lanczos_kernel_table())
    state = make_device_state(0, 0, cfg, inc)

    ref_out, ref_prod, ref_state, ref_back = resample_scan(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r
    )
    got_out, got_prod, got_state, got_back = resample_scan_fused(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r,
        increment=inc, interpret=True,
    )
    assert not bool(ref_back) and not bool(got_back)
    np.testing.assert_array_equal(np.asarray(got_prod), np.asarray(ref_prod))
    np.testing.assert_array_equal(np.asarray(got_out), np.asarray(ref_out))
    assert int(got_state.position_integer) == int(ref_state.position_integer)
    assert int(got_state.position_fractional) == int(ref_state.position_fractional)


def test_scan_tiled_back_compat_alias():
    """resample_scan_tiled (d, cand interface) routes through the fused scan."""
    from clownresampler_tpu.lowlevel import resample_scan_tiled
    from clownresampler_tpu.ops.pallas_resample import plan_uniform

    rng = np.random.default_rng(56)
    in_rate, out_rate = 48000, 44100
    cfg = configure(in_rate, out_rate, out_rate)
    inc = fx.calculate_ratio(in_rate, out_rate)
    r = cfg.integer_stretched_kernel_radius
    lanes, n_in, k = 128, 256, 3
    n_out_cap = -(-(((n_in + 2 * r) * 65536) // inc + 16) // 64) * 64
    plan = plan_uniform(inc, n_out_cap)

    chunks = jnp.asarray(
        rng.integers(-32768, 32768, size=(k, n_in, lanes)).astype(np.int32)
    )
    table = jnp.asarray(lanczos_kernel_table())
    state = make_device_state(0, 0, cfg, inc)

    ref = resample_scan_fused(
        table, chunks, state, max_taps=8, n_out=int(n_out_cap), radius=r,
        increment=inc, interpret=True,
    )
    got = resample_scan_tiled(
        table, chunks, state, max_taps=8, n_out=int(n_out_cap), radius=r,
        d=plan["d"], cand=plan["cand"], interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))


def test_scan_fused_rejects_wide_kernels():
    """The fused scan's engines are VMEM-resident; widths past the guard
    must fail loudly (the streaming alternative is the LowLevelResampler
    tile loop with the DMA wide kernel), not OOM in Mosaic."""
    cfg = configure(44100, 132, 44100)      # radius 1003, taps 2008
    inc = fx.calculate_ratio(44100, 132)
    r = cfg.integer_stretched_kernel_radius
    max_taps = -(-2 * r // 8) * 8
    table = jnp.asarray(lanczos_kernel_table())
    state = make_device_state(0, 0, cfg, inc)
    chunks = jnp.zeros((2, 256, 128), jnp.int32)
    with pytest.raises(AssertionError, match="VMEM-resident"):
        resample_scan_fused(
            table, chunks, state, max_taps=max_taps, n_out=128, radius=r,
            increment=inc, interpret=True)


def test_scan_backlog_flag_on_undersized_n_out():
    """Advisor regression: an undersized static n_out must raise the backlog
    flag instead of silently producing wrong output."""
    rng = np.random.default_rng(57)
    in_rate, out_rate = 8000, 44100          # ~5.5 output frames per input
    cfg = configure(in_rate, out_rate, out_rate)
    inc = fx.calculate_ratio(in_rate, out_rate)
    r = cfg.integer_stretched_kernel_radius
    lanes, n_in, k = 4, 128, 4

    chunks = jnp.asarray(
        rng.integers(-32768, 32768, size=(k, n_in, lanes)).astype(np.int16)
    )
    table = jnp.asarray(lanczos_kernel_table())
    state = make_device_state(0, 0, cfg, inc)

    # Proper cap -> no backlog; half of it -> backlog raised.
    good_cap = ((n_in + 2 * r) * 65536) // inc + 16
    *_, ok = resample_scan(
        table, chunks, state, max_taps=8, n_out=int(good_cap), radius=r
    )
    assert not bool(ok)
    *_, bad = resample_scan(
        table, chunks, state, max_taps=8, n_out=int(good_cap) // 2, radius=r
    )
    assert bool(bad)


@pytest.mark.parametrize("in_rate,out_rate", [(48000, 44100), (96000, 48000),
                                              (44100, 8000)])
@pytest.mark.parametrize("split", [2, 4])
def test_scan_fused_split_chains_bit_exact(in_rate, out_rate, split):
    """split-chain fused scans (independent sub-fleet carries inside one
    scan, the device-concurrency lever for whole-stream streaming —
    VERDICT r2 item 1) == the monolithic fused scan, for every kernel
    class."""
    rng = np.random.default_rng(61)
    cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
    inc = fx.calculate_ratio(in_rate, out_rate)
    r = cfg.integer_stretched_kernel_radius
    max_taps = -(-2 * r // 8) * 8
    lanes, n_in, k = 128 * split, 256, 4
    n_out_cap = -(-(((n_in + 2 * r) * 65536) // inc + 16) // 128) * 128
    chunks = jnp.asarray(
        rng.integers(-32768, 32768, size=(k, n_in, lanes)).astype(np.int32))
    table = jnp.asarray(lanczos_kernel_table())
    state = make_device_state(0, 0, cfg, inc)

    mono = resample_scan_fused(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r,
        increment=inc, interpret=True)
    multi = resample_scan_fused(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r,
        increment=inc, interpret=True, split=split)
    np.testing.assert_array_equal(np.asarray(multi[0]), np.asarray(mono[0]))
    np.testing.assert_array_equal(np.asarray(multi[1]), np.asarray(mono[1]))
    assert int(multi[2].position_integer) == int(mono[2].position_integer)
    assert int(multi[2].position_fractional) == int(mono[2].position_fractional)
    assert bool(multi[3]) == bool(mono[3])


@pytest.mark.parametrize("in_rate,out_rate", FUSED_RATIOS)
def test_scan_fused_with_strided_table(in_rate, out_rate):
    """resample_scan_fused fed the row-gather LUT layout == without it."""
    from clownresampler_tpu.models import DEFAULT_MODEL

    rng = np.random.default_rng(57)
    cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
    inc = fx.calculate_ratio(in_rate, out_rate)
    r = cfg.integer_stretched_kernel_radius
    max_taps = -(-2 * r // 8) * 8
    lanes, n_in, k = 128, 256, 3
    n_out_cap = -(-(((n_in + 2 * r) * 65536) // inc + 16) // 128) * 128
    chunks = jnp.asarray(
        rng.integers(-32768, 32768, size=(k, n_in, lanes)).astype(np.int32))
    table = jnp.asarray(lanczos_kernel_table())
    tstr = jnp.asarray(DEFAULT_MODEL.strided_table(cfg.kernel_step_size, max_taps))
    state = make_device_state(0, 0, cfg, inc)

    plain = resample_scan_fused(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r,
        increment=inc, interpret=True)
    fast = resample_scan_fused(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r,
        increment=inc, interpret=True, table_strided=tstr)
    np.testing.assert_array_equal(np.asarray(fast[0]), np.asarray(plain[0]))
    np.testing.assert_array_equal(np.asarray(fast[1]), np.asarray(plain[1]))


@pytest.mark.parametrize("in_rate,out_rate", [(48000, 44100), (96000, 48000),
                                              (44100, 8000)])
@pytest.mark.parametrize("split", [1, 4])
def test_scan_fused_pipeline_bit_exact(in_rate, out_rate, split):
    """pipeline=True (double-buffered staging: step t's engine reads the
    buffer staged at t-1 while step t stages chunk t+1 — VERDICT r3 item 5's
    overlap lever) must be bit-identical to the serial stage->engine scan
    for every kernel class, split, outputs, produced counts, and state."""
    rng = np.random.default_rng(61)
    cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
    inc = fx.calculate_ratio(in_rate, out_rate)
    r = cfg.integer_stretched_kernel_radius
    max_taps = -(-2 * r // 8) * 8
    lanes, n_in, k = 128 * split, 256, 4
    n_out_cap = -(-(((n_in + 2 * r) * 65536) // inc + 16) // 128) * 128
    chunks = jnp.asarray(
        rng.integers(-32768, 32768, size=(k, n_in, lanes)).astype(np.int16))
    table = jnp.asarray(lanczos_kernel_table())
    state = make_device_state(0, 0x2345, cfg, inc)

    serial = resample_scan_fused(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r,
        increment=inc, interpret=True, split=split, pipeline=False)
    piped = resample_scan_fused(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r,
        increment=inc, interpret=True, split=split, pipeline=True)
    np.testing.assert_array_equal(np.asarray(piped[0]), np.asarray(serial[0]))
    np.testing.assert_array_equal(np.asarray(piped[1]), np.asarray(serial[1]))
    assert int(piped[2].position_integer) == int(serial[2].position_integer)
    assert int(piped[2].position_fractional) == int(serial[2].position_fractional)
    assert bool(piped[3]) == bool(serial[3])

"""Uniform-ratio fast paths must match the XLA oracle bit-for-bit.

The Pallas kernel runs in interpreter mode here (CPU mesh); bench.py and
tools/bench_kernels.py exercise the compiled kernel on the real chip.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from clownresampler_tpu import fixedpoint as fx
from clownresampler_tpu.configure import configure
from clownresampler_tpu.lowlevel import make_device_state
from clownresampler_tpu.models import lanczos_kernel_table
from clownresampler_tpu.ops.convolve import convolve_frames
from clownresampler_tpu.ops.pallas_resample import (
    STRIDED_FUSED_MAX_ROWS,
    choose_strided_plan,
    plan_uniform,
    resample_integer_stride,
    resample_strided_phases,
    resample_strided_phases_wide,
    resample_uniform_lanes_general,
    resample_uniform_lanes_tiled,
    strided_phase_padding,
    window_rows_needed,
)

TILED_RATIOS = [
    (48000, 44100),   # headline: d=1, cand=2
    (8000, 44100),    # upsample: d=0
    (44100, 48000),   # near-unity upsample: d=0, large cand
    (44100, 44100),   # unity: d=1, lo=0
    (65521, 65537),   # prime near-unity
    (32000, 48000),
]

STRIDED_RATIOS = [(96000, 48000), (2, 1), (3, 1), (132300, 44100)]

GENERAL_RATIOS = [(44100, 8000), (44100, 7000), (40000, 997), (44100, 19000)]


def _setup(in_rate, out_rate, n_out=64, lanes=128, seed=3):
    cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
    inc = fx.calculate_ratio(in_rate, out_rate)
    state = make_device_state(0, 0, cfg, inc)
    max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
    s = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 64
    s = -(-s // 16) * 16
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32)
    return cfg, inc, state, max_taps, jnp.asarray(x)


def _oracle(table, x, state, max_taps, n_out):
    n = jnp.arange(n_out, dtype=jnp.int32)
    pos, frac = fx.positions_from_state(
        state.position_integer,
        state.position_fractional,
        state.cfg.increment_hi,
        state.cfg.increment_lo,
        n,
    )
    return convolve_frames(table, x, pos, frac, state.cfg, max_taps)


@pytest.mark.parametrize("eps_fold", [False, True], ids=["selects", "epsfold"])
@pytest.mark.parametrize("in_rate,out_rate", TILED_RATIOS)
def test_tiled_kernel_bit_exact(in_rate, out_rate, eps_fold):
    table = jnp.asarray(lanczos_kernel_table())
    cfg, inc, state, max_taps, x = _setup(in_rate, out_rate)
    plan = plan_uniform(inc, 64)
    assert plan["kernel"] == "tiled", plan
    n_out = 64
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    got, _rows = resample_uniform_lanes_tiled(
        table,
        x,
        state,
        max_taps=max_taps,
        n_out=n_out,
        d=plan["d"],
        cand=plan["cand"],
        interpret=True,
        eps_fold=eps_fold,
    )
    np.testing.assert_array_equal(np.asarray(got), want, err_msg=str((in_rate, out_rate)))


@pytest.mark.parametrize("in_rate,out_rate", STRIDED_RATIOS)
def test_strided_path_bit_exact(in_rate, out_rate):
    table = jnp.asarray(lanczos_kernel_table())
    cfg, inc, state, max_taps, x = _setup(in_rate, out_rate)
    plan = plan_uniform(inc, 64)
    assert plan["kernel"] == "strided", plan
    n_out = 64
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    got, _rows = resample_integer_stride(
        table, x, state, max_taps=max_taps, n_out=n_out, d=plan["d"]
    )
    np.testing.assert_array_equal(np.asarray(got), want, err_msg=str((in_rate, out_rate)))


def _setup_strided(in_rate, out_rate, p0, n_out, group, lanes=256, seed=9):
    """Input sized to the polyphase kernels' over-read contract
    (strided_phase_padding)."""
    cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
    inc = fx.calculate_ratio(in_rate, out_rate)
    d = inc >> 16
    assert inc & 0xFFFF == 0
    state = make_device_state(p0, 0, cfg, inc)
    max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
    s = p0 + (n_out - 8 * group) * d + strided_phase_padding(max_taps, d, group) + 8
    s = -(-s // 16) * 16
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))
    return d, state, max_taps, x


@pytest.mark.parametrize("in_rate,out_rate", STRIDED_RATIOS + [(176400, 44100), (529200, 44100)])
@pytest.mark.parametrize("p0", [0, 1, 5])
def test_strided_phases_bit_exact(in_rate, out_rate, p0):
    """Polyphase strided kernels (fused + wide) vs the oracle, across strides
    d=2..12 and initial positions covering every phase residue s0."""
    table = jnp.asarray(lanczos_kernel_table())
    n_out = 64
    d, state, max_taps, x = _setup_strided(in_rate, out_rate, p0, n_out, 8)
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    got, _ = resample_strided_phases(
        table, x, state, max_taps=max_taps, n_out=n_out, d=d, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), want,
                                  err_msg=f"fused {in_rate}->{out_rate} p0={p0}")
    got_w, _ = resample_strided_phases_wide(
        table, x, state, max_taps=max_taps, n_out=n_out, d=d, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_w), want,
                                  err_msg=f"wide {in_rate}->{out_rate} p0={p0}")


def test_strided_phases_group32_sublaunch_clamp():
    """group=32 (the TPU-default grain), lane-sliced sub-launches and the
    fused s16 clamp all match the oracle."""
    table = jnp.asarray(lanczos_kernel_table())
    n_out = 256
    d, state, max_taps, x = _setup_strided(96000, 48000, 3, n_out, 32, lanes=384)
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    got, _ = resample_strided_phases(
        table, x, state, max_taps=max_taps, n_out=n_out, d=d, group=32,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    for fn in (resample_strided_phases, resample_strided_phases_wide):
        part, _ = fn(
            table, x, state, max_taps=max_taps, n_out=n_out, d=d, group=32,
            lanes=128, lane_offset=128, clamp_s16=True, interpret=True,
        )
        assert part.dtype == jnp.int16
        want_part = np.clip(want[:, 128:256], -0x7FFF, 0x7FFF).astype(np.int16)
        np.testing.assert_array_equal(np.asarray(part), want_part, err_msg=fn.__name__)


def test_choose_strided_plan_thresholds():
    """Variant selection: fused within the VMEM row budget, wide up to d x
    budget, XLA (None) beyond, at off-grain frame counts, or — the span
    contract — when the buffer lacks the polyphase over-read padding."""
    taps = 16
    # span requirements at taps=16, d=2: group 32 -> 1552 rows for n_out=512,
    # group 8 -> 1168 (strided_phase_padding 1040 / 272).
    assert choose_strided_plan(2048, 2, 512, taps) == ("fused", 32)
    assert choose_strided_plan(2048, 2, 64, taps) == ("fused", 8)
    assert choose_strided_plan(2048, 2, 8, taps) is None      # off-grain
    # group fallback: only the smaller over-read fits the buffer
    assert choose_strided_plan(1200, 2, 512, taps) == ("fused", 8)
    # the ADVICE repro: sized for the XLA span contract only -> None
    assert choose_strided_plan(1056, 2, 512, taps) is None
    assert choose_strided_plan(20000, 2, 8192, taps) == ("wide", 32)
    assert choose_strided_plan(2 * STRIDED_FUSED_MAX_ROWS + 2, 2, 8192, taps) is None
    assert choose_strided_plan(3 * STRIDED_FUSED_MAX_ROWS, 4, 8192, taps) == ("wide", 32)


def test_multi_resample_strided_span_contract_downgrade():
    """A buffer sized only for the XLA span contract (the pre-polyphase
    multi_resample contract, s >= (n_out-1)*d + taps + 8) must still be
    bit-exact: choose_strided_plan routes it to the XLA path instead of
    letting the polyphase kernels' base clamp shift real frames' windows
    (ADVICE round-2 high finding; repro 96k->48k, n_out=512, s=1056)."""
    from clownresampler_tpu.ops.pallas_resample import multi_resample

    table = jnp.asarray(lanczos_kernel_table())
    cfg = configure(96000, 48000, 96000)
    inc = fx.calculate_ratio(96000, 48000)
    d = inc >> 16
    max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
    n_out = 512
    state = make_device_state(2, 0, cfg, inc)
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.integers(-32768, 32768, size=(1056, 128)).astype(np.int32))
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    (got,) = multi_resample(
        table, (x,), (state,),
        (("strided", d, None, max_taps, n_out, False),), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_multi_resample_strided_dispatch():
    """multi_resample's "strided" kind routes through the polyphase kernels
    and still matches the XLA path bit-for-bit."""
    from clownresampler_tpu.ops.pallas_resample import multi_resample

    table = jnp.asarray(lanczos_kernel_table())
    n_out = 64
    d, state, max_taps, x = _setup_strided(96000, 48000, 2, n_out, 8)
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    (got,) = multi_resample(
        table, (x,), (state,),
        (("strided", d, None, max_taps, n_out, False),), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_tiled_kernel_nonzero_initial_phase():
    """Mid-stream launches start at arbitrary (pos, frac)."""
    table = jnp.asarray(lanczos_kernel_table())
    in_rate, out_rate = 48000, 44100
    cfg = configure(in_rate, out_rate, out_rate)
    inc = fx.calculate_ratio(in_rate, out_rate)
    max_taps = 8
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.integers(-32768, 32768, size=(192, 128)).astype(np.int32))
    plan = plan_uniform(inc, 64)
    for p0, f0 in [(3, 0x8421), (0, 0xFFFF), (11, 1)]:
        state = make_device_state(p0, f0, cfg, inc)
        want = np.asarray(_oracle(table, x, state, max_taps, 64))
        got, _ = resample_uniform_lanes_tiled(
            table, x, state, max_taps=max_taps, n_out=64,
            d=plan["d"], cand=plan["cand"], interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=str((p0, f0)))


def test_plan_coverage():
    """Every legal increment maps to a plan; tiled bounds candidates at 8."""
    for inc in [1, 11888, 60211, 65536, 71331, 131071]:
        plan = plan_uniform(inc, 64)
        assert plan["kernel"] == "tiled" and 1 <= plan["cand"] <= 8
    assert plan_uniform(131072, 64)["kernel"] == "strided"
    assert plan_uniform(361267, 64)["kernel"] == "general"  # 44.1k->8k
    assert plan_uniform(5 << 16, 64)["kernel"] == "strided"


def test_window_rows_needed_covers_tiles():
    """The static load window must cover every row any tile touches."""
    for in_rate, out_rate in TILED_RATIOS:
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        inc = fx.calculate_ratio(in_rate, out_rate)
        plan = plan_uniform(inc, 512)
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        w = window_rows_needed(max_taps, plan["d"], plan["cand"])
        # emulate: max offset within tile = 7 (alignment) + 7*d + eps + taps
        n = np.arange(512, dtype=np.int64)
        t = 0x8421 + n * inc
        pos = t >> 16
        frac = t & 0xFFFF
        min_rel = (frac + cfg.stretched_kernel_radius_delta + 0xFFFF) >> 16
        rows = pos + min_rel
        tiles = rows.reshape(-1, 8)
        base = tiles[:, 0]
        worst = (tiles - base[:, None]).max() + (max_taps - 1)
        # +7: the kernel 8-aligns each tile's base load downward, so the
        # window must also cover up to 7 rows of alignment slack.
        assert worst + 7 < w, (in_rate, out_rate, worst, w)


@pytest.mark.parametrize("in_rate,out_rate", GENERAL_RATIOS)
def test_general_kernel_bit_exact(in_rate, out_rate):
    table = jnp.asarray(lanczos_kernel_table())
    n_out = 128
    cfg, inc, state, max_taps, x = _setup(in_rate, out_rate, n_out=n_out)
    plan = plan_uniform(inc, n_out)
    assert plan["kernel"] == "general", plan
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    got, _rows = resample_uniform_lanes_general(
        table, x, state, max_taps=max_taps, n_out=n_out, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), want, err_msg=str((in_rate, out_rate)))


def test_tiled_kernel_clamped_output():
    """clamp_s16=True == clipping the wide output (fused serving path)."""
    table = jnp.asarray(lanczos_kernel_table())
    cfg, inc, state, max_taps, x = _setup(48000, 44100, seed=44)
    plan = plan_uniform(inc, 64)
    wide, _ = resample_uniform_lanes_tiled(
        table, x, state, max_taps=max_taps, n_out=64,
        d=plan["d"], cand=plan["cand"], interpret=True,
    )
    clamped, _ = resample_uniform_lanes_tiled(
        table, x, state, max_taps=max_taps, n_out=64,
        d=plan["d"], cand=plan["cand"], clamp_s16=True, interpret=True,
    )
    assert clamped.dtype == jnp.int16
    want = np.clip(np.asarray(wide), -0x7FFF, 0x7FFF).astype(np.int16)
    np.testing.assert_array_equal(np.asarray(clamped), want)


def test_lane_sliced_launches_match_full_width():
    """lanes/lane_offset sub-launches == column slices of the full launch
    (zero-copy lane splitting used by the farm and the benches)."""
    table = jnp.asarray(lanczos_kernel_table())
    rng = np.random.default_rng(3)
    n_out = 128
    for in_rate, out_rate in [(48000, 44100), (44100, 8000)]:
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        inc = fx.calculate_ratio(in_rate, out_rate)
        state = make_device_state(0, 0x4321, cfg, inc)
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        s = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
        s = -(-s // 16) * 16
        x = jnp.asarray(rng.integers(-32768, 32768, size=(s, 384)).astype(np.int32))
        plan = plan_uniform(inc, n_out)
        if plan["kernel"] == "tiled":
            fn = lambda **kw: resample_uniform_lanes_tiled(
                table, x, state, max_taps=max_taps, n_out=n_out,
                d=plan["d"], cand=plan["cand"], interpret=True, **kw)[0]
        else:
            fn = lambda **kw: resample_uniform_lanes_general(
                table, x, state, max_taps=max_taps, n_out=n_out,
                interpret=True, **kw)[0]
        full = np.asarray(fn())
        for off, w in [(0, 128), (128, 256), (256, 128)]:
            part = np.asarray(fn(lanes=w, lane_offset=off))
            np.testing.assert_array_equal(
                part, full[:, off : off + w],
                err_msg=f"{in_rate}->{out_rate} off={off} w={w}")


def test_multi_resample_lane_split_specs():
    """8-tuple multi_resample plans (lane slices of one buffer) == the
    6-tuple full-width plan, reassembled."""
    from clownresampler_tpu.ops.pallas_resample import multi_resample

    table = jnp.asarray(lanczos_kernel_table())
    rng = np.random.default_rng(5)
    n_out = 128
    cfg = configure(48000, 44100, 44100)
    inc = fx.calculate_ratio(48000, 44100)
    state = make_device_state(0, 77, cfg, inc)
    plan = plan_uniform(inc, n_out)
    s = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 128
    s = -(-s // 16) * 16
    x = jnp.asarray(rng.integers(-32768, 32768, size=(s, 256)).astype(np.int32))

    (full,) = multi_resample(
        table, (x,), (state,),
        (("tiled", plan["d"], plan["cand"], 8, n_out, False),), interpret=True)
    parts = multi_resample(
        table, (x, x), (state, state),
        (("tiled", plan["d"], plan["cand"], 8, n_out, False, 128, 0),
         ("tiled", plan["d"], plan["cand"], 8, n_out, False, 128, 128)),
        interpret=True)
    got = np.concatenate([np.asarray(p) for p in parts], axis=1)
    np.testing.assert_array_equal(got, np.asarray(full))


def test_strided_table_rowgather_matches_flat():
    """precompute with KernelModel.strided_table (the fast row-gather LUT
    layout) must be bit-identical to the flat-table gather across kernel
    classes, fracs, and the clip edges."""
    from clownresampler_tpu.models import DEFAULT_MODEL
    from clownresampler_tpu.ops.pallas_resample import precompute_launch

    table = jnp.asarray(lanczos_kernel_table())
    for in_rate, out_rate in [(48000, 44100), (8000, 44100), (44100, 8000),
                              (44100, 7000), (96000, 48000)]:
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        inc = fx.calculate_ratio(in_rate, out_rate)
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        tstr = jnp.asarray(
            DEFAULT_MODEL.strided_table(cfg.kernel_step_size, max_taps))
        for f0 in (0, 1, 0x4321, 0xFFFF):
            state = make_device_state(0, f0, cfg, inc)
            flat = precompute_launch(table, state, max_taps=max_taps, n_out=256)
            fast = precompute_launch(table, state, max_taps=max_taps, n_out=256,
                                     table_strided=tstr)
            for a, b in zip(flat, fast):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"{in_rate}->{out_rate} f0={f0}")


def test_tiled_kernel_with_strided_table():
    """End-to-end: the tiled kernel fed the row-gather table == the oracle."""
    from clownresampler_tpu.models import DEFAULT_MODEL

    table = jnp.asarray(lanczos_kernel_table())
    cfg, inc, state, max_taps, x = _setup(48000, 44100, seed=7)
    plan = plan_uniform(inc, 64)
    tstr = jnp.asarray(DEFAULT_MODEL.strided_table(cfg.kernel_step_size, max_taps))
    want = np.asarray(_oracle(table, x, state, max_taps, 64))
    got, _ = resample_uniform_lanes_tiled(
        table, x, state, max_taps=max_taps, n_out=64,
        d=plan["d"], cand=plan["cand"], interpret=True, table_strided=tstr,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_strided_phases_random_fuzz():
    """Random integer strides, initial phases, and low-pass stretches through
    both polyphase kernels vs the oracle (complements the curated ratios)."""
    table = jnp.asarray(lanczos_kernel_table())
    rng = np.random.default_rng(71)
    n_out = 64
    for _ in range(10):
        d = int(rng.integers(2, 17))
        out_rate = int(rng.integers(500, 4000))
        in_rate = d * out_rate
        # lpf below out_rate stretches the kernel (more taps, smaller step)
        lpf = int(rng.integers(max(200, out_rate // 3), in_rate))
        cfg = configure(in_rate, out_rate, lpf)
        if cfg is None:
            continue
        inc = fx.calculate_ratio(in_rate, out_rate)
        assert inc & 0xFFFF == 0 and (inc >> 16) == d
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        if max_taps > 256:
            continue  # keep interpret-mode runtime bounded
        p0 = int(rng.integers(0, 3 * d))
        f0 = int(rng.integers(0, 1 << 16))
        state = make_device_state(p0, f0, cfg, inc)
        s = p0 + (n_out - 64) * d + strided_phase_padding(max_taps, d, 8) + 8
        s = -(-s // 16) * 16
        x = jnp.asarray(rng.integers(-32768, 32768, size=(s, 128)).astype(np.int32))
        want = np.asarray(_oracle(table, x, state, max_taps, n_out))
        ctx = f"d={d} lpf={lpf} p0={p0} f0={f0} taps={max_taps}"
        got, _ = resample_strided_phases(
            table, x, state, max_taps=max_taps, n_out=n_out, d=d, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), want, err_msg="fused " + ctx)
        got_w, _ = resample_strided_phases_wide(
            table, x, state, max_taps=max_taps, n_out=n_out, d=d, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_w), want, err_msg="wide " + ctx)


@pytest.mark.parametrize("in_rate,out_rate,p0,f0", [
    (44100, 132, 0, 0),       # radius 1003 (the C-oracle ll_wide ratio class)
    (44100, 132, 7, 0x8421),  # unaligned window starts / mid-stream phase
    (44100, 44, 3, 0x1111),   # radius 3007 — the widest default-model ratio
    (96000, 480, 5, 0),       # wide integer stride through the same kernel
])
def test_wide_taps_kernel_bit_exact(in_rate, out_rate, p0, f0):
    """The DMA-based wide-kernel fast path (taps > FAST_KERNEL_MAX_TAPS,
    VERDICT r2 item 5) == the oracle across the widest accepted ratios
    (clownresampler.h:974-975: stretched radius up to 3007 at defaults)."""
    from clownresampler_tpu.ops.pallas_resample import resample_wide_taps

    table = jnp.asarray(lanczos_kernel_table())
    cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
    inc = fx.calculate_ratio(in_rate, out_rate)
    state = make_device_state(p0, f0, cfg, inc)
    max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
    assert max_taps > 1024, "case must exercise the wide path"
    n_out = 8
    s = p0 + ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 64
    s = -(-s // 16) * 16
    rng = np.random.default_rng(91)
    x = jnp.asarray(rng.integers(-32768, 32768, size=(s, 128)).astype(np.int32))
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    got, _ = resample_wide_taps(
        table, x, state, max_taps=max_taps, n_out=n_out, d=inc >> 16,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got), want, err_msg=f"{in_rate}->{out_rate} p0={p0} f0={f0}"
    )


@pytest.mark.parametrize("in_rate,out_rate,p0,f0", [
    (44100, 517, 5, 0x4321),   # taps 512
    (44100, 349, 0, 0),        # taps 760
    (44100, 262, 9, 0x8421),   # taps 1016 — just under FAST_KERNEL_MAX_TAPS
])
def test_wide_taps_kernel_medium_widths_bit_exact(in_rate, out_rate, p0, f0):
    """resample_wide_taps == the oracle at MEDIUM tap widths (inside
    FAST_KERNEL_MAX_TAPS but past the roll-free kv-shift guard) — the domain
    the roll-path general kernel serves today. Groundwork for dispatching
    these widths to the DMA kernel (tools/probe_midwide.py measures the
    crossover on hardware)."""
    from clownresampler_tpu.ops.pallas_resample import resample_wide_taps

    table = jnp.asarray(lanczos_kernel_table())
    cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
    inc = fx.calculate_ratio(in_rate, out_rate)
    state = make_device_state(p0, f0, cfg, inc)
    max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
    assert 248 < max_taps <= 1024, "case must sit in the medium-width band"
    n_out = 16
    s = p0 + ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 64
    s = -(-s // 16) * 16
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.integers(-32768, 32768, size=(s, 128)).astype(np.int32))
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    got, _ = resample_wide_taps(
        table, x, state, max_taps=max_taps, n_out=n_out, d=inc >> 16,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got), want, err_msg=f"{in_rate}->{out_rate} p0={p0} f0={f0}"
    )


@pytest.mark.parametrize("in_rate,out_rate,n_out,lanes_n", [
    (44100, 132, 24, 256),   # taps 2008, whole-window MAC; 3 groups (odd
                             # parity wrap) x 2 lane tiles (i-boundary
                             # prefetch)
    (44100, 44, 16, 128),    # radius 3007: blocked tap grid (n_k > 1)
    (44100, 349, 16, 256),   # medium band (taps 760)
])
def test_wide_taps_pipelined_bit_exact(in_rate, out_rate, n_out, lanes_n):
    """The double-buffered group-DMA variant == the oracle: the prefetch
    schedule (parity alternation, next-group/next-lane-tile targets, first
    group self-start) must not change a single sample."""
    from clownresampler_tpu.ops.pallas_resample import resample_wide_taps

    table = jnp.asarray(lanczos_kernel_table())
    cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
    inc = fx.calculate_ratio(in_rate, out_rate)
    state = make_device_state(3, 0x7531, cfg, inc)
    max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
    s = 3 + ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 64
    s = -(-s // 16) * 16
    rng = np.random.default_rng(29)
    x = jnp.asarray(
        rng.integers(-32768, 32768, size=(s, lanes_n)).astype(np.int32))
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    got, _ = resample_wide_taps(
        table, x, state, max_taps=max_taps, n_out=n_out, d=inc >> 16,
        interpret=True, pipeline=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got), want,
        err_msg=f"{in_rate}->{out_rate} n_out={n_out} lanes={lanes_n}",
    )


def test_general_kernel_roll_path_bit_exact():
    """Tap widths past GENERAL_SHIFT_MAX_WLOAD use the roll variant of the
    general kernel (the roll-free body blows the Mosaic scoped-vmem stack
    at such widths — see general_w_load); both must match the oracle."""
    from clownresampler_tpu.ops.pallas_resample import general_w_load

    table = jnp.asarray(lanczos_kernel_table())
    n_out = 128
    # deep low-pass stretch: radius 504, taps 1008, d=2 (the verify_tpu
    # wide-in-guard shape)
    cfg = configure(24000, 11000, 143)
    inc = fx.calculate_ratio(24000, 11000)
    state = make_device_state(0, 0x4321, cfg, inc)
    max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
    assert not general_w_load(max_taps)[1], "case must exercise the roll path"
    s = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 2048 + 96
    s = -(-s // 16) * 16
    rng = np.random.default_rng(97)
    x = jnp.asarray(rng.integers(-32768, 32768, size=(s, 128)).astype(np.int32))
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    got, _ = resample_uniform_lanes_general(
        table, x, state, max_taps=max_taps, n_out=n_out, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_general_kernel_group32_bit_exact():
    """The 256-frame-step variant of the general kernel == the oracle."""
    table = jnp.asarray(lanczos_kernel_table())
    n_out = 256
    cfg, inc, state, max_taps, x = _setup(44100, 8000, n_out=n_out)
    want = np.asarray(_oracle(table, x, state, max_taps, n_out))
    got, _ = resample_uniform_lanes_general(
        table, x, state, max_taps=max_taps, n_out=n_out, group=32,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_wide_taps_rejects_unaligned_max_taps():
    """resample_wide_taps' alignment proofs (8-aligned clamp bounds, the
    pl.multiple_of claims) presume max_taps % 8 == 0 — the dispatchers round
    up, so a direct caller passing an unaligned width must get an error, not
    silently shifted windows."""
    from clownresampler_tpu.ops.pallas_resample import resample_wide_taps

    table = jnp.asarray(lanczos_kernel_table())
    cfg = configure(44100, 132, 44100)
    inc = fx.calculate_ratio(44100, 132)
    state = make_device_state(0, 0, cfg, inc)
    x = jnp.zeros((4096, 128), jnp.int32)
    with pytest.raises(AssertionError, match="multiple of 8"):
        resample_wide_taps(table, x, state, max_taps=2001, n_out=8,
                           d=inc >> 16, interpret=True)


def test_strided_table_cache_evicts_dead_clients():
    """A rebuild after a backend re-initialization sweeps EVERY entry built
    by a defunct client, including configs never re-requested — otherwise
    the dead client and its device arrays stay pinned forever."""
    from clownresampler_tpu.ops import pallas_resample as pr

    dead_key = ("dead-client-sentinel",)
    pr._strided_table_cache[dead_key] = (object(), None)
    # an uncached config on the LIVE client triggers the rebuild path
    pr.strided_table_device(3, 0x400, 123, 8)
    assert dead_key not in pr._strided_table_cache


def test_general_launch_envelope_matches_measured_points():
    """general_launch_fits() must reproduce EVERY hardware-probed compile
    outcome of the general kernel (tools/probe_midwide.py envelope/envelope2,
    AOT-compiled on v5e, round 4 — the list below is the authoritative
    dataset; its length is asserted so re-probes visibly change coverage).
    The dispatchers consult this predicate before every general-class
    launch; a drifted rule either ships a Mosaic scoped-vmem compile
    failure or leaves speed on the table."""
    from clownresampler_tpu.ops import pallas_resample as pr

    # (taps, lanes, group, s, compiled?) — verbatim from the probe logs.
    points = [
        # envelope sweep (lanes 128/512, taps 248/272/1016)
        (248, 128, 16, 16384, True),
        (248, 128, 32, 16384, False),
        (248, 128, 32, 12288, False),
        (248, 128, 32, 8192, True),
        (248, 512, 16, 16384, False),
        (248, 512, 16, 12288, False),
        (248, 512, 16, 8192, True),
        (248, 512, 32, 16384, False),
        (248, 512, 32, 12288, False),
        (248, 512, 32, 8192, False),
        (248, 512, 32, 4096, False),
        (272, 128, 16, 16384, True),
        (272, 128, 32, 16384, False),
        (272, 128, 32, 12288, False),
        (272, 128, 32, 8192, False),
        (272, 128, 32, 4096, False),
        (272, 512, 16, 16384, False),
        (272, 512, 16, 12288, False),
        (272, 512, 16, 8192, True),
        (272, 512, 32, 16384, False),
        (272, 512, 32, 12288, False),
        (272, 512, 32, 8192, False),
        (272, 512, 32, 4096, False),
        (1016, 128, 16, 16384, True),
        (1016, 128, 32, 16384, False),
        (1016, 128, 32, 12288, False),
        (1016, 128, 32, 8192, False),
        (1016, 128, 32, 4096, False),
        (1016, 512, 16, 16384, False),
        (1016, 512, 16, 12288, False),
        (1016, 512, 16, 8192, True),
        (1016, 512, 32, 16384, False),
        (1016, 512, 32, 12288, False),
        (1016, 512, 32, 8192, False),
        (1016, 512, 32, 4096, False),
        # envelope2 sweep (small w_load classes + lanes-2048 points)
        (40, 2048, 32, 12288, True),
        (40, 2048, 32, 16384, False),
        (40, 2048, 16, 16384, False),
        (40, 512, 32, 16384, False),
        (128, 512, 16, 16384, False),
        (128, 512, 16, 12288, True),
        (128, 512, 32, 12288, False),
        (128, 512, 32, 8192, True),
        (128, 2048, 16, 12288, True),
        (128, 2048, 32, 12288, False),
        (248, 2048, 16, 8192, True),
        (248, 2048, 16, 12288, False),
        (272, 2048, 16, 8192, True),
        (1016, 2048, 16, 8192, True),
        # envelope3 sweep (round 5: the w_load 144..248 group-32 interior)
        (136, 512, 32, 12288, False),
        (136, 512, 32, 8192, True),
        (136, 512, 32, 4096, True),
        (136, 2048, 32, 8192, True),
        (168, 512, 32, 8192, False),
        (168, 512, 32, 4096, True),
        (168, 2048, 32, 8192, False),
        (200, 512, 32, 8192, False),
        (200, 512, 32, 4096, True),
        (200, 2048, 32, 8192, False),
        (240, 512, 32, 8192, False),
        (240, 512, 32, 4096, False),
        (240, 2048, 32, 4096, False),
    ]
    assert len(points) == 62, len(points)   # the probed-coverage count
    for taps, lanes, group, s, compiled in points:
        assert pr.general_launch_fits(s, lanes, group, taps) == compiled, (
            taps, lanes, group, s, compiled)


def test_general_pick_group_grain_and_fallback():
    """general_pick_group honours the n_out grain (group g needs
    n_out % 8g == 0), prefers 32 inside the envelope, and returns None where
    no group compiles (the callers' oracle/wide reroute signal)."""
    from clownresampler_tpu.ops import pallas_resample as pr

    assert pr.general_pick_group(256, 8192, 128, 40) == 32
    assert pr.general_pick_group(128, 8192, 128, 40) == 16   # 256-grain fails
    assert pr.general_pick_group(256, 16384, 128, 248) == 16  # 32 blows vmem
    assert pr.general_pick_group(256, 12288, 512, 248) is None
    assert pr.general_pick_group(256, 8192, 512, 1016) == 16
    assert pr.general_pick_group(256, 12288, 512, 1016) is None

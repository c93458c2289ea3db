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
    outputs, produced, _ = resample_scan(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r
    )
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


def test_scan_tiled_matches_oracle_scan():
    """The Pallas-engined scan == the oracle scan, chunk for chunk."""
    from clownresampler_tpu.lowlevel import resample_scan_tiled
    from clownresampler_tpu.ops.pallas_resample import plan_uniform

    rng = np.random.default_rng(55)
    in_rate, out_rate = 48000, 44100
    cfg = configure(in_rate, out_rate, out_rate)
    inc = fx.calculate_ratio(in_rate, out_rate)
    r = cfg.integer_stretched_kernel_radius
    max_taps = 8
    lanes, n_in, k = 128, 256, 5
    n_out_cap = -(-(((n_in + 2 * r) * 65536) // inc + 16) // 64) * 64
    plan = plan_uniform(inc, n_out_cap)

    data = rng.integers(-32768, 32768, size=(k, n_in, lanes)).astype(np.int32)
    chunks = jnp.asarray(data)
    table = jnp.asarray(lanczos_kernel_table())
    state = make_device_state(0, 0, cfg, inc)

    ref_out, ref_prod, ref_state = resample_scan(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r
    )
    got_out, got_prod, got_state = resample_scan_tiled(
        table, chunks, state, max_taps=max_taps, n_out=int(n_out_cap), radius=r,
        d=plan["d"], cand=plan["cand"], interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_prod), np.asarray(ref_prod))
    np.testing.assert_array_equal(np.asarray(got_out), np.asarray(ref_out))
    assert int(got_state.position_integer) == int(ref_state.position_integer)
    assert int(got_state.position_fractional) == int(ref_state.position_fractional)

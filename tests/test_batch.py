"""Batched multi-stream chunk kernel: per-stream parity with the host path."""

import jax.numpy as jnp
import numpy as np

from clownresampler_tpu import fixedpoint as fx
from clownresampler_tpu.batch import make_batch_state, resample_batch
from clownresampler_tpu.configure import configure
from clownresampler_tpu.lowlevel import LowLevelResampler
from clownresampler_tpu.models import lanczos_kernel_table

RATIOS = [
    (48000, 44100),
    (8000, 44100),
    (44100, 8000),
    (96000, 48000),
    (44100, 44100),
    (7, 13),
    (13, 7),
    (22050, 48000),
]


def test_mixed_ratio_batch_matches_host_path():
    rng = np.random.default_rng(11)
    channels = 2
    n_in = 256
    max_radius = 17
    n_out = 1024
    max_taps = 2 * max_radius

    table = jnp.asarray(lanczos_kernel_table())
    configs = []
    data = rng.integers(-32768, 32768, size=(len(RATIOS), n_in, channels))
    for i, (in_rate, out_rate) in enumerate(RATIOS):
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        configs.append((cfg, fx.calculate_ratio(in_rate, out_rate)))

    states = make_batch_state(configs)
    quotas = jnp.full((len(RATIOS),), 10**6, jnp.int32)
    totals = jnp.full((len(RATIOS),), n_in, jnp.int32)

    # Positions are relative to the buffer start; the padding contract
    # (clownresampler.h:725-733) puts stream frame 0 at row `radius`, so each
    # stream lays out [radius zeros | data | radius zeros] in a shared-shape
    # staging buffer.
    buf = np.zeros((len(RATIOS), n_in + 2 * max_radius, channels), np.int16)
    for i, (cfg, _) in enumerate(configs):
        r = cfg.integer_stretched_kernel_radius
        buf[i, : n_in + 2 * r, :] = np.concatenate(
            [
                np.zeros((r, channels), np.int16),
                data[i].astype(np.int16),
                np.zeros((r, channels), np.int16),
            ]
        )

    out, produced, consumed, new_states, exhausted = resample_batch(
        table,
        jnp.asarray(buf),
        totals,
        states,
        quotas,
        max_taps=max_taps,
        n_out=n_out,
    )
    out = np.asarray(out)
    produced = np.asarray(produced)

    for i, (in_rate, out_rate) in enumerate(RATIOS):
        rs = LowLevelResampler.init(
            channels, in_rate, out_rate, max(in_rate, out_rate), max_radius=max_radius
        )
        r = rs.config.integer_stretched_kernel_radius
        padded = np.concatenate(
            [
                np.zeros((r, channels), np.int16),
                data[i].astype(np.int16),
                np.zeros((r, channels), np.int16),
            ]
        )
        exhausted_h, remaining_h, frames_h = rs.resample(padded, n_in)
        n = frames_h.shape[0]
        assert produced[i] == min(n, n_out), (in_rate, out_rate)
        np.testing.assert_array_equal(
            out[i, : produced[i]], frames_h[: produced[i]], err_msg=str((in_rate, out_rate))
        )
        # masked tail is zero
        assert not out[i, produced[i] :].any()
        if n < n_out:
            assert bool(np.asarray(exhausted)[i]) == exhausted_h
            assert int(np.asarray(consumed)[i]) == n_in - remaining_h
            assert int(np.asarray(new_states.position_integer)[i]) == rs.position_integer
            assert int(np.asarray(new_states.position_fractional)[i]) == rs.position_fractional

"""Single-frame convolution parity vs the C oracle (clownresampler.h:986-1035).

Covers 9 ratio configs x {1,2,4,16} channels x positions x 6 phase fractions
from the committed oracle vectors, including the lpf-stretched and ~40x
downsample configs.
"""

import jax.numpy as jnp
import numpy as np

from clownresampler_tpu import fixedpoint as fx
from clownresampler_tpu.configure import configure
from clownresampler_tpu.models import lanczos_kernel_table
from clownresampler_tpu.ops.convolve import ConfigScalars, convolve_frames
from tests import oracle


def test_lowest_level_frames_bit_exact():
    table = jnp.asarray(lanczos_kernel_table())
    # Group cases by (rates, channels): within a group the input buffer is
    # shared and only (pos, frac) vary, so each group is one batched call.
    groups = {}
    for case in oracle.lowest_cases():
        key = (case["rates"], case["channels"], case["input"].tobytes())
        groups.setdefault(key, []).append(case)

    n_checked = 0
    for (rates, _channels, _), cases in groups.items():
        in_rate, out_rate, lpf = rates
        cfg = configure(in_rate, out_rate, lpf)
        assert cfg is not None
        increment = fx.calculate_ratio(in_rate, out_rate)
        scalars = ConfigScalars.from_configuration(cfg, increment)
        pos = jnp.asarray([c["position"][0] for c in cases], jnp.int32)
        frac = jnp.asarray([c["position"][1] for c in cases], jnp.int32)
        out = np.asarray(
            convolve_frames(
                table,
                jnp.asarray(cases[0]["input"]),
                pos,
                frac,
                scalars,
                2 * cfg.integer_stretched_kernel_radius,
            )
        )
        expected = np.stack([c["expected"] for c in cases])
        np.testing.assert_array_equal(out, expected, err_msg=str(rates))
        n_checked += len(cases)
    assert n_checked > 500


def test_max_taps_padding_is_inert():
    """Padding the tap window beyond the required bound must not change results
    (masked taps contribute zero to accumulator and normaliser)."""
    table = jnp.asarray(lanczos_kernel_table())
    cfg = configure(44100, 8000, 44100)
    increment = fx.calculate_ratio(44100, 8000)
    scalars = ConfigScalars.from_configuration(cfg, increment)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(-32768, 32768, size=(64, 2)), jnp.int16)
    pos = jnp.asarray(rng.integers(0, 8, size=16), jnp.int32)
    frac = jnp.asarray(rng.integers(0, 65536, size=16), jnp.int32)
    a = convolve_frames(table, x, pos, frac, scalars, 34)
    b = convolve_frames(table, x, pos, frac, scalars, 64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""API failure-surface parity (SURVEY.md section 5 error handling):
tri-state failures on Init/Adjust, ratio sentinels, channel limits."""

import numpy as np
import pytest

import clownresampler_tpu as crt
from clownresampler_tpu.highlevel import HighLevelResampler
from clownresampler_tpu.lowlevel import LowLevelResampler


def test_channels_over_16_rejected():
    # clownresampler.h:1103 — high-level init rejects channels > 16.
    assert HighLevelResampler.init(17, 48000, 44100, 44100) is None
    assert HighLevelResampler.init(16, 48000, 44100, 44100) is not None


def test_crazy_ratio_rejected():
    # clownresampler.h:974-975 — kernel scale >= 0x1000 fails Configure.
    assert crt.configure(300000000, 44100, 44100) is None
    assert LowLevelResampler.init(2, 300000000, 44100, 44100) is None
    assert HighLevelResampler.init(2, 300000000, 44100, 44100) is None


def test_zero_rate_sentinel():
    # clownresampler.h:919-920 — zero rates yield the sentinel ratio and the
    # configure path fails via the scale check.
    assert crt.fixedpoint.calculate_ratio(0, 44100) == 0xFFFFFFFF
    assert crt.fixedpoint.calculate_ratio(44100, 0) == 0xFFFFFFFF
    assert crt.configure(0, 44100, 44100) is None


def test_highlevel_adjust_transactional():
    # clownresampler.h:1183-1209 — failed adjust leaves state untouched.
    rs = HighLevelResampler.init(2, 44100, 8000, 44100)
    before = (
        rs.low_level.increment,
        rs.low_level.config,
        rs.low_level.position_integer,
    )
    assert not rs.adjust(192000, 8000, 192000)   # radius would grow past init
    assert not rs.adjust(300000000, 44100, 44100)  # crazy scale
    after = (
        rs.low_level.increment,
        rs.low_level.config,
        rs.low_level.position_integer,
    )
    assert before == after
    assert rs.adjust(44100, 48000, 48000)        # narrowing is fine


def test_lowlevel_adjust_unrestricted_radius():
    # The C low-level API allows radius growth on Adjust (only high-level
    # restricts it); ours mirrors that by growing tap capacity.
    rs = LowLevelResampler.init(2, 44100, 44100, 44100)
    assert rs.adjust(192000, 8000, 192000)
    assert rs.config.integer_stretched_kernel_radius > 17


def test_resample_array_rejects_unsupported():
    with pytest.raises(ValueError):
        crt.resample_array(np.zeros((16, 2), np.int16), 300000000, 44100, 44100)

"""Configure/ratio parity against the C oracle (clownresampler.h:913-984)."""

from clownresampler_tpu.configure import configure
from tests import oracle


def test_configure_against_oracle():
    for row in oracle.configs():
        in_rate, out_rate, lpf, ok = (int(v) for v in row[:4])
        got = configure(in_rate, out_rate, lpf)
        if not ok:
            assert got is None, (in_rate, out_rate, lpf)
            continue
        assert got is not None, (in_rate, out_rate, lpf)
        assert got.stretched_kernel_radius == int(row[4])
        assert got.integer_stretched_kernel_radius == int(row[5])
        assert got.stretched_kernel_radius_delta == int(row[6])
        assert got.kernel_step_size == int(row[7])


def test_survey_derived_values():
    # SURVEY.md section 7 step 2 anchors.
    c = configure(44100, 8000, 44100)
    assert c.integer_stretched_kernel_radius == 17
    assert c.kernel_step_size == 185
    c = configure(8000, 44100, 44100)
    assert c.integer_stretched_kernel_radius == 3
    assert c.kernel_step_size == 1024
    c = configure(96000, 48000, 96000)
    assert c.integer_stretched_kernel_radius == 6
    assert c.kernel_step_size == 512

"""Configure/ratio parity against the C oracle (clownresampler.h:913-984)."""

from clownresampler_tpu.configure import configure
from tests import oracle


def test_configure_against_oracle():
    saw_step0 = False
    for row in oracle.configs():
        in_rate, out_rate, lpf, ok = (int(v) for v in row[:4])
        got = configure(in_rate, out_rate, lpf)
        if not ok:
            assert got is None, (in_rate, out_rate, lpf)
            continue
        if int(row[7]) == 0:
            # Deliberate deviation (configure.py docstring): the reference
            # accepts kernel_step_size == 0 configs but SIGFPEs on the first
            # resampled frame (normaliser = taps * table[0] = 0 at
            # clownresampler.h:1025); we reject them at configure time.
            assert got is None, (in_rate, out_rate, lpf)
            saw_step0 = True
            continue
        assert got is not None, (in_rate, out_rate, lpf)
        assert got.stretched_kernel_radius == int(row[4])
        assert got.integer_stretched_kernel_radius == int(row[5])
        assert got.stretched_kernel_radius_delta == int(row[6])
        assert got.kernel_step_size == int(row[7])
    assert saw_step0, "oracle vectors should include a step==0 boundary row"


def test_step0_boundary():
    """44100->44 (scale ~1002) is the widest ratio the reference can run;
    44100->43 floors kernel_step_size to 0 (reference SIGFPE domain)."""
    c = configure(44100, 44, 44100)
    assert c is not None and c.kernel_step_size == 1
    assert c.integer_stretched_kernel_radius == 3007
    assert configure(44100, 43, 44100) is None


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

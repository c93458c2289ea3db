"""Invariant checker: passes on legal launches, catches violations."""

from clownresampler_tpu import fixedpoint as fx
from clownresampler_tpu.configure import configure
from clownresampler_tpu.debug import check_launch


def test_legal_launch_clean():
    for in_rate, out_rate in [(48000, 44100), (8000, 44100), (44100, 8000)]:
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        inc = fx.calculate_ratio(in_rate, out_rate)
        n_out = 1024
        rows_needed = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 2
        report = check_launch(cfg, inc, 0, 0, n_out, rows_needed)
        assert report.ok(), report.violations


def test_underpadded_input_detected():
    cfg = configure(44100, 8000, 44100)
    inc = fx.calculate_ratio(44100, 8000)
    report = check_launch(cfg, inc, 0, 0, 1024, input_rows=100)
    assert not report.ok()
    assert "input row" in report.violations[0]


def test_table_overrun_detected():
    cfg = configure(8000, 44100, 44100)
    inc = fx.calculate_ratio(8000, 44100)
    report = check_launch(cfg, inc, 0, 0, 64, input_rows=10_000, table_size=100)
    assert not report.ok()
    assert "kernel index" in report.violations[0]

"""Low-level streaming parity: replay the C-oracle scripts step by step.

Each script drives ClownResampler_LowLevel_* in the C harness
(tools/gen_oracle_vectors.c) and records outputs, return values, consumed
counts and full state after every op. Replaying through LowLevelResampler must
match everything bit-for-bit: chunked feeds with position carry
(clownresampler.h:1063-1068), output-full rewind (1084-1088), mid-stream
Adjust pitch bends (1052-1056), integer ratios and unity passthrough.
"""

import numpy as np
import pytest

from clownresampler_tpu.lowlevel import LowLevelResampler
from tests import oracle


def _replay(name, meta, ops, expected_out, stream):
    ch = meta["channels"]
    in_rate, out_rate, lpf = meta["rates"]
    pad = meta["pad"]
    stream_frames = meta["stream_frames"]
    stream = stream.reshape(-1, ch)

    rs = LowLevelResampler.init(ch, in_rate, out_rate, lpf)
    assert rs is not None

    produced_frames = []
    cursor = 0
    for row in ops:
        op, a0, a1, a2 = (int(v) for v in row[:4])
        exp_ret, exp_remaining, exp_produced = (int(v) for v in row[4:7])
        exp_state = tuple(int(v) for v in row[7:14])

        if op == 1:
            n = min(a0, stream_frames - cursor)
            radius = rs.config.integer_stretched_kernel_radius
            start = pad + cursor - radius
            window = stream[start : pad + cursor + n + radius]
            ret, remaining, frames = rs.resample(window, n, output_limit=a1)
            assert ret == bool(exp_ret), (name, row)
            assert remaining == exp_remaining, (name, row)
            assert frames.shape[0] == exp_produced, (name, row)
            produced_frames.append(frames)
            cursor += n - remaining
        elif op == 2:
            ret = rs.adjust(a0, a1, a2)
            assert ret == bool(exp_ret), (name, row)
        else:
            raise AssertionError(f"unknown op {op}")

        assert rs.state_tuple() == exp_state, (name, row)

    got = np.concatenate(produced_frames, axis=0).ravel() if produced_frames else np.zeros(0)
    np.testing.assert_array_equal(got, expected_out, err_msg=name)


@pytest.mark.parametrize(
    "script", list(oracle.scripts("lowlevel")), ids=lambda s: s[0]
)
def test_lowlevel_script(script):
    _replay(*script)

"""End-to-end golden-file bit-exactness — the reference's own test strategy.

Reproduces tests/CMakeLists.txt:23-47: resample the decoded test.flac fixture
at the four rate configs through BOTH API levels and compare every output
sample with the goldens regenerated from the C reference (SURVEY.md section 4:
the committed upstream goldens are stale; BASELINE.md lists the regenerated
md5s these fixtures carry).
"""

import numpy as np
import pytest

from clownresampler_tpu.highlevel import HighLevelResampler
from clownresampler_tpu.lowlevel import resample_array
from tests import oracle

CONFIGS = [
    # (in_rate, out_rate, lpf, golden_file)
    (8000, 44100, 44100, "golden_8000_44100.raw"),   # test1
    (8000, 44100, 8000, "golden_8000_44100.raw"),    # test2 == test1 (lpf no-op)
    (44100, 8000, 44100, "golden_44100_8000.raw"),   # test3
    (44100, 8000, 8000, "golden_44100_8000.raw"),    # test4 == test3
]


@pytest.mark.parametrize("in_rate,out_rate,lpf,golden_file", CONFIGS)
def test_lowlevel_golden(in_rate, out_rate, lpf, golden_file):
    pcm = oracle.pcm_fixture()
    golden = oracle.golden(golden_file)
    out = resample_array(pcm, in_rate, out_rate, lpf)
    np.testing.assert_array_equal(out.ravel(), golden)


@pytest.mark.parametrize("in_rate,out_rate,lpf,golden_file", CONFIGS[::2])
def test_highlevel_golden(in_rate, out_rate, lpf, golden_file):
    pcm = oracle.pcm_fixture()
    golden = oracle.golden(golden_file)

    state = {"cursor": 0}

    def input_callback(total_frames: int) -> np.ndarray:
        give = min(total_frames, pcm.shape[0] - state["cursor"])
        out = pcm[state["cursor"] : state["cursor"] + give]
        state["cursor"] += give
        return out

    rs = HighLevelResampler.init(2, in_rate, out_rate, lpf)
    out = rs.resample_stream(input_callback)
    np.testing.assert_array_equal(out.ravel(), golden)

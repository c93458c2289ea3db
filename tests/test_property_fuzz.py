"""Property fuzz: random ratios x random chunkings, farm == host == one-shot.

The host LowLevelResampler is proven bit-exact against the C oracle; this
closes the loop by fuzzing the production (farm) path against it across the
whole supported ratio space, including ratios no curated list would pick.
"""

import numpy as np
import pytest

from clownresampler_tpu.configure import configure
from clownresampler_tpu.farm import UniformStreamFarm
from tests.test_farm import _host_reference

RNG = np.random.default_rng(0xC0FFEE)


def _random_ratio(rng):
    while True:
        in_rate = int(rng.integers(1, 200_000))
        out_rate = int(rng.integers(1, 200_000))
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        # keep radius small enough that the staging stays reasonable
        if cfg is not None and cfg.integer_stretched_kernel_radius <= 40:
            return in_rate, out_rate


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_farm_matches_host(seed):
    rng = np.random.default_rng(seed * 7919 + 13)
    in_rate, out_rate = _random_ratio(rng)
    ch = int(rng.integers(1, 4))
    total = int(rng.integers(150, 600))
    data = rng.integers(-32768, 32768, size=(2, total, ch)).astype(np.int16)

    farm = UniformStreamFarm(
        2, ch, in_rate, out_rate, max(in_rate, out_rate),
        chunk_frames=256, interpret=True,
    )
    outs = []
    cursor = 0
    while cursor < total:
        size = min(int(rng.integers(1, 256)), total - cursor)
        outs.append(farm.process(data[:, cursor : cursor + size]))
        cursor += size
    outs.append(farm.flush())
    got = np.concatenate(outs, axis=1)

    for i in range(2):
        want = _host_reference(data[i], ch, in_rate, out_rate, max(in_rate, out_rate))
        np.testing.assert_array_equal(
            got[i], want, err_msg=f"ratio {in_rate}->{out_rate} ch={ch} stream {i}"
        )

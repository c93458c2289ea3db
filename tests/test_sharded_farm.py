"""ShardedStreamFarm (lanes over a dp mesh) must be bit-equal to the
single-device UniformStreamFarm — and transitively to the C reference per
stream — on the 8-virtual-device CPU mesh (conftest)."""

import numpy as np
import pytest

from clownresampler_tpu.farm import UniformStreamFarm
from clownresampler_tpu.parallel import ShardedStreamFarm, make_mesh


def _run(farm, chunks):
    outs = [farm.process(c) for c in chunks]
    outs.append(farm.flush())
    return np.concatenate(outs, axis=1)


@pytest.mark.parametrize(
    "in_rate,out_rate",
    [
        (48000, 44100),   # tiled kernel class
        (96000, 48000),   # polyphase strided class (phases kernel per shard)
        (44100, 8000),    # general per-frame class
    ],
)
def test_sharded_farm_matches_uniform_farm(in_rate, out_rate):
    mesh = make_mesh()  # all 8 CPU-mesh devices on dp
    n_streams, channels, chunk = 512, 2, 384
    rng = np.random.default_rng(11)
    chunks = [
        rng.integers(-32768, 32768, (n_streams, chunk, channels)).astype(np.int16)
        for _ in range(3)
    ]
    ref_farm = UniformStreamFarm(
        n_streams, channels, in_rate, out_rate, interpret=True,
        chunk_frames=chunk,
    )
    sh_farm = ShardedStreamFarm(
        mesh, n_streams, channels, in_rate, out_rate, interpret=True,
        chunk_frames=chunk,
    )
    assert sh_farm._lanes % (128 * mesh.shape["dp"]) == 0
    want = _run(ref_farm, chunks)
    got = _run(sh_farm, chunks)
    np.testing.assert_array_equal(got, want, err_msg=f"{in_rate}->{out_rate}")


def test_sharded_farm_adjust_pitch_bend():
    """Mid-stream adjust (position carry) matches the single-device farm."""
    mesh = make_mesh()
    n_streams, channels, chunk = 512, 1, 384
    rng = np.random.default_rng(13)
    chunks = [
        rng.integers(-32768, 32768, (n_streams, chunk, channels)).astype(np.int16)
        for _ in range(3)
    ]
    rates = [(48000, 44100), (96000, 48000), (32000, 48000)]

    def run(farm):
        outs = []
        for (ir, orate), c in zip(rates, chunks):
            assert farm.adjust(ir, orate, max(ir, orate))
            outs.append(farm.process(c))
        outs.append(farm.flush())
        return np.concatenate(outs, axis=1)

    ref_farm = UniformStreamFarm(
        n_streams, channels, 48000, 44100, interpret=True,
        chunk_frames=chunk, max_radius=8,
    )
    sh_farm = ShardedStreamFarm(
        mesh, n_streams, channels, 48000, 44100, interpret=True,
        chunk_frames=chunk, max_radius=8,
    )
    np.testing.assert_array_equal(run(sh_farm), run(ref_farm))


def test_sharded_farm_clamp_s16():
    """clamp_s16 through the shard-mapped launch == clipping the wide farm."""
    mesh = make_mesh()
    n_streams, ch, chunk = 512, 1, 256
    rng = np.random.default_rng(17)
    data = rng.integers(-32768, 32768, (n_streams, chunk, ch)).astype(np.int16)
    wide = ShardedStreamFarm(mesh, n_streams, ch, 48000, 44100,
                             chunk_frames=chunk, interpret=True)
    clamped = ShardedStreamFarm(mesh, n_streams, ch, 48000, 44100,
                                chunk_frames=chunk, interpret=True,
                                clamp_s16=True)
    a = np.concatenate([wide.process(data), wide.flush()], axis=1)
    b = np.concatenate([clamped.process(data), clamped.flush()], axis=1)
    assert b.dtype == np.int16
    np.testing.assert_array_equal(b, np.clip(a, -0x7FFF, 0x7FFF).astype(np.int16))

"""Non-default kernel models: bit-exact against the reference compiled with
overridden CLOWNRESAMPLER_KERNEL_RADIUS/RESOLUTION (tools note in
tools/gen_oracle_vectors.c; vectors from /tmp build of gen_model_vectors.c,
packed as tests/fixtures/model_vectors.npz).

Covers the quality-preset subsystem (SURVEY.md section 2 row 1: the
compile-time radius/resolution knobs, made runtime here as KernelModel).
"""

import os

import numpy as np
import pytest

from clownresampler_tpu.lowlevel import LowLevelResampler
from clownresampler_tpu.models import KernelModel

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "model_vectors.npz")

CASES = {
    "r10": KernelModel(radius=10, resolution=0x400),
    "r2": KernelModel(radius=2, resolution=0x200),
}


@pytest.fixture(scope="module")
def vectors():
    return np.load(FIXTURE)


@pytest.mark.parametrize("tag", list(CASES))
def test_model_table_bit_exact(vectors, tag):
    model = CASES[tag]
    np.testing.assert_array_equal(model.table(), vectors[f"{tag}__table"])


@pytest.mark.parametrize("tag", list(CASES))
def test_model_resample_bit_exact(vectors, tag):
    """One-shot 44.1k->32k stereo with the variant model (400 frames)."""
    model = CASES[tag]
    padded = vectors[f"{tag}__input"].reshape(-1, 2)
    rs = LowLevelResampler.init(2, 44100, 32000, 44100, model=model)
    radius = rs.config.integer_stretched_kernel_radius
    n = padded.shape[0] - 2 * radius
    _, _, frames = rs.resample(padded, n)
    np.testing.assert_array_equal(
        frames.ravel(), vectors[f"{tag}__output"], err_msg=tag
    )

"""Kernel LUT must be bit-identical to ClownResampler_Precompute."""

import numpy as np

from clownresampler_tpu.models import DEFAULT_MODEL, KernelModel, lanczos_kernel_table
from tests import oracle


def test_table_bit_exact_vs_c():
    ours = lanczos_kernel_table(3, 0x400)
    theirs = oracle.kernel_table()
    assert ours.dtype == np.int32
    np.testing.assert_array_equal(ours, theirs)


def test_survey_anchors():
    # Empirically verified anchors from SURVEY.md section 2 row 5.
    t = DEFAULT_MODEL.table()
    assert t.shape == (6144,)
    assert t[3072] == 65536
    assert t.min() == -9651
    assert t[0] == 0 and t[-1] == 0


def test_other_models_generate():
    for model in (KernelModel(2, 0x200), KernelModel(10, 0x400)):
        t = model.table()
        assert t.shape == (model.table_size,)
        assert t[model.table_size // 2] == 65536

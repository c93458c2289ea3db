"""Device compute ops: the windowed-sinc convolution core.

``convolve`` is the always-correct XLA formulation (gather + masked MAC);
``pallas_resample`` is the fused TPU kernel used on the hot path. Both are
bit-exact against the C reference and against each other (tests/test_pallas.py).
"""

from clownresampler_tpu.ops.convolve import ConfigScalars, convolve_frames

__all__ = ["ConfigScalars", "convolve_frames"]

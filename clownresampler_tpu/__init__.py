"""clownresampler_tpu — a TPU-native windowed-sinc audio resampling framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Clownacy/clownresampler (a C89 streaming Lanczos resampler in 16.16 fixed
point): bit-exact numerics, the full four-layer API surface, and batched
multi-stream throughput on TPU.

Layer map (mirrors SURVEY.md section 1):
  models/       filter models: Lanczos LUT generation (Precompute)
  configure     lowest-level ratio/stretching math (LowestLevel_Configure)
  ops/          the convolution core: XLA oracle + fused Pallas kernel
                (LowestLevel_Resample)
  lowlevel      phase-accumulator streaming over pre-padded input
                (LowLevel_Init/Adjust/Resample)
  highlevel     buffered streaming with automatic edge padding
                (HighLevel_Init/Resample/Adjust/ResampleEnd)
  batch         batched multi-stream transcode (the TPU-native capability the
                scalar reference cannot express)
  parallel/     device-mesh sharding of stream batches (DP over ICI)
  utils/        PCM/WAV helpers
"""

from clownresampler_tpu import fixedpoint
from clownresampler_tpu.configure import MAXIMUM_CHANNELS, Configuration, configure
from clownresampler_tpu.farm import MixedStreamFarm, UniformStreamFarm
from clownresampler_tpu.highlevel import HighLevelResampler
from clownresampler_tpu.lowlevel import (
    LowLevelResampler,
    resample_array,
    resample_chunk,
    resample_scan,
    resample_scan_fused,
    resample_scan_tiled,
)
from clownresampler_tpu.models import (
    DEFAULT_MODEL,
    HIGH_QUALITY_MODEL,
    LOW_COST_MODEL,
    KernelModel,
    lanczos_kernel_table,
)

__version__ = "0.1.0"

__all__ = [
    "fixedpoint",
    "Configuration",
    "configure",
    "MAXIMUM_CHANNELS",
    "KernelModel",
    "lanczos_kernel_table",
    "DEFAULT_MODEL",
    "HIGH_QUALITY_MODEL",
    "LOW_COST_MODEL",
    "LowLevelResampler",
    "HighLevelResampler",
    "UniformStreamFarm",
    "MixedStreamFarm",
    "resample_chunk",
    "resample_scan",
    "resample_scan_fused",
    "resample_scan_tiled",
    "resample_array",
    "__version__",
]

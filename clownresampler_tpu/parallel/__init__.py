"""Mesh-parallel scaling of the stream farm (DP over streams, SP over frames)."""

from clownresampler_tpu.parallel.farm import (
    ShardedMixedStreamFarm,
    ShardedStreamFarm,
)
from clownresampler_tpu.parallel.sharding import (
    make_mesh,
    sharded_resample_batch,
    sharded_uniform_resample,
)

__all__ = [
    "ShardedMixedStreamFarm",
    "ShardedStreamFarm",
    "make_mesh",
    "sharded_resample_batch",
    "sharded_uniform_resample",
]

"""Mesh-sharded transcode farm: the production multi-chip batch path.

``ShardedStreamFarm`` is ``farm.UniformStreamFarm`` with the lane
(stream x channel) axis sharded over a device mesh's ``dp`` axis. Streams
share nothing (SURVEY.md section 2: the reference is a scalar, single-stream
library; there is no cross-stream communication to replicate), so this is
pure data parallelism with ZERO collectives:

* the staging buffer lives sharded on the mesh (rows replicated, lanes
  split); the chunk-cycle device ops (stage write, kernel launch, slide)
  partition along the lane axis, so XLA inserts only the initial
  host-chunk scatter;
* the kernel launch runs under ``shard_map``: each device executes the
  plan-specialised Pallas kernel (ops/pallas_resample.py) on its own lane
  slice with the replicated scalar phase state and LUT — the same
  independent-buffer slicing the single-chip farm uses past its per-launch
  width bound (farm.LANE_SPLIT), here realised as one buffer per chip;
* all host bookkeeping (positions, halo slide, natural counts) is inherited
  unchanged, so outputs are bit-exact vs the single-device farm and
  transitively vs the C reference per stream (tests/test_sharded_farm.py).

The per-stream phase state is shared across the fleet (uniform ratio), so
``adjust`` (pitch bend) works exactly as on the single-chip farm.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from clownresampler_tpu.farm import LANES, MixedStreamFarm, UniformStreamFarm
from clownresampler_tpu.models import DEFAULT_MODEL, KernelModel
from clownresampler_tpu.ops.pallas_resample import multi_resample


class ShardedStreamFarm(UniformStreamFarm):
    """UniformStreamFarm whose lanes shard over ``mesh``'s ``dp`` axis."""

    def __init__(
        self,
        mesh: Mesh,
        n_streams: int,
        channels: int,
        input_rate: int,
        output_rate: int,
        low_pass_rate: Optional[int] = None,
        chunk_frames: int = 4096,
        model: KernelModel = DEFAULT_MODEL,
        max_radius: Optional[int] = None,
        interpret: bool = False,
        clamp_s16: bool = False,
        capacity_rows: Optional[int] = None,
    ):
        self.mesh = mesh
        self._dp = mesh.shape["dp"]
        super().__init__(
            n_streams, channels, input_rate, output_rate, low_pass_rate,
            chunk_frames=chunk_frames, model=model, max_radius=max_radius,
            interpret=interpret, clamp_s16=clamp_s16,
            capacity_rows=capacity_rows,
            # one full-width launch per frame tile; the mesh IS the lane split
            split_lanes=False,
            # every lane shard must be a whole 128-lane kernel tile
            lane_multiple=LANES * self._dp,
            # staging stays device-resident and sharded even in interpret
            # mode (the CPU-mesh test path)
            device_staging=True,
        )
        self._sharding = NamedSharding(mesh, P(None, "dp"))
        self._staging = tuple(
            jax.device_put(st, self._sharding) for st in self._staging
        )
        self._launch_cache: dict = {}

    def _launch(self, n_out: int):
        """Shard-mapped analogue of UniformStreamFarm._launch: every frame
        tile's plan-specialised kernel runs per-device on that device's lane
        slice of the staging buffer, fused into one program."""
        specs, lane_splits = self._launch_specs(n_out)
        assert lane_splits == 1
        plans = tuple(plan for *_, plan in specs)
        states = tuple(state for _, _, state, _ in specs)
        tstrs = self._spec_tstr(specs)
        fn = self._launch_cache.get(plans)
        if fn is None:
            mesh = self.mesh
            interpret = self.interpret

            def per_shard(table, x_local, sts, ts):
                return multi_resample(
                    table, (x_local,) * len(plans), sts, plans,
                    interpret=interpret, tstrs=ts,
                )

            state_specs = jax.tree.map(lambda _: P(), states)
            tstr_specs = jax.tree.map(lambda _: P(), tstrs)
            fn = jax.jit(shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(P(), P(None, "dp"), state_specs, tstr_specs),
                out_specs=tuple(P(None, "dp") for _ in plans),
                check_vma=False,
            ))
            self._launch_cache[plans] = fn
        outs = list(fn(self._table, self._staging[0], states, tstrs))
        return self._collect_parts(specs, outs, 1)


class ShardedMixedStreamFarm(MixedStreamFarm):
    """MixedStreamFarm whose ratio groups each shard over ``mesh``'s ``dp``
    axis: per-ratio-group lane sharding, with every group's plan-specialised
    kernel fused into ONE shard-mapped device program per chunk (the same
    dispatch-floor argument as the single-chip mixed farm, here per chip).

    Streams still share nothing (SURVEY.md section 2: no cross-stream
    communication), so the only mesh interaction is the lane partition of
    each group's staging buffer — zero collectives. Each group is a
    ShardedStreamFarm, so per-group lane counts pad to LANES*dp (whole
    128-lane kernel tiles per device); ``adjust_stream`` migrates a stream
    into its own sharded solo farm exactly as on the single-chip mixed farm
    (clownresampler.h:1052-1056 per stream, at multi-chip batch scale).
    Bit-exact vs MixedStreamFarm per stream (tests/test_sharded_farm.py).
    """

    def __init__(self, mesh: Mesh, specs, channels: int,
                 chunk_frames: int = 4096, model: KernelModel = DEFAULT_MODEL,
                 interpret: bool = False, max_radius: Optional[int] = None,
                 clamp_s16: bool = False):
        self.mesh = mesh
        self._mixed_launch_cache: dict = {}
        super().__init__(specs, channels, chunk_frames=chunk_frames,
                         model=model, interpret=interpret,
                         max_radius=max_radius, clamp_s16=clamp_s16)

    def _make_group_farm(self, n_streams, rates, max_radius=None,
                         capacity_rows=None):
        return ShardedStreamFarm(
            self.mesh, n_streams, self.channels, *rates,
            chunk_frames=self.chunk_frames, model=self.model,
            interpret=self.interpret, max_radius=max_radius,
            clamp_s16=self.clamp_s16, capacity_rows=capacity_rows,
        )

    def _run_combined_launch(self, table, xs, states, plans, tstrs, interpret):
        """One shard-mapped program running EVERY group's sub-launches on each
        device's lane slice of that group's staging buffer (the multi-group
        analogue of ShardedStreamFarm._launch)."""
        plans = tuple(plans)
        states = tuple(states)
        tstrs = tuple(tstrs)
        fn = self._mixed_launch_cache.get(plans)
        if fn is None:
            mesh = self.mesh

            def per_shard(tbl, xs_local, sts, ts):
                return multi_resample(
                    tbl, xs_local, sts, plans, interpret=interpret, tstrs=ts,
                )

            state_specs = jax.tree.map(lambda _: P(), states)
            tstr_specs = jax.tree.map(lambda _: P(), tstrs)
            fn = jax.jit(shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(P(), tuple(P(None, "dp") for _ in plans),
                          state_specs, tstr_specs),
                out_specs=tuple(P(None, "dp") for _ in plans),
                check_vma=False,
            ))
            self._mixed_launch_cache[plans] = fn
        return list(fn(table, tuple(xs), states, tstrs))

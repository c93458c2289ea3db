"""Transcode farm: steady-state chunked resampling of many parallel streams.

This is the production path the scalar reference cannot express: B streams
flow through the fused TPU kernel (ops/pallas_resample.py) as 128-wide vector
lanes, with the host side doing exactly what the reference's high-level layer
does for one stream — staging buffer, halo carry, edge padding
(clownresampler.h:1096-1252) — via the native C++ engine (native/stage.cpp).

``UniformStreamFarm`` drives B same-ratio streams (one shared phase state).
Mixed-ratio fleets are ratio-grouped: one farm per distinct ratio (streams
share nothing, so grouping is free — SURVEY.md section 2, parallelism notes).
Dynamic ratio changes (pitch bends) are ``adjust`` between chunks, mirroring
LowLevel_Adjust semantics (clownresampler.h:1052-1056): position carries over,
only the increment/stretching change.

Bit-exactness: each stream's output is identical to running the reference
(and to LowLevelResampler) on that stream alone — tests/test_farm.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from clownresampler_tpu import fixedpoint as fx
from clownresampler_tpu.configure import Configuration, configure
from clownresampler_tpu.lowlevel import FAST_KERNEL_MAX_TAPS, make_device_state
from clownresampler_tpu.models import DEFAULT_MODEL, KernelModel
from clownresampler_tpu.ops.pallas_resample import (
    LANES,
    general_pick_group,
    multi_resample,
    plan_uniform,
    strided_phase_padding,
    strided_table_device,
    wide_serves,
    window_rows_needed,
)
from clownresampler_tpu.utils import native

# Max output frames per kernel launch: device positions come from
# fx.positions_from_state, int32-exact only while f0 + n*inc_lo < 2^31,
# i.e. n < 2^15 in the worst case. Same bound as lowlevel.MAX_CHUNK_OUTPUT_FRAMES.
MAX_LAUNCH_OUTPUT_FRAMES = 1 << 14

# The Pallas kernels keep the (rows, 128) input block VMEM-resident and Mosaic
# double-buffers it across lane-tiles; empirically ~8.9k rows compiles and
# ~17.9k rows fails on v5e (tools/probe_launch_overhead.py). Staging buffers
# beyond this row count route to the XLA gather oracle instead.
VMEM_SAFE_INPUT_ROWS = 12288

# Fleets stay in ONE launch up to this many lanes. Round-5 honest structure
# sweep (tools/probe_headline_structure.py — the earlier "narrow sub-launches
# overlap and win 1.3-1.7x" was the dead-carry DCE fiction, see
# benchmarks/RESULTS.md round-5 correction): for the TILED class per-launch
# time grows SUBLINEARLY in lanes up to 2048 (mono 512/1024/2048 =
# 0.182/0.329/0.621 ms for the headline shape — the lane-tile axis pipelines
# on the grid) and superlinearly past it (4096: 1.378 ms), while split
# structures at equal total lanes are strictly slower (4x512: 0.772,
# 2x1024: 0.797). The POLYPHASE STRIDED class inverts: mono 2048 runs 0.495
# ms vs 0.365 for two fused 1024-lane launches on independent buffers
# (2 x the mono-1024 time exactly — zero fusion overhead), so strided-class
# farms slice at 1024. Shared-buffer column slices are strictly worse for
# both classes (0.722-1.173 ms) — the split must be independent buffers.
LANE_SPLIT = 2048
STRIDED_LANE_SPLIT = 1024


def compute_lane_slices(lanes: int, max_taps: int, capacity: int,
                        increment: int | None = None) -> list:
    """[(width, offset), ...] of the independent staging sub-buffers for a
    fleet of ``lanes`` lanes (see LANE_SPLIT/STRIDED_LANE_SPLIT — the slice
    width is chosen by the ratio class of ``increment`` at farm-init /
    checkpoint-restore time; wide-kernel farms — the DMA kernel reads HBM
    directly — and VMEM-unsafe oracle-routed capacities stay unsplit).
    A farm later re-rated across classes keeps its slicing: correctness is
    unaffected (lanes are independent), only the launch structure is the
    other class's second-best."""
    split_at = LANE_SPLIT
    if (
        increment is not None
        and max_taps <= FAST_KERNEL_MAX_TAPS
        and (increment & 0xFFFF) == 0
        and (increment >> 16) >= 2
    ):
        split_at = STRIDED_LANE_SPLIT
    use_oracle = max_taps > FAST_KERNEL_MAX_TAPS or capacity > VMEM_SAFE_INPUT_ROWS
    if use_oracle or lanes <= split_at:
        return [(lanes, 0)]
    n_splits = -(-lanes // split_at)
    per = -(-(lanes // LANES) // n_splits) * LANES
    slices = []
    off = 0
    while off < lanes:
        w = min(per, lanes - off)
        slices.append((w, off))
        off += w
    return slices


class UniformStreamFarm:
    """B same-ratio streams, chunked, bit-exact, Pallas-accelerated.

    Feed fixed-size chunks with :meth:`process`; finish with :meth:`flush`.
    Outputs are wide int32 frames per stream, exactly matching the reference's
    per-stream results for the concatenated input.
    """

    def __init__(
        self,
        n_streams: int,
        channels: int,
        input_rate: int,
        output_rate: int,
        low_pass_rate: Optional[int] = None,
        chunk_frames: int = 4096,
        model: KernelModel = DEFAULT_MODEL,
        max_radius: Optional[int] = None,
        interpret: bool = False,
        device_staging: Optional[bool] = None,
        clamp_s16: bool = False,
        lane_multiple: int = LANES,
        split_lanes: bool = True,
        capacity_rows: Optional[int] = None,
    ):
        low_pass_rate = low_pass_rate if low_pass_rate is not None else max(input_rate, output_rate)
        cfg = configure(input_rate, output_rate, low_pass_rate,
                        radius=model.radius, resolution=model.resolution)
        if cfg is None:
            raise ValueError("unsupported ratio (kernel scale >= 0x1000)")
        self.n_streams = n_streams
        self.channels = channels
        self.chunk_frames = chunk_frames
        self.model = model
        self.interpret = interpret
        self.clamp_s16 = clamp_s16  # emit clamped int16 (serving; halves D2H)
        self._table = jnp.asarray(model.table())

        assert lane_multiple % LANES == 0
        self._lanes = fx.round_up(n_streams * channels, lane_multiple)
        radius_bound = max(cfg.integer_stretched_kernel_radius, max_radius or 0)
        self._max_taps = fx.round_up(2 * radius_bound, 8)
        self._radius_bound = radius_bound

        # Host streaming state (exact Python ints) + device scalars per launch.
        self.position_integer = 0
        self.position_fractional = 0
        self._set_config(cfg, fx.calculate_ratio(input_rate, output_rate))

        # Staging buffer: [left halo | data ... | load slack]. Row r of the
        # staging buffer is sample_index r in the reference's convolution
        # (clownresampler.h:995): logical stream frame f lives at row f+radius.
        # Slack covers the tiled kernel's aligned loads for padding frames past
        # the natural count, and the strided path's (n_pad - n_out)*d over-read
        # (d <= kernel_scale <= radius_bound/radius + 1, so 8*d is bounded by
        # ~3*radius_bound for the default radius 3). Wide kernels beyond
        # FAST_KERNEL_MAX_TAPS route to the DMA wide kernel
        # (ops.resample_wide_taps), which reads the RESERVED tap width
        # (max_taps + 8 rows) from every window start regardless of the
        # CURRENT ratio's actual taps (the surplus taps are zero — exact),
        # so when the current radius is narrower than the reserved bound the
        # read extends past the actual window by up to 2*(radius_bound -
        # radius) rows. Window starts reach at most fill - radius_bound
        # (positions < consumable total = fill - 2*radius_bound, plus the
        # halo shift), so reads end <= fill + radius_bound + 8: a slack of
        # radius_bound + 16 keeps every legal read inside the buffer even at
        # full fill. (The round-2 oracle fallback tolerated the old slack=16
        # via clipped gathers + zero taps; the DMA kernel must not clamp
        # legal frames' window starts — caught by
        # tests/test_farm.py::test_wide_bound_farm_narrow_ratio_bit_exact.)
        if self._max_taps > FAST_KERNEL_MAX_TAPS:
            slack = radius_bound + 16
        else:
            slack = 96 + window_rows_needed(self._max_taps, 1, 8) + 3 * radius_bound
            # Polyphase strided launches (integer-stride ratios, possibly via
            # adjust) over-read d*(w_load + 8) rows past the last frame's
            # window plus up to 255 grain-padding frames x d rows. Reserve for
            # the strides this farm can actually reach — a stride-d ratio has
            # kernel_scale >= d, so its radius is >= model.radius * d and
            # adjust accepts it only while model.radius * d <= radius_bound.
            # Strided launches that end up without the over-read padding
            # downgrade to the XLA path per-launch in _launch_specs.
            strided_slack = 0
            for dd in range(2, radius_bound // model.radius + 1):
                strided_slack = max(
                    strided_slack,
                    96 + 256 * dd + strided_phase_padding(self._max_taps, dd, 32),
                )
            base_capacity = 2 * radius_bound + chunk_frames + slack
            with_strided = 2 * radius_bound + chunk_frames + strided_slack
            # Reserve unless it would be the ONLY thing pushing a farm whose
            # primary ratio is tiled/general past the VMEM row budget (which
            # would reroute its hot path onto the gather oracle). A farm
            # already past the budget loses nothing (tiled/general are
            # oracle-routed regardless, and the polyphase WIDE variant only
            # needs capacity/d rows per block); a farm whose PRIMARY ratio is
            # integer-stride wants the reservation even at the cost of a
            # hypothetical later tiled adjust.
            primary_strided = plan_uniform(self.increment, 0)["kernel"] == "strided"
            if strided_slack > slack and (
                with_strided <= VMEM_SAFE_INPUT_ROWS
                or base_capacity > VMEM_SAFE_INPUT_ROWS
                or primary_strided
            ):
                slack = strided_slack
        self._capacity = radius_bound + chunk_frames + radius_bound + slack
        if capacity_rows is not None:
            # Caller-forced staging geometry (MixedStreamFarm.adjust_stream:
            # a migrating stream's solo farm must match the source farm's
            # capacity exactly, but the strided-slack reservation above
            # depends on the PRIMARY ratio, which differs between the two).
            # Always >= the base capacity because the reservation only ever
            # grows the slack for equal (radius_bound, chunk_frames, model);
            # launches that then lack the polyphase over-read downgrade to
            # the XLA strided path per-launch in _launch_specs.
            assert capacity_rows >= 2 * radius_bound + chunk_frames, capacity_rows
            self._capacity = capacity_rows

        # Lane slicing: monolithic staging up to the class's measured best
        # launch width (LANE_SPLIT for tiled/general, STRIDED_LANE_SPLIT for
        # the polyphase strided class — round-5 honest structure sweep);
        # wider fleets stage into independent slice buffers. Oracle-routed
        # farms stay unsplit (the gather reads all lanes).
        self._lane_slices = (
            compute_lane_slices(self._lanes, self._max_taps, self._capacity,
                                increment=self.increment)
            if split_lanes
            else [(self._lanes, 0)]
        )

        # Device-resident staging (default on TPU): the buffers live in HBM;
        # each process() uploads only the new chunk and stages/shifts on
        # device — halving host<->device traffic vs re-uploading the buffer.
        if device_staging is None:
            device_staging = jax.default_backend() == "tpu" and not interpret
        self._device_staging = device_staging
        if device_staging:
            self._staging = tuple(
                jnp.zeros((self._capacity, w), jnp.int32)
                for w, _ in self._lane_slices
            )
        else:
            self._staging = np.zeros((self._capacity, self._lanes), np.int32)
        self._fill = radius_bound      # rows of valid data (left zero halo)
        self._pending_slide = None     # (consumed, keep) parked by defer_slide

    # ------------------------------------------------------------------
    def _set_config(self, cfg: Configuration, increment: int) -> None:
        self.config = cfg
        self.increment = increment

    def adjust(self, input_rate: int, output_rate: int, low_pass_rate: Optional[int] = None) -> bool:
        """Mid-stream ratio change (pitch bend); position carries over.

        Like HighLevel_Adjust (clownresampler.h:1183-1209), the radius may not
        grow past the construction-time bound (pass max_radius to reserve)."""
        low_pass_rate = low_pass_rate if low_pass_rate is not None else max(input_rate, output_rate)
        cfg = configure(input_rate, output_rate, low_pass_rate,
                        radius=self.model.radius, resolution=self.model.resolution)
        if cfg is None or cfg.integer_stretched_kernel_radius > self._radius_bound:
            return False
        self._set_config(cfg, fx.calculate_ratio(input_rate, output_rate))
        return True

    # ------------------------------------------------------------------
    # Device-side staging ops (jitted; fill/shift are dynamic scalars;
    # stagings is the per-lane-slice buffer tuple, updated in ONE program).
    @staticmethod
    @partial(jax.jit, static_argnames=("total_lanes",))
    def _dev_stage(stagings, chunk, fill, total_lanes):
        b, n, c = chunk.shape
        rows = chunk.astype(jnp.int32).transpose(1, 0, 2).reshape(n, b * c)
        rows = jnp.pad(rows, ((0, 0), (0, total_lanes - b * c)))
        outs, off = [], 0
        for st in stagings:
            w = st.shape[1]
            outs.append(jax.lax.dynamic_update_slice(
                st, rows[:, off : off + w], (fill, 0)))
            off += w
        return tuple(outs)

    @staticmethod
    @jax.jit
    def _dev_shift(stagings, shift, keep):
        outs = []
        for st in stagings:
            rolled = jnp.roll(st, -shift, axis=0)
            row = jnp.arange(st.shape[0], dtype=jnp.int32)[:, None]
            outs.append(jnp.where(row < keep, rolled, 0))
        return tuple(outs)

    @staticmethod
    @jax.jit
    def _dev_zero_rows(stagings, fill, n):
        outs = []
        for st in stagings:
            row = jnp.arange(st.shape[0], dtype=jnp.int32)[:, None]
            mask = (row >= fill) & (row < fill + n)
            outs.append(jnp.where(mask, 0, st))
        return tuple(outs)

    # ------------------------------------------------------------------
    def _natural_count(self, total_frames: int) -> int:
        num = ((total_frames - self.position_integer) << 16) - self.position_fractional
        return 0 if num <= 0 else -(-num // self.increment)

    def _launch_specs(self, n_out: int) -> tuple[list, int]:
        """(specs, lane_splits): sub-launch descriptors producing frames
        [0, n_out) from the staging buffer, as [(tile, state, plan_tuple)...]
        ordered frame-tile-major with ``lane_splits`` consecutive lane-slice
        specs per frame tile.

        Frame-tiled into <= 2^14-frame sub-launches: device positions come
        from fx.positions_from_state, which is int32-exact only for n < 2^15
        (f0 + n*inc_lo must stay below 2^31); p0/f0 advance host-side in
        exact Python ints between tiles, like LowLevelResampler._compute_frames.
        Lane-split into <= ~LANE_SPLIT-wide zero-copy column slices (see
        LANE_SPLIT). Plan tuples are the static halves of
        ops.pallas_resample.multi_resample launches, so a MixedStreamFarm can
        fuse every group's sub-launches into ONE device program.
        """
        if self._max_taps <= FAST_KERNEL_MAX_TAPS:
            plan = plan_uniform(self.increment, 0)
            kind, d, cand = plan["kernel"], plan.get("d"), plan.get("cand")
        else:
            kind = None   # past the fast-kernel guard: wide unconditionally
        # Launch at the CURRENT ratio's tap width class, not the farm's
        # reserved bound: precompute_launch's geometry is config-driven and
        # its kv columns are masked at the per-frame tap count, so any
        # launch width >= the current class is bit-exact — and the kernels'
        # MAC volume (and the wide kernel's per-window DMA span) scale with
        # the LAUNCH width. An adjusted-down farm used to MAC the whole
        # reserve: the config-4 pitch-bend sweep (reserve 16, five of eight
        # rates in the 8-tap class) measured 1.36x faster same-window with
        # current-width launches, bit-exact on device (benchmarks/RESULTS.md
        # round 5). Recompiles stay bounded: widths bucket to multiples of
        # 8, and a re-rate already recompiles via its n_pad change.
        taps_launch = min(
            self._max_taps,
            fx.round_up(2 * self.config.integer_stretched_kernel_radius, 8),
        )
        # The crossover consults the farm's WIDEST lane slice: the kind is
        # per-farm (every slice shares the fused multi_resample program), so
        # a mixed-width farm whose widest slice crosses over sends its
        # 128-wide slices wide too, where taps 272-392 measured 0.69-0.95x
        # the general roll kernel — a deliberate tradeoff (the multi-lane
        # majority's 2.3-8.8x win dominates; per-slice kinds would split the
        # fused program per chunk).
        route_wide = kind is None or wide_serves(
            kind, taps_launch, lanes=max(w for w, _ in self._lane_slices)
        )
        if not route_wide and kind == "general":
            # The general kernel's compile envelope is TIGHTER than the
            # tiled row budget (general_launch_fits, measured round 4):
            # multi-lane-tile launches double-buffer the (S, 128) input
            # block and medium tap widths shrink the ceiling to 8192 rows.
            # No legal frame group at this staging shape -> the DMA wide
            # kernel, NOT the gather oracle: in the shapes that fail here
            # (shift-band taps at over-ceiling capacities, multi-lane) the
            # wide kernel at its width-dependent launch bound measured
            # 6.0 Gsamples/s vs the oracle's 1.2 at taps 40 x 512 lanes —
            # ~5x, and at parity with the general kernel's in-envelope rate
            # (benchmarks/RESULTS.md round-5 envelope-failure note). Its
            # buffer-safety argument is the same slack inequality as the
            # crossover band below.
            lane_w = max(w for w, _ in self._lane_slices)
            if general_pick_group(
                256, self._capacity, lane_w, taps_launch
            ) is None:
                route_wide = True
        if route_wide:
            # DMA-based wide kernel (see ops.resample_wide_taps) — past the
            # fast-kernel guard unconditionally, for general-class launches
            # past the measured medium-width crossover
            # (WIDE_DISPATCH_MIN_TAPS / _MULTI), and for general-class
            # staging shapes outside the compile envelope. The staging
            # buffer stays in HBM, so no VMEM row budget applies; launches
            # are capped at the wide kernel's frame bound. The reserved-width
            # read (max_taps + 8 per window) is covered by the tiled/general
            # slack, which is >= radius_bound + 16
            # (window_rows_needed(max_taps) >= 2*radius_bound alone).
            from clownresampler_tpu.ops.pallas_resample import (
                wide_max_launch_frames,
            )

            kind, d, cand = "wide", self.increment >> 16, None
            step = wide_max_launch_frames(taps_launch)
        else:
            if kind == "tiled" and self._capacity > VMEM_SAFE_INPUT_ROWS:
                kind, d, cand = "oracle", None, None  # Mosaic VMEM safety
            step = MAX_LAUNCH_OUTPUT_FRAMES
        # Padding granularity per kernel: tiled needs 8*group (64 for small
        # emits, 256 once a tile can carry group 32 — the round-5 honest
        # group sweep measured 32 at 0.615 ms vs 8 at 0.776 on the 2048-lane
        # headline launch; "fleets prefer 8" was a dead-carry-era artifact),
        # the general and polyphase strided kernels 8*group=256, the XLA
        # strided path and the oracle only 8.
        grain = {"tiled": 64, "strided": 256, "strided_xla": 8,
                 "general": 256, "wide": 8, "oracle": 8}[kind]
        # Staging keeps a fixed R_BOUND-row left halo; the C window contract
        # (clownresampler.h:725-733) puts the buffer origin only `radius` rows
        # before the data, so shift launch positions by the difference when
        # the current radius is narrower than the reserved bound.
        halo_shift = self._radius_bound - self.config.integer_stretched_kernel_radius

        if kind == "strided":
            # The polyphase kernels over-read strided_phase_padding rows past
            # the last frame's window; if the staging buffer (whose slack may
            # not have been reserved for this stride — see __init__) cannot
            # honour that contract for the WORST launch of this emit,
            # downgrade to the XLA strided path, which only reads the frame
            # span. Worst case: the final frame tile.
            last_done = ((n_out - 1) // step) * step if n_out > 0 else 0
            worst_tile = n_out - last_done
            n_pad_w = fx.round_up(max(worst_tile, grain), grain)
            t_w = self.position_fractional + last_done * self.increment
            p0_w = self.position_integer + (t_w >> 16) + halo_shift
            need = (
                p0_w + 1 + (n_pad_w - 256) * d
                + strided_phase_padding(taps_launch, d, 32)
            )
            if need > self._capacity:
                kind = "strided_xla"
                grain = 8

        specs = []
        done = 0
        while done < n_out:
            tile = min(n_out - done, step)
            grain_t = 256 if kind == "tiled" and tile >= 1024 else grain
            n_pad = fx.round_up(max(tile, grain_t), grain_t)
            t = self.position_fractional + done * self.increment
            p0 = self.position_integer + (t >> 16) + halo_shift
            f0 = t & 0xFFFF
            state = make_device_state(p0, f0, self.config, self.increment)
            plan_t = (kind, d, cand, taps_launch, n_pad, self.clamp_s16)
            if kind == "tiled" and n_pad % 256 == 0:
                plan_t = plan_t + (None, 0, 32)
            for split_idx in range(len(self._lane_slices)):
                specs.append((tile, split_idx, state, plan_t))
            done += tile
        return specs, len(self._lane_slices)

    def _spec_tstr(self, specs: list) -> tuple:
        """Per-spec strided kernel table (the fast row-gather LUT layout)
        for the kinds whose precompute gathers per-frame taps; None for the
        strided/oracle kinds (constant-fraction geometry / plain gather)."""
        # Keyed on the PLAN's width (the current ratio's class, which may be
        # narrower than the farm reserve); strided_table_device caches per
        # config, so repeated lookups are free.
        return tuple(
            strided_table_device(
                self.model.radius, self.model.resolution,
                self.config.kernel_step_size, p[3],
            ) if p[0] in ("tiled", "general", "wide") else None
            for *_, p in specs
        )

    def _spec_inputs(self, specs: list) -> tuple:
        """The per-spec input buffer tuple (device path: the independent
        per-slice buffers; host path: uploaded column slices)."""
        if self._device_staging:
            return tuple(self._staging[si] for _, si, _, _ in specs)
        slices = [
            jnp.asarray(np.ascontiguousarray(self._staging[:, off : off + w]))
            for w, off in self._lane_slices
        ]
        return tuple(slices[si] for _, si, _, _ in specs)

    def _collect_parts(self, specs: list, outs: list, lane_splits: int) -> np.ndarray:
        parts = []
        for t in range(0, len(specs), lane_splits):
            tile = specs[t][0]
            if lane_splits == 1:
                part = np.asarray(outs[t])
            else:
                part = np.concatenate(
                    [np.asarray(o) for o in outs[t : t + lane_splits]], axis=1
                )
            parts.append(part[:tile])
        return parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)

    def _launch(self, n_out: int) -> np.ndarray:
        """Run the best kernel(s) for the current plan over the staging
        buffers as one device program."""
        specs, lane_splits = self._launch_specs(n_out)
        outs = multi_resample(
            self._table,
            self._spec_inputs(specs),
            tuple(state for _, _, state, _ in specs),
            tuple(plan for *_, plan in specs),
            interpret=self.interpret,
            tstrs=self._spec_tstr(specs),
        )
        return self._collect_parts(specs, outs, lane_splits)

    def _emit(self, total_frames: int) -> np.ndarray:
        """Produce every frame available against `total_frames` of data, then
        slide the staging window (LowLevel position carry, 1063-1068)."""
        n_out = self._natural_count(total_frames)
        lanes_out = self._launch(n_out) if n_out > 0 else None
        return self._finish_emit(total_frames, n_out, lanes_out)

    def _finish_emit(
        self, total_frames: int, n_out: int, lanes_out: Optional[np.ndarray],
        defer_slide: bool = False,
    ) -> np.ndarray:
        """De-interleave launched lanes, advance the phase, slide the staging
        window. Split from _emit so MixedStreamFarm can run every group's
        launches as one combined device program between the two halves;
        defer_slide additionally parks the device shift in _pending_slide for
        the caller to fuse across groups."""
        out_dtype = np.int16 if self.clamp_s16 else np.int32
        if n_out > 0:
            if self.clamp_s16:
                # int16 lanes: plain numpy de-interleave (the native engine's
                # unstage is int32-specific).
                bc = self.n_streams * self.channels
                result = np.ascontiguousarray(
                    lanes_out[:, :bc]
                    .reshape(-1, self.n_streams, self.channels)
                    .transpose(1, 0, 2)
                )
            else:
                result = native.unstage_output(lanes_out, self.n_streams, self.channels)
        else:
            result = np.zeros((self.n_streams, 0, self.channels), out_dtype)

        t = self.position_fractional + n_out * self.increment
        self.position_integer += t >> 16
        self.position_fractional = t & 0xFFFF
        consumed = min(self.position_integer, total_frames)
        self.position_integer -= consumed
        # Slide out consumed frames; retain everything after them (incl. halo).
        keep = self._fill - consumed
        if consumed:
            if self._device_staging and defer_slide:
                # MixedStreamFarm fuses every group's slide into ONE device
                # program after distributing results (see _pending_slide).
                self._pending_slide = (consumed, keep)
            elif self._device_staging:
                self._staging = self._dev_shift(
                    self._staging, jnp.int32(consumed), jnp.int32(keep)
                )
            else:
                native.shift_rows(self._staging, keep, consumed)
        self._fill = keep
        return result

    def _stage_prepare(self, chunk: np.ndarray) -> np.ndarray:
        """Validate a chunk against the staging contract (host-side half of
        _stage, split out so MixedStreamFarm can fuse every group's device
        staging op into one program)."""
        chunk = np.ascontiguousarray(chunk, dtype=np.int16)
        b, n, c = chunk.shape
        assert b == self.n_streams and c == self.channels and n <= self.chunk_frames
        if self._fill + n > self._capacity:
            raise ValueError("staging overflow: feed chunks of at most chunk_frames")
        return chunk

    def _stage_commit(self, n: int) -> int:
        """Advance the fill cursor after the staging write; returns the
        consumable frame count (the last `radius` data rows stay held back
        until more data or flush arrives — the high-level buffer's early
        `input_buffer_end`, 1154)."""
        self._fill += n
        return self._fill - 2 * self._radius_bound

    def _gather_lanes(self, lane_lo: int, width: int) -> np.ndarray:
        """Read staged columns [lane_lo, lane_lo+width) back to the host
        (used when a stream migrates between farms, e.g. per-stream adjust)."""
        if self._device_staging:
            parts = []
            for (w, off), buf in zip(self._lane_slices, self._staging):
                lo = max(lane_lo, off)
                hi = min(lane_lo + width, off + w)
                if lo < hi:
                    parts.append(np.asarray(buf[:, lo - off : hi - off]))
            return np.concatenate(parts, axis=1)
        return np.array(self._staging[:, lane_lo : lane_lo + width])

    def _seed_lanes(self, lane_lo: int, data: np.ndarray) -> None:
        """Overwrite staged columns [lane_lo, lane_lo+data.shape[1]) with
        host rows (the inverse of _gather_lanes; rows beyond data are kept)."""
        r, width = data.shape
        if self._device_staging:
            new = []
            for (w, off), buf in zip(self._lane_slices, self._staging):
                lo = max(lane_lo, off)
                hi = min(lane_lo + width, off + w)
                if lo < hi:
                    host = np.asarray(buf)
                    host[:r, lo - off : hi - off] = data[:, lo - lane_lo : hi - lane_lo]
                    buf = jnp.asarray(host)
                new.append(buf)
            self._staging = tuple(new)
        else:
            self._staging[:r, lane_lo : lane_lo + width] = data

    def _stage(self, chunk: np.ndarray) -> int:
        """Stage one input chunk; returns the consumable frame count."""
        chunk = self._stage_prepare(chunk)
        if self._device_staging:
            self._staging = self._dev_stage(
                self._staging, jnp.asarray(chunk), jnp.int32(self._fill),
                total_lanes=self._lanes,
            )
        else:
            native.stage_chunk(chunk, self._staging, self._fill)
        return self._stage_commit(chunk.shape[1])

    def process(self, chunk: np.ndarray) -> np.ndarray:
        """Feed (n_streams, n, channels) int16; returns (n_streams, m, channels)
        wide int32 output frames (m varies with phase, ~n*out_rate/in_rate)."""
        total = self._stage(chunk)
        out_dtype = np.int16 if self.clamp_s16 else np.int32
        return self._emit(total) if total > 0 else np.zeros(
            (self.n_streams, 0, self.channels), out_dtype
        )

    def flush(self) -> np.ndarray:
        """Feed `radius` zero frames and drain (ResampleEnd, 1242-1250)."""
        r = self._radius_bound
        if self._device_staging:
            self._staging = self._dev_zero_rows(
                self._staging, jnp.int32(self._fill), jnp.int32(r)
            )
        else:
            native.zero_rows(self._staging, self._fill, r)
        self._fill += r
        total = self._fill - 2 * self._radius_bound
        return self._emit(max(total, 0))


class MixedStreamFarm:
    """Streams at heterogeneous ratios, grouped per-ratio into uniform farms.

    Streams share nothing (SURVEY.md section 2: no cross-stream communication
    exists to replicate), so a mixed fleet decomposes exactly into one
    UniformStreamFarm per distinct (rates, lpf) triple — and every group's
    kernel launches for a chunk are FUSED into one device program
    (ops.pallas_resample.multi_resample): this environment has a flat
    ~30 us per-program dispatch floor, so G separate group launches cost
    ~G x more than one combined program at small group sizes (the round-1
    config-5 gap). Each group still runs its own plan-specialised kernel at
    full speed inside the combined program, which dominates a per-lane-group
    ragged kernel (that would force every group onto the general per-frame
    code path to unify the kernel statics). This is the BASELINE.json
    config-5 "mixed-ratio transcode farm" as an API.

    ``specs`` is a list of per-stream (input_rate, output_rate[, lpf]) tuples.
    ``process`` takes/returns per-stream lists (outputs differ in length per
    ratio). Per-stream re-rating is :meth:`adjust_stream` (the re-rated
    stream splits into its own phase-carrying group); whole-fleet re-rating
    of a uniform group is its farm's ``adjust``.
    """

    def __init__(self, specs, channels: int, chunk_frames: int = 4096,
                 model: KernelModel = DEFAULT_MODEL, interpret: bool = False,
                 max_radius: Optional[int] = None, clamp_s16: bool = False):
        self.channels = channels
        self.n_streams = len(specs)
        self.chunk_frames = chunk_frames
        self.model = model
        self.interpret = interpret
        self.max_radius = max_radius
        self.clamp_s16 = clamp_s16
        # [(farm, members)]: members[j] is the stream id occupying the farm's
        # lane slot j, or None for a slot vacated by adjust_stream (fed zeros,
        # its output discarded). Groups are identified by position, not ratio:
        # a re-rated stream carries its own phase, so two groups may share a
        # ratio but differ in phase lineage.
        self._groups: list[list] = []
        norm = []
        for spec in specs:
            in_rate, out_rate = spec[0], spec[1]
            lpf = spec[2] if len(spec) > 2 else max(in_rate, out_rate)
            norm.append((in_rate, out_rate, lpf))
        by_key: dict[tuple, int] = {}
        for i, key in enumerate(norm):
            if key not in by_key:
                farm = self._make_group_farm(
                    sum(1 for k in norm if k == key), key,
                    max_radius=max_radius,
                )
                by_key[key] = len(self._groups)
                self._groups.append([farm, []])
            self._groups[by_key[key]][1].append(i)

    def _make_group_farm(self, n_streams: int, rates: tuple,
                         max_radius: Optional[int] = None,
                         capacity_rows: Optional[int] = None) -> UniformStreamFarm:
        """Group-farm factory (ShardedMixedStreamFarm overrides this to build
        mesh-sharded groups)."""
        return UniformStreamFarm(
            n_streams, self.channels, *rates,
            chunk_frames=self.chunk_frames, model=self.model,
            interpret=self.interpret, max_radius=max_radius,
            clamp_s16=self.clamp_s16, capacity_rows=capacity_rows,
        )

    def _run_combined_launch(self, table, xs, states, plans, tstrs,
                             interpret) -> list:
        """Run every group's sub-launches as ONE device program
        (ShardedMixedStreamFarm overrides this with a shard_map version)."""
        return list(
            multi_resample(
                table, tuple(xs), tuple(states), tuple(plans),
                interpret=interpret, tstrs=tuple(tstrs),
            )
        )

    def adjust_stream(self, i: int, input_rate: int, output_rate: int,
                      low_pass_rate: Optional[int] = None) -> bool:
        """Re-rate ONE stream mid-stream (the reference's per-stream Adjust,
        clownresampler.h:1052-1056, at batch scale): position carries over,
        only the increment/stretching change; every other stream is
        untouched.

        A stream's phase is its own after an adjust, so it can no longer
        share a uniform launch with its old group: the stream is split into
        its own single-stream farm seeded with its current phase and staged
        samples, and its old lane slot is retired (fed zeros). Subsequent
        adjusts on the same stream are then in-place on its private farm.
        Fails (returns False, nothing changes) if the new ratio is
        unsupported or its radius exceeds the construction-time bound, like
        HighLevel_Adjust (clownresampler.h:1183-1209)."""
        low_pass_rate = (low_pass_rate if low_pass_rate is not None
                         else max(input_rate, output_rate))
        for group in self._groups:
            farm, members = group
            if i in members:
                break
        else:
            raise IndexError(f"no stream {i}")
        if sum(1 for m in members if m is not None) == 1:
            return farm.adjust(input_rate, output_rate, low_pass_rate)
        # Validate against the source farm's reserved radius bound BEFORE any
        # surgery (transactional, like HighLevel_Adjust's backup/rollback).
        cfg = configure(input_rate, output_rate, low_pass_rate,
                        radius=farm.model.radius, resolution=farm.model.resolution)
        if cfg is None or cfg.integer_stretched_kernel_radius > farm._radius_bound:
            return False
        j = members.index(i)
        solo = self._make_group_farm(
            1, (input_rate, output_rate, low_pass_rate),
            max_radius=farm._radius_bound,
            # Force identical staging geometry: the strided-slack reservation
            # depends on the primary ratio, so a solo farm built for the NEW
            # ratio could otherwise size its buffer differently from the
            # source (round-2 advisor finding: AssertionError on migration).
            capacity_rows=farm._capacity,
        )
        assert solo._capacity == farm._capacity
        solo.position_integer = farm.position_integer
        solo.position_fractional = farm.position_fractional
        solo._fill = farm._fill
        lane_lo = j * self.channels
        if farm._device_staging and solo._device_staging:
            # Migrate the stream's staged lanes entirely on device: one jitted
            # slice+scatter program, no host round-trip mid-stream (repeated
            # host transfers interleaved with launches permanently degrade the
            # relay-tunneled dispatch path — see benchmarks/RESULTS.md).
            cols = []
            for bi, (w, off) in enumerate(farm._lane_slices):
                lo = max(lane_lo, off)
                hi = min(lane_lo + self.channels, off + w)
                if lo < hi:
                    cols.append((bi, lo - off, hi - off))
            migrated = self._dev_migrate_lanes(
                farm._staging, cols=tuple(cols),
                dst_shape=(solo._capacity, solo._lanes),
            )
            sharding = getattr(solo, "_sharding", None)  # mesh-sharded solo
            if sharding is not None:
                migrated = jax.device_put(migrated, sharding)
            solo._staging = (migrated,)
        else:
            staged = farm._gather_lanes(lane_lo, self.channels)
            solo._seed_lanes(0, staged[: solo._capacity])
        members[j] = None
        self._groups.append([solo, [i]])
        return True

    @staticmethod
    @partial(jax.jit, static_argnames=("cols", "dst_shape"))
    def _dev_migrate_lanes(src_bufs, cols, dst_shape):
        """Build a solo farm's staging buffer from column slices of the source
        farm's per-slice buffers, entirely on device. ``cols`` is a static
        tuple of (buffer_index, lo, hi) column ranges (a stream's channel
        lanes may straddle a lane-slice boundary); rows are copied verbatim
        (capacities match by construction), remaining lanes are zero."""
        parts = [src_bufs[bi][:, lo:hi] for bi, lo, hi in cols]
        data = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        out = jnp.zeros(dst_shape, jnp.int32)
        return jax.lax.dynamic_update_slice(out, data, (0, 0))

    # Fused per-group device staging ops: one compiled program stages (or
    # slides) EVERY group's buffers, instead of one ~30 us dispatch per group
    # per chunk (same flat-dispatch-floor argument as the fused launches).
    @staticmethod
    @partial(jax.jit, static_argnames=("lanes_list",))
    def _dev_stage_groups(stagings_list, chunks, fills, lanes_list):
        return tuple(
            UniformStreamFarm._dev_stage(st, ch, f, total_lanes=tl)
            for st, ch, f, tl in zip(stagings_list, chunks, fills, lanes_list)
        )

    @staticmethod
    @jax.jit
    def _dev_shift_groups(stagings_list, shifts, keeps):
        return tuple(
            UniformStreamFarm._dev_shift(st, sh, k)
            for st, sh, k in zip(stagings_list, shifts, keeps)
        )

    def process(self, chunks: list) -> list:
        """chunks[i]: (n, channels) int16 for stream i (equal n per call).
        Returns outputs[i]: (m_i, channels) int32 (m varies per ratio).

        The whole chunk cycle runs as THREE device programs regardless of
        group count: one fused staging write, one fused multi-kernel launch,
        one fused staging slide (see class docstring for the dispatch-floor
        rationale).
        """
        # Stage every group's chunk (one fused program when device-resident),
        # collect each group's sub-launch specs. Vacated lane slots (None
        # members, retired by adjust_stream) are fed zeros.
        live = [i for _, members in self._groups for i in members if i is not None]
        zeros = np.zeros_like(np.asarray(chunks[live[0]], np.int16))
        staged = []  # (farm, members, batch)
        for farm, members in self._groups:
            batch = farm._stage_prepare(
                np.stack([
                    zeros if i is None else np.asarray(chunks[i], np.int16)
                    for i in members
                ])
            )
            staged.append((farm, members, batch))
        dev_farms = [t for t in staged if t[0]._device_staging]
        if dev_farms:
            new_stagings = self._dev_stage_groups(
                tuple(f._staging for f, _, _ in dev_farms),
                tuple(jnp.asarray(b) for _, _, b in dev_farms),
                tuple(jnp.int32(f._fill) for f, _, _ in dev_farms),
                lanes_list=tuple(f._lanes for f, _, _ in dev_farms),
            )
            for (f, _, _), st in zip(dev_farms, new_stagings):
                f._staging = st
        pending = []  # (farm, members, total, n_out, specs, lane_splits)
        for farm, members, batch in staged:
            if not farm._device_staging:
                native.stage_chunk(batch, farm._staging, farm._fill)
            total = farm._stage_commit(batch.shape[1])
            n_out = farm._natural_count(total) if total > 0 else 0
            specs, lane_splits = farm._launch_specs(n_out) if n_out > 0 else ([], 1)
            pending.append((farm, members, total, n_out, specs, lane_splits))

        # One combined launch across every group's specs.
        xs, states, plans, tstrs = [], [], [], []
        for farm, _, _, _, specs, _ in pending:
            xs.extend(farm._spec_inputs(specs))
            tstrs.extend(farm._spec_tstr(specs))
            for _, _si, state, plan in specs:
                states.append(state)
                plans.append(plan)
        if xs:
            table = pending[0][0]._table  # groups share the kernel model
            interpret = pending[0][0].interpret
            outs = self._run_combined_launch(
                table, xs, states, plans, tstrs, interpret
            )
        else:
            outs = []

        # Distribute results and run each group's bookkeeping; device slides
        # are parked (defer_slide) and fused into one program at the end.
        outputs: list = [None] * self.n_streams
        cursor = 0
        for farm, members, total, n_out, specs, lane_splits in pending:
            if n_out > 0:
                lanes_out = farm._collect_parts(
                    specs, outs[cursor : cursor + len(specs)], lane_splits
                )
                cursor += len(specs)
            else:
                lanes_out = None
            if total > 0:
                out = farm._finish_emit(total, n_out, lanes_out, defer_slide=True)
            else:
                dtype = np.int16 if farm.clamp_s16 else np.int32
                out = np.zeros((farm.n_streams, 0, farm.channels), dtype)
            for j, i in enumerate(members):
                if i is not None:
                    outputs[i] = out[j]
        sliding = [f for f, *_ in pending if f._pending_slide is not None]
        if sliding:
            new_stagings = self._dev_shift_groups(
                tuple(f._staging for f in sliding),
                tuple(jnp.int32(f._pending_slide[0]) for f in sliding),
                tuple(jnp.int32(f._pending_slide[1]) for f in sliding),
            )
            for f, st in zip(sliding, new_stagings):
                f._staging = st
                f._pending_slide = None
        return outputs

    def flush(self) -> list:
        outputs: list = [None] * self.n_streams
        for farm, members in self._groups:
            out = farm.flush()
            for j, i in enumerate(members):
                if i is not None:
                    outputs[i] = out[j]
        return outputs

"""Low-level streaming API: phase-accumulator state over pre-padded input.

Functional re-expression of ClownResampler_LowLevel_{Init,Adjust,Resample}
(clownresampler.h:640-648, 1039-1094). The reference runs a sequential
per-output-frame loop whose only state is the 16.16 phase accumulator; between
Adjust calls the accumulation is linear, so output frame n has the closed-form
position  t(n) = f0 + n*increment,  pos(n) = p0 + (t >> 16),
frac(n) = t & 0xFFFF  — which turns the loop into one batched device
computation per chunk.

Two layers are provided:

* ``resample_chunk`` — pure, jit-able: static-shape output tile + masks, with
  the reference's exact termination bookkeeping (position carry on input
  exhaustion, clownresampler.h:1063-1068; rewind on output-full, 1084-1088).
  This is the building block for the batched/sharded/Pallas perf paths.

* ``LowLevelResampler`` — host streaming class mirroring the C API surface,
  including the per-frame output-callback contract. Bookkeeping uses exact
  Python ints (no overflow for arbitrarily long streams); the math runs on
  device through the same convolution core.

Input padding contract is the reference's (clownresampler.h:725-733): the
buffer must carry ``integer_stretched_kernel_radius`` extra frames before and
after the chunk, holding neighbouring stream data (or zeros at stream edges),
not counted in ``total_input_frames``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clownresampler_tpu import fixedpoint as fx
from clownresampler_tpu.configure import Configuration, configure
from clownresampler_tpu.models import DEFAULT_MODEL, KernelModel
from clownresampler_tpu.ops.convolve import ConfigScalars, convolve_frames

# Keep n*increment_lo inside int32 (fixedpoint.positions_from_state).
MAX_CHUNK_OUTPUT_FRAMES = 1 << 14

# Width guard for the VMEM-resident fast paths. The reference accepts any
# ratio with kernel_scale < 0x1000 (clownresampler.h:974-975), i.e. stretched
# radius up to 3*4096 and tap windows up to ~24,576 — but the VMEM Pallas
# kernels keep their window loads on-chip (power-of-two rows scaling with
# taps) and the XLA strided fallback unrolls one slice per tap, so very wide
# kernels would blow the VMEM budget / compile forever. Beyond this bound the
# TPU dispatchers run the DMA-based wide kernel
# (ops.pallas_resample.resample_wide_taps: input stays in HBM, one
# double-buffered DMA per frame — covers the full accepted domain), and
# non-TPU paths use the XLA gather oracle (ops/convolve.py). Bit-exactness
# across the boundary: tests/test_pallas.py, tests/test_property_fuzz.py,
# tools/verify_tpu.py.
FAST_KERNEL_MAX_TAPS = 1024


class DeviceState(NamedTuple):
    """Traced int32 mirror of ClownResampler_LowLevel_State (640-648)."""

    position_integer: jnp.ndarray
    position_fractional: jnp.ndarray
    cfg: ConfigScalars


def make_device_state(
    position_integer: int, position_fractional: int, cfg: Configuration, increment: int
) -> DeviceState:
    return DeviceState(
        position_integer=jnp.asarray(position_integer, jnp.int32),
        position_fractional=jnp.asarray(position_fractional, jnp.int32),
        cfg=ConfigScalars.from_configuration(cfg, increment),
    )


def natural_output_count(p0, f0, inc_hi, inc_lo, total_input_frames):
    """Number of frames the reference loop produces before the position check
    (clownresampler.h:1063) trips: smallest n with p0 + ((f0+n*inc) >> 16) >= N,
    i.e. ceil(((N - p0) << 16 - f0) / inc), clamped at 0.

    int32-safe for N < 2^14 (callers tile larger inputs).
    """
    num = ((total_input_frames - p0) << 16) - f0
    inc = (inc_hi << 16) + inc_lo  # increments that large force tiny N; see note
    n = jnp.where(num > 0, (num + inc - 1) // jnp.maximum(inc, 1), 0)
    return n


@partial(jax.jit, static_argnames=("max_taps", "n_out"))
def resample_chunk(
    table,
    padded_input,         # (N_in + 2*radius_max, C) int16
    total_input_frames,   # int32 scalar: frames, excluding padding
    state: DeviceState,
    output_quota,         # int32 scalar: max frames to emit this call
    *,
    max_taps: int,
    n_out: int,           # static output tile capacity
):
    """One LowLevel_Resample call as a pure function.

    Returns (output (n_out, C) int32 zero-masked past ``produced``, produced,
    consumed, new_state, input_exhausted) with the reference's exact return
    semantics: ``input_exhausted`` mirrors the cc_true/cc_false return of
    clownresampler.h:1058-1092 — true iff the position check exited the loop,
    which requires strictly fewer natural frames than the output quota (when
    the quota trips on the final frame the reference reports output-full).
    """
    assert n_out <= MAX_CHUNK_OUTPUT_FRAMES
    p0 = state.position_integer
    f0 = state.position_fractional
    inc_hi = state.cfg.increment_hi
    inc_lo = state.cfg.increment_lo

    natural = natural_output_count(p0, f0, inc_hi, inc_lo, total_input_frames)
    quota = jnp.minimum(output_quota, jnp.int32(n_out))
    produced = jnp.minimum(natural, quota)

    n = jnp.arange(n_out, dtype=jnp.int32)
    pos, frac = fx.positions_from_state(p0, f0, inc_hi, inc_lo, n)

    out = convolve_frames(table, padded_input, pos, frac, state.cfg, max_taps)
    out = jnp.where((n < produced)[:, None], out, 0)

    # Advance state past the produced frames, then apply the unified
    # carry/rewind: delta = min(position, N) covers both exit paths
    # (input-exhausted carry 1063-1068 and output-full rewind 1084-1088).
    p_after, f_after = fx.positions_from_state(p0, f0, inc_hi, inc_lo, produced)
    delta = jnp.minimum(p_after, total_input_frames)
    consumed = delta
    new_state = DeviceState(
        position_integer=p_after - delta,
        position_fractional=f_after,
        cfg=state.cfg,
    )
    input_exhausted = natural < quota
    return out, produced, consumed, new_state, input_exhausted


@partial(jax.jit, static_argnames=("max_taps", "n_out", "radius"))
def resample_scan(
    table,
    chunks,              # (K, n_in, L) int16/int32: K successive input chunks
    state: DeviceState,  # cfg radius must equal `radius`
    *,
    max_taps: int,
    n_out: int,          # static per-chunk output cap; use
                         # ((n_in + 2*radius) << 16) // increment + slack so the
                         # initial radius backlog can drain through any one step
    radius: int,         # static integer_stretched_kernel_radius
):
    """Whole-stream resampling as ONE jitted lax.scan over input chunks.

    The reference's high-level layer refills a staging buffer and memmoves a
    2*radius dead-zone halo between refills (clownresampler.h:1143-1154); here
    the halo is the scan carry: each step assembles [halo | chunk], resamples
    every frame visible against n_in (position carry keeps the leftover
    fraction in the state, 1063-1068), and hands the trailing 2*radius rows to
    the next step. No host round-trips between chunks — the entire stream
    pipeline is a single device computation.

    Returns (outputs (K, n_out, L) int32 zero-masked, produced (K,), state',
    backlog bool). ``backlog`` is True iff some step's natural frame count
    exceeded the static ``n_out`` cap — the caller undersized n_out and
    backlogged frames' windows may have slid out of the carried halo, so the
    outputs are NOT trustworthy; size n_out by the rule above.
    Leading edge: seed the first halo with zeros (done here); trailing edge:
    append a radius-frame zero chunk to flush, as ResampleEnd does (1242-1250).
    """
    k, n_in, l = chunks.shape
    # natural_output_count shifts (n_in - p0) left by 16 in int32.
    assert n_in < 1 << 14, "scan chunks must be < 2^14 frames (tile longer input)"
    halo0 = jnp.zeros((2 * radius, l), chunks.dtype)

    # Buffer row r maps to stream frame r - 2*radius (the halo occupies the
    # first 2*radius rows), while the C window contract puts stream frame 0 at
    # row `radius` (clownresampler.h:725-733). Bias positions by +radius going
    # in and strip it from the returned state.
    state = DeviceState(
        position_integer=state.position_integer + jnp.int32(radius),
        position_fractional=state.position_fractional,
        cfg=state.cfg,
    )

    def step(carry, chunk):
        st, halo = carry
        buffer = jnp.concatenate([halo, chunk], axis=0)
        natural = natural_output_count(
            st.position_integer,
            st.position_fractional,
            st.cfg.increment_hi,
            st.cfg.increment_lo,
            jnp.int32(n_in),
        )
        out, produced, _consumed, st2, _flag = resample_chunk(
            table,
            buffer,
            jnp.int32(n_in),
            st,
            jnp.int32(1 << 30),
            max_taps=max_taps,
            n_out=n_out,
        )
        new_halo = jax.lax.slice_in_dim(buffer, n_in, n_in + 2 * radius, axis=0)
        return (st2, new_halo), (out, produced, natural > jnp.int32(n_out))

    (state_out, _halo), (outputs, produced, over) = jax.lax.scan(
        step, (state, halo0), chunks
    )
    state_out = DeviceState(
        position_integer=state_out.position_integer - jnp.int32(radius),
        position_fractional=state_out.position_fractional,
        cfg=state_out.cfg,
    )
    return outputs, produced, state_out, jnp.any(over)


@partial(
    jax.jit,
    static_argnames=("max_taps", "n_out", "radius", "increment", "interpret",
                     "split", "pipeline"),
)
def resample_scan_fused(
    table,
    chunks,              # (K, n_in, L) int16/int32
    state: DeviceState,
    *,
    max_taps: int,
    n_out: int,          # per-chunk cap: ((n_in + 2*radius) << 16)//inc + slack,
                         # rounded up to the engine grain (64/8/128; 128 covers all)
    radius: int,
    increment: int,      # static 16.16 increment: selects the kernel class
    interpret: bool = False,
    table_strided=None,  # KernelModel.strided_table(step, max_taps): fast LUT rows
    split: int = 1,      # independent lane-column sub-fleets per scan step
    pipeline: bool = True,   # double-buffer the staged input across steps
):
    """resample_scan with the fastest kernel for ``increment`` as the engine.

    Same semantics as resample_scan (one jitted lax.scan, halo carry, radius
    position bias) but each step runs the plan_uniform-selected fused path —
    tiled Pallas (increment < 2^17), polyphase/XLA strided (exact integer
    stride), or the general per-frame Pallas kernel (wide non-integer
    downsampling) — so the fully-fused whole-stream pipeline covers every
    ratio class the reference accepts (the high-level chunk loop,
    clownresampler.h:1138-1173, as one device computation for ANY ratio).

    ``split`` runs the fleet as that many INDEPENDENT sub-fleets of L/split
    lanes inside the same scan, each with its own halo/state carry and
    staging buffer. Round-5 HONEST measurement (the fiction-era "sub-fleet
    kernels overlap ~1.7-2.4x" was XLA deleting the unmaterialized chains —
    benchmarks/RESULTS.md methodology correction #2): the full split x
    pipeline matrix on the config-7 shape spans 4,029-4,432 Msamples/s
    (145-164x C) with no coherent ordering — structure is inside the ±5%
    window noise, so the default is the simplest form (split=1). Bit-exact
    for any split: lanes are independent streams, the per-fleet math is
    identical (tests/test_scan.py).

    ``pipeline`` double-buffers the staged engine input through the scan
    carry: step t's engine consumes the buffer staged at step t-1, while
    step t itself stages chunk t+1's buffer (halo slice + int16->int32 widen
    + slack concat). Honest round-5 re-measurement: within the same ±5%
    noise (the round-4 "+36%" compared dead-carry variants); True kept as
    the default (it measured ahead at split=1 and costs nothing).
    Bit-exact either way — the engine sees byte-identical buffers.

    Returns (outputs (K, n_out, L) int32 zero-masked, produced (K,), state',
    backlog bool); ``backlog`` as in resample_scan.
    """
    from clownresampler_tpu.ops.pallas_resample import (
        choose_strided_plan,
        general_pick_group,
        general_w_load,
        plan_uniform,
        resample_integer_stride,
        resample_strided_phases,
        resample_strided_phases_wide,
        resample_uniform_lanes_general,
        resample_uniform_lanes_tiled,
        strided_phase_padding,
        window_rows_needed,
    )

    k, n_in, l = chunks.shape
    assert n_in < 1 << 14
    assert max_taps <= FAST_KERNEL_MAX_TAPS, (
        "the fused scan's engines keep their input block VMEM-resident; "
        "wide kernels stream via resample_scan (oracle engine) or the "
        "LowLevelResampler tile loop (resample_wide_taps dispatch)"
    )
    plan = plan_uniform(increment, n_out)
    if plan["kernel"] == "tiled":
        assert n_out % 64 == 0, "tiled engine: n_out must be a multiple of 64"
        slack = window_rows_needed(max_taps, plan["d"], plan["cand"]) + 8

        def engine(buffer, st):
            out, _ = resample_uniform_lanes_tiled(
                table, buffer, st, max_taps=max_taps, n_out=n_out,
                d=plan["d"], cand=plan["cand"], interpret=interpret,
                table_strided=table_strided,
            )
            return out
    elif plan["kernel"] == "strided":
        assert n_out % 64 == 0, "strided engine: n_out must be a multiple of 64"
        d_ = plan["d"]
        grp = 32 if n_out % 256 == 0 else 8
        # Buffer must satisfy both the XLA path's span contract and the
        # polyphase kernels' over-read contract (first frame's window row is
        # bounded by the position carry d+1, biased +2*radius).
        span_xla = (n_out - 1) * d_ + max_taps + d_ + 16
        span_phases = (
            (n_out - 8 * grp) * d_ + strided_phase_padding(max_taps, d_, grp)
            + d_ + 16
        )
        slack = max(32, span_xla - n_in, span_phases - n_in)
        choice = choose_strided_plan(2 * radius + n_in + slack, d_, n_out, max_taps)

        def engine(buffer, st):
            if choice is None:
                out, _ = resample_integer_stride(
                    table, buffer, st, max_taps=max_taps, n_out=n_out, d=d_,
                )
            else:
                variant, grp2 = choice
                fn = (resample_strided_phases if variant == "fused"
                      else resample_strided_phases_wide)
                out, _ = fn(
                    table, buffer, st, max_taps=max_taps, n_out=n_out, d=d_,
                    group=grp2, interpret=interpret,
                )
            return out
    else:
        assert n_out % 128 == 0, "general engine: n_out must be a multiple of 128"
        slack = general_w_load(max_taps)[0] + 8   # the engine's window + align
        # The staged buffer is [halo | chunk | slack] per sub-fleet; pick the
        # largest frame group inside the measured compile envelope
        # (general_launch_fits). Shapes outside the envelope at any group
        # (e.g. >8192-row buffers on multi-lane-tile sub-fleets at medium
        # tap widths) run the gather-oracle engine instead — slower, but the
        # scan stays a single fused program and the bytes are identical.
        radius_ = max_taps // 2 if radius is None else radius
        s_buf = 2 * radius_ + n_in + slack
        grp = general_pick_group(n_out, s_buf, l // split, max_taps)

        if grp is not None:
            def engine(buffer, st):
                out, _ = resample_uniform_lanes_general(
                    table, buffer, st, max_taps=max_taps, n_out=n_out,
                    interpret=interpret, table_strided=table_strided,
                    group=grp,
                )
                return out
        else:
            def engine(buffer, st):
                n = jnp.arange(n_out, dtype=jnp.int32)
                pos, frac = fx.positions_from_state(
                    st.position_integer, st.position_fractional,
                    st.cfg.increment_hi, st.cfg.increment_lo, n,
                )
                return convolve_frames(table, buffer, pos, frac, st.cfg,
                                       max_taps)

    assert l % split == 0, "chunk lanes must divide evenly into split sub-fleets"
    l_sub = l // split
    halo0 = jnp.zeros((2 * radius, l_sub), jnp.int32)
    zeros_slack = jnp.zeros((slack, l_sub), jnp.int32)

    state = DeviceState(
        position_integer=state.position_integer + jnp.int32(radius),
        position_fractional=state.position_fractional,
        cfg=state.cfg,
    )

    def stage(halo, chunk):
        return jnp.concatenate([halo, chunk.astype(jnp.int32), zeros_slack], axis=0)

    def run_engine(st, buffer):
        natural = natural_output_count(
            st.position_integer,
            st.position_fractional,
            st.cfg.increment_hi,
            st.cfg.increment_lo,
            jnp.int32(n_in),
        )
        produced = jnp.minimum(natural, jnp.int32(n_out))
        out = engine(buffer, st)
        n = jnp.arange(n_out, dtype=jnp.int32)
        out = jnp.where((n < produced)[:, None], out, 0)

        p_after, f_after = fx.positions_from_state(
            st.position_integer,
            st.position_fractional,
            st.cfg.increment_hi,
            st.cfg.increment_lo,
            produced,
        )
        delta = jnp.minimum(p_after, jnp.int32(n_in))
        st2 = DeviceState(
            position_integer=p_after - delta,
            position_fractional=f_after,
            cfg=st.cfg,
        )
        return st2, out, produced, natural > jnp.int32(n_out)

    def substep(st, halo, chunk):
        buffer = stage(halo, chunk)
        st2, out, produced, over = run_engine(st, buffer)
        new_halo = jax.lax.slice_in_dim(buffer, n_in, n_in + 2 * radius, axis=0)
        return st2, new_halo, out, produced, over

    chunk_cols = tuple(
        jax.lax.slice_in_dim(chunks, i * l_sub, (i + 1) * l_sub, axis=2)
        for i in range(split)
    )

    if pipeline:
        # Double-buffered: the carry holds each sub-fleet's STAGED buffer;
        # iteration t runs the engine on it (staged at t-1) and stages
        # chunk t+1's buffer from its tail halo — two independent dependency
        # chains inside one iteration, so the widen/concat copy can hide
        # under the kernels. The last iteration restages chunk K-1 into a
        # never-consumed buffer (cheaper than predicating the slice).
        def substep_pipe(st, buf, t):
            st2, out, produced, over = run_engine(st, buf)
            new_halo = jax.lax.slice_in_dim(buf, n_in, n_in + 2 * radius, axis=0)
            return st2, new_halo, out, produced, over

        def step_pipe(carry, t):
            sts, bufs = carry
            results = [substep_pipe(st, buf, t) for st, buf in zip(sts, bufs)]
            t_next = jnp.minimum(t + 1, jnp.int32(k - 1))
            bufs2 = tuple(
                stage(r[1], jax.lax.dynamic_index_in_dim(cc, t_next, 0,
                                                         keepdims=False))
                for r, cc in zip(results, chunk_cols)
            )
            sts2 = tuple(r[0] for r in results)
            outs = tuple(r[2] for r in results)
            return (sts2, bufs2), (outs, results[0][3], results[0][4])

        bufs0 = tuple(
            stage(halo0, jax.lax.index_in_dim(cc, 0, 0, keepdims=False))
            for cc in chunk_cols
        )
        (states_out, _bufs), (outputs_t, produced, over) = jax.lax.scan(
            step_pipe,
            (tuple(state for _ in range(split)), bufs0),
            jnp.arange(k, dtype=jnp.int32),
        )
    else:
        def step(carry, chunks_t):
            sts, halos = carry
            results = [
                substep(st, halo, chunk)
                for st, halo, chunk in zip(sts, halos, chunks_t)
            ]
            sts2 = tuple(r[0] for r in results)
            halos2 = tuple(r[1] for r in results)
            outs = tuple(r[2] for r in results)
            # Every sub-fleet shares the (scalar) phase sequence; report
            # fleet 0's.
            return (sts2, halos2), (outs, results[0][3], results[0][4])

        (states_out, _halos), (outputs_t, produced, over) = jax.lax.scan(
            step,
            (tuple(state for _ in range(split)), tuple(halo0 for _ in range(split))),
            chunk_cols,
        )
    outputs = outputs_t[0] if split == 1 else jnp.concatenate(outputs_t, axis=2)
    state_out = DeviceState(
        position_integer=states_out[0].position_integer - jnp.int32(radius),
        position_fractional=states_out[0].position_fractional,
        cfg=states_out[0].cfg,
    )
    return outputs, produced, state_out, jnp.any(over)


def resample_scan_tiled(
    table,
    chunks,              # (K, n_in, L) int32
    state: DeviceState,
    *,
    max_taps: int,
    n_out: int,
    radius: int,
    d: int,              # static plan_uniform params (increment < 2^17)
    cand: int,
    interpret: bool = False,
):
    """Back-compat alias: the tiled-engine case of resample_scan_fused.

    Reconstructs a representative increment for the (d, cand) plan the caller
    already computed; prefer resample_scan_fused(increment=...) directly.
    Returns (outputs, produced, state', backlog) like resample_scan_fused.
    """
    # Smallest lo with ceil((0xFFFF + 7*lo)/65536) == cand - 1 jitter bound.
    lo = 0 if cand <= 1 else ((cand - 1) * 65536 - 0xFFFF + 6) // 7
    increment = (d << 16) + lo
    from clownresampler_tpu.ops.pallas_resample import plan_uniform

    plan = plan_uniform(increment, n_out)
    assert plan == {"kernel": "tiled", "d": d, "cand": cand}, plan
    return resample_scan_fused(
        table, chunks, state, max_taps=max_taps, n_out=n_out, radius=radius,
        increment=increment, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Host streaming API (exact-bookkeeping mirror of the C low-level API)
# ---------------------------------------------------------------------------

OutputCallback = Callable[[np.ndarray], bool]

# Independent tile launches fused per device program by the batched tile
# dispatcher (_compute_frames). Fusing amortizes the flat per-program
# dispatch cost (~25-35 us, tools/probe_launch_overhead.py) — NOT kernel
# overlap: the round-5 DCE audit showed independent pallas programs have
# ~zero device concurrency (tools/probe_chain_dce.py; the earlier
# "~1.7-2.4x overlap" was measured on chains XLA had dead-code-eliminated).
# 4 per program keeps program size and compile time bounded.
TILE_LAUNCH_GROUP = 4


def _pack_super_groups(
    descs: list, ch: int, budget: int
) -> list[list[tuple[int, int]]]:
    """Pack tile descriptors into launch groups and budgeted cycles.

    Groups are runs of consecutive same-shape tiles (same n_pad and rows),
    TILE_LAUNCH_GROUP tiles max — each group becomes one fused device
    program. Super-groups are runs of consecutive groups whose combined
    resident footprint (int16 windows + ch-lane int32 outputs, plus the
    current program's transient lane-padded widened tiles) fits ``budget``;
    each super-group runs one upload->launch->download cycle and drops its
    device references before the next, bounding device memory for
    arbitrarily long streams.
    """
    groups = []
    i = 0
    while i < len(descs):
        j = i + 1
        while (
            j < len(descs)
            and j - i < TILE_LAUNCH_GROUP
            and descs[j][1:3] == descs[i][1:3]
        ):
            j += 1
        groups.append((i, j))
        i = j

    super_groups: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    resident = 0
    for (i, j) in groups:
        g_res = sum(
            descs[k][2] * ch * 2 + descs[k][1] * ch * 4 for k in range(i, j)
        )
        lanes_pad = fx.round_up(ch, 128)
        g_tmp = sum(
            (descs[k][2] + descs[k][1]) * lanes_pad * 4 for k in range(i, j)
        )
        if cur and resident + g_res + g_tmp > budget:
            super_groups.append(cur)
            cur, resident = [], 0
        cur.append((i, j))
        resident += g_res
    super_groups.append(cur)
    return super_groups


@partial(jax.jit, static_argnames=("plans", "ch", "interpret"))
def _grouped_packed_launch(table, xs, f0s, cfg, plans, tstrs, ch, interpret=False):
    """Run a group of independent resample tiles as ONE device program.

    ``xs[i]`` is tile i's input window as the HOST uploaded it — (rows_i, ch)
    int16, i.e. only the stream's real channels — and is lane-padded to the
    128-lane kernel tile and widened to int32 ON DEVICE, so host->device
    traffic stays at 2 bytes x ch per input row instead of the kernels'
    4 x 128. ``f0s[i]`` is tile i's 16.16 phase fraction (tile positions are
    rebased to the window start, so position_integer is always 0 here).
    Outputs are trimmed back to ``ch`` lanes before they leave the program,
    so device->host traffic is equally narrow.

    The group's launches share no data and fuse into one program, paying one
    ~25-35 us dispatch floor instead of TILE_LAUNCH_GROUP of them; bulk
    streaming runs at batch speed because the closed-form segments skip the
    scan's per-step fixed costs entirely (benchmarks/RESULTS.md round 5 —
    the launches do NOT overlap on device; that was the dead-carry fiction).
    """
    from clownresampler_tpu.ops.pallas_resample import multi_resample

    lanes_pad = fx.round_up(ch, 128)
    xs32 = tuple(
        jnp.pad(x.astype(jnp.int32), ((0, 0), (0, lanes_pad - ch)))
        for x in xs
    )
    states = tuple(
        DeviceState(
            position_integer=jnp.asarray(0, jnp.int32),
            position_fractional=f0s[i],
            cfg=cfg,
        )
        for i in range(len(xs))
    )
    outs = multi_resample(table, xs32, states, plans, interpret=interpret,
                          tstrs=tstrs)
    return tuple(o[:, :ch] for o in outs)


@dataclass
class LowLevelResampler:
    """Stateful host-side mirror of the C low-level API.

    ``init``/``adjust``/``resample`` correspond one-to-one to
    ClownResampler_LowLevel_{Init,Adjust,Resample}. Positions are exact Python
    ints; per-chunk math is dispatched to the device in tiles.
    """

    channels: int
    model: KernelModel = DEFAULT_MODEL
    position_integer: int = 0
    position_fractional: int = 0
    increment: int = 0
    config: Optional[Configuration] = None
    # static tap bound for compiled kernels; fixed at init so adjust() never
    # changes compiled shapes (mirrors the high-level radius rule).
    _max_taps: int = 0
    # Test knob: run the TPU kernel dispatch (fast/wide Pallas paths) in
    # Pallas interpret mode on non-TPU backends, so the CPU-mesh test suite
    # exercises the same dispatch the chip runs (mirrors farm.interpret).
    interpret: bool = False

    # Device-resident byte budget for ONE upload->launch->download cycle of
    # the batched tile dispatch (_compute_frames_batched). A cycle keeps all
    # its int16 windows and ch-lane int32 outputs resident at once; streams
    # whose tiles exceed the budget run as several sequential cycles, so a
    # direct resample() call over an arbitrarily long input keeps a bounded
    # device footprint (the guarantee the old one-tile-at-a-time dispatch
    # gave) while each cycle still amortizes program dispatch via fusing.
    BATCH_DEVICE_BUDGET_BYTES = 2 << 30

    @classmethod
    def init(
        cls,
        channels: int,
        input_rate: int,
        output_rate: int,
        low_pass_rate: int,
        model: KernelModel = DEFAULT_MODEL,
        max_radius: Optional[int] = None,
        interpret: bool = False,
    ) -> Optional["LowLevelResampler"]:
        """ClownResampler_LowLevel_Init (clownresampler.h:1044-1050).

        ``max_radius`` optionally reserves tap-window capacity for later
        ``adjust`` calls to wider ratios (the C low-level API has no such
        limit because it is scalar; compiled tile shapes need a bound).
        """
        self = cls(channels=channels, model=model, interpret=interpret)
        if not self.adjust(input_rate, output_rate, low_pass_rate, _initial=True):
            return None
        radius_bound = max(
            self.config.integer_stretched_kernel_radius, max_radius or 0
        )
        self._max_taps = fx.round_up(2 * radius_bound, 8)
        return self

    def adjust(
        self, input_rate: int, output_rate: int, low_pass_rate: int, _initial=False
    ) -> bool:
        """ClownResampler_LowLevel_Adjust (1052-1056): recompute increment and
        stretching mid-stream; position is untouched. Fails only on crazy
        ratios (scale >= 0x1000, clownresampler.h:974-975)."""
        cfg = configure(
            input_rate,
            output_rate,
            low_pass_rate,
            radius=self.model.radius,
            resolution=self.model.resolution,
        )
        if cfg is None:
            return False
        if not _initial and 2 * cfg.integer_stretched_kernel_radius > self._max_taps:
            # The C low-level API permits unrestricted radius growth on Adjust
            # (only the high-level API restricts it, clownresampler.h:1195);
            # growing the static tap bound just recompiles the kernels.
            self._max_taps = fx.round_up(2 * cfg.integer_stretched_kernel_radius, 8)
        self.increment = fx.calculate_ratio(input_rate, output_rate)
        self.config = cfg
        return True

    # -- core chunk computation ------------------------------------------

    def _natural_count(self, total_input_frames: int) -> int:
        num = (
            (total_input_frames - self.position_integer) << 16
        ) - self.position_fractional
        if num <= 0:
            return 0
        return -(-num // self.increment)

    def _compute_frames(self, padded_input: np.ndarray, n_frames: int) -> np.ndarray:
        """Convolve output frames [0, n_frames) from the current state.

        Tiles the launch so device index math stays in int32, and pads inputs
        and tile sizes to a few static buckets to bound recompilation. On TPU
        the tiles route through the fused kernels (ops/pallas_resample.py);
        the XLA gather oracle is the CPU/interpret path.
        """
        import jax as _jax

        from clownresampler_tpu.ops.pallas_resample import (
            choose_strided_plan,
            general_launch_fits,
            general_pick_group,
            plan_uniform,
            resample_integer_stride,
            resample_strided_phases,
            resample_strided_phases_wide,
            resample_uniform_lanes_general,
            resample_uniform_lanes_tiled,
            resample_wide_taps,
            strided_phase_padding,
            strided_table_device,
            wide_max_launch_frames,
            wide_serves,
            window_rows_needed,
        )

        table = self.model.table()
        on_device = _jax.default_backend() == "tpu" or self.interpret
        # Launch at the CURRENT ratio's tap width class, not the reserve:
        # precompute_launch's geometry is config-driven and its kv columns
        # are masked at the per-frame tap count, so any launch width >= the
        # current class is bit-exact — while MAC volume, window uploads, and
        # the wide kernel's DMA span all scale with the LAUNCH width (the
        # farm's current-width launches measured 1.36x on the pitch-bend
        # sweep, benchmarks/RESULTS.md round 5). A reserve-wide stream
        # adjusted to a narrow ratio also regains the fast VMEM kernels
        # this way (the FAST_KERNEL_MAX_TAPS guard tests the launch width).
        taps_l = min(
            self._max_taps,
            fx.round_up(2 * self.config.integer_stretched_kernel_radius, 8),
        )
        plan = (
            plan_uniform(self.increment, 0)
            if on_device and taps_l <= FAST_KERNEL_MAX_TAPS
            else None
        )
        # Kernels past the VMEM-resident width guard run the DMA-based wide
        # kernel (input stays in HBM) instead of the gather oracle; general-
        # class launches past the measured medium-width crossover
        # (WIDE_DISPATCH_MIN_TAPS / _MULTI — the crossover is lane-dependent,
        # so pass this stream's real lane count) route there too.
        lanes_pad = fx.round_up(self.channels, 128)
        use_wide = on_device and (
            taps_l > FAST_KERNEL_MAX_TAPS
            or (plan is not None
                and wide_serves(plan["kernel"], taps_l,
                                lanes=lanes_pad))
        )
        use_fast = plan is not None and not use_wide
        # The general kernel's measured compile envelope is TIGHTER than the
        # tiled row budget for multi-lane-tile launches (general_launch_fits:
        # the (S, 128) input block is double-buffered per lane tile, so
        # S=16384 never compiles at lanes > 128). Cap the row budget at the
        # largest measured ceiling that fits this stream's lane count so a
        # legal frame group always exists — `general_pick_group(...) or 16`
        # here used to ship a Mosaic scoped-vmem compile failure for
        # channels > 128 (ADVICE r4); no legal ceiling at all means the
        # gather oracle serves the stream.
        general_rows_budget = 16384
        if use_fast and plan["kernel"] == "general":
            for cap in (16384, 12288, 8192, 4096):
                if general_launch_fits(cap, lanes_pad, 16, taps_l):
                    general_rows_budget = cap
                    break
            else:
                use_fast = False
        if use_fast:
            # Fast kernels keep their input block VMEM-resident, so each tile
            # gets a bounded row window (rebased positions) instead of the
            # whole stream; slack covers aligned loads past the last window.
            d = self.increment >> 16
            slack = window_rows_needed(taps_l, min(d, 1), 8) + 8 * d + 32
            if plan["kernel"] == "strided":
                # Polyphase strided kernels over-read d*(w_load+8) rows past
                # the last frame's window (strided_phase_padding contract).
                slack = max(slack, strided_phase_padding(taps_l, d, 32) + 8)
            rows_budget = (general_rows_budget if plan["kernel"] == "general"
                           else 16384)
            rows_per_tile = rows_budget - 2 * (taps_l // 2) - slack
            max_tile_frames = max(64, (rows_per_tile << 16) // self.increment - 8)
            tstr = strided_table_device(
                self.model.radius, self.model.resolution,
                self.config.kernel_step_size, taps_l,
            )

        # ---- pass 1: tile geometry (shared by the sequential and batched
        # dispatch paths; positions are exact host ints, so every tile's
        # window row and phase fraction are closed-form from `done`)
        descs = []  # (tile, n_pad, rows, p0, f0); rows None on the oracle path
        done = 0
        while done < n_frames:
            tile = min(n_frames - done, MAX_CHUNK_OUTPUT_FRAMES)
            t = self.position_fractional + (done * self.increment)
            p0 = self.position_integer + (t >> 16)
            f0 = t & 0xFFFF
            if use_fast:
                tile = min(tile, max_tile_frames)
                grain = {"tiled": 64, "strided": 256, "general": 128}[plan["kernel"]]
                if plan["kernel"] in ("tiled", "general") and tile >= 1024:
                    # Bigger frame groups per grid step are ~26% (tiled) /
                    # ~12% (general) faster (fewer per-step latencies);
                    # round 5 re-measured this honestly for fleet-width
                    # launches too (0.615 vs 0.776 ms at 2048 lanes), so
                    # every >=1024-frame tile takes the 256 grain.
                    grain = 256
                n_pad = fx.round_up(tile, grain)
                # Row window [p0, p0 + rows), zero-padded past the stream end;
                # positions rebased to the window start. Rows are bucketed to
                # powers of two: small tiles (e.g. HighLevel refills of ~2k
                # frames) then upload a few hundred KB instead of the full
                # 16384-row budget, while the bucket count bounds recompiles.
                rows = min(
                    rows_budget,
                    ((n_pad * self.increment) >> 16) + taps_l + slack,
                )
                bucket = 1024
                while bucket < rows:
                    bucket *= 2
                rows = min(bucket, rows_budget)
            elif use_wide:
                # DMA-based wide kernel: input stays in HBM (no VMEM row
                # budget); launches are capped at the width-dependent
                # wide_max_launch_frames bound and the row window
                # power-of-two-bucketed to bound recompiles.
                tile = min(tile, wide_max_launch_frames(taps_l))
                n_pad = fx.round_up(tile, 8)
                rows = ((n_pad * self.increment) >> 16) + taps_l + 64
                bucket = 1024
                while bucket < rows:
                    bucket *= 2
                rows = bucket
            else:
                if taps_l > FAST_KERNEL_MAX_TAPS:
                    # Wide-kernel oracle (CPU path): the gather materialises
                    # (n_pad, max_taps, C) windows — bound the launch footprint
                    # and skip the recompilation-bucket padding (natural counts
                    # at such ratios are tiny anyway).
                    tile = min(tile, max(8, (1 << 22) // taps_l))
                    n_pad = fx.round_up(tile, 8)
                else:
                    n_pad = fx.round_up(tile, 512)
                rows = None
            descs.append((tile, n_pad, rows, p0, f0))
            done += tile

        # ---- batched dispatch: several independent tiles fused per device
        # program (amortizing the per-program dispatch floor; bulk streaming
        # reaches batch speed by skipping scan per-step costs, not by
        # launch overlap — round-5 correction), with all uploads before the
        # launch stream and all downloads after it (the relay's
        # transfer/execute discipline).
        if (use_fast or use_wide) and len(descs) > 1:
            kind = plan["kernel"] if use_fast else "wide"
            if use_wide:
                tstr = strided_table_device(
                    self.model.radius, self.model.resolution,
                    self.config.kernel_step_size, taps_l,
                )
            return self._compute_frames_batched(
                padded_input, descs, kind, table, tstr, taps_l,
                cand=plan["cand"] if use_fast and kind == "tiled" else None,
            )

        # ---- sequential per-tile launches (single tile, or the oracle path)
        chunks = []
        for tile, n_pad, rows, p0, f0 in descs:
            if use_fast:
                window = np.zeros((rows, lanes_pad), np.int32)
                avail = min(rows, padded_input.shape[0] - p0)
                if avail > 0:
                    window[:avail, : self.channels] = padded_input[p0 : p0 + avail]
                state = make_device_state(0, f0, self.config, self.increment)
                x = jnp.asarray(window)
                if plan["kernel"] == "tiled":
                    # group 32 for big launches (throughput, ~27% per round
                    # 2); group 8 otherwise — the round-5 long-chain latency
                    # sweep (tools/bench_latency.py sweep, on the record in
                    # benchmarks/RESULTS.md "Latency (round 5)") measured
                    # group 8 fastest at both 64-frame (3.6 us, one grid
                    # step) and 128-frame (5.6 us) launches; a round-4
                    # short-chain sweep briefly shipped group 4 here on what
                    # turned out to be relay noise (group 4 is 5.4/6.2 us —
                    # strictly slower).
                    grp = 32 if n_pad % 256 == 0 else 8
                    out, _ = resample_uniform_lanes_tiled(
                        table, x, state, max_taps=taps_l, n_out=n_pad,
                        d=plan["d"], cand=plan["cand"], table_strided=tstr,
                        group=grp,
                        interpret=self.interpret,
                    )
                elif plan["kernel"] == "strided":
                    choice = choose_strided_plan(
                        rows, plan["d"], n_pad, taps_l
                    )
                    if choice is None:
                        out, _ = resample_integer_stride(
                            table, x, state, max_taps=taps_l,
                            n_out=n_pad, d=plan["d"],
                        )
                    else:
                        variant, grp = choice
                        fn = (resample_strided_phases if variant == "fused"
                              else resample_strided_phases_wide)
                        out, _ = fn(
                            table, x, state, max_taps=taps_l,
                            n_out=n_pad, d=plan["d"], group=grp,
                            interpret=self.interpret,
                        )
                else:
                    # rows was bucketed under general_rows_budget above, so a
                    # legal group always exists at this shape (group 16
                    # compiles at every bucketed row count inside the
                    # envelope; group 32 only where general_launch_fits says
                    # so). Defensive None -> gather oracle, never a forced
                    # group (which shipped a Mosaic compile failure, ADVICE
                    # r4).
                    grp = general_pick_group(
                        n_pad, rows, lanes_pad, taps_l
                    )
                    if grp is None:
                        chunks.append(
                            self._oracle_tile(
                                table, padded_input, tile, n_pad, p0, f0,
                                taps_l,
                            )
                        )
                        continue
                    out, _ = resample_uniform_lanes_general(
                        table, x, state, max_taps=taps_l, n_out=n_pad,
                        table_strided=tstr, group=grp,
                        interpret=self.interpret,
                    )
                chunks.append(np.asarray(out)[:tile, : self.channels])
            elif use_wide:
                window = np.zeros((rows, lanes_pad), np.int32)
                avail = min(rows, padded_input.shape[0] - p0)
                if avail > 0:
                    window[:avail, : self.channels] = padded_input[p0 : p0 + avail]
                state = make_device_state(0, f0, self.config, self.increment)
                tstr_w = strided_table_device(
                    self.model.radius, self.model.resolution,
                    self.config.kernel_step_size, taps_l,
                )
                out, _ = resample_wide_taps(
                    table, jnp.asarray(window), state,
                    max_taps=taps_l, n_out=n_pad,
                    d=self.increment >> 16, table_strided=tstr_w,
                    interpret=self.interpret,
                )
                chunks.append(np.asarray(out)[:tile, : self.channels])
            else:
                chunks.append(
                    self._oracle_tile(table, padded_input, tile, n_pad, p0,
                                      f0, taps_l)
                )
        return (
            np.concatenate(chunks, axis=0)
            if chunks
            else np.zeros((0, self.channels), np.int32)
        )

    def _oracle_tile(
        self, table, padded_input: np.ndarray, tile: int, n_pad: int,
        p0: int, f0: int, taps: Optional[int] = None,
    ) -> np.ndarray:
        """One tile of output frames through the XLA gather oracle
        (ops/convolve.py) — the CPU path and the defensive downgrade when no
        fast-kernel launch shape compiles. ``taps`` is the launch width
        (>= the current ratio's class; defaults to the reserve — any such
        width is bit-exact, narrower gathers smaller windows)."""
        n = np.arange(n_pad, dtype=np.int64)
        tvec = f0 + n * self.increment
        pos = (p0 + (tvec >> 16)).astype(np.int32)
        frac = (tvec & 0xFFFF).astype(np.int32)
        cfg = ConfigScalars.from_configuration(self.config, self.increment)
        out = _convolve_jit(table, padded_input, pos, frac, cfg,
                            self._max_taps if taps is None else taps)
        return np.asarray(out)[:tile]

    def _compute_frames_batched(
        self, padded_input: np.ndarray, descs: list, kind: str, table, tstr,
        taps: int, cand: Optional[int] = None,
    ) -> np.ndarray:
        """Launch many independent tiles, TILE_LAUNCH_GROUP per device program.

        Bit-equal to the sequential per-tile path (same windows, same rebased
        states, same kernels — only the program packaging differs): grouping
        pays one ~25-35 us dispatch floor per TILE_LAUNCH_GROUP tiles, and
        the int16/ch-lane packing in _grouped_packed_launch keeps host
        traffic at stream width instead of the kernels' 128-lane int32
        tiles. Transfer
        discipline: windows and phases are uploaded before their cycle's
        first launch and downloaded after its last one; streams past
        BATCH_DEVICE_BUDGET_BYTES run as several such cycles (see the class
        attribute).
        """
        ch = self.channels
        interp = self.interpret
        state0 = make_device_state(0, 0, self.config, self.increment)
        plan_of = {
            # group=32 for 256-grain tiles mirrors the sequential path
            # (round-5 honest sweep: 32 beats 8 everywhere a tile can carry
            # it — "fleets prefer 8" was a dead-carry-era artifact).
            "tiled": lambda n_pad: ("tiled", self.increment >> 16,
                                    cand, taps,
                                    n_pad, False, None, 0,
                                    32 if n_pad % 256 == 0 else 8),
            "strided": lambda n_pad: ("strided", self.increment >> 16, None,
                                      taps, n_pad, False),
            "general": lambda n_pad: ("general", None, None, taps,
                                      n_pad, False),
            "wide": lambda n_pad: ("wide", self.increment >> 16, None,
                                   taps, n_pad, False),
        }[kind]
        tstr_entry = None if kind == "strided" else tstr

        super_groups = _pack_super_groups(
            descs, ch, self.BATCH_DEVICE_BUDGET_BYTES
        )

        chunks = []
        for sg in super_groups:
            lo, hi = sg[0][0], sg[-1][1]
            # uploads (all before the super-group's first launch)
            windows = []
            for tile, n_pad, rows, p0, f0 in descs[lo:hi]:
                w = np.zeros((rows, ch), np.int16)
                avail = min(rows, padded_input.shape[0] - p0)
                if avail > 0:
                    w[:avail] = padded_input[p0 : p0 + avail]
                windows.append(jnp.asarray(w))
            f0_arrays = [
                jnp.asarray(
                    np.array([descs[k][4] for k in range(i, j)], np.int32)
                )
                for i, j in sg
            ]

            # launch stream (no interleaved host transfers within the cycle)
            outs = []
            for (i, j), f0s in zip(sg, f0_arrays):
                plans = tuple(plan_of(descs[k][1]) for k in range(i, j))
                outs.extend(
                    _grouped_packed_launch(
                        table, tuple(windows[i - lo : j - lo]), f0s,
                        state0.cfg, plans, (tstr_entry,) * (j - i), ch,
                        interpret=interp,
                    )
                )

            # downloads, then drop EVERY device reference the cycle holds
            # (windows, phases, outputs) before the next cycle's uploads —
            # otherwise this cycle's outputs stay resident alongside the next
            # cycle's windows and peak use exceeds the budget.
            chunks.extend(
                np.asarray(o)[: d[0]] for o, d in zip(outs, descs[lo:hi])
            )
            del windows, f0_arrays, outs

        return np.concatenate(chunks, axis=0)

    def _advance(self, n_frames: int) -> None:
        t = self.position_fractional + n_frames * self.increment
        self.position_integer += t >> 16
        self.position_fractional = t & 0xFFFF

    def resample(
        self,
        padded_input: np.ndarray,     # (N + 2*radius, channels) int16
        total_input_frames: int,
        output_callback: Optional[OutputCallback] = None,
        output_limit: Optional[int] = None,
    ) -> tuple[bool, int, np.ndarray]:
        """ClownResampler_LowLevel_Resample (1058-1092).

        Returns (input_exhausted, remaining_input_frames, output_frames).
        ``output_callback(frame) -> bool`` reproduces the per-frame contract
        (return False to stop); ``output_limit`` is the array-API equivalent
        (stop after N frames). With neither, runs to input exhaustion.
        """
        padded_input = np.ascontiguousarray(padded_input, dtype=np.int16).reshape(
            -1, self.channels
        )
        natural = self._natural_count(total_input_frames)

        quota = natural if output_limit is None else min(natural, output_limit)
        frames = self._compute_frames(padded_input, quota)

        # "refused" mirrors the output callback returning 0: the reference
        # reports output-full (cc_false) even when the refusal lands on the
        # final natural frame, because the refusal exits the loop before the
        # position check runs (clownresampler.h:1081-1089).
        produced = quota
        refused = False
        if output_callback is not None:
            for i in range(quota):
                if not output_callback(frames[i]):
                    produced = i + 1
                    refused = True
                    break
        if not refused and output_limit is not None and natural >= output_limit:
            refused = True
        frames = frames[:produced]

        self._advance(produced)
        # Unified carry/rewind (1063-1068, 1084-1088).
        delta = min(self.position_integer, total_input_frames)
        remaining = total_input_frames - delta
        self.position_integer -= delta

        return not refused, remaining, frames

    def state_tuple(self) -> tuple[int, int, int, int, int, int, int]:
        """(pos_int, pos_frac, increment, stretched, int_radius, delta, step) —
        for oracle state-equality tests."""
        c = self.config
        return (
            self.position_integer,
            self.position_fractional,
            self.increment,
            c.stretched_kernel_radius,
            c.integer_stretched_kernel_radius,
            c.stretched_kernel_radius_delta,
            c.kernel_step_size,
        )


@partial(jax.jit, static_argnames=("max_taps",))
def _convolve_jit(table, padded_input, pos, frac, cfg, max_taps):
    return convolve_frames(table, padded_input, pos, frac, cfg, max_taps)


def resample_array(
    input_frames: np.ndarray,
    input_rate: int,
    output_rate: int,
    low_pass_rate: int,
    model: KernelModel = DEFAULT_MODEL,
) -> np.ndarray:
    """One-shot whole-buffer resample (the tests/test-low-level.c usage:
    caller pads with radius zero-frames both ends, clownresampler.h:725-733).

    input_frames: (N, channels) int16. Returns (M, channels) int32 wide
    samples, M = natural output count.
    """
    input_frames = np.asarray(input_frames, dtype=np.int16)
    if input_frames.ndim == 1:
        input_frames = input_frames[:, None]
    n, channels = input_frames.shape
    rs = LowLevelResampler.init(channels, input_rate, output_rate, low_pass_rate, model)
    if rs is None:
        raise ValueError("unsupported ratio")
    r = rs.config.integer_stretched_kernel_radius
    padded = np.zeros((n + 2 * r, channels), dtype=np.int16)
    padded[r : r + n] = input_frames
    _, _, out = rs.resample(padded, n)
    return out

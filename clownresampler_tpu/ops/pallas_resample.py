"""Fused Pallas TPU kernels for the windowed-sinc resampling hot loop.

This replaces the reference's scalar inner MAC loop
(ClownResampler_LowestLevel_Resample, clownresampler.h:986-1035) — the
component SURVEY.md section 2 row 8 calls the north star — with a VPU kernel
that processes 8 output frames x 128 interleaved streams per vector step.

Layout: input is lane-major ``x[(S, L)] int32`` (sign-extended s16 samples)
with L = streams x channels on the 128-wide lane axis; every lane shares the
launch's phase sequence (uniform ratio), so all per-frame quantities (window
row, tap kernel values, normaliser reciprocal) are precomputed once in XLA
(``precompute_launch``) and broadcast across lanes. The data-dependent part of
the reference loop — per-output-frame window bounds, LUT gather, reciprocal —
thus leaves the kernel entirely; what remains is a dense multiply-accumulate
with the exact trunc-toward-zero fixed-point semantics (fixedpoint.py).

The irregular access pattern (window rows advance by a non-integer stride) is
made dense by a Bresenham decomposition: within an 8-frame tile,
``rows[n] = tile_row0 + (n%8)*d + eps(n)`` with d = increment>>16 and
eps in [0, CAND). The kernel performs ONE 8-aligned dynamic load per tile
(Mosaic requires provably aligned dynamic sublane indices), ONE dynamic
sublane roll to cancel the misalignment, and then every tap/candidate window
is a *static* slice — all VPU-friendly aligned vector ops, no gathers.

Kernel coverage (plan_uniform):
  tiled   — d = increment>>16 in {0,1}: every upsample and all sub-2x
            downsamples (the headline 48k->44.1k included); fastest path.
  strided — exact integer strides (fraction == 0, e.g. 2:1 96k->48k): a
            polyphase Pallas kernel over the free (S, L) -> (S/d, d*L) view
            where every window access is stride 1 (resample_strided_phases;
            _wide variant for VMEM-exceeding buffers; XLA fallback
            resample_integer_stride for shapes neither fits).
  general — everything else (wide non-integer downsampling, e.g. 44.1k->8k):
            per-frame aligned load + roll with taps on the sublane axis.
All paths are bit-exact vs ops.convolve (tests/test_pallas.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clownresampler_tpu import fixedpoint as fx
from clownresampler_tpu.lowlevel import DeviceState
from clownresampler_tpu.ops.convolve import window_geometry

LANES = 128
FRAMES_PER_TILE = 8


# ---------------------------------------------------------------------------
# XLA-side launch precompute (tiny: O(n_out * taps) ints)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_taps", "n_out"))
def precompute_launch(table, state: DeviceState, *, max_taps: int, n_out: int,
                      table_strided=None):
    """Per-output-frame scalars for a uniform-ratio launch.

    Returns (rows (N,), kvals (N, T), q (N,), eps (N,), tile_rows (N/8,)):
    rows[n] is the first input row of frame n's tap window (pos + min_rel,
    clownresampler.h:995), kvals the masked LUT taps (1008-1021), q the 17.15
    reciprocal (1025), eps/tile_rows the Bresenham tile decomposition.

    ``table_strided`` (KernelModel.strided_table(step, max_taps) for this
    launch's config) turns the (N, T) element gather into an (N,) whole-row
    take — ~50x faster on TPU; without it the flat-table gather is used.
    """
    assert n_out % FRAMES_PER_TILE == 0, "n_out must be a multiple of 8"
    cfg = state.cfg
    n = jnp.arange(n_out, dtype=jnp.int32)
    pos, frac = fx.positions_from_state(
        state.position_integer,
        state.position_fractional,
        cfg.increment_hi,
        cfg.increment_lo,
        n,
    )
    min_rel, _max_rel, kernel_start, taps = window_geometry(cfg, frac)
    rows = pos + min_rel

    j = jnp.arange(max_taps, dtype=jnp.int32)
    if table_strided is None:
        kidx = kernel_start[:, None] + j[None, :] * cfg.kernel_step_size
        kidx = jnp.clip(kidx, 0, table.shape[0] - 1)
        kv = jnp.take(table, kidx, axis=0)
    else:
        assert table_strided.shape[1] == max_taps
        start = jnp.clip(kernel_start, 0, table_strided.shape[0] - 1)
        kv = jnp.take(table_strided, start, axis=0)
    kvals = jnp.where(j[None, :] < taps[:, None], kv, 0)

    q = fx.reciprocal_q31(jnp.sum(kvals, axis=1))

    d = cfg.increment_hi
    tile_rows = rows[::FRAMES_PER_TILE]
    local = n % FRAMES_PER_TILE
    eps = rows - jnp.repeat(tile_rows, FRAMES_PER_TILE) - local * d
    return rows, kvals, q, eps, tile_rows


# config -> (client, array): dryrun_multichip / the test conftest
# re-initialize backends mid-process (clear_backends), which invalidates
# earlier device arrays — so each entry remembers WHICH backend client built
# it; any rebuild first evicts EVERY entry built by a different (dead)
# client, so defunct clients and their device arrays are released even for
# configs never re-requested after the backend switch.
_strided_table_cache: dict = {}


def strided_table_device(radius: int, resolution: int, step: int, max_taps: int):
    """Device-resident KernelModel.strided_table, cached per config for the
    lifetime of the backend client that built it."""
    import jax.extend  # registers jax.extend.backend (not exported by default)

    from clownresampler_tpu.models import KernelModel

    client = jax.extend.backend.get_backend()
    key = (radius, resolution, step, max_taps)
    hit = _strided_table_cache.get(key)
    if hit is None or hit[0] is not client:
        for k in [k for k, v in _strided_table_cache.items() if v[0] is not client]:
            del _strided_table_cache[k]
        arr = jnp.asarray(KernelModel(radius, resolution).strided_table(step, max_taps))
        _strided_table_cache[key] = (client, arr)
        return arr
    return hit[1]


def _macc(win32, kval, acc):
    """One tap-block multiply-accumulate with C-exact truncation.

    Implements sum over taps of trunc((x*k)/2^16) (clownresampler.h:1020, 625).
    The tap product spans exactly [-2^31, 2^31) (|x| <= 32768, k in
    [-9651, 65536], SURVEY.md section 7) so a single int32 multiply is exact;
    truncation toward zero is floor after adding 0xFFFF to negative products
    (p >> 31 is 0 or -1, so (p >> 31) & 0xFFFF is the exact bias).
    """
    p = win32 * kval
    return acc + ((p + ((p >> 31) & 0xFFFF)) >> 16)


def _phase_shift_kvals(kvals, m):
    """Delay each frame's tap vector by its window's 8-alignment residue.

    Returns (N, T+8): row n holds k_n shifted right by m[n] with zeros
    elsewhere, so an 8-aligned window load multiplies directly — win[t']
    pairs with k[t' - m] and the zero taps contribute zero truncated terms
    (exact under the reference's per-term trunc, clownresampler.h:1020).
    This replaces in-kernel rolls in the general and wide kernels. Built
    with 8 static pads + a vectorised select: an (N, T+8) element gather
    here would hit the slow scalar-core path.
    """
    t = kvals.shape[1]
    shifted = [
        jnp.pad(kvals, ((0, 0), (mm, 8 - mm)))[:, : t + 8] for mm in range(8)
    ]
    kv8 = shifted[0]
    for mm in range(1, 8):
        kv8 = jnp.where((m == mm)[:, None], shifted[mm], kv8)
    return kv8


def _eps_shift_kvals(kvals, eps, cand):
    """(N, T) -> (N, T + cand - 1): row n's taps delayed by its Bresenham
    jitter eps[n] (zeros elsewhere), so the tiled kernel's static window
    slice j pairs directly with kv[j] — window row base + n*d + j against
    k_n[j - eps_n] — and the per-tap candidate selects leave the kernel
    entirely (the same trade as _phase_shift_kvals for the general/wide
    kernels, applied to the tile jitter instead of the 8-alignment residue).
    Exact: the padded zero taps contribute zero truncated terms
    (clownresampler.h:1020, trunc(0/65536) == 0)."""
    shifted = [jnp.pad(kvals, ((0, 0), (c, cand - 1 - c))) for c in range(cand)]
    kv = shifted[0]
    for c in range(1, cand):
        kv = jnp.where((eps == c)[:, None], shifted[c], kv)
    return kv


def window_rows_needed(max_taps: int, d: int, cand: int) -> int:
    """Rows a tile's aligned load touches: alignment slack (<=7) + 7 frames of
    stride d + taps + candidate jitter — rounded up to a POWER OF TWO because
    pltpu.roll compiles incorrectly for non-power-of-two sublane extents
    (empirically verified: 24-row rolls produce wrong data; 16/32 are fine)."""
    span = 7 * d + (max_taps - 1) + (cand - 1) + 1 + 7
    w = 16
    while w < span:
        w *= 2
    return w


# ---------------------------------------------------------------------------
# The tiled kernel: 8 output frames x 128 lanes per grid step
# ---------------------------------------------------------------------------

def _kernel_tiled(
    tile_rows_ref,  # scalar prefetch (N/8,)
    meta_ref,       # (8*G, 128) block per grid step: col 0 = eps, col 1 = q
    kv_ref,         # (8*G, T) block per grid step: full kernel values
    x_ref,          # (S, 128) lane-tile block, int32
    out_ref,        # (8*G, 128) block
    *,
    max_taps: int,
    d: int,         # static row stride per frame (0 or 1)
    cand: int,      # static candidate count (1 + max eps)
    w_load: int,    # static aligned window rows (window_rows_needed)
    group: int,     # static frame-tiles per grid step (amortises block DMAs)
    clamp_s16: bool,
    eps_fold: bool, # static: kv columns pre-shifted by eps (_eps_shift_kvals)
):
    jg = pl.program_id(1)

    results = []
    for g in range(group):
        base = tile_rows_ref[jg * group + g]
        a = pl.multiple_of((base // 8) * 8, 8)
        window = x_ref[pl.ds(a, w_load), :]
        # After the roll, row i of `r` is input row base + i.
        r = pltpu.roll(window, -(base - a), axis=0)

        lo = g * FRAMES_PER_TILE
        hi = lo + FRAMES_PER_TILE
        q = meta_ref[lo:hi, 1:2]

        acc = jnp.zeros((FRAMES_PER_TILE, LANES), jnp.int32)
        if eps_fold:
            # kv column j is k_n[j - eps_n] (zero outside), so every tap is
            # ONE static slice + MAC: no candidate selects, no second slice
            # assembly. Costs cand-1 extra (zero-tap) MAC columns.
            for j in range(max_taps + cand - 1):
                if d == 1:
                    win = r[j : j + FRAMES_PER_TILE]
                else:
                    win = jnp.broadcast_to(r[j : j + 1], (FRAMES_PER_TILE, LANES))
                acc = _macc(win, kv_ref[lo:hi, j : j + 1], acc)
        else:
            eps = meta_ref[lo:hi, 0:1]                           # (8, 1)
            sel = [eps == c for c in range(1, cand)]             # hoisted masks
            for t in range(max_taps):
                if d == 1:
                    # sublane k needs row base + k + eps(k) + t
                    win = r[t : t + FRAMES_PER_TILE]
                    for c in range(1, cand):
                        win = jnp.where(sel[c - 1], r[t + c : t + c + FRAMES_PER_TILE], win)
                else:
                    # sublane k needs row base + eps(k) + t (no per-frame stride)
                    win = jnp.broadcast_to(r[t : t + 1], (FRAMES_PER_TILE, LANES))
                    for c in range(1, cand):
                        win = jnp.where(
                            sel[c - 1],
                            jnp.broadcast_to(r[t + c : t + c + 1], (FRAMES_PER_TILE, LANES)),
                            win,
                        )
                acc = _macc(win, kv_ref[lo:hi, t : t + 1], acc)

        results.append(fx.mul_shift15(acc, q))                   # 17.15 normalise

    out = jnp.concatenate(results, axis=0)
    if clamp_s16:
        # Fused output clamp (what the reference's examples do on every frame,
        # clownresampler.h:96-100) — halves output HBM traffic. One whole-block
        # store keeps the int16 write tile-aligned.
        out = jnp.clip(out, -0x7FFF, 0x7FFF).astype(jnp.int16)
    out_ref[:, :] = out


@partial(
    jax.jit,
    static_argnames=(
        "max_taps", "n_out", "d", "cand", "group", "clamp_s16", "interpret",
        "lanes", "lane_offset", "eps_fold",
    ),
)
def resample_uniform_lanes_tiled(
    table,
    x,                   # (S, L) int32; see window_rows_needed for padding
    state: DeviceState,
    *,
    max_taps: int,
    n_out: int,          # static; multiple of 8*group
    d: int,              # static: increment >> 16, must be 0 or 1
    cand: int,           # static: 1 + max row jitter within an 8-frame tile
    group: int = 8,      # static frame-tiles per grid step
    clamp_s16: bool = False,  # fuse the s16 output clamp (serving path)
    interpret: bool = False,
    lanes: Optional[int] = None,   # static sub-launch width (default: all of x)
    lane_offset: int = 0,          # static first lane column (multiple of 128)
    table_strided=None,            # KernelModel.strided_table(step, max_taps)
    eps_fold: bool = False,        # static: fold eps into kv (_eps_shift_kvals)
):
    """Fast-path uniform-ratio resample; requires increment < 2^17.

    The caller must pad x so that every tile's aligned window fits:
    S >= ((max_row & ~7) + window_rows_needed(max_taps, d, cand)).
    ``lanes``/``lane_offset`` run the launch over a column slice of x with no
    copy (the lane-tile grid starts at lane_offset). NOTE (round-5 honest
    structure sweep): column-slice sub-launches are STRICTLY SLOWER than one
    full-width launch (the earlier ~1.3-1.7x overlap claim was the
    dead-carry DCE fiction) — the fields exist for ragged fleets whose
    slices genuinely differ, not as a performance lever.
    Returns (out (n_out, lanes or L) int32, rows (n_out,)).
    """
    assert d in (0, 1)
    s, l = x.shape
    lanes = l if lanes is None else lanes
    assert lanes % LANES == 0 and lane_offset % LANES == 0
    assert lane_offset + lanes <= l
    assert n_out % (FRAMES_PER_TILE * group) == 0
    tile0 = lane_offset // LANES
    w_load = window_rows_needed(max_taps, d, cand)
    rows, kvals, q, eps, tile_rows = precompute_launch(
        table, state, max_taps=max_taps, n_out=n_out, table_strided=table_strided
    )
    # Frames past the caller's natural count are padding whose results are
    # discarded; clamp their window bases so the aligned loads stay in bounds.
    tile_rows = jnp.clip(tile_rows, 0, max(s - w_load, 0))
    if eps_fold and cand > 1:
        kv = _eps_shift_kvals(kvals, eps, cand)                  # (N, T+cand-1)
    else:
        kv = kvals                                               # (N, T)
    kv_w = kv.shape[1]
    meta = jnp.stack([eps, q], axis=1)                           # (N, 2)
    meta = jnp.pad(meta, ((0, 0), (0, LANES - 2)))               # (N, 128)

    step_frames = FRAMES_PER_TILE * group
    n_steps = n_out // step_frames
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(lanes // LANES, n_steps),
        in_specs=[
            pl.BlockSpec((step_frames, LANES), lambda i, j, *_: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((step_frames, kv_w), lambda i, j, *_: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, LANES), lambda i, j, *_: (0, i + tile0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (step_frames, LANES), lambda i, j, *_: (j, i), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        partial(
            _kernel_tiled, max_taps=max_taps, d=d, cand=cand, w_load=w_load,
            group=group, clamp_s16=clamp_s16, eps_fold=eps_fold and cand > 1,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_out, lanes), jnp.int16 if clamp_s16 else jnp.int32
        ),
        interpret=interpret,
    )(tile_rows, meta, kv, x)
    return out, rows


# ---------------------------------------------------------------------------
# General-stride kernel: any increment (wide non-integer downsampling)
# ---------------------------------------------------------------------------

# Widths up to this run the roll-free (kv-shift) general kernel; larger
# windows use the roll path: without the roll serializing each frame's
# dataflow, Mosaic keeps many (w_load, 128) temporaries live at once and
# blows the 16M scoped-vmem stack at w_load ~1024 (measured: 28M requested
# for taps 1016 — the roll variant compiles and runs the same width fine).
GENERAL_SHIFT_MAX_WLOAD = 256


def general_w_load(max_taps: int) -> tuple:
    """(w_load, shift_kv) for the general kernel at this tap width."""
    if max_taps + 8 <= GENERAL_SHIFT_MAX_WLOAD:
        return max_taps + 8, True
    w = 16
    while w < max_taps + 8:
        w *= 2
    return w, False


# Measured Mosaic scoped-vmem compile envelope of the general kernel
# (tools/probe_midwide.py `envelope`/`envelope2`/`envelope3`, AOT-compiled
# on v5e hardware, rounds 4-5 — 62 points across w_load 48..1024, lanes
# 128..2048, group 16/32, s 4096..16384; the authoritative point list is
# tests/test_pallas.py::test_general_launch_envelope_matches_measured_points,
# which asserts its own count). Two effects bound the envelope:
#   - multi-lane-tile launches double-buffer the (s, 128) input block, so
#     s=16384 fails (~16.2M vs the 16M limit) for EVERY tap class — even
#     taps 40 — while a single lane tile passes s=16384 at group 16 for
#     every w_load up to 1024;
#   - group=32 keeps ~2x the per-frame window temporaries live, so its
#     ceiling shrinks fast with w_load (w_load>=512 requests 36-101M and
#     never compiles; w_load=256 fits only single-tile at s<=8192).
# The dispatchers' historical row budgets (lowlevel rows_budget=16384, farm
# VMEM_SAFE_INPUT_ROWS=12288) were calibrated on the TILED kernel (taps 8,
# tiny temporaries) and are NOT safe for the general kernel — every
# general-class dispatch must consult this predicate.
def general_launch_fits(s: int, lanes: int, group: int, max_taps: int) -> bool:
    """True iff resample_uniform_lanes_general compiles at this launch shape
    (measured envelope above; exact on all 62 probed points — the round-5
    `envelope3` probe filled the w_load 144..248 group-32 interior: 144
    compiles multi-lane to s 8192, 176/208 to s 4096, 248 never multi;
    the failing allocations are lane-count-independent, confirming the
    per-lane-tile scoping model)."""
    w_load, _ = general_w_load(max_taps)
    multi = lanes > LANES
    if group <= 16:
        if not multi:
            return s <= 16384
        return s <= (12288 if w_load <= 136 else 8192)
    if w_load <= 48:
        return s <= 12288
    if w_load <= 144:
        return s <= 8192
    if w_load <= 208:
        return s <= (4096 if multi else 8192)
    if w_load <= 256:
        return not multi and s <= 8192
    return False


def general_pick_group(n_out: int, s: int, lanes: int, max_taps: int):
    """Largest legal frame group for a general-kernel launch at this shape
    (32 is ~12% faster per step when it fits), or None when no group
    compiles — the caller must route to the wide DMA kernel / the gather
    oracle instead."""
    for g in (32, 16):
        if n_out % (8 * g) == 0 and general_launch_fits(s, lanes, g, max_taps):
            return g
    return None


# Dispatch crossover for GENERAL-class launches in the medium-width band
# (GENERAL_SHIFT_MAX_WLOAD - 8 < taps <= lowlevel.FAST_KERNEL_MAX_TAPS).
# There the general kernel pays a per-frame power-of-two aligned load + roll
# (the roll-free kv-shift body blows the Mosaic scoped-vmem stack, see
# GENERAL_SHIFT_MAX_WLOAD) AND its VMEM-resident input block caps real frames
# below the launch grain — padding frames MAC clamped junk. The DMA wide
# kernel (resample_wide_taps) has neither cost: roll-free phase-shifted
# kernel columns, whole-window MAC, input in HBM.
#
# Measured crossover (tools/probe_midwide.py time, v5e, round 4 — wide
# throughput as a multiple of the general kernel's dispatch-real rate):
#   lanes=2048: 2.55x / 2.34x / 7.11x / 7.34x / 8.82x at taps
#               272 / 392 / 512 / 760 / 1016 -> wide wins the WHOLE roll
#               band on multi-lane-tile launches;
#   lanes=128:  0.69x / 0.95x / 1.48x / 6.89x at taps 272/392/512/760
#               (1016 is launch-overhead-bound either way) -> the general
#               roll kernel keeps taps <= 392, wide takes the rest.
# The shift band (taps <= GENERAL_SHIFT_MAX_WLOAD - 8) stays on the
# roll-free general kernel at every lane count (1144-1169x the C anchor,
# benchmarks/RESULTS.md round-3; the wide kernel's best in-band rate is
# well below it).
WIDE_DISPATCH_MIN_TAPS = 448          # single lane tile (between 392 and 512)
WIDE_DISPATCH_MIN_TAPS_MULTI = 248    # multi lane tile: the whole roll band


def wide_serves(plan_kernel: str, max_taps: int, lanes: int = None) -> bool:
    """True when a launch of this plan class and RESERVED tap width should
    run the DMA wide kernel instead of its VMEM-resident class kernel.

    Only the general class crosses over: the tiled class never reaches
    medium widths at sane models (taps = 2*radius at d <= 1) and the
    polyphase strided kernels are faster than the wide kernel where they
    apply. Callers past FAST_KERNEL_MAX_TAPS route wide unconditionally —
    this predicate covers the band below it. ``lanes`` is the launch's lane
    count (the crossover is lane-dependent, see the table above); None
    assumes multi-lane-tile, the throughput-relevant case."""
    if plan_kernel != "general":
        return False
    bound = (WIDE_DISPATCH_MIN_TAPS if lanes is not None and lanes <= LANES
             else WIDE_DISPATCH_MIN_TAPS_MULTI)
    return max_taps > bound


def _kernel_general(
    rows_ref,       # scalar prefetch (N,): per-frame window starts (ALIGNED
                    # when shift_kv, raw otherwise)
    meta_ref,       # (8*G, 128) block: col 1 = q (col 0 unused here)
    kv_ref,         # (T+8 | T, 8*G) block: kernel values, taps on sublanes
                    # (phase-shifted per frame when shift_kv — see
                    # resample_uniform_lanes_general)
    x_ref,          # (S, 128) lane-tile block, int32
    out_ref,        # (8*G, 128) block
    *,
    max_taps: int,
    w_load: int,    # static window rows (see general_w_load)
    group: int,
    clamp_s16: bool,
    shift_kv: bool,
):
    """Per-frame windows with taps on the sublane axis.

    For increments >= 2*2^16 consecutive frames' windows no longer overlap
    enough to share a tile load, so each frame slices its own aligned
    window. With ``shift_kv`` (taps <= GENERAL_SHIFT_MAX_WLOAD - 8) the
    alignment residue is folded into the KERNEL column in XLA (taps
    pre-shifted by base%8, zeros elsewhere — exact, since a zero tap
    contributes a zero truncated term), so there is NO in-kernel roll: the
    (T+8, 128) window multiply-accumulates directly against a (T+8, 1)
    kernel column and reduces over sublanes (the roll was ~the largest
    per-frame cost, benchmarks/RESULTS.md round-3). Wider windows keep the
    per-frame roll (see GENERAL_SHIFT_MAX_WLOAD). Any ratio the reference
    accepts works here.
    """
    jg = pl.program_id(1)
    rows_used = max_taps + 8 if shift_kv else max_taps

    for g in range(group):
        rows_lo = jg * (FRAMES_PER_TILE * group) + g * FRAMES_PER_TILE
        accs = []
        for k in range(FRAMES_PER_TILE):
            if shift_kv:
                a = pl.multiple_of(rows_ref[rows_lo + k], 8)
                win = x_ref[pl.ds(a, w_load), :][:rows_used]
            else:
                base = rows_ref[rows_lo + k]
                a = pl.multiple_of((base // 8) * 8, 8)
                window = x_ref[pl.ds(a, w_load), :]
                win = pltpu.roll(window, -(base - a), axis=0)[:rows_used]
            kcol = kv_ref[:, g * FRAMES_PER_TILE + k : g * FRAMES_PER_TILE + k + 1]
            terms = _macc(win, kcol, jnp.zeros_like(win))
            accs.append(jnp.sum(terms, axis=0, keepdims=True))   # (1, 128)
        acc = jnp.concatenate(accs, axis=0)                      # (8, 128)
        lo = g * FRAMES_PER_TILE
        q = meta_ref[lo : lo + FRAMES_PER_TILE, 1:2]
        res = fx.mul_shift15(acc, q)
        if clamp_s16:
            res = jnp.clip(res, -0x7FFF, 0x7FFF).astype(jnp.int16)
        out_ref[lo : lo + FRAMES_PER_TILE, :] = res


@partial(
    jax.jit,
    static_argnames=("max_taps", "n_out", "group", "clamp_s16", "interpret",
                     "lanes", "lane_offset"),
)
def resample_uniform_lanes_general(
    table,
    x,                   # (S, L) int32; padded so aligned loads fit (w_load rows)
    state: DeviceState,
    *,
    max_taps: int,
    n_out: int,          # multiple of 128
    group: int = 16,     # 16*8 = 128 frames/step so the transposed kv block
                         # has a 128-lane tile (Mosaic blocking rule); 32 is
                         # also legal (256-lane kv tile)
    clamp_s16: bool = False,
    interpret: bool = False,
    lanes: Optional[int] = None,   # static sub-launch width (default: all of x)
    lane_offset: int = 0,          # static first lane column (multiple of 128)
    table_strided=None,            # KernelModel.strided_table(step, max_taps)
):
    """Any-ratio uniform-lane resample (used for increment >= 2^17, lo != 0)."""
    assert group in (16, 32), "kv block needs a 128-lane-multiple grid step"
    s, l = x.shape
    lanes = l if lanes is None else lanes
    assert lanes % LANES == 0 and lane_offset % LANES == 0
    assert lane_offset + lanes <= l
    assert n_out % (FRAMES_PER_TILE * group) == 0
    tile0 = lane_offset // LANES
    # Common widths: exactly the MAC rows, no roll (the residue lives in the
    # kernel column). Wide windows: power-of-two rows for the roll path.
    w_load, shift_kv = general_w_load(max_taps)
    rows, kvals, q, eps, _tile_rows = precompute_launch(
        table, state, max_taps=max_taps, n_out=n_out, table_strided=table_strided
    )
    # Clamp padding frames' window bases into bounds (results discarded).
    rows_clamped = jnp.clip(rows, 0, max(s - w_load, 0))
    if shift_kv:
        # 8-align each start and fold the residue into the kernel column
        # (taps delayed by base%8, zeros elsewhere — exact: zero taps
        # contribute zero truncated terms). Removes the kernel's per-frame
        # roll, its single largest cost (RESULTS.md round-3 decomposition).
        m = rows_clamped % 8
        rows_launch = rows_clamped - m
        kv = _phase_shift_kvals(kvals, m).T                      # (T+8, N)
    else:
        rows_launch = rows_clamped
        kv = kvals.T                                             # (T, N)
    kv_rows = max_taps + 8 if shift_kv else max_taps
    meta = jnp.stack([eps, q], axis=1)
    meta = jnp.pad(meta, ((0, 0), (0, LANES - 2)))

    step_frames = FRAMES_PER_TILE * group
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(lanes // LANES, n_out // step_frames),
        in_specs=[
            pl.BlockSpec((step_frames, LANES), lambda i, j, *_: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kv_rows, step_frames), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, LANES), lambda i, j, *_: (0, i + tile0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (step_frames, LANES), lambda i, j, *_: (j, i), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        partial(
            _kernel_general, max_taps=max_taps, w_load=w_load, group=group,
            clamp_s16=clamp_s16, shift_kv=shift_kv,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_out, lanes), jnp.int16 if clamp_s16 else jnp.int32
        ),
        interpret=interpret,
    )(rows_launch, meta, kv, x)
    return out, rows


# ---------------------------------------------------------------------------
# Polyphase Pallas kernel for exact integer strides (increment_lo == 0)
# ---------------------------------------------------------------------------

# VMEM budgets for the polyphase strided kernels (v5e scoped vmem is 16M;
# measured: 2 x 8736-row phase blocks = 17.31M OOMs, so cap the double-buffered
# input footprint at the same 12288 rows the tiled kernel uses).
STRIDED_FUSED_MAX_ROWS = 12288   # total input rows (all d phase blocks resident)
STRIDED_WIDE_MAX_ROWS = 12288    # rows per phase block (S // d)


def strided_phase_taps(max_taps: int, d: int) -> int:
    """Tap-pairs per phase row: 1 + ceil((T-1)/d) covers any s0 in [0, d)."""
    return 1 + -(-(max_taps - 1) // d)


def choose_strided_plan(s: int, d: int, n_out: int, max_taps: int):
    """Pick the polyphase strided variant for an (input rows, stride, frames,
    taps) launch: ("fused"|"wide", group) or None when only the XLA path fits
    (undersized n_out grain, a VMEM-exceeding buffer, or — the span
    contract — a buffer without the polyphase over-read padding:
    s >= (n_out - 8*group)*d + strided_phase_padding, mirroring
    resample_integer_stride's static span check so a buffer sized for the
    XLA path is never silently window-shifted by the kernels' base clamp)."""
    groups = [32, 8] if n_out % 256 == 0 else ([8] if n_out % 64 == 0 else [])
    for group in groups:
        if s < (n_out - 8 * group) * d + strided_phase_padding(max_taps, d, group):
            continue  # smaller group over-reads less; retry before XLA
        if s <= STRIDED_FUSED_MAX_ROWS:
            return ("fused", group)
        if s // d <= STRIDED_WIDE_MAX_ROWS:
            return ("wide", group)
        return None
    return None


def _strided_w_load(max_taps: int, d: int, group: int = 8) -> int:
    """Aligned window rows per GROUP grid step in decimated (phase) space:
    8*group frames x stride 1 + n_j taps + alignment slack, power of two
    for roll."""
    n_j = strided_phase_taps(max_taps, d)
    w = 16
    while w < 8 * group + n_j + 15:
        w *= 2
    return w


def strided_phase_padding(max_taps: int, d: int, group: int = 8) -> int:
    """Input rows required beyond the last grid step's base row: the caller
    must provide S >= rows[0] + (n_out - 8*group)*d + this."""
    return d * (_strided_w_load(max_taps, d, group) + 8)


def _kernel_strided(
    step_rows_ref,  # scalar prefetch (N/(8*G),): per-grid-step base row
    kv_ref,         # (d*n_j + 1, 128) block: per-(phase, j) taps + q0 last row
    *refs,          # d x (S2, 128) phase-view blocks, then the out block
    n_j: int,
    d: int,
    w_load: int,
    group: int,
    clamp_s16: bool,
):
    """Fused integer-stride MAC in decimated row space (stride is exactly 1).

    The free row-major view x[(S, L)] -> x2[(S/d, d*L)] puts input row
    r = d*i + m at phase-block m of view row i, so an output frame whose
    window starts at row r0 + n*d reads view rows n0 + n + j (stride ONE per
    frame, no Bresenham jitter) at phase m, weighted k[d*j + m - s0]
    (clownresampler.h:1008-1021 re-indexed by t = d*j + m - s0). Because
    consecutive frames advance by exactly one view row, a whole 8*group-frame
    grid step shares ONE aligned load + roll per phase (the tiled kernel
    needs one per 8-frame tile); every window is then a static sublane
    slice. All d phases arrive as separate lane-tile refs of the same view
    (index-mapped 128-lane columns, one per phase block), so the tap sum
    folds across phases in VMEM — exact under the per-term trunc semantics
    (_macc: the reference's tap sum is a plain sum of independently
    truncated terms in any order) — and the 17.15 normalisation
    (clownresampler.h:1025-1033) happens in-kernel. No partial arrays, no
    XLA epilogue.
    """
    x_refs, out_ref = refs[:-1], refs[-1]
    jg = pl.program_id(1)
    base = step_rows_ref[jg]
    a = pl.multiple_of((base // 8) * 8, 8)
    rs = [
        pltpu.roll(x_refs[m][pl.ds(a, w_load), :], -(base - a), axis=0)
        for m in range(d)
    ]
    q = kv_ref[d * n_j : d * n_j + 1, :]
    results = []
    for g in range(group):
        acc = jnp.zeros((FRAMES_PER_TILE, LANES), jnp.int32)
        for m in range(d):
            r = rs[m]
            for j in range(n_j):
                o = g * FRAMES_PER_TILE + j
                acc = _macc(
                    r[o : o + FRAMES_PER_TILE],
                    kv_ref[m * n_j + j : m * n_j + j + 1, :],
                    acc,
                )
        results.append(fx.mul_shift15(acc, q))
    out = jnp.concatenate(results, axis=0)
    if clamp_s16:
        out = jnp.clip(out, -0x7FFF, 0x7FFF).astype(jnp.int16)
    out_ref[:, :] = out


def _kernel_strided_partial(
    step_rows_ref,  # scalar prefetch (N/(8*G),): per-grid-step base row
    kv_ref,         # (n_j, 128) block: this phase's tap values, lane-repeated
    x_ref,          # (S2, 128) phase-view lane-tile block, int32
    out_ref,        # (8*G, 128) partial-accumulation block
    *,
    n_j: int,
    w_load: int,
    group: int,
):
    """Wide-buffer variant of _kernel_strided: one phase per grid step.

    Each step touches a single (S2, 128) phase block (VMEM footprint S/d
    rows instead of S), emitting per-phase int32 partial tap sums that
    resample_strided_phases_wide folds and normalises in an XLA epilogue.
    Used when the full input exceeds the VMEM input budget that the fused
    kernel's d simultaneous phase blocks would need.
    """
    jg = pl.program_id(1)
    base = step_rows_ref[jg]
    a = pl.multiple_of((base // 8) * 8, 8)
    window = x_ref[pl.ds(a, w_load), :]
    r = pltpu.roll(window, -(base - a), axis=0)
    results = []
    for g in range(group):
        acc = jnp.zeros((FRAMES_PER_TILE, LANES), jnp.int32)
        for j in range(n_j):
            o = g * FRAMES_PER_TILE + j
            acc = _macc(r[o : o + FRAMES_PER_TILE], kv_ref[j : j + 1, :], acc)
        results.append(acc)
    out_ref[:, :] = jnp.concatenate(results, axis=0)


def _strided_setup(table, x, state, *, max_taps, n_out, d, group):
    """Shared XLA-side precompute for the polyphase strided kernels.

    Returns (x2 view, kv_small (n_j, d), q0, rows, step_rows, n_j, w_load,
    s2): the decimated view, the per-(j, phase) tap table re-indexed by
    t = d*j + m - s0, the constant normaliser, and per-grid-step base rows.
    """
    s, l = x.shape
    n_j = strided_phase_taps(max_taps, d)
    w_load = _strided_w_load(max_taps, d, group)
    s2 = s // d
    x2 = x[: s2 * d].reshape(s2, d * l)          # free view: row i = rows d*i..d*i+d-1

    # increment_lo == 0: the phase fraction is constant, so ONE frame's
    # geometry (tap vector, normaliser, first window row) serves the whole
    # launch — skip the O(n_out x taps) LUT gather and the per-frame
    # reciprocals that the varying-frac kernels need.
    rows8, kvals, q, _eps, _tiles = precompute_launch(
        table, state, max_taps=max_taps, n_out=FRAMES_PER_TILE
    )
    r0 = rows8[0]                                 # rows[n] = r0 + n*d exactly
    rows = r0 + d * jnp.arange(n_out, dtype=jnp.int32)
    s0 = r0 % d
    n0 = r0 // d
    k0 = kvals[0]                                 # (T,) constant across frames
    jj = jnp.arange(n_j, dtype=jnp.int32)[:, None]
    mm = jnp.arange(d, dtype=jnp.int32)[None, :]
    t = d * jj + mm - s0                          # tap index per (j, phase)
    kv_small = jnp.where(
        (t >= 0) & (t < max_taps), jnp.take(k0, jnp.clip(t, 0, max_taps - 1)), 0
    )

    step_frames = FRAMES_PER_TILE * group
    n_steps = n_out // step_frames
    step_rows = jnp.clip(
        n0 + step_frames * jnp.arange(n_steps, dtype=jnp.int32),
        0, max(s2 - w_load, 0),
    )
    return x2, kv_small, q[0], rows, step_rows, n_j, w_load, s2


@partial(
    jax.jit,
    static_argnames=(
        "max_taps", "n_out", "d", "group", "clamp_s16", "interpret",
        "lanes", "lane_offset",
    ),
)
def resample_strided_phases(
    table,
    x,                   # (S, L) int32; S >= rows[0] + (n_out-8)*d + strided_phase_padding
    state: DeviceState,
    *,
    max_taps: int,
    n_out: int,          # static; multiple of 8*group
    d: int,              # static integer stride = increment >> 16, >= 2
    group: int = 8,
    clamp_s16: bool = False,
    interpret: bool = False,
    lanes: Optional[int] = None,   # static sub-launch width (default: all of x)
    lane_offset: int = 0,          # static first lane column (multiple of 128)
):
    """Pallas integer-stride resample via polyphase decimation-as-a-view.

    With increment_lo == 0 the phase fraction is constant: one tap vector k0
    and one normaliser q0 serve every frame, and window rows advance by
    exactly d (clownresampler.h:1076-1078 with a zero fractional increment).
    Rather than strided device loads, reinterpret the input as
    (S//d, d*L) — a free row-major reshape — where every frame's window is a
    STRIDE-1 sublane slice: the same aligned-load + roll access pattern as
    the headline tiled kernel, with ~T/d tap iterations per phase, zero
    candidate selects, and a single load + roll per phase per 8*group-frame
    grid step (see _kernel_strided).

    Replaces resample_integer_stride (pure-XLA) on the hot path: XLA
    materialises per-tap intermediates there (~7x slower per sample,
    benchmarks/RESULTS.md); here all T MACs run in VMEM per grid step.

    VMEM: all d phase blocks are resident per grid step — total input
    footprint is the full S rows (like the tiled kernel). For inputs past
    that budget use resample_strided_phases_wide (S/d rows per step).
    """
    assert d >= 2
    s, l = x.shape
    lanes = l if lanes is None else lanes
    assert lanes % LANES == 0 and lane_offset % LANES == 0
    assert lane_offset + lanes <= l
    assert n_out % (FRAMES_PER_TILE * group) == 0
    # Over-read contract (see strided_phase_padding): an undersized buffer
    # would let the per-grid-step base clamp silently shift real frames'
    # windows. choose_strided_plan enforces the same bound for dispatchers.
    assert s >= (n_out - 8 * group) * d + strided_phase_padding(max_taps, d, group), (
        f"input rows {s} below the polyphase over-read span for n_out={n_out},"
        f" d={d}, taps={max_taps}, group={group}; use the XLA strided path"
    )
    x2, kv_small, q0, rows, step_rows, n_j, w_load, s2 = _strided_setup(
        table, x, state, max_taps=max_taps, n_out=n_out, d=d, group=group
    )
    # (d*n_j + 1, 128): row m*n_j + j = phase m's tap j; last row = q0.
    kv = jnp.repeat(kv_small.T.reshape(d * n_j, 1), LANES, axis=1)
    kv = jnp.concatenate(
        [kv, jnp.broadcast_to(q0, (1, LANES)).astype(jnp.int32)], axis=0
    )

    per_phase = lanes // LANES                    # lane tiles per phase block
    off = lane_offset // LANES
    stride_tiles = l // LANES                     # phase-block stride in x2 tiles
    step_frames = FRAMES_PER_TILE * group
    x_specs = [
        pl.BlockSpec(
            (s2, LANES),
            lambda i, j, *_, m=m: (0, m * stride_tiles + off + i),
            memory_space=pltpu.VMEM,
        )
        for m in range(d)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(per_phase, n_out // step_frames),
        in_specs=[
            pl.BlockSpec(
                (d * n_j + 1, LANES), lambda i, j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            *x_specs,
        ],
        out_specs=pl.BlockSpec(
            (step_frames, LANES), lambda i, j, *_: (j, i), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        partial(
            _kernel_strided, n_j=n_j, d=d, w_load=w_load, group=group,
            clamp_s16=clamp_s16,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_out, lanes), jnp.int16 if clamp_s16 else jnp.int32
        ),
        interpret=interpret,
    )(step_rows, kv, *([x2] * d))
    return out, rows


@partial(
    jax.jit,
    static_argnames=(
        "max_taps", "n_out", "d", "group", "clamp_s16", "interpret",
        "lanes", "lane_offset",
    ),
)
def resample_strided_phases_wide(
    table,
    x,                   # (S, L) int32; same padding contract as the fused kernel
    state: DeviceState,
    *,
    max_taps: int,
    n_out: int,          # static; multiple of 8*group
    d: int,              # static integer stride = increment >> 16, >= 2
    group: int = 8,
    clamp_s16: bool = False,
    interpret: bool = False,
    lanes: Optional[int] = None,   # static sub-launch width (default: all of x)
    lane_offset: int = 0,          # static first lane column (multiple of 128)
):
    """Wide-buffer polyphase strided resample: one phase per grid step.

    Same math as resample_strided_phases but each grid step holds a single
    (S/d, 128) phase block in VMEM, so inputs up to d times the fused
    kernel's budget work. Emits per-phase int32 partial tap sums
    (n_out, d*lanes); an XLA epilogue folds the d phase blocks and applies
    the 17.15 normalisation (clownresampler.h:1025-1033) — one extra HBM
    round-trip of the partial, which the fused kernel avoids.
    """
    assert d >= 2
    s, l = x.shape
    lanes = l if lanes is None else lanes
    assert lanes % LANES == 0 and lane_offset % LANES == 0
    assert lane_offset + lanes <= l
    assert n_out % (FRAMES_PER_TILE * group) == 0
    # Same over-read contract as resample_strided_phases (see there).
    assert s >= (n_out - 8 * group) * d + strided_phase_padding(max_taps, d, group), (
        f"input rows {s} below the polyphase over-read span for n_out={n_out},"
        f" d={d}, taps={max_taps}, group={group}; use the XLA strided path"
    )
    x2, kv_small, q0, rows, step_rows, n_j, w_load, s2 = _strided_setup(
        table, x, state, max_taps=max_taps, n_out=n_out, d=d, group=group
    )
    kv = jnp.repeat(kv_small, LANES, axis=1)      # (n_j, d*128)

    per_phase = lanes // LANES                    # lane tiles per phase block
    off = lane_offset // LANES
    stride_tiles = l // LANES                     # phase-block stride in x2 tiles
    step_frames = FRAMES_PER_TILE * group
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d * per_phase, n_out // step_frames),
        in_specs=[
            pl.BlockSpec(
                (n_j, LANES),
                lambda i, j, *_: (0, i // per_phase),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (s2, LANES),
                lambda i, j, *_: (0, (i // per_phase) * stride_tiles + off + i % per_phase),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (step_frames, LANES), lambda i, j, *_: (j, i), memory_space=pltpu.VMEM
        ),
    )
    partial_out = pl.pallas_call(
        partial(_kernel_strided_partial, n_j=n_j, w_load=w_load, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, d * lanes), jnp.int32),
        interpret=interpret,
    )(step_rows, kv, x2)
    acc = partial_out.reshape(n_out, d, lanes).sum(axis=1)
    out = fx.mul_shift15(acc, q0)
    if clamp_s16:
        out = jnp.clip(out, -0x7FFF, 0x7FFF).astype(jnp.int16)
    return out, rows


# ---------------------------------------------------------------------------
# XLA strided path for exact integer strides (increment fractional part == 0)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_taps", "n_out", "d", "clamp_s16",
                                   "lanes", "lane_offset"))
def resample_integer_stride(
    table,
    x,                   # (S, L) int32, padded so row rows[0] + (n_out-1)*d + T fits
    state: DeviceState,
    *,
    max_taps: int,
    n_out: int,
    d: int,              # static integer stride = increment >> 16, >= 1
    clamp_s16: bool = False,
    lanes: Optional[int] = None,   # static sub-launch width (default: all of x)
    lane_offset: int = 0,
):
    """Exact-integer-stride resample (e.g. 2:1 96k->48k, BASELINE config 2).

    With increment_lo == 0 the phase fraction is constant, so the tap kernel
    vector and the normaliser are a single (T,)/scalar and window rows are
    exactly rows[0] + n*d: each tap contributes a *static strided slice* of
    the input — plain vectorised XLA, no gather, no Pallas needed.
    """
    if lanes is not None and (lane_offset != 0 or lanes != x.shape[1]):
        x = jax.lax.slice_in_dim(x, lane_offset, lane_offset + lanes, axis=1)
    s, l = x.shape
    span = (n_out - 1) * d + max_taps
    if span + 8 > s:
        raise ValueError(
            f"input has {s} rows but the strided span needs {span + 8}; pad the"
            f" input or reduce n_out (n_out={n_out}, d={d}, taps={max_taps})"
        )
    # One frame's geometry serves the whole launch (constant fraction);
    # rows are closed-form r0 + n*d. See _strided_setup.
    rows8, kvals, q, _eps, _tile = precompute_launch(
        table, state, max_taps=max_taps, n_out=8
    )
    rows = rows8[0] + d * jnp.arange(n_out, dtype=jnp.int32)
    k0 = kvals[0]                      # (T,) — constant across frames
    q0 = q[0]
    # row0 is dynamic (position state); slice once, then stride. Clamping only
    # ever moves the window when padding frames (results discarded) would read
    # past the end — legal frames satisfy row0 + span <= s by the padding
    # contract plus the check above.
    row0 = jnp.minimum(rows[0], s - span)
    xwin = jax.lax.dynamic_slice_in_dim(x, row0, span, axis=0)
    acc = jnp.zeros((n_out, l), jnp.int32)
    for t in range(max_taps):
        sl = jax.lax.slice_in_dim(xwin, t, t + (n_out - 1) * d + 1, stride=d, axis=0)
        acc = _macc(sl, k0[t], acc)
    out = fx.mul_shift15(acc, q0)
    if clamp_s16:
        out = jnp.clip(out, -0x7FFF, 0x7FFF).astype(jnp.int16)
    return out, rows


# ---------------------------------------------------------------------------
# Wide-kernel fast path (taps > FAST_KERNEL_MAX_TAPS): per-frame DMA kernel
# ---------------------------------------------------------------------------

WIDE_FRAME_GROUP = 8      # frames per grid step (out block sublane count)
WIDE_MAX_LAUNCH_FRAMES = 64   # caps the duplicated kv layout's footprint


def wide_max_launch_frames(max_taps: int) -> int:
    """Frames-per-launch cap for resample_wide_taps at this reserved width.

    64 everywhere the wide kernel normally serves: the round-5 launch-size
    sweep (v5e, 512 lanes) measured LARGER launches strictly slower past the
    shift band (taps 1016: 0.399 G at 64 frames vs 0.245 at 256; taps 2008:
    0.202 vs 0.112 at 192), and the duplicated kv layout's footprint scales
    with frames x width. SMALL widths invert: a 64-frame launch is overhead-
    bound there (taps 40: 1.03 G at 64 frames vs 6.0 G at 256; taps 136:
    0.80 vs 1.85), and the only dispatcher that sends such widths wide is
    the farm's compile-envelope-failure reroute (general-class staging
    shapes with no legal frame group) — so the shift-band interior gets the
    256-frame cap it measured fastest at."""
    return 256 if max_taps <= 136 else WIDE_MAX_LAUNCH_FRAMES
# MAC rows per grid step along the tap-block axis. Bounds the kernel's live
# vector temporaries: one whole-window multiply at radius 3007 (w=6032)
# keeps several (w, 128) buffers live across the 8 unrolled frames and
# blows the 16M scoped-vmem stack (measured 21-22M); with the tap axis in
# the GRID, each step touches (512, 128) slices only.
WIDE_MAC_BLOCK = 512
# Whole-window MAC hybrid: when w itself is below this bound, the MAC block
# is the WHOLE window (one tap-grid step), recovering the faster
# single-visit form (902x vs 864x at radius 1003, benchmarks/RESULTS.md) —
# the Mosaic stack cost scales ~linearly with the block rows (measured
# 21-22M at w=6032), so w <= 3072 stays ~11M under the 16M scoped-vmem
# limit. Hardware-verified at the bound by tools/verify_tpu.py.
WIDE_WHOLE_MAC_MAX_W = 3072


def _kernel_wide_taps(
    g_ref,          # scalar prefetch (G,): clamped 8-aligned GROUP base rows
    o_ref,          # scalar prefetch (N_pad,): per-frame window offsets
                    # within the group window (8-aligned, pre-clamped in XLA)
    kv_ref,         # (WIDE_MAC_BLOCK, 128) block per (tap block, group):
                    # col n = frame n's phase-shifted tap slice
    x_ref,          # FULL (S, L) input in HBM (DMA'd manually)
    out_ref,        # (8, 128) block: per-frame raw tap sums, ACCUMULATED
                    # across the tap-block grid axis (index map ignores k)
    scratch,        # VMEM (span, 128) group-window buffer
    sem,            # DMA semaphore
    *,
    w: int,         # static true window rows (taps + 8)
    span: int,      # static rows per group window (>= 7*d + w + slack)
    tile0: int,
    mac_block: int, # static MAC rows per tap-grid step (w itself when the
                    # whole-window form is stack-safe; WIDE_MAC_BLOCK else)
):
    """Raw tap sums for 8 output frames with the input resident in HBM.

    The reference serves its widest accepted ratios (stretched radius up to
    3007, tap windows up to ~24,576 samples) with the same scalar loop as
    narrow ones (clownresampler.h:974-975, 986-1035); the VMEM-resident
    fast kernels cannot — their whole input block must fit on chip. Here
    ONE async HBM->VMEM DMA per 8-frame GROUP copies the union of the
    group's tap windows (consecutive wide windows overlap by ~(T-d)/T, so
    the union span is ~(7d+T) rows vs 8T for per-frame copies — ~3.7x less
    traffic at radius 1003); the tap axis is a GRID dimension (k,
    innermost), each step multiplying every frame's (WIDE_MAC_BLOCK, 128)
    aligned window slice against its kernel-column slice and accumulating
    into the revisited out block — so the live vector temporaries stay
    bounded regardless of tap width (exact: the tap sum is a plain sum of
    independently truncated terms in any order). The per-frame kernel
    columns were pre-shifted by the window's 8-alignment residue in XLA —
    no in-kernel roll. Normalisation (1025-1033) happens in the XLA
    epilogue, where the per-frame reciprocal already lives.
    """
    i = pl.program_id(0)
    jf = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        base = pl.multiple_of(g_ref[jf], 8)
        dma = pltpu.make_async_copy(
            x_ref.at[pl.ds(base, span), pl.ds((i + tile0) * LANES, LANES)],
            scratch,
            sem,
        )
        dma.start()
        dma.wait()

    # Tap block k covers window rows [k*KB, k*KB+KB), except the LAST block,
    # which is pulled back to end exactly at w (its kernel column zeroes the
    # overlap with the previous block) so the kernel never reads past a
    # frame's true w-row window — the caller contract guarantees only w.
    # min() expresses both cases uniformly (w >= KB always; equality in the
    # whole-window hybrid, where the single block IS the window).
    kb0 = jnp.minimum(k * mac_block, w - mac_block)
    part = _wide_mac_part(scratch, o_ref, kv_ref, jf, kb0, mac_block)

    @pl.when(k == 0)
    def _():
        out_ref[:, :] = part

    @pl.when(k > 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + part


def _wide_mac_part(scratch, o_ref, kv_ref, jf, kb0, mac_block):
    """One tap-block MAC for all 8 frames of group ``jf`` read from the
    given group-window scratch buffer: (8, 128) partial tap sums."""
    rows_out = []
    for n in range(WIDE_FRAME_GROUP):
        off = pl.multiple_of(o_ref[jf * WIDE_FRAME_GROUP + n], 8)
        start = pl.multiple_of(off + kb0, 8)
        win = scratch[pl.ds(start, mac_block), :]
        kcol = kv_ref[:, n : n + 1]
        terms = _macc(win, kcol, jnp.zeros_like(win))
        rows_out.append(jnp.sum(terms, axis=0, keepdims=True))   # (1, 128)
    return jnp.concatenate(rows_out, axis=0)                     # (8, 128)


def _kernel_wide_taps_pipelined(
    g_ref, o_ref, kv_ref, x_ref, out_ref,
    scratch0, scratch1,      # VMEM (span, 128) DOUBLE-BUFFERED group windows
    sem0, sem1,              # one DMA semaphore per buffer
    *,
    w: int,
    span: int,
    tile0: int,
    mac_block: int,
    n_i: int,                # static lane-tile count (grid dim 0 extent)
    n_groups: int,           # static group count (grid dim 1 extent)
):
    """_kernel_wide_taps with the group-window DMA software-pipelined.

    The plain kernel starts and immediately waits its group DMA at k == 0,
    serializing the HBM copy against the group's MACs. Here group windows
    alternate between two scratch buffers by GLOBAL group parity (the grid
    runs lexicographically with k innermost, so (i, jf) pairs enumerate
    groups in order and parity alternates step to step): at each group's
    k == 0 the kernel waits the copy a PREVIOUS step already started into
    this group's buffer, then starts the NEXT group's copy into the other
    buffer — that copy proceeds while this group's n_k MAC steps run. The
    first group self-starts. Buffer reuse is safe without extra sync: the
    copy into a given buffer is started by the group immediately before
    its reader and targets the buffer the PREVIOUS-previous group finished
    reading at its own last grid step (grid steps execute in order; only
    the copies are asynchronous). Parity branches duplicate the MAC body
    so every scratch reference stays static (dynamic ref selection would
    load both buffers). Costs a second (span, 128) buffer — the dispatcher
    gates on the scoped-vmem estimate (wide_pipeline_auto)."""
    i = pl.program_id(0)
    jf = pl.program_id(1)
    k = pl.program_id(2)
    gidx = i * n_groups + jf
    par = jax.lax.rem(gidx, 2)

    def copy(dst, sem, base, lane_i):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(base, span), pl.ds((lane_i + tile0) * LANES, LANES)],
            dst,
            sem,
        )

    @pl.when(k == 0)
    def _():
        base_cur = pl.multiple_of(g_ref[jf], 8)
        last_j = jf == n_groups - 1
        j2 = jnp.where(last_j, 0, jf + 1)
        i2 = jnp.where(last_j, i + 1, i)
        nxt_valid = i2 < n_i
        i2c = jnp.minimum(i2, n_i - 1)
        base_nxt = pl.multiple_of(g_ref[j2], 8)

        @pl.when(gidx == 0)
        def _():
            copy(scratch0, sem0, base_cur, i).start()

        @pl.when(par == 0)
        def _():
            copy(scratch0, sem0, base_cur, i).wait()

            @pl.when(nxt_valid)
            def _():
                copy(scratch1, sem1, base_nxt, i2c).start()

        @pl.when(par == 1)
        def _():
            copy(scratch1, sem1, base_cur, i).wait()

            @pl.when(nxt_valid)
            def _():
                copy(scratch0, sem0, base_nxt, i2c).start()

    kb0 = jnp.minimum(k * mac_block, w - mac_block)

    @pl.when(par == 0)
    def _():
        part = _wide_mac_part(scratch0, o_ref, kv_ref, jf, kb0, mac_block)

        @pl.when(k == 0)
        def _():
            out_ref[:, :] = part

        @pl.when(k > 0)
        def _():
            out_ref[:, :] = out_ref[:, :] + part

    @pl.when(par == 1)
    def _():
        part = _wide_mac_part(scratch1, o_ref, kv_ref, jf, kb0, mac_block)

        @pl.when(k == 0)
        def _():
            out_ref[:, :] = part

        @pl.when(k > 0)
        def _():
            out_ref[:, :] = out_ref[:, :] + part


# Gate for the double-buffered group-DMA variant (see
# _kernel_wide_taps_pipelined). Measured on hardware (round 4,
# tools/probe_midwide.py pipeline, 64 frames x 1024 lanes):
#   taps 6016 (blocked path, span 13072): 0.988 vs 1.610 ms  -> 1.63x WIN
#   taps 2008 (whole-window MAC):         0.314 vs 0.311 ms  -> 0.99x loss
#   taps 1016 (whole-window MAC):         0.175 vs 0.172 ms  -> 0.99x loss
# The whole-window path leaves no DMA exposed worth hiding (its dmasplit
# share measured -2..11%), so auto only ever pipelines the BLOCKED path
# (mac_block < w), where the serial per-group [DMA -> n_k MAC steps] chain
# leaves the copy fully exposed.
WIDE_PIPELINE_ENABLED = True

# Scoped-vmem stack estimate: 2 x (span, 128) int32 scratch (exact) + ~5
# live (mac_block, 128) MAC temporaries (the single-buffer 21-22M
# measurement at mac_block 6032 prices the MAC stack at ~5 blocks).
# Hardware calibration: the blocked form at the domain's widest point
# (span 13072, mac_block 512 -> est 14.7M) COMPILES on v5e (16M limit);
# the budget keeps ~0.9M of margin under that limit.
WIDE_PIPELINE_VMEM_BUDGET = 15_500 * 1024


def wide_pipeline_fits(w: int, mac_block: int, span: int) -> bool:
    """Scoped-vmem budget test for the double-buffered variant: the doubled
    scratch + MAC stack estimate must fit next to the kv/out blocks."""
    est = (2 * span + 5 * mac_block) * 512
    return est <= WIDE_PIPELINE_VMEM_BUDGET


def wide_pipeline_auto(w: int, mac_block: int, span: int) -> bool:
    """Default pipeline choice for resample_wide_taps: blocked path only
    (the measured win — whole-window widths lose 1%, see the gate comment)
    AND the doubled scratch + MAC stack estimate fits the scoped budget."""
    return (WIDE_PIPELINE_ENABLED and mac_block < w
            and wide_pipeline_fits(w, mac_block, span))


@partial(
    jax.jit,
    static_argnames=("max_taps", "n_out", "d", "clamp_s16", "interpret",
                     "lanes", "lane_offset", "pipeline"),
)
def resample_wide_taps(
    table,
    x,                   # (S, L) int32; S >= last window row + max_taps + 8.
                         # NOT VMEM-bounded (stays in HBM).
    state: DeviceState,
    *,
    max_taps: int,       # static; any width the reference accepts
    n_out: int,          # static; multiple of 8,
                         # <= wide_max_launch_frames(max_taps)
    d: int,              # static stride bound: increment >> 16 (sizes the
                         # per-group DMA window)
    clamp_s16: bool = False,
    interpret: bool = False,
    lanes: Optional[int] = None,
    lane_offset: int = 0,
    table_strided=None,
    pipeline: Optional[bool] = None,  # None = wide_pipeline_auto
):
    """Any-ratio resample for kernels wider than the VMEM-resident paths.

    Covers the full accepted configure domain (kernel_scale < 0x1000, radius
    up to 3007 at defaults — clownresampler.h:974-975): the input never
    enters a VMEM block, so there is no input-row budget; each 8-frame
    group's union tap window arrives by one DMA (see _kernel_wide_taps).
    Works for any increment with hi word == d (per-frame geometry);
    bit-exact vs ops.convolve (tests/test_pallas.py) and vs the C oracle
    scripts at radius 1003/3007.
    Returns (out (n_out, lanes) int32|int16, rows (n_out,)).
    """
    s, l = x.shape
    lanes = l if lanes is None else lanes
    assert lanes % LANES == 0 and lane_offset % LANES == 0
    assert lane_offset + lanes <= l
    assert n_out % WIDE_FRAME_GROUP == 0
    assert n_out <= wide_max_launch_frames(max_taps), (
        "tile wide launches (dispatchers do)")
    # Every alignment claim below (pl.multiple_of on off+kb0, the 8-aligned
    # clamp bounds) presumes an 8-aligned reserved width; dispatchers round
    # max_taps up, but a direct caller must too — silently wrong windows
    # otherwise, so make the contract explicit.
    assert max_taps % 8 == 0, "max_taps must be a multiple of 8"
    w = max_taps + 8
    # Widths below WIDE_MAC_BLOCK run the whole-window hybrid (mac_block = w,
    # one tap-grid step), so any 8-aligned width the dispatchers send is
    # servable; the blocked path (w > WIDE_WHOLE_MAC_MAX_W) always has
    # w >= WIDE_MAC_BLOCK.
    assert s >= w, "input shorter than one tap window"
    # Union span of a group's 8 windows: rows advance <= d+1 per frame plus
    # the group base's alignment loss. Capped by the buffer itself (legal
    # frames' windows all fit in s, so a window of floor8(s) rows covers any
    # group whose formula span exceeds the buffer).
    span = min(-(-(7 * d + w + 16) // 8) * 8, (s // 8) * 8)
    tile0 = lane_offset // LANES

    rows, kvals, q, _eps, _tiles = precompute_launch(
        table, state, max_taps=max_taps, n_out=n_out, table_strided=table_strided
    )
    m = rows % 8                                         # alignment residue
    # 8-aligned per-frame window starts; the upper clamps (8-aligned too)
    # only ever move PADDING frames' windows — legal frames fit by the
    # caller contract.
    a = jnp.clip(rows - m, 0, ((s - w) // 8) * 8)
    gbase = jnp.clip(a[::WIDE_FRAME_GROUP], 0, ((s - span) // 8) * 8)  # (G,)
    offs = jnp.clip(
        a - jnp.repeat(gbase, WIDE_FRAME_GROUP), 0, span - w
    )                                                    # (N,) 8-aligned
    kv8 = _phase_shift_kvals(kvals, m)                   # (N, W)
    # Whole-window hybrid: one tap-grid step when the single-block MAC is
    # stack-safe (see WIDE_WHOLE_MAC_MAX_W) — fewer out-block revisits.
    # Larger BLOCKED sizes measured perf-neutral at radius 3007 (3072-row
    # blocks: identical 0.419 ms/iter — the path is MAC/DMA-volume-bound,
    # not revisit-bound) and waste up to mac_block-8 zero-padded MAC rows
    # for widths just past a block boundary, so 512 stays.
    mac_block = w if w <= WIDE_WHOLE_MAC_MAX_W else WIDE_MAC_BLOCK
    if pipeline is None:
        pipeline = wide_pipeline_auto(w, mac_block, span)
    # Per-MAC-block kernel columns: block k holds taps [k*KB, k*KB+KB),
    # except the LAST block, pulled back to end at w with its overlap taps
    # zeroed (see the kernel's kb0) — so nothing reads past the w-row
    # window and the pad taps stay exact zeros.
    n_k = -(-w // mac_block)
    if n_k * mac_block != w:
        head = kv8[:, : (n_k - 1) * mac_block]
        overlap = n_k * mac_block - w
        tail = jnp.concatenate(
            [
                jnp.zeros((kv8.shape[0], overlap), kv8.dtype),
                kv8[:, (n_k - 1) * mac_block :],
            ],
            axis=1,
        )
        kv8 = jnp.concatenate([head, tail], axis=1)      # (N, n_k*KB)
    w_blocks = n_k * mac_block
    # Group layout: (W_blocks, G*128), group g's frames in lanes g*128..+8.
    n_groups = n_out // WIDE_FRAME_GROUP
    kvg = kv8.reshape(n_groups, WIDE_FRAME_GROUP, w_blocks).transpose(0, 2, 1)
    kvg = jnp.pad(kvg, ((0, 0), (0, 0), (0, LANES - WIDE_FRAME_GROUP)))
    kvg = kvg.transpose(1, 0, 2).reshape(w_blocks, n_groups * LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(lanes // LANES, n_groups, n_k),
        in_specs=[
            pl.BlockSpec((mac_block, LANES),
                         lambda i, jf, k, *_: (k, jf),
                         memory_space=pltpu.VMEM),
            # Explicitly HBM: pl.ANY let the compiler pull the whole input
            # into VMEM, defeating the kernel's purpose (and its tiled-memref
            # slicing then demands alignment proofs the DMA path doesn't).
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (WIDE_FRAME_GROUP, LANES), lambda i, jf, k, *_: (jf, i),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(
            [
                pltpu.VMEM((span, LANES), jnp.int32),
                pltpu.VMEM((span, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ]
            if pipeline
            else [
                pltpu.VMEM((span, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ]
        ),
    )
    kern = (
        partial(_kernel_wide_taps_pipelined, w=w, span=span, tile0=tile0,
                mac_block=mac_block, n_i=lanes // LANES, n_groups=n_groups)
        if pipeline
        else partial(_kernel_wide_taps, w=w, span=span, tile0=tile0,
                     mac_block=mac_block)
    )
    acc = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, lanes), jnp.int32),
        interpret=interpret,
    )(gbase, offs, kvg, x)
    out = fx.mul_shift15(acc, q[:, None])
    if clamp_s16:
        out = jnp.clip(out, -0x7FFF, 0x7FFF).astype(jnp.int16)
    return out, rows


# ---------------------------------------------------------------------------
# Combined multi-launch: several uniform-ratio launches in ONE XLA program
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("plans", "interpret"))
def multi_resample(table, xs: tuple, states: tuple, plans: tuple,
                   interpret: bool = False, tstrs: Optional[tuple] = None) -> tuple:
    """Run several independent uniform-ratio launches as ONE device program.

    ``plans[i]`` is a hashable static tuple
    (kind, d, cand, max_taps, n_out, clamp_s16[, lanes, lane_offset[, group]])
    with kind in {"tiled", "strided", "strided_xla", "general", "wide",
    "oracle"}; the optional trailing ``group`` overrides the tiled kernel's
    frame-tiles per grid step (dispatchers pass 32 whenever the tile
    carries it — the round-5 honest sweep measured 32 at 0.615 ms vs the
    old fleet default 8 at 0.776 on the 2048-lane headline launch).
    xs[i]/states[i] are that launch's input block and phase state. The
    optional (lanes, lane_offset) pair runs the launch over a column slice
    of xs[i] with no copy — for ragged fleets; round-5 honest measurement
    shows shared-buffer column-slice sub-launches are strictly slower than
    one full-width launch (0.722-1.173 ms vs 0.495 for the strided shape;
    the old ~1.3-1.7x overlap claim was the dead-carry DCE fiction).
    Returns a tuple of outputs.

    Why this exists: dispatching a compiled program costs a flat ~25-35 us in
    this environment regardless of content (measured: a 128-lane launch and a
    4096-lane launch take the same wall time; benchmarks/RESULTS.md). A
    mixed-ratio fleet split into G ratio groups therefore pays G dispatch
    floors per chunk if each group launches separately; fusing the G launches
    into one jitted program pays one. Each group still runs its own
    plan-specialised kernel at full speed — this dominates a per-lane-group
    "ragged" kernel, which would force every group onto the slowest
    (general per-frame) code path to unify statics.
    """
    from clownresampler_tpu.ops.convolve import convolve_frames

    if tstrs is None:
        tstrs = (None,) * len(xs)
    outs = []
    for x, st, p, tstr in zip(xs, states, plans, tstrs):
        kind, d, cand, max_taps, n_out, clamp = p[:6]
        lanes, lane_offset = (p[6], p[7]) if len(p) > 6 else (None, 0)
        if kind == "general":
            # The caller may pin the group (p[8]); otherwise pick the largest
            # group inside the measured compile envelope. A launch shape
            # outside the envelope at ANY group downgrades to the gather
            # oracle (callers are expected to route such shapes to the wide
            # DMA kernel before reaching here — this is the safety net).
            eff_lanes = lanes if lanes is not None else x.shape[1]
            general_grp = (
                p[8] if len(p) > 8 and p[8] is not None
                else general_pick_group(n_out, x.shape[0], eff_lanes, max_taps)
            )
            if general_grp is None:
                kind = "oracle"
        if kind == "tiled":
            out, _ = resample_uniform_lanes_tiled(
                table, x, st, max_taps=max_taps, n_out=n_out, d=d, cand=cand,
                clamp_s16=clamp, interpret=interpret,
                lanes=lanes, lane_offset=lane_offset, table_strided=tstr,
                group=p[8] if len(p) > 8 else 8,
            )
        elif kind in ("strided", "strided_xla"):
            # "strided_xla" is an explicit caller downgrade (e.g. the farm's
            # staging buffer lacks the polyphase over-read padding); "strided"
            # picks the fastest variant the shapes allow.
            choice = (None if kind == "strided_xla"
                      else choose_strided_plan(x.shape[0], d, n_out, max_taps))
            if choice is None:
                out, _ = resample_integer_stride(
                    table, x, st, max_taps=max_taps, n_out=n_out, d=d,
                    clamp_s16=clamp, lanes=lanes, lane_offset=lane_offset,
                )
            else:
                variant, grp = choice
                fn = (resample_strided_phases if variant == "fused"
                      else resample_strided_phases_wide)
                out, _ = fn(
                    table, x, st, max_taps=max_taps, n_out=n_out, d=d,
                    group=grp, clamp_s16=clamp, interpret=interpret,
                    lanes=lanes, lane_offset=lane_offset,
                )
        elif kind == "general":
            out, _ = resample_uniform_lanes_general(
                table, x, st, max_taps=max_taps, n_out=n_out,
                clamp_s16=clamp, interpret=interpret, lanes=lanes,
                lane_offset=lane_offset, table_strided=tstr,
                group=general_grp,
            )
        elif kind == "wide":  # taps > FAST_KERNEL_MAX_TAPS: DMA kernel
            out, _ = resample_wide_taps(
                table, x, st, max_taps=max_taps, n_out=n_out, d=d,
                clamp_s16=clamp, interpret=interpret, lanes=lanes,
                lane_offset=lane_offset, table_strided=tstr,
            )
        else:  # "oracle": wide-kernel gather fallback (lowlevel.FAST_KERNEL_MAX_TAPS)
            if lanes is not None and (lane_offset != 0 or lanes != x.shape[1]):
                x = jax.lax.slice_in_dim(x, lane_offset, lane_offset + lanes, axis=1)
            n = jnp.arange(n_out, dtype=jnp.int32)
            pos, frac = fx.positions_from_state(
                st.position_integer, st.position_fractional,
                st.cfg.increment_hi, st.cfg.increment_lo, n,
            )
            out = convolve_frames(table, x, pos, frac, st.cfg, max_taps)
            if clamp:
                out = jnp.clip(out, -0x7FFF, 0x7FFF).astype(jnp.int16)
        outs.append(out)
    return tuple(outs)


# ---------------------------------------------------------------------------
# Dispatch planning
# ---------------------------------------------------------------------------

def plan_uniform(increment: int, n_out: int) -> dict:
    """Choose a kernel + static params for a launch at this increment.

    tiled   — Pallas kernel; d = increment>>16 in {0,1}
    strided — XLA static-strided path; increment fractional part == 0, d >= 2
    general — Pallas per-frame kernel; any other ratio (wide downsampling)
    """
    d = increment >> 16
    lo = increment & 0xFFFF
    if d <= 1:
        # eps(k) = ceil((a + k*lo)/2^16) - ceil(a/2^16) <= ceil(7*lo/2^16)
        # over an 8-frame tile (7*lo is never a multiple of 2^16 for 0<lo<2^16,
        # so the ceil covers the floor+1 worst case).
        cand = 1 + (0xFFFF + 7 * lo) // 65536
        return {"kernel": "tiled", "d": d, "cand": min(cand, 8)}
    if lo == 0:
        return {"kernel": "strided", "d": d}
    return {"kernel": "general", "d": d}

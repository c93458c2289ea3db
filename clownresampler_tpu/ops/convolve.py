"""Batched windowed-sinc convolution — the lowest-level resample op.

Re-expresses ClownResampler_LowestLevel_Resample (clownresampler.h:986-1035)
as a data-parallel computation over a whole vector of output frames at once.
The reference computes one output frame per call inside a sequential
per-output-frame loop; here the loop is delinearised (phase positions are
closed-form, SURVEY.md section 7) and every output frame's tap window is
gathered, multiply-accumulated and normalised in parallel.

Per output frame n with phase (pos, frac) the reference computes:
  min_rel      = ceil16(frac + delta)                        (993)
  max_rel      = floor16(frac + stretched_radius)            (994)
  taps         = int_radius + max_rel - min_rel              (995-996)
  kernel_start = (step * ((min_rel << 16) - frac)) >> 16     (1001)
  acc[c]       = sum_j trunc((x[pos+min_rel+j, c] * K[kernel_start+j*step]) / 2^16)
  norm         = sum_j K[...]                                (1008-1021)
  out[c]       = trunc((acc[c] * trunc(2^31 / norm)) / 2^15) (1025, 1033)

The tap count varies with frac, so windows are padded to a static ``max_taps``
(>= 2 * max integer stretched radius) and masked: a masked tap contributes
kernel value 0 to both the accumulator and the normaliser, which is exactly
equivalent to not iterating it. All arithmetic is int32 (see fixedpoint.py for
the overflow analysis); config values are dynamic scalars so ratio changes do
not recompile.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from clownresampler_tpu import fixedpoint as fx


class ConfigScalars(NamedTuple):
    """Dynamic (traced) int32 mirror of ClownResampler_LowestLevel_Configuration
    plus the phase increment. Build from a host Configuration with
    ``from_configuration``."""

    stretched_kernel_radius: jnp.ndarray        # 16.16
    integer_stretched_kernel_radius: jnp.ndarray
    stretched_kernel_radius_delta: jnp.ndarray  # 16.16
    kernel_step_size: jnp.ndarray
    increment: jnp.ndarray                      # 16.16 (fits uint32; carried as 2x16)
    increment_hi: jnp.ndarray
    increment_lo: jnp.ndarray

    @classmethod
    def from_configuration(cls, cfg, increment: int) -> "ConfigScalars":
        hi, lo = fx.split_increment(increment)
        i32 = lambda v: jnp.asarray(v, jnp.int32)
        return cls(
            stretched_kernel_radius=i32(cfg.stretched_kernel_radius),
            integer_stretched_kernel_radius=i32(cfg.integer_stretched_kernel_radius),
            stretched_kernel_radius_delta=i32(cfg.stretched_kernel_radius_delta),
            kernel_step_size=i32(cfg.kernel_step_size),
            increment=i32(increment & 0x7FFFFFFF),  # info only; hi/lo are authoritative
            increment_hi=i32(hi),
            increment_lo=i32(lo),
        )


def window_geometry(cfg: ConfigScalars, frac):
    """(min_rel, max_rel, kernel_start, taps) for each phase fraction.

    All quantities are non-negative and fit int32: frac, delta < 2^16;
    stretched < 3 * 0x1000 * 2^16 / 8 (scale capped at 0x1000, radius small);
    step <= resolution; (min_rel << 16) - frac <= 2^17.
    """
    min_rel = fx.ceil_shr16_nonneg(frac + cfg.stretched_kernel_radius_delta)
    max_rel = fx.floor_shr16_nonneg(frac + cfg.stretched_kernel_radius)
    kernel_start = fx.floor_shr16_nonneg(
        cfg.kernel_step_size * ((min_rel << 16) - frac)
    )
    taps = cfg.integer_stretched_kernel_radius + max_rel - min_rel
    return min_rel, max_rel, kernel_start, taps


def convolve_frames(
    table,            # (table_size,) int32 kernel LUT
    input_samples,    # (S, C) int16/int32 padded input (S covers pos+2*radius)
    pos,              # (N,) int32 integer positions (relative to input_samples)
    frac,             # (N,) int32 16.16 fractions in [0, 65536)
    cfg: ConfigScalars,
    max_taps: int,    # static tap-window bound (>= 2 * max integer radius)
):
    """Compute N output frames bit-exactly; returns (N, C) int32."""
    table_size = table.shape[0]

    min_rel, _max_rel, kernel_start, taps = window_geometry(cfg, frac)

    j = jnp.arange(max_taps, dtype=jnp.int32)
    mask = j[None, :] < taps[:, None]                       # (N, T)

    kidx = kernel_start[:, None] + j[None, :] * cfg.kernel_step_size
    kidx = jnp.clip(kidx, 0, table_size - 1)                # clamp masked lanes
    kvals = jnp.where(mask, jnp.take(table, kidx, axis=0), 0)

    rows = pos[:, None] + min_rel[:, None] + j[None, :]     # (N, T)
    rows = jnp.clip(rows, 0, input_samples.shape[0] - 1)
    x = jnp.take(input_samples, rows, axis=0).astype(jnp.int32)  # (N, T, C)

    # Per-tap trunc-toward-zero scaling, then accumulate (clownresampler.h:1020).
    terms = fx.fixed_mul_trunc(x, kvals[:, :, None])
    acc = jnp.sum(terms, axis=1)                            # (N, C)

    norm = jnp.sum(kvals, axis=1)                           # (N,)
    q = fx.reciprocal_q31(norm)                             # 17.15 reciprocal (1025)

    return fx.mul_shift15(acc, q[:, None])                  # (N, C)

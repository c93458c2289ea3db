#!/usr/bin/env python3
"""VPU issue-ceiling calibration for the roofline (docs/ROOFLINE.md).

The resampler's hot loop is the C reference's per-tap truncating MAC
(clownresampler.h:1008-1021): ``out += (sample * kernel) / 65536`` with C
trunc-toward-zero semantics. On the VPU that is 6 int32 vector ops per tap
per lane (mul; the 3-op sign-fix add ``p += (p >> 31) & 0xFFFF``; arithmetic
shift; accumulate) — per-term truncation makes the MXU unusable (RESULTS.md
round-1/2 analysis), so the relevant hardware ceiling is the VPU's issue
rate OF EXACTLY THIS OP MIX, not a matmul FLOP number.

This tool measures that ceiling empirically: a Pallas kernel whose grid
step runs ``ITERS`` dependent iterations of the 6-op tap body (plus one
bookkeeping xor to keep the chain live — 7 ops/element/iteration) on a
VMEM-resident (8*GROUP, 128) block, with no loads, windows, rolls, or
per-frame geometry. Timed with the K-slope chain (relay-proof). The
resulting taps/second number is what a resampler kernel would sustain if
window staging and geometry were FREE — the roofline's 100% line.

Run on the TPU: python tools/roofline.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from clownresampler_tpu.utils.profiling import measure_kernel_time

    GROUP = 32          # (8*GROUP, 128) block = 32 int32 vregs resident
    ITERS = 512         # dependent tap bodies per grid step
    GRID = 64           # grid steps per launch

    def kernel(x_ref, o_ref):
        v = x_ref[...]

        def body(i, carry):
            acc, v = carry
            # the 6-op truncating tap MAC (C semantics, fixedpoint.py):
            p = v * 31337                       # 1: mul
            p = p + ((p >> 31) & 0xFFFF)        # 2-4: shift, and, add
            p = p >> 16                         # 5: arithmetic shift
            acc = acc + p                       # 6: accumulate
            # keep the chain data-dependent across iterations so Mosaic
            # cannot hoist the loop-invariant product (1 extra op, counted)
            v = v ^ acc
            return acc, v

        acc, v = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros_like(v), v))
        o_ref[...] = acc + v

    rows = 8 * GROUP

    @functools.partial(jax.jit, static_argnames=())
    def launch(x):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((rows, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((GRID * rows, 128), jnp.int32),
        )(x)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.integers(-(2 ** 30), 2 ** 30, size=(rows, 128)).astype(np.int32))
    print(f"backend={jax.default_backend()} block=({rows},128) "
          f"iters={ITERS} grid={GRID}", flush=True)

    def chain_body(c):
        out = launch(c)
        return c.at[0, 0].add(out[0, 0] & 1)

    st = measure_kernel_time(chain_body, x0, rows * 128 * ITERS * GRID,
                             k1=8, k2=40)
    taps_per_s = st.samples_per_second          # one "sample" = one tap body
    ops_per_s = taps_per_s * 7                  # 6 MAC ops + 1 bookkeeping
    print({
        "metric": "VPU issue ceiling, 6-op truncating-MAC tap body",
        "seconds_per_launch": round(st.seconds_per_launch, 6),
        "tap_bodies_per_launch": rows * 128 * ITERS * GRID,
        "taps_per_second_G": round(taps_per_s / 1e9, 1),
        "int32_ops_per_second_T": round(ops_per_s / 1e12, 2),
    }, flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""VPU issue-ceiling calibration for the roofline (docs/ROOFLINE.md).

The resampler's hot loop is the C reference's per-tap truncating MAC
(clownresampler.h:1008-1021): ``out += (sample * kernel) / 65536`` with C
trunc-toward-zero semantics. On the VPU that is 6 int32 vector ops per tap
per lane (mul; the 3-op sign-fix ``p += (p >> 31) & 0xFFFF``; arithmetic
shift; accumulate) — per-term truncation makes the MXU unusable (RESULTS.md
round-1/2 analysis), so the relevant hardware ceiling is the VPU's issue
rate OF EXACTLY THIS OP MIX, not a matmul FLOP number.

Three variants, because "the ceiling" depends on how much instruction-level
parallelism the measurement exposes (production kernels expose a lot —
independent taps x frames within a kernel, plus overlapping sub-launches):

- ``dep``:     ONE dependent 7-op chain per element (the round-4 number).
               Lower bound: a single serialized dependency chain.
- ``ilp``:     UNROLL independent accumulator chains per element per
               iteration (only one feeds the cross-iteration dependency), so
               the VPU can fill its issue slots — the single-program ceiling.
- ``overlap``: CHAINS independent copies of the ilp program whose K-slope
               chains only self-depend (the bench.py/multi_resample
               structure). Production configs are measured exactly this way,
               so this is the apples-to-apples 100% line.

All timed with the K-slope chain (relay-proof). The resulting taps/second is
what a resampler kernel would sustain if window staging and geometry were
FREE.

Run on the TPU: python tools/roofline.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GROUP = 32          # (8*GROUP, 128) block = 32 int32 vregs resident
GRID = 64           # grid steps per launch


def _make_launch(iters: int, unroll: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    # distinct odd multipliers per unrolled chain so Mosaic cannot CSE them
    consts = [31337 + 2 * u for u in range(unroll)]

    def kernel(x_ref, o_ref):
        v = x_ref[...]

        def body(i, carry):
            accs, v = carry
            new = []
            for u in range(unroll):
                # the 6-op truncating tap MAC (C semantics, fixedpoint.py)
                p = v * consts[u]                   # 1: mul
                p = p + ((p >> 31) & 0xFFFF)        # 2-4: shift, and, add
                p = p >> 16                         # 5: arithmetic shift
                new.append(accs[u] + p)             # 6: accumulate
            # keep the chain data-dependent across iterations so Mosaic
            # cannot hoist the loop-invariant products (1 extra op, counted
            # against chain 0 only; chains 1.. are pure independent work)
            v = v ^ new[0]
            return tuple(new), v

        accs, v = jax.lax.fori_loop(
            0, iters, body,
            (tuple(jnp.zeros_like(v) for _ in range(unroll)), v))
        out = v
        for a in accs:
            out = out + a
        o_ref[...] = out

    rows = 8 * GROUP

    @jax.jit
    def launch(x):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((rows, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((GRID * rows, 128), jnp.int32),
        )(x)

    taps_per_launch = rows * 128 * iters * GRID * unroll
    return launch, taps_per_launch


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu.utils.profiling import measure_kernel_time

    rows = 8 * GROUP
    rng = np.random.default_rng(0)

    def fresh_x():
        return jnp.asarray(rng.integers(
            -(2 ** 30), 2 ** 30, size=(rows, 128)).astype(np.int32))

    print(f"backend={jax.default_backend()} block=({rows},128) grid={GRID}",
          flush=True)

    results = {}

    # -- dep: one dependent chain per element (round-4 record) --------------
    launch, taps = _make_launch(iters=512, unroll=1)
    x0 = fresh_x()

    def body_dep(c):
        out = launch(c)
        return c.at[0, 0].add(out[0, 0] & 1)

    st = measure_kernel_time(body_dep, x0, taps, k1=8, k2=40)
    results["dep"] = st.samples_per_second
    print({"variant": "dep (1 chain/element)",
           "ms_per_launch": round(st.seconds_per_launch * 1e3, 3),
           "taps_per_second_G": round(st.samples_per_second / 1e9, 1)},
          flush=True)

    # -- ilp: unrolled independent chains per element ------------------------
    for unroll in (4, 8):
        launch, taps = _make_launch(iters=128, unroll=unroll)
        x0 = fresh_x()

        def body_ilp(c, launch=launch):
            out = launch(c)
            return c.at[0, 0].add(out[0, 0] & 1)

        st = measure_kernel_time(body_ilp, x0, taps, k1=8, k2=40)
        results[f"ilp{unroll}"] = st.samples_per_second
        print({"variant": f"ilp (unroll {unroll})",
               "ms_per_launch": round(st.seconds_per_launch * 1e3, 3),
               "taps_per_second_G": round(st.samples_per_second / 1e9, 1)},
              flush=True)

    # -- overlap: N independent self-chained programs (the bench structure).
    # Swept in N to find the SATURATION point: a single program reaches only
    # ~25% of the chip (ilp8), and 4 chains scaled linearly on the first
    # round-5 run, so the plateau — not any fixed N — is the ceiling.
    best_unroll = 8 if results["ilp8"] >= results["ilp4"] else 4
    launch, taps = _make_launch(iters=128, unroll=best_unroll)
    for N in (2, 4, 8, 16):
        xs0 = tuple(fresh_x() for _ in range(N))

        def body_overlap(xs):
            outs = [launch(x) for x in xs]
            return tuple(
                x.at[0, 0].add(o[0, 0] & 1) for x, o in zip(xs, outs))

        st = measure_kernel_time(body_overlap, xs0, taps * N, k1=8, k2=40)
        results[f"overlap{N}"] = st.samples_per_second
        print({"variant": f"overlap ({N} chains, unroll {best_unroll})",
               "ms_per_launch": round(st.seconds_per_launch * 1e3, 3),
               "taps_per_second_G": round(st.samples_per_second / 1e9, 1)},
              flush=True)

    ceiling = max(results.values())
    print({
        "metric": "VPU issue ceiling, 6-op truncating-MAC tap body",
        "ceiling_taps_per_second_G": round(ceiling / 1e9, 1),
        "ceiling_int32_ops_per_second_T": round(ceiling * 6 / 1e12, 2),
        "variants_G": {k: round(v / 1e9, 1) for k, v in results.items()},
    }, flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Exhaustive on-device proof that fixedpoint.reciprocal_q31's float-first
formulation equals exact integer division floor(2^31/m) for EVERY magnitude
m in [2, 2^28] (the realisable kernel-window-sum domain: |sum| ~ 65536 *
kernel_scale < 2^28, clownresampler.h:1025), plus the negative mirror on a
sample. Run on the TPU: python tools/verify_reciprocal.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from clownresampler_tpu import fixedpoint as fx


@jax.jit
def _mismatches(lo):
    m = lo + jnp.arange(1 << 24, dtype=jnp.int32)
    got = fx.reciprocal_q31(m)
    # oracle: the integer-division split formulation (the previous
    # implementation; bit-identical to C's 0x80000000 / m for m >= 2)
    q0 = jnp.int32(1 << 30) // m
    r0 = jnp.int32(1 << 30) - q0 * m
    want = q0 * 2 + (r0 * 2) // m
    return jnp.sum((got != want).astype(jnp.int32))


def main() -> int:
    print("backend:", jax.default_backend())
    bad = 0
    for lo in range(2, 1 << 28, 1 << 24):
        n = int(_mismatches(jnp.int32(lo)))
        bad += n
        if n:
            print(f"MISMATCHES in [{lo}, {lo + (1 << 24)}): {n}")
    # negative mirror (sign handled outside the magnitude math; sample)
    rng = np.random.default_rng(0)
    m = rng.integers(2, 1 << 28, 1 << 20).astype(np.int32)
    got = np.asarray(fx.reciprocal_q31(jnp.asarray(-m)))
    want = -((np.int64(1) << 31) // m.astype(np.int64)).astype(np.int32)
    neg_bad = int((got != want).sum())
    bad += neg_bad
    print("negative sample mismatches:", neg_bad)
    print("PASS" if bad == 0 else f"FAIL ({bad} mismatches)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

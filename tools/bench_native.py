#!/usr/bin/env python3
"""Host data-plane throughput: native C++ staging engine vs numpy (dev tool).

Usage: python tools/bench_native.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from clownresampler_tpu.utils import native


def timeit(name, fn, nbytes, iters=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms -> {nbytes/dt/1e9:.1f} GB/s")


def main():
    b, n, c = 1024, 4096, 2
    rng = np.random.default_rng(0)
    chunk = rng.integers(-32768, 32768, size=(b, n, c)).astype(np.int16)
    staging = np.zeros((n + 128, b * c), np.int32)
    lanes_out = rng.integers(-(2**20), 2**20, size=(n, b * c)).astype(np.int32)
    nbytes = chunk.nbytes

    print(f"native available: {native.available()} "
          f"(chunk {b}x{n}x{c} = {nbytes/1e6:.0f} MB int16)")
    timeit("stage_chunk (native)", lambda: native.stage_chunk(chunk, staging, 64), nbytes)
    timeit("shift_rows  (native)", lambda: native.shift_rows(staging, n, 64), staging.nbytes)
    timeit("unstage     (native)", lambda: native.unstage_output(lanes_out, b, c), lanes_out.nbytes)

    lib, tried = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        timeit("stage_chunk (numpy) ", lambda: native.stage_chunk(chunk, staging, 64), nbytes)
        timeit("unstage     (numpy) ", lambda: native.unstage_output(lanes_out, b, c), lanes_out.nbytes)
    finally:
        native._lib, native._tried = lib, tried


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Compare resampling kernel variants on the current backend (dev tool).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_kernels.py [lanes] [n_out]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.lowlevel import make_device_state
    from clownresampler_tpu.models import lanczos_kernel_table
    from clownresampler_tpu.ops.pallas_resample import (
        plan_uniform,
        resample_integer_stride,
        resample_uniform_lanes_tiled,
    )

    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_out = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    table = jnp.asarray(lanczos_kernel_table())
    rng = np.random.default_rng(0)

    def timeit(name, fn, samples):
        out = fn()
        jax.block_until_ready(out)
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.3f} ms -> {samples/dt/1e9:.2f} Gsamples/s", flush=True)

    def setup(in_rate, out_rate):
        cfg = configure(in_rate, out_rate, max(in_rate, out_rate))
        inc = fx.calculate_ratio(in_rate, out_rate)
        state = make_device_state(0, 0, cfg, inc)
        max_taps = -(-2 * cfg.integer_stretched_kernel_radius // 8) * 8
        s = ((n_out * inc) >> 16) + 2 * cfg.integer_stretched_kernel_radius + 64
        s = -(-s // 16) * 16
        x = jnp.asarray(rng.integers(-32768, 32768, size=(s, lanes)).astype(np.int32))
        return cfg, inc, state, max_taps, x

    # Headline 48k->44.1k (tiled, d=1 cand=2)
    cfg, inc, state, max_taps, x = setup(48000, 44100)
    plan = plan_uniform(inc, n_out)
    print(f"48k->44.1k lanes={lanes} n_out={n_out} plan={plan} taps={max_taps}", flush=True)
    timeit("tiled 48k->44.1k", lambda: resample_uniform_lanes_tiled(
        table, x, state, max_taps=max_taps, n_out=n_out,
        d=plan["d"], cand=plan["cand"])[0], n_out * lanes)

    # Upsample 8k->44.1k (tiled, d=0)
    cfg2, inc2, state2, taps2, x2 = setup(8000, 44100)
    plan2 = plan_uniform(inc2, n_out)
    print(f"8k->44.1k plan={plan2}", flush=True)
    timeit("tiled 8k->44.1k ", lambda: resample_uniform_lanes_tiled(
        table, x2, state2, max_taps=taps2, n_out=n_out,
        d=plan2["d"], cand=plan2["cand"])[0], n_out * lanes)

    # 2:1 96k->48k (strided XLA)
    cfg3, inc3, state3, taps3, x3 = setup(96000, 48000)
    plan3 = plan_uniform(inc3, n_out)
    print(f"96k->48k plan={plan3} taps={taps3}", flush=True)
    timeit("strided 96k->48k", lambda: resample_integer_stride(
        table, x3, state3, max_taps=taps3, n_out=n_out, d=plan3["d"])[0], n_out * lanes)


if __name__ == "__main__":
    main()

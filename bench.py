"""Throughput benchmark: batched 1024-stream stereo 48k->44.1k transcode.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}

Baseline (BASELINE.md): the C reference measured 37.4M output frames/s =
74.9 Msamples/s single-core for stereo 48k->44.1k; the north-star target is
>=100x that on one TPU chip (BASELINE.json).

Measures the fused Pallas kernel (ops/pallas_resample.py) on 1024 stereo
streams = 2048 lanes. Timing is fully serialized: each launch's position state
depends on the previous launch's output, so queued launches cannot overlap or
be deduplicated (independent identical launches measured ~20x faster through
the axon relay — that number is a pipelining artifact, not throughput).
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.lowlevel import DeviceState, make_device_state
    from clownresampler_tpu.models import lanczos_kernel_table
    from clownresampler_tpu.ops.pallas_resample import (
        plan_uniform,
        resample_uniform_lanes_tiled,
    )

    B, CH = 1024, 2
    LANES_TOTAL = B * CH
    IN_RATE, OUT_RATE = 48000, 44100
    N_OUT = 4096

    cfg = configure(IN_RATE, OUT_RATE, OUT_RATE)
    inc = fx.calculate_ratio(IN_RATE, OUT_RATE)
    state0 = make_device_state(0, 0, cfg, inc)
    plan = plan_uniform(inc, N_OUT)
    max_taps = 8

    s = ((N_OUT * inc) >> 16) + 96
    s = -(-s // 16) * 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-32768, 32768, size=(s, LANES_TOTAL)).astype(np.int32))
    table = jnp.asarray(lanczos_kernel_table())

    @jax.jit
    def step(st):
        out, _ = resample_uniform_lanes_tiled(
            table, x, st, max_taps=max_taps, n_out=N_OUT, d=plan["d"], cand=plan["cand"]
        )
        # Chain a (constant-zero) function of the output into the next state so
        # successive launches are data-dependent -> honest serialized timing.
        return (
            DeviceState(
                position_integer=st.position_integer + (out[0, 0] & 0),
                position_fractional=st.position_fractional,
                cfg=st.cfg,
            ),
            out,
        )

    st, out = step(state0)
    jax.block_until_ready(st)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        st, out = step(st)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / iters

    samples_per_launch = N_OUT * LANES_TOTAL
    msamples = samples_per_launch / dt / 1e6
    baseline_msamples = 74.9  # BASELINE.md single-core C anchor
    print(
        json.dumps(
            {
                "metric": "batched stereo 48k->44.1k output throughput (1024 streams, 1 chip, Pallas)",
                "value": round(msamples, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msamples / baseline_msamples, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

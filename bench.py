"""Throughput benchmark: batched 1024-stream stereo 48k->44.1k transcode.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}

Baseline (BASELINE.md): the C reference measured 37.4M output frames/s =
74.9 Msamples/s single-core for stereo 48k->44.1k; the north-star target is
>=100x that on one TPU chip. The benchmark measures steady-state output
samples/sec of the batched chunk kernel on the default backend (TPU under the
driver; set JAX_PLATFORMS=cpu to smoke-test).
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.batch import make_batch_state, resample_batch
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.models import lanczos_kernel_table

    B, CH = 1024, 2
    IN_RATE, OUT_RATE = 48000, 44100
    N_IN = 4096
    N_OUT = 4096

    cfg = configure(IN_RATE, OUT_RATE, OUT_RATE)
    inc = fx.calculate_ratio(IN_RATE, OUT_RATE)
    r = cfg.integer_stretched_kernel_radius
    max_taps = 2 * r

    rng = np.random.default_rng(0)
    buf = np.zeros((B, N_IN + 2 * r, CH), np.int16)
    buf[:, r : r + N_IN] = rng.integers(-32768, 32768, size=(B, N_IN, CH))

    table = jnp.asarray(lanczos_kernel_table())
    inputs = jnp.asarray(buf)
    states = make_batch_state([(cfg, inc)] * B)
    totals = jnp.full((B,), N_IN, jnp.int32)
    quotas = jnp.full((B,), 1 << 20, jnp.int32)

    def step():
        return resample_batch(
            table, inputs, totals, states, quotas, max_taps=max_taps, n_out=N_OUT
        )

    # Warm up / compile.
    out = step()
    jax.block_until_ready(out)
    produced = int(np.asarray(out[1])[0])

    # Steady state: repeat launches; the state/result are identical each time,
    # which matches a transcode farm's per-chunk duty cycle.
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    samples_per_launch = produced * B * CH
    msamples = samples_per_launch / dt / 1e6
    baseline_msamples = 74.9  # BASELINE.md single-core C anchor
    print(
        json.dumps(
            {
                "metric": "batched stereo 48k->44.1k output throughput (1024 streams, 1 chip)",
                "value": round(msamples, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msamples / baseline_msamples, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Throughput benchmark: batched 1024-stream stereo 48k->44.1k transcode.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}

Baseline (BASELINE.md): the C reference measured 37.4M output frames/s =
74.9 Msamples/s single-core for stereo 48k->44.1k; the north-star target is
>=100x that on one TPU chip (BASELINE.json).

Methodology (HONEST, round 2 — the K-slope chain):

  1. K kernel invocations are CHAINED INSIDE ONE jitted lax.scan, each step's
     input data-dependent on the previous step's output
     (x[0,0] += out[0,0] & 1 — not constant-foldable), so the device MUST
     serialize K full kernel executions; timing runs from dispatch to a
     forced device->host read of the final carry.
  2. The chain is timed at two lengths K1 < K2; the per-kernel time is the
     SLOPE (T2 - T1) / (K2 - K1), which cancels every fixed per-program cost.

Why this is necessary on this relay (measured, tools/probe_launch_overhead.py
and the round-2 probes): (a) block_until_ready returns when the relay ACKS,
not when compute finishes — "pipelined independent launches" time the ack
stream at a payload-independent ~30 us/launch, hundreds of times faster than
the VPU can compute; (b) every dispatched program carries ~60 ms of flat
relay overhead (dispatch + first D2H), which would swamp the kernel if
charged to it. The slope excludes the fiction AND the relay tax: it is the
pure device compute rate, which is what survives on co-located hardware.

Round-5 correction: the chain must MATERIALIZE EVERY carry leaf. Through
round 4 this bench returned only chain 0's carry, letting XLA's while-loop
simplifier delete the other 3 sub-fleets' pallas calls from the compiled
loop (verified statically + dynamically, tools/probe_chain_dce.py) — the
recorded 999x measured ONE 512-lane sub-fleet while attributing 2048 lanes.
The honest structure sweep (tools/probe_headline_structure.py) then showed
independent programs have ~zero device overlap, so the fleet now rides one
monolithic 2048-lane launch (27.0 Gsamples/s = 361x, vs 21.7 G for the old
4x512 split form measured honestly).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _wait_for_backend(max_wait_s: float = 240.0, probe_timeout_s: float = 90.0) -> bool:
    """Gate on the accelerator backend actually initialising.

    The axon tunnel can be transiently unavailable (observed: init hangs for
    minutes, then raises UNAVAILABLE); a hung init in THIS process is
    unrecoverable, so probe from short-lived subprocesses and only let the
    main process touch JAX once a probe has seen a live backend. Returns
    False when the backend never came up within the budget.

    The budget MUST stay well under the driver's own timeout: round 3 shipped
    a 30-minute probe budget and the driver killed bench.py (rc=124) before
    the designed error record ever printed. ~2 probes x 90 s + one 60 s sleep
    = 4 minutes worst case, then the explicit error JSON goes out.

    A probe only counts if it lands on an ACCELERATOR backend — unless the
    caller explicitly pinned the CPU platform (the documented smoke mode).
    Otherwise a fast-failing TPU init that silently falls back to CPU would
    pass the gate and the headline metric would get a meaningless record."""
    probe_src = (
        "import os, jax; assert jax.devices(); "
        "assert jax.default_backend() != 'cpu' or "
        "'cpu' in os.environ.get('JAX_PLATFORMS', '').lower(), "
        "jax.default_backend(); "
        "import jax.numpy as jnp; jnp.arange(4).sum().block_until_ready()"
    )
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src],
                timeout=probe_timeout_s, capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        print(f"# backend probe {attempt} failed; retrying", file=sys.stderr,
              flush=True)
        time.sleep(min(60.0, max(5.0, deadline - time.monotonic())))


def main() -> None:
    if not _wait_for_backend():
        print(json.dumps({
            "metric": "batched stereo 48k->44.1k output throughput (1024 streams, 1 chip, Pallas, K-slope chained)",
            "value": 0.0,
            "unit": "Msamples/s",
            "vs_baseline": 0.0,
            "error": "accelerator backend unavailable (tunnel down; see stderr)",
        }))
        return
    import jax
    import jax.numpy as jnp

    from clownresampler_tpu import fixedpoint as fx
    from clownresampler_tpu.configure import configure
    from clownresampler_tpu.lowlevel import make_device_state
    from clownresampler_tpu.models import lanczos_kernel_table
    from clownresampler_tpu.models import DEFAULT_MODEL
    from clownresampler_tpu.ops.pallas_resample import (
        multi_resample,
        plan_uniform,
        strided_table_device,
    )

    B, CH = 1024, 2
    LANES_TOTAL = B * CH
    IN_RATE, OUT_RATE = 48000, 44100
    N_OUT = 8192   # frames per kernel invocation (16384 exceeds Mosaic VMEM)
    # ONE monolithic launch carrying the whole fleet: the round-5 honest
    # structure sweep (tools/probe_headline_structure.py, long chains, one
    # point per subprocess) measured mono 2048 lanes at 0.621 ms/step =
    # 27.0 Gsamples/s vs 21.7 for the 4x512 split structure the dead-carry
    # era shipped — independent pallas programs have ~zero device overlap
    # (tools/probe_chain_dce.py), so splitting only adds per-launch cost.
    SPLIT = 2048
    K1, K2 = 32, 192
    # Smoke mode off-TPU: Pallas only interprets on CPU, so run the same
    # dispatch path in interpret mode at token shapes (proves the path; the
    # printed rate is meaningless there and the JSON says so).
    interpret = jax.default_backend() != "tpu"
    if interpret:
        B, N_OUT, K1, K2 = 128, 256, 2, 4
        LANES_TOTAL = B * CH   # 256 lanes = 2 sub-buffers of one 128-lane tile
        SPLIT = 128

    cfg = configure(IN_RATE, OUT_RATE, OUT_RATE)
    inc = fx.calculate_ratio(IN_RATE, OUT_RATE)
    plan = plan_uniform(inc, N_OUT)
    max_taps = 8

    s = ((N_OUT * inc) >> 16) + 96
    s = -(-s // 16) * 16
    rng = np.random.default_rng(0)
    # ALL host->device transfers happen before the first execution. The fleet
    # rides ONE SPLIT-lane staging buffer per chain (SPLIT = LANES_TOTAL on
    # TPU): the lane-tile axis pipelines on the kernel grid, which is the
    # only launch-level concurrency this device really has.
    table = jnp.asarray(lanczos_kernel_table())
    n_sub = LANES_TOTAL // SPLIT
    xs0 = tuple(
        jnp.asarray(rng.integers(-32768, 32768, size=(s, SPLIT)).astype(np.int32))
        for _ in range(n_sub)
    )
    state = make_device_state(0, 0x4321, cfg, inc)
    jax.block_until_ready([table, *xs0])

    # group=32 pinned: the monolithic launch at group 8 measures 0.776
    # ms/step vs 0.621 at group 32 (the "fleets prefer group 8" rule was a
    # dead-carry-era artifact; N_OUT % 256 == 0 holds in both modes)
    plans = tuple(
        ("tiled", plan["d"], plan["cand"], max_taps, N_OUT, False,
         None, 0, 32)
        for _ in range(n_sub)
    )
    states = tuple(state for _ in range(n_sub))
    tstrs = tuple(
        strided_table_device(DEFAULT_MODEL.radius, DEFAULT_MODEL.resolution,
                             cfg.kernel_step_size, max_taps)
        for _ in range(n_sub)
    )

    def body(xs, _):
        outs = multi_resample(table, xs, states, plans, tstrs=tstrs,
                              interpret=interpret)
        # feed one non-foldable output bit of every sub-launch into ITS OWN
        # next input: true per-chain serialization, no cross-chain barrier
        return tuple(
            x.at[0, 0].add(o[0, 0] & 1) for x, o in zip(xs, outs)
        ), None

    def make_chain(k):
        @jax.jit
        def chain(xs):
            xs, _ = jax.lax.scan(body, xs, None, length=k)
            # EVERY chain's carry feeds the returned scalar: materializing
            # only xs[0] lets XLA's while-loop simplifier DELETE the other
            # chains (and their pallas calls) from the compiled loop — the
            # round-5 DCE fiction that inflated the recorded headline ~4x
            # (tools/probe_chain_dce.py has the static + dynamic proof).
            acc = jnp.int32(0)
            for x in xs:
                acc = acc + x[0, 0]
            return acc

        return chain

    def timed(chain):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = chain(xs0)
            jax.block_until_ready(r)
            _ = np.asarray(r)          # real completion, not just the ack
            ts.append(time.perf_counter() - t0)
        return ts

    chain1, chain2 = make_chain(K1), make_chain(K2)
    for c in (chain1, chain2):        # compile + warm both programs
        r = c(xs0)
        jax.block_until_ready(r)
        _ = np.asarray(r)

    t1s, t2s = timed(chain1), timed(chain2)
    per_kernel_best = (min(t2s) - min(t1s)) / (K2 - K1)
    per_kernel_median = (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)

    samples_per_launch = N_OUT * LANES_TOTAL
    baseline_msamples = 74.9  # BASELINE.md single-core C anchor

    def msps(dt):
        return samples_per_launch / max(dt, 1e-9) / 1e6

    record = {
        "metric": "batched stereo 48k->44.1k output throughput (1024 streams, 1 chip, Pallas, K-slope chained)",
        "value": round(msps(per_kernel_best), 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps(per_kernel_best) / baseline_msamples, 2),
        "median": round(msps(per_kernel_median), 1),
        "median_vs_baseline": round(
            msps(per_kernel_median) / baseline_msamples, 2
        ),
        "per_kernel_ms": round(per_kernel_best * 1e3, 3),
        "slope_K": [K1, K2],
    }
    if interpret:
        record["smoke"] = (f"interpret mode on {jax.default_backend()} at "
                           "token shapes — path proof only, rate meaningless")
    print(json.dumps(record))


if __name__ == "__main__":
    main()

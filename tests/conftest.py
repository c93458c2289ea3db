"""Test environment: force an 8-virtual-device CPU JAX platform.

The container's sitecustomize registers and eagerly initialises the axon TPU
PJRT plugin in every interpreter, so env vars alone are too late. Re-point JAX
at a virtual 8-device CPU platform in-process before any test code traces or
compiles anything. Tests validate numerics and multi-chip sharding on the
virtual mesh; bench.py runs on the real TPU.
"""

import os


def _force_cpu_mesh() -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax
    from jax.extend import backend as jax_backend

    jax.config.update("jax_platforms", "cpu")
    jax_backend.clear_backends()
    assert len(jax.devices()) >= 8, jax.devices()


_force_cpu_mesh()


# ---------------------------------------------------------------------------
# Fast tier: `pytest -m "not slow"` is the <5 min inner loop; the full suite
# (no -m) runs everything and stays the merge gate. Heavy integration tests
# (farm/scan/sharded end-to-end replays, fuzz sweeps, batched-dispatch
# oracles) are marked centrally here by original test name — every subsystem
# keeps at least one quick bit-exact representative in the fast tier.
# Tier-budget rule: new tests that replay full farms/scans/sharded streams,
# fuzz across many configs, or take >~10 s on the CPU mesh go in this set.
# tests/test_meta.py asserts every entry still names a collected test, so a
# rename cannot silently un-mark a heavy test.
SLOW_TESTS = {
    # farm end-to-end replays vs the host oracle
    "test_mixed_farm_adjust_stream_capacity_drift",
    "test_farm_launch_tiling_matches_host",
    "test_farm_clamp_s16_output",
    "test_mixed_farm_per_stream_adjust",
    "test_farm_matches_host",
    "test_medium_width_farm_wide_dispatch_bit_exact",
    "test_general_envelope_failure_wide_route_bit_exact",
    "test_multilane_general_dispatch_bit_exact",
    "test_wide_reserve_narrow_ratio_fast_kernel_dispatch",
    "test_farm_device_staging_matches_host_staging",
    "test_mixed_farm_matches_host",
    "test_farm_pitch_bend_matches_host",
    "test_mixed_farm_clamp_s16",
    "test_farm_large_chunk_strided_keeps_polyphase",
    "test_wide_bound_farm_narrow_ratio_bit_exact",
    # kernel sweeps / fuzz
    "test_strided_phases_random_fuzz",
    "test_lane_sliced_launches_match_full_width",
    "test_strided_phases_group32_sublaunch_clamp",
    "test_general_kernel_group32_bit_exact",
    "test_strided_phases_bit_exact",
    "test_general_kernel_roll_path_bit_exact",
    "test_general_kernel_bit_exact",
    # checkpoint/resume integration
    "test_sharded_mixed_farm_checkpoint_resume",
    "test_mixed_farm_checkpoint_resume",
    "test_sharded_farm_checkpoint_resume",
    # batched bulk dispatch oracles
    "test_batched_tile_dispatch_bit_exact",
    # sharded farm integration
    "test_sharded_mixed_farm_matches_mixed_farm",
    "test_sharded_farm_matches_uniform_farm",
    "test_sharded_farm_adjust_pitch_bend",
    # whole-stream scans
    "test_scan_fused_split_chains_bit_exact",
    "test_scan_fused_with_strided_table",
    "test_scan_fused_matches_oracle_scan",
    "test_scan_fused_pipeline_bit_exact",
    # heavy examples / high-level streams
    "test_multichip_farm_example",
    "test_bulk_then_incremental_resume",
    "test_resample_stream_bulk_fused_identical_bytes",
    "test_realtime_refusal_resumes_bit_exact",
    "test_fuzz_farm_matches_host",
    "test_lowest_level_frames_bit_exact",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    slow = pytest.mark.slow
    for item in items:
        name = getattr(item, "originalname", None) or item.name
        if name in SLOW_TESTS:
            item.add_marker(slow)

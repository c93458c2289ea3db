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

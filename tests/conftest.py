"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding (data parallelism, edge partitioning) is validated on a
virtual 8-device CPU mesh, mirroring how the driver dry-runs the multi-chip
path (see __graft_entry__.dryrun_multichip). The axon TPU plugin ignores the
JAX_PLATFORMS env var, so we force the platform through jax.config before any
test imports jax.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare f32 activations against torch; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")

"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests exercise the
real pjit/shard_map partitioning on 8 virtual CPU devices instead.

This image's sitecustomize imports jax and registers the axon TPU backend at
interpreter startup, so env vars set here are too late — use jax.config
updates (backends are not initialized until first use, which happens inside
the tests).
"""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""  # keep subprocesses off the TPU too
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding paths (shard_map over the node mesh axis) are exercised
on a simulated 8-device CPU mesh, per the project test strategy (SURVEY §4).

Note: this environment pre-sets the ``jax_platforms`` config (not just the
env var) to prefer the TPU plugin, so we must override the config object
itself before any backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, jax.devices()

"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding paths (shard_map over the node mesh axis) are exercised
on a simulated 8-device CPU mesh, per the project test strategy (SURVEY §4).

Note: this environment pre-sets the ``jax_platforms`` config (not just the
env var) to prefer the TPU plugin, so we must override the config object
itself before any backend initialization.
"""

import os

# NO persistent XLA cache for the CPU suite: on this host XLA:CPU logs
# "Machine type used for XLA:CPU compilation doesn't match the machine type
# for execution ... could lead to execution errors such as SIGILL" when
# loading cached AOT results, and the full suite reproducibly segfaulted
# ~180 tests in inside compilation_cache get/put (r5 root-cause hunt:
# fresh-cache, write-disabled and read paths all crashed; individual files
# never did). The TPU-side cache (CLI/benches) is unaffected.
os.environ["DIP_ADMM_NO_XLA_CACHE"] = "1"

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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The full suite compiles several hundred XLA:CPU programs into one
    process; past ~180 tests the NEXT compile (or compilation-cache
    read/write) reproducibly dies with SIGABRT/SIGSEGV inside XLA on this
    host — cumulative JIT-code state, not any single test (every file
    passes in isolation; the crash site moves with cache settings but the
    position doesn't). Dropping jax's executable caches per module bounds
    the live-program count at the cost of some recompilation."""
    yield
    import jax

    jax.clear_caches()

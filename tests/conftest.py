"""Test configuration: force an 8-device CPU mesh so sharding tests run
anywhere (the real TPU path is exercised by bench.py / the driver)."""

import os

# The container's sitecustomize registers the axon TPU plugin and pins
# JAX_PLATFORMS=axon before any user code runs, so a plain env override is
# not enough — force the config after import, before any backend is used.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: golden/e2e tests recompile per scene shape;
# caching across runs cuts suite wall time severalfold after the first run.
# The cache lives inside the repo (committed) so fresh containers start warm
# — on this 2-core host a cold suite spends tens of minutes in XLA compiles.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402

REFERENCE_INPUTS = "/root/reference/inputs"


@pytest.fixture(scope="session")
def inputs_dir():
    return REFERENCE_INPUTS

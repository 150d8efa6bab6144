"""Test harness: force an 8-device CPU mesh so sharding paths run without a
real pod.

NOTE: this environment pins JAX_PLATFORMS=axon (a tunneled TPU with remote
compile) via the ambient env + sitecustomize; os.environ overrides are NOT
reliable — ``jax.config.update("jax_platforms", ...)`` after import is.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted")
    return REFERENCE

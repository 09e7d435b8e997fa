"""Test configuration: run everything on a fake 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware the standard way:
``xla_force_host_platform_device_count`` (SURVEY.md §4). Must be set before
jax is imported anywhere.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (TPU tunnel),
# which would run every test op over the wire.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by a pytest plugin with the env-pinned
# platform; config.update wins as long as no backend is initialized yet.
jax.config.update("jax_platforms", "cpu")
from cuahn_vio import default_compile_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", default_compile_cache_dir())
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

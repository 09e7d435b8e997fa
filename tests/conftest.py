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
# NOTE: no persistent compilation cache here — XLA:CPU AOT executable
# serialization segfaults intermittently (see _enable_persistent_compile
# _cache in cuahn_vio/__init__.py, which also skips CPU backends).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The full suite accumulates hundreds of XLA:CPU executables on a 2-core
    VM; under that memory pressure the CPU backend segfaults intermittently
    inside backend_compile (observed twice, both in whatever module compiles
    late in the run). Standalone modules never crash. Dropping caches
    between modules keeps the resident set flat."""
    yield
    jax.clear_caches()

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices (SURVEY.md §2.3).  Env vars must be set
before jax initializes its backends, hence this module-level block.
"""

import os

# Force-override: the driver environment presets JAX_PLATFORMS=axon (the
# tunneled TPU) and its sitecustomize re-forces jax_platforms at interpreter
# start, so the env var alone is not enough — override at the jax.config
# level before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same stream regardless of which
    # other tests ran before it (a session-scoped generator made outcomes
    # depend on test-collection order).
    return np.random.default_rng(0)

import os

# Multi-device CPU emulation for sharding tests. NOTE: this environment's
# sitecustomize registers a tunneled-TPU ("axon") PJRT plugin and forces
# JAX_PLATFORMS=axon at interpreter start, so the env var alone is not
# enough — we must also override the jax config before any backend
# initializes. Running tests over the TPU tunnel would execute op-by-op
# over the network (~100x slowdown).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first jax import anywhere in the test process.
"""

import os

# Force CPU: the session env points JAX at a real TPU (JAX_PLATFORMS=axon) and the
# axon sitecustomize imports jax before conftest runs, so env vars alone are not
# enough — override via jax.config after import. XLA_FLAGS is still read lazily at
# backend init, so the 8-device CPU mesh flag does take effect here.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

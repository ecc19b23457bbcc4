"""Test harness: CPU backend with a virtual 8-device mesh (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# NB: the JAX_PLATFORMS env var is ignored in this environment (the axon TPU
# plugin registers regardless); the config update is honored.
jax.config.update("jax_platforms", "cpu")

from bacs_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.RandomState(0)

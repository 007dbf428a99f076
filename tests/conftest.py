"""Test configuration: run everything on a simulated 8-device CPU mesh
(SURVEY.md §4(e): multi-device tests without a real cluster)."""

import os

# The harness environment pins JAX_PLATFORMS=axon (one real TPU chip) and a
# sitecustomize hook imports jax at interpreter start, so plain env-var
# setdefault is too late. Force the CPU platform with 8 virtual devices via
# jax.config before the backend is first used.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)

"""Test config: run on CPU with a virtual 8-device mesh.

Multi-chip behavior is validated without a cluster via XLA's host-platform
device-count flag — the JAX-idiomatic fake mesh (SURVEY.md §4).

This environment registers a TPU ("axon") backend from sitecustomize at
interpreter startup and forces it via env/config, so plain env vars are not
enough: we must set XLA_FLAGS before the CPU client initializes *and* update
jax_platforms through jax.config (backends init lazily, so doing it here in
conftest — before any test touches jax — is safe).
"""

import os

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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process XLA compiler state: with the whole suite in one
    process, the accumulated live executables eventually make a late large
    CPU compile segfault (observed repeatedly in the train-CLI validation
    compile at ~90% of the suite; never in isolation).  Dropping compiled
    programs between modules keeps the compiler healthy; modules don't share
    jitted shapes, so there is almost no recompile cost."""
    yield
    jax.clear_caches()

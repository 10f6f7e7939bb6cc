"""Test configuration: force an 8-device virtual CPU mesh.

NOTE: in this environment jax is pre-imported by a sitecustomize with
JAX_PLATFORMS=axon (remote TPU tunnel). Plain env vars set here are too late,
but the backend initializes lazily, so `jax.config.update` still wins as long
as it runs before any device is touched. Tests must run on the local CPU
backend — eager ops against the TPU tunnel cost ~ms each.

The reference repo's only QA gate is compilation under -Werror plus one Catch2
smoke test (reference test/tests-logic-cfsd18-sensation-slam.cpp:26-30); per
SURVEY.md §4 we do far better: kernel unit tests with NumPy oracles, synthetic
track integration tests, and multi-device sharding tests on this virtual mesh.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (possibly already imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The suite compiles hundreds of distinct XLA:CPU programs (many of them
    8-device shard_maps); with all of them held live by jit/lru caches the
    runtime eventually segfaults inside a later sharded dispatch
    (deterministically ~157 programs in, jaxlib 0.9.0 CPU). Each module's
    programs are independent, so freeing them between modules keeps the live
    set small at no re-trace cost within a module."""
    yield
    jax.clear_caches()

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere (the task environment has
one real TPU chip; tests use 8 virtual CPU devices so multi-chip sharding
paths are exercised hermetically).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The task image's sitecustomize imports jax and registers a remote-TPU
# ("axon") PJRT backend at interpreter start, so the env var alone is too
# late — override through the already-imported config as well.  Tests must
# run on the virtual 8-device CPU mesh, never the (slow, single-chip) tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic graphs are cheap to run
# but slow for XLA CPU to compile; caching makes repeat test runs fast.
# same machine-fingerprinted dir the package picks (stale AOT entries
# from a different host CPU segfault — see zk_stark_project_tpu/__init__.py)
import zk_stark_project_tpu  # noqa: E402,F401  (applies the cache config)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import random

import numpy as np
import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0xC0FFEE)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running protocol-level test")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live compiled-executable references after each test module.

    A full single-process suite run accumulates hundreds of loaded XLA-CPU
    executables; past a threshold the XLA CPU runtime segfaults (observed
    repeatedly at the same cumulative point, in whichever compile or cache
    deserialization happened to run next — individual files and either
    half of the suite always pass).  Clearing jit caches per module keeps
    the live count bounded; re-used shapes reload from the persistent
    compile cache in milliseconds.
    """
    yield
    jax.clear_caches()

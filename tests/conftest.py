"""Test configuration: force a virtual 8-device CPU mesh so unit and
sharding tests run without TPU hardware (SURVEY.md §4 implication (e)).

The axon TPU PJRT plugin registers itself from sitecustomize at interpreter
start and eagerly initializes the TPU backend before any conftest runs,
so JAX_PLATFORMS in the environment is ineffective here. Instead we flip the
platform selection and clear the initialized backends; the next backend
lookup re-reads XLA_FLAGS and comes up as 8 virtual CPU devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
from jax._src import xla_bridge

jax.config.update("jax_platforms", "cpu")
if xla_bridge.backends_are_initialized():
    xla_bridge._clear_backends()

assert jax.default_backend() == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()

# Persistent XLA compilation cache: most of the suite's wall clock on a
# 1-core host is XLA:CPU compiles of the big train-step/sharded programs
# (measured 12.1 -> 3.1 s on a toy program; the sharded train step alone
# compiles for minutes). First run is cold; every later run — including
# re-runs of the slow tier — hits the cache.
#
# The dir is keyed by the host CPU model: XLA:CPU AOT cache entries embed
# the compile machine's feature set, and the loader only WARNS (risking
# SIGILL / wrong code) when executing an entry from a different machine —
# observed when a cache written on one round's host was read on another.
def _cpu_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    name = line.split(":", 1)[1].strip()
                    return "".join(c if c.isalnum() else "-" for c in name)[:48]
    except OSError:
        pass
    return "unknown-cpu"


jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.expanduser("~"), ".cache",
                 f"scene3d_mvsnet_jax_{_cpu_tag()}"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)

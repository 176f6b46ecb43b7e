"""Test environment: force the JAX CPU backend with 8 virtual devices so
mesh/pjit code paths run host-side (the standard JAX stand-in for multi-chip
tests; SURVEY §4). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# jax may already be preloaded at interpreter startup (with JAX_PLATFORMS
# pointing at the TPU); override the live config before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"

# Persistent XLA compilation cache: this machine has ONE core, so the
# suite's wall time is dominated by CPU-backend compiles; caching them
# makes repeat runs much faster (first run unchanged).
from audio_denoising_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(0)

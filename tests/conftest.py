"""Test configuration: force an 8-virtual-device CPU backend.

All tests run without a TPU; multi-device sharding logic is exercised on a
virtual 8-device CPU mesh per SURVEY.md §4.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var; the
# config flag is honored, so set it too (before any backend initialization).
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache for the CPU test backend: the suite is pure
# compile time on this 1-core host, and the cache cuts warm reruns ~3-4x.
# Safe here because tests never touch the axon TPU plugin (which hangs when
# serializing large scan executables — CLAUDE.md); the cache loader's
# "machine feature mismatch" E-lines on stderr are a known false positive
# for the prefer-no-scatter/gather pseudo-features on the same host.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".xla_test_cache",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full train-step compiles (~1 min each on the 1-core CPU "
        "suite); `pytest -m 'not slow'` is the quick pre-commit lane, the "
        "full suite remains the green gate",
    )


@pytest.fixture
def test_config(tmp_path):
    """Small config for fast tests (analog of reference TestConfig,
    testing/test_diffusion.py:19-34)."""
    from distillation_trajectories_tpu import Config

    cfg = Config(
        dataset="MNIST",
        image_size=16,
        channels=1,
        batch_size=8,
        sample_steps=10,
        timesteps=10,
        epochs=1,
        compute_dtype="float32",
        base_dir=str(tmp_path),
    )
    cfg.create_directories()
    return cfg


@pytest.fixture
def rng():
    return np.random.default_rng(0)

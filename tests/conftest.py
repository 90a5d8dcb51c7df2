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

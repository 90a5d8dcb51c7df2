"""Pallas kernel parity tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from distillation_trajectories_tpu.ops.cfg_update import (
    cfg_engine_update,
    cfg_engine_update_reference,
)


def test_cfg_engine_update_matches_reference():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    shape = (2, 16, 16, 3)  # deliberately not tile-aligned when flattened
    x, u, c, n = (jax.random.normal(k, shape) for k in ks)
    c1, c2, sigma, g = 1.005, 0.07, 0.05, 7.5
    want = cfg_engine_update_reference(x, u, c, n, c1, c2, sigma, g)
    got = cfg_engine_update(x, u, c, n, c1, c2, sigma, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_cfg_engine_update_odd_sizes():
    shape = (1, 7, 5, 1)  # 35 elements — heavy padding path
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    x, u, c, n = (jax.random.normal(k, shape) for k in ks)
    want = cfg_engine_update_reference(x, u, c, n, 0.9, 0.1, 0.02, 3.0)
    got = cfg_engine_update(x, u, c, n, 0.9, 0.1, 0.02, 3.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

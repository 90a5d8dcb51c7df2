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


def test_trajectory_scan_pallas_path_matches(test_config):
    """Config.pallas_cfg_update routes the sampler tail through the kernel
    (auto-interpret off-TPU) with identical trajectories."""
    from distillation_trajectories_tpu.diffusion import (
        generate_trajectory_scan,
        get_diffusion_params,
    )
    from distillation_trajectories_tpu.models import make_unet, init_unet
    from distillation_trajectories_tpu.training import make_eval_model_fn

    model = make_unet(test_config, size_factor=0.1)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))
    model_fn = make_eval_model_fn(model, variables)
    dp = get_diffusion_params(test_config.timesteps, test_config)
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))

    for gs in (None, 3.0):  # no-CFG and CFG paths
        base = generate_trajectory_scan(
            model_fn, noise, test_config.timesteps, dp["alphas"], 0,
            guidance_scale=gs,
        )
        fused = generate_trajectory_scan(
            model_fn, noise, test_config.timesteps, dp["alphas"], 0,
            guidance_scale=gs, use_pallas=True,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(base), rtol=2e-5, atol=1e-5
        )

"""Picard parallel-in-time sampler tests: exact convergence to the
sequential chain, and tolerance-based early exit."""

import jax
import jax.numpy as jnp
import numpy as np

from distillation_trajectories_tpu.diffusion import get_diffusion_params
from distillation_trajectories_tpu.diffusion.parallel_sampling import (
    parallel_generate_trajectory,
)
from distillation_trajectories_tpu.diffusion.sampling import (
    generate_trajectory_scan,
)
from distillation_trajectories_tpu.models import make_unet, init_unet


def _model_fn(test_config):
    model = make_unet(test_config, size_factor=0.1)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))

    def fn(x, t, cond, cond_mask):
        return model.apply(variables, x, t, cond=cond, cond_mask=cond_mask)

    return fn


def test_parallel_exact_match_full_sweeps(test_config):
    fn = _model_fn(test_config)
    T = test_config.timesteps  # 10
    dp = get_diffusion_params(T, test_config)
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))

    seq = generate_trajectory_scan(fn, noise, T, dp["alphas"], seed=5)
    par, sweeps = parallel_generate_trajectory(
        fn, noise, T, dp["alphas"], seed=5, tol=0.0
    )
    assert par.shape == seq.shape == (T + 1, 2, 16, 16, 1)
    np.testing.assert_allclose(
        np.asarray(par), np.asarray(seq), rtol=1e-4, atol=1e-5
    )
    assert int(sweeps) <= T - 1


def test_parallel_cfg_matches_sequential(test_config):
    fn = _model_fn(test_config)
    T = 6
    dp = get_diffusion_params(T, test_config)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 1))
    seq = generate_trajectory_scan(
        fn, noise, T, dp["alphas"], seed=3, guidance_scale=5.0
    )
    par, _ = parallel_generate_trajectory(
        fn, noise, T, dp["alphas"], seed=3, guidance_scale=5.0, tol=0.0
    )
    np.testing.assert_allclose(
        np.asarray(par), np.asarray(seq), rtol=1e-4, atol=1e-5
    )


def test_parallel_early_exit_uses_fewer_sweeps(test_config):
    fn = _model_fn(test_config)
    T = test_config.timesteps
    dp = get_diffusion_params(T, test_config)
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 1))
    par_exact, sweeps_exact = parallel_generate_trajectory(
        fn, noise, T, dp["alphas"], seed=7, tol=0.0
    )
    par_loose, sweeps_loose = parallel_generate_trajectory(
        fn, noise, T, dp["alphas"], seed=7, tol=1e-2
    )
    assert int(sweeps_loose) <= int(sweeps_exact)
    # loose solution still close to the exact one
    np.testing.assert_allclose(
        np.asarray(par_loose), np.asarray(par_exact), atol=0.1
    )


def test_sliding_window_tol0_matches_sequential(test_config):
    """tol=0 finalizes one step per sweep and reproduces the chain exactly
    (window positions only act as warm starts)."""
    from distillation_trajectories_tpu.diffusion.parallel_sampling import (
        sliding_window_trajectory,
    )

    fn = _model_fn(test_config)
    T = test_config.timesteps
    dp = get_diffusion_params(T, test_config)
    noise = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 1))

    seq = generate_trajectory_scan(fn, noise, T, dp["alphas"], seed=9)
    win, sweeps = sliding_window_trajectory(
        fn, noise, T, dp["alphas"], seed=9, window=4, tol=0.0
    )
    assert win.shape == seq.shape
    assert int(sweeps) == T - 1
    np.testing.assert_allclose(
        np.asarray(win), np.asarray(seq), rtol=1e-4, atol=1e-5
    )
    # layout contract: entry 0 is the noise, last two entries identical
    np.testing.assert_array_equal(np.asarray(win[0]), np.asarray(noise))
    np.testing.assert_array_equal(np.asarray(win[-1]), np.asarray(win[-2]))


def test_sliding_window_cfg_and_slide_mechanics(test_config):
    from distillation_trajectories_tpu.diffusion.parallel_sampling import (
        sliding_window_trajectory,
    )

    fn = _model_fn(test_config)
    T = test_config.timesteps  # 10 → n_steps = 9
    dp = get_diffusion_params(T, test_config)
    noise = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 1))

    # CFG path, tol=0 parity
    seq = generate_trajectory_scan(
        fn, noise, T, dp["alphas"], seed=11, guidance_scale=4.0
    )
    win, _ = sliding_window_trajectory(
        fn, noise, T, dp["alphas"], seed=11, guidance_scale=4.0,
        window=4, tol=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(win), np.asarray(seq), rtol=1e-4, atol=1e-5
    )

    # Infinite tolerance slides the full window every sweep:
    # ceil(9 / 4) = 3 sweeps.
    _, sweeps = sliding_window_trajectory(
        fn, noise, T, dp["alphas"], seed=11, window=4, tol=1e9
    )
    assert int(sweeps) == -(-(T - 1) // 4)


def test_config_parallel_sampling_window_switch(test_config):
    """Config.parallel_sampling='window' routes engine.generate_trajectory
    through the sliding-window sampler; tol=0 is exact."""
    from distillation_trajectories_tpu.models import make_unet, init_unet
    from distillation_trajectories_tpu.trajectories.engine import (
        generate_trajectory,
    )

    model = make_unet(test_config, size_factor=0.1)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))
    noise = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 1))

    seq = generate_trajectory(
        model, variables, noise, test_config.timesteps, seed=2, config=test_config
    )
    test_config.parallel_sampling = "window"
    test_config.paradigms_tol = 0.0
    win = generate_trajectory(
        model, variables, noise, test_config.timesteps, seed=2, config=test_config
    )
    test_config.parallel_sampling = "off"
    np.testing.assert_allclose(
        np.asarray(win), np.asarray(seq), rtol=1e-4, atol=1e-5
    )


def test_sliding_window_finite_tol_close_to_exact(test_config):
    from distillation_trajectories_tpu.diffusion.parallel_sampling import (
        sliding_window_trajectory,
    )

    fn = _model_fn(test_config)
    T = test_config.timesteps
    dp = get_diffusion_params(T, test_config)
    noise = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 1))

    exact = generate_trajectory_scan(fn, noise, T, dp["alphas"], seed=13)
    win, sweeps = sliding_window_trajectory(
        fn, noise, T, dp["alphas"], seed=13, window=4, tol=1e-2
    )
    assert int(sweeps) <= T - 1
    np.testing.assert_allclose(np.asarray(win), np.asarray(exact), atol=0.15)

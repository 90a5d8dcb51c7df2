"""Diffusion core tests: schedules, q_sample SNR invariants, samplers."""

import jax
import jax.numpy as jnp
import numpy as np

from distillation_trajectories_tpu.diffusion import (
    get_diffusion_params,
    linear_beta_schedule,
    cosine_beta_schedule,
    extract,
    q_sample,
    p_sample_loop,
    generate_trajectory_scan,
    subsampled_timestep_indices,
    engine_update,
)


def test_linear_schedule_endpoints():
    betas = linear_beta_schedule(100, 1e-4, 0.02)
    assert betas.shape == (100,)
    np.testing.assert_allclose(float(betas[0]), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(betas[-1]), 0.02, rtol=1e-5)


def test_cosine_schedule_valid():
    betas = cosine_beta_schedule(100)
    assert np.all(np.asarray(betas) > 0)
    assert np.all(np.asarray(betas) <= 0.999)


def test_diffusion_params_keys_and_identities():
    dp = get_diffusion_params(50)
    # all six reference keys (utils/diffusion.py:59-66) plus the alphas the
    # reference's editing modules expected but never got
    for k in (
        "betas",
        "alphas",
        "alphas_cumprod",
        "sqrt_recip_alphas",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "posterior_variance",
    ):
        assert k in dp, k
    ac = np.asarray(dp["alphas_cumprod"])
    np.testing.assert_allclose(
        np.asarray(dp["sqrt_alphas_cumprod"]) ** 2, ac, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dp["sqrt_one_minus_alphas_cumprod"]) ** 2, 1 - ac, rtol=1e-4
    )
    assert np.all(np.diff(ac) < 0)  # strictly decreasing


def test_extract_gathers_and_broadcasts():
    a = jnp.arange(10.0)
    t = jnp.array([0, 5, 9, 20])  # 20 clamps to 9
    out = extract(a, t, (4, 8, 8, 3))
    assert out.shape == (4, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0, 5, 9, 9])


def test_q_sample_snr():
    """x_t = √ᾱ·x0 + √(1−ᾱ)·ε: variance ≈ ᾱ·var(x0) + (1−ᾱ)."""
    dp = get_diffusion_params(100)
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((64, 8, 8, 1)) * 0.5
    t = jnp.full((64,), 50, dtype=jnp.int32)
    x_noisy, noise = q_sample(x0, t, dp, key)
    assert x_noisy.shape == x0.shape
    ac = float(dp["alphas_cumprod"][50])
    np.testing.assert_allclose(
        float(jnp.mean(x_noisy)), np.sqrt(ac) * 0.5, atol=0.05
    )
    np.testing.assert_allclose(float(jnp.var(x_noisy)), 1 - ac, rtol=0.2)


def test_subsampled_indices_match_reference_formula():
    # reference diffusion.py:194-197
    idx = subsampled_timestep_indices(100, 100)
    assert list(idx) == list(range(99, -1, -1))
    idx2 = subsampled_timestep_indices(100, 10)
    assert idx2[0] == 90 and idx2[-1] == 0 and len(idx2) == 10


def _zero_model(x, t, cond, cond_mask):
    return jnp.zeros_like(x)


def test_p_sample_loop_shapes_and_trajectory():
    dp = get_diffusion_params(10)
    img, traj = p_sample_loop(
        _zero_model,
        (2, 8, 8, 1),
        10,
        dp,
        jax.random.PRNGKey(0),
        track_trajectory=True,
    )
    assert img.shape == (2, 8, 8, 1)
    assert traj.shape == (11, 2, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(img))


def test_engine_trajectory_parity_structure():
    """T+1 entries; last two identical (reference's no-op t=0 iteration)."""
    T = 10
    dp = get_diffusion_params(T)
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 1))
    traj = generate_trajectory_scan(
        _zero_model, noise, T, dp["alphas"], seed=42, guidance_scale=None
    )
    assert traj.shape == (T + 1, 1, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(traj[-2]))
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(noise))


def test_engine_update_matches_reference_math():
    """Direct check of c1/c2/σ update against the formulas at
    trajectory_engine.py:96-110 computed by hand."""
    x = jnp.ones((1, 2, 2, 1)) * 2.0
    eps = jnp.ones((1, 2, 2, 1)) * 0.5
    n = jnp.ones((1, 2, 2, 1)) * 0.1
    a_t, a_prev = 0.98, 0.99
    out = engine_update(x, eps, n, a_t, a_prev)
    c1 = np.sqrt(a_prev) / np.sqrt(a_t)
    c2 = np.sqrt(1 - a_prev) - np.sqrt(a_prev / a_t) * np.sqrt(1 - a_t)
    sigma = np.sqrt(1 - a_prev) * np.sqrt(1 - a_t / a_prev)
    expected = c1 * 2.0 - c2 * 0.5 + sigma * 0.1
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_trajectory_noise_deterministic_in_seed():
    """Same seed ⇒ identical trajectories; different seeds ⇒ different."""
    T = 8
    dp = get_diffusion_params(T)
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 1))
    t1 = generate_trajectory_scan(_zero_model, noise, T, dp["alphas"], seed=7)
    t2 = generate_trajectory_scan(_zero_model, noise, T, dp["alphas"], seed=7)
    t3 = generate_trajectory_scan(_zero_model, noise, T, dp["alphas"], seed=8)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2))
    assert not np.allclose(np.asarray(t1), np.asarray(t3))


def test_store_dtype_bf16():
    """bf16 trajectory storage: carry math stays f32 (identical final state
    up to one bf16 round), stored states are bf16 and within bf16 eps of the
    f32-stored trajectory; downstream metric scalars stay within 1e-2 rel."""
    T = 10
    dp = get_diffusion_params(T)
    noise = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 1))
    f32 = generate_trajectory_scan(_zero_model, noise, T, dp["alphas"], seed=3)
    bf16 = generate_trajectory_scan(
        _zero_model, noise, T, dp["alphas"], seed=3, store_dtype=jnp.bfloat16
    )
    assert bf16.dtype == jnp.bfloat16
    assert bf16.shape == f32.shape
    # bf16 has an 8-bit mantissa: single-round error ≤ 2^-8 relative.
    np.testing.assert_allclose(
        np.asarray(bf16, dtype=np.float32), np.asarray(f32), rtol=0, atol=4e-2
    )
    # Last two entries still identical (duplicated no-op t=0 state).
    np.testing.assert_allclose(
        np.asarray(bf16[-1], np.float32), np.asarray(bf16[-2], np.float32)
    )

    from distillation_trajectories_tpu.metrics.trajectory_metrics import (
        compute_trajectory_metrics,
    )

    m32 = compute_trajectory_metrics(f32[:, 0], f32[:, 1])
    m16 = compute_trajectory_metrics(bf16[:, 0], bf16[:, 1])
    for k in ("point_by_point_similarity", "mean_wasserstein", "path_alignment"):
        ref, got = m32[k], m16[k]
        assert abs(got - ref) <= 1e-2 * max(abs(ref), 1.0), (k, ref, got)


def test_cfg_trajectory_uses_guidance(test_config):
    """CFG path must differ from no-CFG path with a cond-sensitive model."""
    import jax

    from distillation_trajectories_tpu.models import make_unet, init_unet

    model = make_unet(test_config, size_factor=0.1)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))

    def model_fn(x, t, cond, cond_mask):
        return model.apply(variables, x, t, cond=cond, cond_mask=cond_mask)

    T = 5
    dp = get_diffusion_params(T)
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 1))
    t_plain = generate_trajectory_scan(model_fn, noise, T, dp["alphas"], seed=1)
    t_cfg = generate_trajectory_scan(
        model_fn, noise, T, dp["alphas"], seed=1, guidance_scale=5.0
    )
    assert t_plain.shape == t_cfg.shape == (T + 1, 1, 16, 16, 1)
    assert not np.allclose(np.asarray(t_plain[1:]), np.asarray(t_cfg[1:]))


def test_p_sample_matches_reference_formula():
    """Direct check of the ddpm-formulation update against
    utils/diffusion.py:149-158 computed by hand with a constant model."""
    from distillation_trajectories_tpu.diffusion import p_sample

    dp = get_diffusion_params(10)
    const = 0.3

    def model_fn(x, t, cond, cond_mask):
        # cond pass returns const, uncond returns const/2 (distinguished by
        # the cond value routed through cond arg)
        scale = jnp.where(jnp.sum(cond) > 0, 1.0, 0.5)
        return jnp.full_like(x, const) * scale

    x = jnp.ones((1, 4, 4, 1)) * 2.0
    t = jnp.array([5])
    g = 3.0
    out = p_sample(model_fn, x, t, jnp.asarray(5), dp, jax.random.PRNGKey(0),
                   guidance_scale=g)
    betas_t = float(dp["betas"][5])
    sqrt_omac = float(dp["sqrt_one_minus_alphas_cumprod"][5])
    sqrt_recip = float(dp["sqrt_recip_alphas"][5])
    cond_out, uncond_out = const, const * 0.5
    model_out = uncond_out + g * (cond_out - uncond_out)
    pred_dir = (1.0 - sqrt_omac) * model_out
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(0), x.shape))
    expected = sqrt_recip * (2.0 - pred_dir) + noise * betas_t
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_p_sample_no_noise_at_t0():
    from distillation_trajectories_tpu.diffusion import p_sample

    dp = get_diffusion_params(10)
    x = jnp.ones((1, 4, 4, 1))
    out1 = p_sample(_zero_model, x, jnp.array([0]), jnp.asarray(0), dp,
                    jax.random.PRNGKey(0))
    out2 = p_sample(_zero_model, x, jnp.array([0]), jnp.asarray(0), dp,
                    jax.random.PRNGKey(99))
    # t_index == 0 → deterministic (no noise added)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_ancestral_sampler_denoises_linear_model():
    """With the oracle ε-predictor for data x0=0 (ε̂ = x_t/√(1−ᾱ_t)), the
    correct ancestral sampler must contract toward 0; the reference
    formulation does not (documented divergence, SURVEY.md §2.3)."""
    from distillation_trajectories_tpu.diffusion import p_sample_loop

    T = 50
    dp = get_diffusion_params(T)

    def oracle(x, t, cond, cond_mask):
        somac = extract(dp["sqrt_one_minus_alphas_cumprod"], t.astype(jnp.int32),
                        x.shape)
        return x / somac

    img = p_sample_loop(
        oracle, (8, 8, 8, 1), T, dp, jax.random.PRNGKey(0), mode="ancestral"
    )
    # x0=0 data: final states should be much closer to 0 than N(0,1)
    assert float(jnp.mean(img**2)) < 0.05


def test_ancestral_mode_differs_from_reference_mode():
    from distillation_trajectories_tpu.diffusion import p_sample_loop

    T = 10
    dp = get_diffusion_params(T)
    a = p_sample_loop(_zero_model, (1, 8, 8, 1), T, dp, jax.random.PRNGKey(0))
    b = p_sample_loop(
        _zero_model, (1, 8, 8, 1), T, dp, jax.random.PRNGKey(0),
        mode="ancestral",
    )
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_diffusion_params_are_host_arrays():
    """Schedule tensors must be HOST (numpy) arrays: as device arrays,
    closure-captured constants force ``jit(...).lower()`` to fetch each one
    back over the axon tunnel (mlir.ir_constant -> array._value) — slow per
    multi-architecture compile pool and a hard hang when the tunnel drops
    mid-fetch (observed round 3, FID stage).  Traced indexing converts with
    jnp.asarray at trace entry instead."""
    import jax

    dp = get_diffusion_params(10)
    for k, v in dp.items():
        assert not isinstance(v, jax.Array), k
        assert isinstance(v, (np.ndarray, np.generic)), (k, type(v))

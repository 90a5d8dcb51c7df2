"""Reverse-process samplers, compiled as single ``lax.scan`` loops.

The reference contains four inconsistent reverse-process implementations
(SURVEY.md §2.3).  This module implements the two that define its external
behavior, each as one scan so the full T-step loop runs on device with no
per-step host sync:

* ``p_sample`` / ``p_sample_loop`` — the reference ``utils/diffusion.py``
  formulation (:103-212), 2-pass CFG, used by training-time sample grids.
* ``generate_trajectory_scan`` — the trajectory-engine formulation
  (``analysis/trajectory_engine.py:24-115``), DDIM-like c1/c2/σ update on
  per-step alphas, fused CFG, per-step noise deterministic in ``(seed, t)``
  so paired teacher/student trajectories share identical noise — this is the
  BASELINE.json north-star path.

All samplers emit trajectories as stacked on-device arrays
``[T+1, B, H, W, C]`` instead of Python lists of host tensors.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import extract

ModelFn = Callable[..., jnp.ndarray]


def subsampled_timestep_indices(sample_steps: int, num_timesteps: int) -> np.ndarray:
    """Descending subsampled timestep indices (reference diffusion.py:194-197)."""
    step_size = max(1, sample_steps // num_timesteps)
    idx = {min(i * step_size, sample_steps - 1) for i in range(num_timesteps)}
    return np.array(sorted(idx, reverse=True), dtype=np.int32)


def p_sample(
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    t_index: jnp.ndarray,
    diffusion_params: Dict[str, jnp.ndarray],
    key: jax.Array,
    guidance_scale: float = 1.0,
) -> jnp.ndarray:
    """One reverse step, reference ``utils/diffusion.py:103-158`` formulation.

    Keeps the reference's non-standard update
    ``x ← 1/√α·(x − (1−√(1−ᾱ))·ε̂) + noise·β`` and its 2-pass CFG
    (cond=1 vs cond=None).
    """
    b = x.shape[0]
    betas_t = extract(diffusion_params["betas"], t, x.shape)
    sqrt_omac_t = extract(
        diffusion_params["sqrt_one_minus_alphas_cumprod"], t, x.shape
    )
    sqrt_recip_alphas_t = extract(diffusion_params["sqrt_recip_alphas"], t, x.shape)

    ones = jnp.ones((b, 1), dtype=x.dtype)
    cond_out = model_fn(x, t, ones, ones)
    uncond_out = model_fn(x, t, jnp.zeros((b, 1), x.dtype), jnp.zeros((b, 1), x.dtype))
    model_output = uncond_out + guidance_scale * (cond_out - uncond_out)

    pred_direction = (1.0 - sqrt_omac_t) * model_output
    noise = jax.random.normal(key, x.shape, dtype=x.dtype)
    noise = jnp.where(t_index > 0, noise, 0.0)
    return sqrt_recip_alphas_t * (x - pred_direction) + noise * betas_t


def p_sample_ancestral(
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    t_index: jnp.ndarray,
    diffusion_params: Dict[str, jnp.ndarray],
    key: jax.Array,
    guidance_scale: float = 1.0,
) -> jnp.ndarray:
    """Textbook DDPM ancestral step (Ho et al. 2020, Eq. 11):

        x_{t-1} = 1/√α_t · (x_t − β_t/√(1−ᾱ_t) · ε̂) + √β̃_t · z

    The reference's own ``p_sample`` uses a non-standard update
    (utils/diffusion.py:149-158, SURVEY.md §2.3) that does not denoise
    correctly; ``p_sample`` reproduces it for parity, while this mode
    (``Config.sampler="ddpm"``) is the framework's mathematically correct
    sampler.  CFG is the same 2-pass cond/uncond combination.
    """
    b = x.shape[0]
    betas_t = extract(diffusion_params["betas"], t, x.shape)
    sqrt_omac_t = extract(
        diffusion_params["sqrt_one_minus_alphas_cumprod"], t, x.shape
    )
    sqrt_recip_alphas_t = extract(diffusion_params["sqrt_recip_alphas"], t, x.shape)
    posterior_var_t = extract(diffusion_params["posterior_variance"], t, x.shape)

    ones = jnp.ones((b, 1), dtype=x.dtype)
    cond_out = model_fn(x, t, ones, ones)
    uncond_out = model_fn(x, t, jnp.zeros((b, 1), x.dtype), jnp.zeros((b, 1), x.dtype))
    eps = uncond_out + guidance_scale * (cond_out - uncond_out)

    mean = sqrt_recip_alphas_t * (x - betas_t / sqrt_omac_t * eps)
    noise = jax.random.normal(key, x.shape, dtype=x.dtype)
    noise = jnp.where(t_index > 0, noise, 0.0)
    return mean + jnp.sqrt(posterior_var_t) * noise


def p_sample_loop(
    model_fn: ModelFn,
    shape: Tuple[int, ...],
    sample_steps: int,
    diffusion_params: Dict[str, jnp.ndarray],
    key: jax.Array,
    num_timesteps: Optional[int] = None,
    track_trajectory: bool = False,
    guidance_scale: float = 1.0,
    mode: str = "reference",
):
    """Full reverse loop as one ``lax.scan`` (reference diffusion.py:160-212).

    ``mode="reference"`` uses the reference's p_sample formulation (parity);
    ``mode="ancestral"`` uses the correct DDPM ancestral update.
    Returns ``img`` or ``(img, trajectory)`` with trajectory
    ``[n_steps+1, B, H, W, C]`` on device.
    """
    if num_timesteps is None:
        num_timesteps = sample_steps
    indices = jnp.asarray(subsampled_timestep_indices(sample_steps, num_timesteps))
    step_fn = p_sample_ancestral if mode == "ancestral" else p_sample

    key, init_key = jax.random.split(key)
    img = jax.random.normal(init_key, shape, dtype=jnp.float32)

    def step(carry, t_index):
        x, k = carry
        k, sk = jax.random.split(k)
        b = x.shape[0]
        t = jnp.full((b,), t_index, dtype=jnp.int32)
        x = step_fn(
            model_fn, x, t, t_index, diffusion_params, sk, guidance_scale
        )
        return (x, k), (x if track_trajectory else None)

    (img_final, _), traj = jax.lax.scan(step, (img, key), indices)
    if track_trajectory:
        trajectory = jnp.concatenate([img[None], traj], axis=0)
        return img_final, trajectory
    return img_final


def engine_update(
    x: jnp.ndarray,
    noise_pred: jnp.ndarray,
    noise: jnp.ndarray,
    alpha_t: jnp.ndarray,
    alpha_prev: jnp.ndarray,
) -> jnp.ndarray:
    """Trajectory-engine DDIM-like update (reference trajectory_engine.py:96-110).

    Note: operates on *per-step* alphas (1−β), not cumulative products —
    an idiosyncrasy of the reference preserved for numerical parity.
    """
    c1 = jnp.sqrt(alpha_prev) / jnp.sqrt(alpha_t)
    c2 = jnp.sqrt(1.0 - alpha_prev) - jnp.sqrt(alpha_prev / alpha_t) * jnp.sqrt(
        1.0 - alpha_t
    )
    x = c1 * x - c2 * noise_pred
    sigma_t = jnp.sqrt(1.0 - alpha_prev) * jnp.sqrt(1.0 - alpha_t / alpha_prev)
    return x + sigma_t * noise


def generate_trajectory_scan(
    model_fn: ModelFn,
    noise: jnp.ndarray,
    timesteps: int,
    alphas: jnp.ndarray,
    seed: jnp.ndarray,
    guidance_scale: Optional[float] = None,
    use_cfg: Optional[bool] = None,
    store_dtype: Optional[jnp.dtype] = None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Full trajectory via the engine formulation as one scan.

    Reference ``analysis/trajectory_engine.py:24-115``: iterate t=T−1..0; at
    each t>0 apply the c1/c2/σ update with per-step noise reseeded as
    ``seed + t`` (here: ``fold_in(PRNGKey(seed), t)`` — deterministic in
    (seed, t) so teacher and student chains see identical noise).  The t=0
    iteration performs no update, so its model forward is skipped entirely
    and the final state is duplicated, exactly matching the reference's
    output trajectory.

    CFG (used when ``guidance_scale > 1.0``) evaluates cond=0 and cond=1
    passes *both through the conditioning MLP* (trajectory_engine.py:68-80),
    unlike ``p_sample``'s cond=None unconditional pass.

    ``use_pallas`` routes the CFG-combine + c1/c2/σ update tail through the
    fused Pallas kernel (ops/cfg_update.py) instead of jnp ops —
    ``Config.pallas_cfg_update``; measured numbers in PERFORMANCE.md.

    ``store_dtype`` (e.g. ``jnp.bfloat16``) casts only the *stored* per-step
    states — the scan carry and all update math stay in the input dtype, so
    sampling numerics are unchanged; storage HBM traffic is halved.  Accuracy
    note (measured, tests/test_diffusion.py::test_store_dtype_bf16): bf16
    storage perturbs downstream metric-suite scalars by <1e-2 relative on the
    similarity metrics (bf16 has ~3 decimal digits; the metrics are means
    over ≥1000 pixels so rounding noise averages down).  Keep float32 (the
    default) when metric outputs must match the reference to 1e-4.

    Returns trajectory ``[T+1, B, H, W, C]``.
    """
    if use_cfg is None:
        use_cfg = guidance_scale is not None and (
            not isinstance(guidance_scale, (int, float)) or guidance_scale > 1.0
        )
    gs = 1.0 if guidance_scale is None else guidance_scale
    b = noise.shape[0]
    alphas = jnp.asarray(alphas)  # host constants (see get_diffusion_params)
    base_key = jax.random.PRNGKey(seed) if jnp.ndim(seed) == 0 else seed

    def step(x, t):
        tvec = jnp.full((b,), t, dtype=jnp.float32)
        step_key = jax.random.fold_in(base_key, t)
        step_noise = jax.random.normal(step_key, x.shape, dtype=x.dtype)
        alpha_t = alphas[t]
        alpha_prev = alphas[t - 1]
        if use_pallas:
            from ..ops.cfg_update import cfg_engine_update

            if use_cfg:
                pred_uncond = model_fn(
                    x, tvec, jnp.zeros((b, 1), x.dtype), jnp.ones((b, 1), x.dtype)
                )
                pred_cond = model_fn(
                    x, tvec, jnp.ones((b, 1), x.dtype), jnp.ones((b, 1), x.dtype)
                )
            else:
                pred_uncond = model_fn(
                    x, tvec, jnp.zeros((b, 1), x.dtype), jnp.zeros((b, 1), x.dtype)
                )
                pred_cond = pred_uncond
            # Same c1/c2/σ algebra as engine_update (kept in sync with it).
            c1 = jnp.sqrt(alpha_prev) / jnp.sqrt(alpha_t)
            c2 = jnp.sqrt(1.0 - alpha_prev) - jnp.sqrt(
                alpha_prev / alpha_t
            ) * jnp.sqrt(1.0 - alpha_t)
            sigma_t = jnp.sqrt(1.0 - alpha_prev) * jnp.sqrt(
                1.0 - alpha_t / alpha_prev
            )
            x = cfg_engine_update(
                x, pred_uncond, pred_cond, step_noise, c1, c2, sigma_t,
                gs if use_cfg else 1.0,
            )
            stored = x if store_dtype is None else x.astype(store_dtype)
            return x, stored
        if use_cfg:
            # Fused CFG: cond-0 and cond-1 passes, both through the cond MLP
            # (trajectory_engine.py:68-80).  Two B-sized forwards measure
            # faster on v5e than one concatenated 2B forward (the concat
            # materializes an extra 2B activation tensor in HBM), so the
            # reference's cat/chunk trick is intentionally not replicated.
            pred_uncond = model_fn(
                x, tvec, jnp.zeros((b, 1), x.dtype), jnp.ones((b, 1), x.dtype)
            )
            pred_cond = model_fn(
                x, tvec, jnp.ones((b, 1), x.dtype), jnp.ones((b, 1), x.dtype)
            )
            noise_pred = pred_uncond + gs * (pred_cond - pred_uncond)
        else:
            # No-CFG path: cond=None (mask 0), single forward
            # (trajectory_engine.py:81-83).
            noise_pred = model_fn(
                x, tvec, jnp.zeros((b, 1), x.dtype), jnp.zeros((b, 1), x.dtype)
            )
        x = engine_update(x, noise_pred, step_noise, alpha_t, alpha_prev)
        stored = x if store_dtype is None else x.astype(store_dtype)
        return x, stored

    ts = jnp.arange(timesteps - 1, 0, -1, dtype=jnp.int32)
    x_final, states = jax.lax.scan(step, noise, ts)
    if store_dtype is not None:
        noise = noise.astype(store_dtype)
        x_final = x_final.astype(store_dtype)
    # [noise, states for t=T-1..1, duplicate for the no-op t=0 iteration]
    return jnp.concatenate([noise[None], states, x_final[None]], axis=0)


# (cond, cond_mask) rows for the two model forwards of the unified batched
# sampler below.  CFG evaluates cond=0 and cond=1 both through the
# conditioning MLP (reference trajectory_engine.py:68-80); no-CFG evaluates
# cond=None — cond 0, mask 0 — (trajectory_engine.py:81-83).  The no-CFG
# rows are identical on purpose: preds[1] == preds[0] makes the CFG combine
# ``u + g*(c - u)`` collapse to exactly ``u`` (the g term is exactly 0.0),
# so ONE compiled graph serves every guidance scale at runtime.
CFG_COND_PAIRS = np.array([[0.0, 1.0], [1.0, 1.0]], dtype=np.float32)
NOCFG_COND_PAIRS = np.array([[0.0, 0.0], [0.0, 0.0]], dtype=np.float32)


def generate_trajectory_batch_scan(
    model_fn: ModelFn,
    noises: jnp.ndarray,
    timesteps: int,
    alphas: jnp.ndarray,
    seeds: jnp.ndarray,
    cond_pairs: jnp.ndarray,
    guidance_scale: jnp.ndarray,
    store_dtype: Optional[jnp.dtype] = None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Sample-batched, CFG-unified engine sampler (the sweep hot path).

    Produces the same values as vmapping :func:`generate_trajectory_scan`
    over ``(noises, seeds)`` (pinned by tests/test_trajectories.py), but is
    restructured to minimise trace+compile wall-clock — the dominant cost of
    the flagship CFG sweep on the 1-core host (round-2 measurement: tracing
    the 19 per-(size, cfg-variant) graphs took 93–200s vs 7.6s of device
    execution):

    * samples ride the model's batch axis directly instead of an outer
      ``vmap`` — only the per-step noise draw is vmapped (per-sample
      ``fold_in(PRNGKey(seed), t)``, preserving the reference's paired
      teacher/student noise, trajectory_engine.py:88-95);
    * the two CFG forwards run as ``lax.map`` over ``cond_pairs`` rows, so
      the U-Net body is traced and compiled ONCE per graph (the two
      iterations still execute as separate B-sized forwards — the measured
      v5e win over one concatenated 2B forward is preserved);
    * ``cond_pairs`` is a runtime ``[2, 2]`` input (:data:`CFG_COND_PAIRS`
      or :data:`NOCFG_COND_PAIRS`), so CFG and no-CFG guidance scales share
      one executable instead of compiling two variants per model.  The
      no-CFG case pays a second (redundant) forward; in the default sweep
      that applies to 1 of 10 scales ≈ +0.5% device time, traded for
      halving the number of traced graphs.

    Args:
        noises: ``[S, H, W, C]`` per-sample starting noise.
        seeds: ``[S]`` int32 per-sample noise seeds.
        cond_pairs: ``[2, 2]`` float32 (cond, cond_mask) rows.
    Returns:
        trajectories ``[S, T+1, H, W, C]``.
    """
    s = noises.shape[0]
    alphas = jnp.asarray(alphas)  # host constants (see get_diffusion_params)
    base_keys = jax.vmap(jax.random.PRNGKey)(seeds)
    gs = guidance_scale

    def step(x, t):
        tvec = jnp.full((s,), t, dtype=jnp.float32)
        step_keys = jax.vmap(lambda k: jax.random.fold_in(k, t))(base_keys)
        # Same bits as the per-sample path's normal(key, (1, H, W, C)):
        # draw shape only affects the reshape, not the stream.
        step_noise = jax.vmap(
            lambda k: jax.random.normal(k, x.shape[1:], x.dtype)
        )(step_keys)
        alpha_t = alphas[t]
        alpha_prev = alphas[t - 1]

        def forward(pair):
            cond = jnp.full((s, 1), pair[0], x.dtype)
            mask = jnp.full((s, 1), pair[1], x.dtype)
            return model_fn(x, tvec, cond, mask)

        preds = jax.lax.map(forward, cond_pairs)  # [2, S, H, W, C]
        if use_pallas:
            from ..ops.cfg_update import cfg_engine_update

            c1 = jnp.sqrt(alpha_prev) / jnp.sqrt(alpha_t)
            c2 = jnp.sqrt(1.0 - alpha_prev) - jnp.sqrt(
                alpha_prev / alpha_t
            ) * jnp.sqrt(1.0 - alpha_t)
            sigma_t = jnp.sqrt(1.0 - alpha_prev) * jnp.sqrt(
                1.0 - alpha_t / alpha_prev
            )
            x = cfg_engine_update(
                x, preds[0], preds[1], step_noise, c1, c2, sigma_t, gs
            )
        else:
            noise_pred = preds[0] + gs * (preds[1] - preds[0])
            x = engine_update(x, noise_pred, step_noise, alpha_t, alpha_prev)
        stored = x if store_dtype is None else x.astype(store_dtype)
        return x, stored

    ts = jnp.arange(timesteps - 1, 0, -1, dtype=jnp.int32)
    x_final, states = jax.lax.scan(step, noises, ts)
    first = noises
    if store_dtype is not None:
        first = first.astype(store_dtype)
        x_final = x_final.astype(store_dtype)
    traj = jnp.concatenate([first[None], states, x_final[None]], axis=0)
    return jnp.moveaxis(traj, 0, 1)  # [S, T+1, H, W, C]

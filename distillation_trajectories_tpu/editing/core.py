"""Shared editing primitives: scan-compiled unconditional generation with
trajectory capture, from arbitrary start states/timesteps.

The reference's editing modules each carry a private copy of the DDIM-like
reverse loop keyed on ``diffusion_params["alphas"]`` — a key the reference's
own ``get_diffusion_params`` never returned (API mismatch, SURVEY.md §2.3).
Here they all share the framework's single sampler (diffusion/sampling.py)
whose params dict does include ``alphas``, closing that bug.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.sampling import engine_update


def denoise_with_trajectory(
    model_fn: Callable,
    x0: jnp.ndarray,
    alphas: jnp.ndarray,
    start_t: int,
    key: jax.Array,
    post_step: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    diffusion_params=None,
    mode: str = "engine",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse process from state ``x0`` at timestep ``start_t`` down to 0.

    ``post_step`` (e.g. inpainting mask reimposition) is applied inside the
    scan body after every update.  Returns ``(final_state, trajectory)`` with
    trajectory ``[start_t+1, B, H, W, C]`` (states *before* each step plus
    final, matching the reference loops' record-then-update ordering).

    ``mode="engine"`` (default) is the reference-parity DDIM-like update;
    ``mode="ancestral"`` is the correct DDPM step (requires
    ``diffusion_params``) — use with ``noise_schedule="cosine"`` models for
    edits that actually denoise.
    """
    b = x0.shape[0]
    alphas = jnp.asarray(alphas)  # host constants (see get_diffusion_params)
    if mode == "ancestral":
        assert diffusion_params is not None, "ancestral mode needs diffusion_params"
        betas = jnp.asarray(diffusion_params["betas"])
        somac = jnp.asarray(diffusion_params["sqrt_one_minus_alphas_cumprod"])
        sra = jnp.asarray(diffusion_params["sqrt_recip_alphas"])
        pvar = jnp.asarray(diffusion_params["posterior_variance"])

    def step(x, t):
        recorded = x
        tvec = jnp.full((b,), t, dtype=jnp.float32)
        noise_pred = model_fn(
            x, tvec, jnp.zeros((b, 1), x.dtype), jnp.zeros((b, 1), x.dtype)
        )
        step_key = jax.random.fold_in(key, t)
        noise = jax.random.normal(step_key, x.shape, dtype=x.dtype)
        if mode == "ancestral":
            mean = sra[t] * (x - betas[t] / somac[t] * noise_pred)
            x_new = mean + jnp.sqrt(pvar[t]) * noise
        else:
            x_new = engine_update(x, noise_pred, noise, alphas[t], alphas[t - 1])
        if post_step is not None:
            x_new = post_step(x_new)
        # t=0 iteration records the state but performs no update (ref loops)
        x_new = jnp.where(t > 0, x_new, x)
        return x_new, recorded

    ts = jnp.arange(start_t, -1, -1, dtype=jnp.int32)
    x_final, states = jax.lax.scan(step, x0, ts)
    trajectory = jnp.concatenate([states, x_final[None]], axis=0)
    return x_final, trajectory


def to_image(x: jnp.ndarray) -> jnp.ndarray:
    """[−1,1] → clipped [0,1] (the reference editing modules' output space)."""
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)

"""Forward diffusion process and training losses.

TPU-native counterpart of reference ``utils/diffusion.py:68-100``: pure
functions with explicit PRNG keys (no global seeding), designed to live inside
a jitted train step.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedules import extract

# A model forward: (x, t, cond, cond_mask) -> predicted noise.
ModelFn = Callable[..., jnp.ndarray]


def q_sample(
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    diffusion_params: Dict[str, jnp.ndarray],
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward diffusion: noise ``x_start`` to timestep ``t``.

    Reference ``utils/diffusion.py:68-79``; returns ``(x_noisy, noise)``.
    """
    noise = jax.random.normal(key, x_start.shape, dtype=x_start.dtype)
    sqrt_ac = extract(diffusion_params["sqrt_alphas_cumprod"], t, x_start.shape)
    sqrt_omac = extract(
        diffusion_params["sqrt_one_minus_alphas_cumprod"], t, x_start.shape
    )
    return sqrt_ac * x_start + sqrt_omac * noise, noise


def p_losses(
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    diffusion_params: Dict[str, jnp.ndarray],
    key: jax.Array,
    cond: Optional[jnp.ndarray] = None,
    cond_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Simple-epsilon MSE loss (reference utils/diffusion.py:81-100).

    ``model_fn`` is a closure over params (and train-mode mutables); ``cond``
    with ``cond_mask=0`` reproduces the reference's ``cond=None``.
    """
    x_noisy, noise = q_sample(x_start, t, diffusion_params, key)
    predicted = model_fn(x_noisy, t, cond, cond_mask)
    return jnp.mean((predicted - noise) ** 2)

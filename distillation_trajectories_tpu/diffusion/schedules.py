"""Noise schedules and precomputed diffusion parameters.

TPU-native counterpart of reference ``utils/diffusion.py:11-66``.  All
schedule tensors are plain ``jnp`` arrays computed once on host and closed
over by jitted step functions — there is no device-selection logic (XLA owns
placement).

The reference configures ``noise_schedule="cosine"`` but only implements
linear (``utils/diffusion.py:21-23`` vs ``config/config.py:26``); we implement
both and default to linear for parity.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(
    timesteps: int, beta_start: float = 1e-4, beta_end: float = 0.02
) -> jnp.ndarray:
    """Linear beta schedule (reference utils/diffusion.py:21-23)."""
    return jnp.linspace(beta_start, beta_end, timesteps, dtype=jnp.float32)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> jnp.ndarray:
    """Cosine schedule from Nichol & Dhariwal (2021).

    The reference declares this in config but never implements it; provided
    here to close that gap (SURVEY.md §2.3).
    """
    steps = np.arange(timesteps + 1, dtype=np.float64)
    f = np.cos(((steps / timesteps) + s) / (1 + s) * np.pi / 2) ** 2
    alphas_cumprod = f / f[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return jnp.asarray(np.clip(betas, 0.0, 0.999), dtype=jnp.float32)


_PARAMS_CACHE: Dict[tuple, Dict[str, jnp.ndarray]] = {}


def get_diffusion_params(
    sample_steps: int, config: Optional[object] = None
) -> Dict[str, jnp.ndarray]:
    """Precompute all schedule tensors (reference utils/diffusion.py:25-66).

    Returns the reference's six keys plus ``alphas``, ``alphas_cumprod_prev``
    and ``sqrt_recip_alphas_cumprod`` — the reference's editing modules expect
    an ``alphas`` key that its own ``get_diffusion_params`` never returned
    (API mismatch noted in SURVEY.md §2.3); we fix that here.

    The derived tensors are computed in NUMPY and memoized per
    (steps, schedule) signature: each jnp op here is an individually
    dispatched (and first time, compiled) device computation, and the sweep
    engine builds one trajectory fn per model size — on the tunneled TPU
    backend the ~10 ops x 10 calls of the round-2 layout cost real
    wall-clock before any real work started.  The dict itself is a fresh
    copy per call.

    Values are HOST (numpy) arrays: closure-captured schedule tensors embed
    into lowered IR straight from host memory.  As device arrays, every
    ``jit(...).lower()`` had to FETCH each one back over the axon tunnel
    (``mlir.ir_constant`` → ``array._value``, ~10 RTTs per graph) — slow in
    aggregate for multi-architecture compile pools and a hard hang when the
    tunnel dropped mid-fetch (observed in the round-3 FID stage).  Functions
    that index these under a trace convert with ``jnp.asarray`` at trace
    entry, which is free after compilation.
    """
    beta_start = getattr(config, "beta_start", 1e-4) if config else 1e-4
    beta_end = getattr(config, "beta_end", 0.02) if config else 0.02
    schedule = getattr(config, "noise_schedule", "linear") if config else "linear"

    cache_key = (int(sample_steps), float(beta_start), float(beta_end), schedule)
    if cache_key in _PARAMS_CACHE:
        return dict(_PARAMS_CACHE[cache_key])

    if schedule == "cosine":
        betas = np.asarray(cosine_beta_schedule(sample_steps))
    else:
        betas = np.linspace(
            beta_start, beta_end, sample_steps, dtype=np.float32
        )

    alphas = (1.0 - betas).astype(np.float32)
    alphas_cumprod = np.cumprod(alphas, axis=0, dtype=np.float32)
    alphas_cumprod_prev = np.pad(
        alphas_cumprod[:-1], (1, 0), constant_values=1.0
    ).astype(np.float32)
    host = {
        "betas": betas,
        "alphas": alphas,
        "alphas_cumprod": alphas_cumprod,
        "alphas_cumprod_prev": alphas_cumprod_prev,
        "sqrt_recip_alphas": np.sqrt(1.0 / alphas),
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
        "sqrt_recip_alphas_cumprod": np.sqrt(1.0 / alphas_cumprod),
        "posterior_variance": betas
        * (1.0 - alphas_cumprod_prev)
        / (1.0 - alphas_cumprod),
    }
    params = {k: np.asarray(v, dtype=np.float32) for k, v in host.items()}
    for v in params.values():
        # The shallow dict copy below shares these arrays process-wide; an
        # in-place edit by any caller would corrupt every later schedule
        # (jax Arrays were immutable — preserve that guarantee).
        v.setflags(write=False)
    params["timesteps"] = np.int32(sample_steps)
    _PARAMS_CACHE[cache_key] = params
    return dict(params)


def extract(a: jnp.ndarray, t: jnp.ndarray, x_shape) -> jnp.ndarray:
    """Gather schedule coefficients at timesteps ``t`` and broadcast-shape.

    Reference ``utils/diffusion.py:11-19`` (with the same clamp-to-bounds).
    """
    a = jnp.asarray(a)  # host schedule constants index fine under trace
    t = jnp.clip(t, 0, a.shape[0] - 1)
    out = a[t]
    return out.reshape(t.shape[0], *((1,) * (len(x_shape) - 1)))

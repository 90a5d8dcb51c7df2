"""Latent-space manipulation: semantic directions via PCA, re-denoising.

Counterpart of reference ``editing/latent_manipulation.py:12-369``:

* ``apply_latent_manipulation`` — add ``strength·direction`` to a final
  latent then re-denoise from T/2 (ref :151-215).
* ``find_semantic_directions`` — PCA(10) over final latents of generated
  samples (ref :217-258) — here all samples are generated in ONE vmapped
  batch instead of a 100-iteration Python loop.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..analysis.dimensionality import pca_fit_transform
from ..diffusion import get_diffusion_params
from ..training.state import make_eval_fn_from_config
from .core import denoise_with_trajectory, to_image


def generate_image_with_latents(
    model, config, variables=None, seed: int = 0, mode: str = "engine"
):
    """Generate one image, returning (image[0,1], final_latent, trajectory)
    (reference latent_manipulation.py:96-149)."""
    model_fn = make_eval_fn_from_config(model, variables, config)
    dp = get_diffusion_params(config.timesteps, config)
    key = jax.random.PRNGKey(seed)
    key, nk = jax.random.split(key)
    x = jax.random.normal(
        nk, (1, config.image_size, config.image_size, config.channels)
    )
    x_final, trajectory = denoise_with_trajectory(
        model_fn, x, dp["alphas"], config.timesteps - 1, key,
        diffusion_params=dp, mode=mode
    )
    return np.asarray(to_image(x_final)), np.asarray(x_final), np.asarray(trajectory)


def apply_latent_manipulation(
    model,
    config,
    latent=None,
    direction=None,
    strength: float = 1.0,
    variables=None,
    record_trajectory: bool = True,
    seed: int = 0,
    mode: str = "engine",
) -> Dict:
    """Manipulate a latent by ``strength·direction`` and re-denoise from T/2
    (reference latent_manipulation.py:151-215)."""
    model_fn = make_eval_fn_from_config(model, variables, config)
    dp = get_diffusion_params(config.timesteps, config)
    key = jax.random.PRNGKey(seed + 1)

    if latent is None:
        _, latent, _ = generate_image_with_latents(
            model, config, variables=variables, seed=seed, mode=mode
        )
    latent = jnp.asarray(latent, dtype=jnp.float32)
    if latent.ndim == 3:
        latent = latent[None]
    if direction is None:
        direction = jax.random.normal(jax.random.PRNGKey(seed + 2), latent.shape)
        direction = direction / jnp.linalg.norm(direction)
    direction = jnp.asarray(direction, dtype=jnp.float32).reshape(latent.shape)

    manipulated = latent + strength * direction
    x_final, trajectory = denoise_with_trajectory(
        model_fn, manipulated, dp["alphas"], config.timesteps // 2, key,
        diffusion_params=dp, mode=mode
    )

    result = {
        "original_latent": np.asarray(latent),
        "manipulated_latent": np.asarray(manipulated),
        "original_image": np.asarray(to_image(latent)),
        "manipulated_image": np.asarray(to_image(x_final)),
        "strength": strength,
    }
    if record_trajectory:
        result["trajectory"] = np.asarray(trajectory)
    return result


def find_semantic_directions(
    model, config, variables=None, num_samples: int = 100, mode: str = "engine"
) -> Dict[str, np.ndarray]:
    """PCA(10) over final latents of ``num_samples`` generated images
    (reference latent_manipulation.py:217-258) — one vmapped batch."""
    model_fn = make_eval_fn_from_config(model, variables, config)
    dp = get_diffusion_params(config.timesteps, config)

    def one(seed):
        key = jax.random.PRNGKey(seed)
        key, nk = jax.random.split(key)
        x = jax.random.normal(
            nk, (1, config.image_size, config.image_size, config.channels)
        )
        x_final, _ = denoise_with_trajectory(
            model_fn, x, dp["alphas"], config.timesteps - 1, key,
            diffusion_params=dp, mode=mode
        )
        return x_final[0]

    latents = jax.jit(jax.vmap(one))(jnp.arange(num_samples, dtype=jnp.int32))
    flat = np.asarray(latents).reshape(num_samples, -1)
    _, _, components, _ = pca_fit_transform(flat, 10)
    return {f"pca_{i}": components[i] for i in range(10)}


def visualize_latent_manipulation(
    result: Dict, output_dir: str, size_factor=None, suffix: str = ""
) -> None:
    """Original vs manipulated panel + trajectory strip
    (reference latent_manipulation.py:260-369)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)

    def prep(img):
        img = np.asarray(img)
        if img.ndim == 4:
            img = img[0]
        img = np.clip(img, 0, 1)
        return img[..., 0] if img.shape[-1] == 1 else img

    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    for ax, k, title in (
        (axes[0], "original_image", "Original"),
        (axes[1], "manipulated_image", f"Manipulated (s={result['strength']})"),
    ):
        img = prep(result[k])
        ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
        ax.set_title(title)
        ax.axis("off")
    plt.tight_layout()
    plt.savefig(
        os.path.join(output_dir, f"latent_manipulation{suffix}.png"),
        dpi=300,
        bbox_inches="tight",
    )
    plt.close()

    if "trajectory" in result:
        traj = result["trajectory"]
        n_show = min(8, traj.shape[0])
        idx = np.linspace(0, traj.shape[0] - 1, n_show).astype(int)
        fig, axes = plt.subplots(1, n_show, figsize=(2.5 * n_show, 3))
        for ax, i in zip(np.atleast_1d(axes), idx):
            img = prep((traj[i] + 1) / 2)
            ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
            ax.set_title(f"step {i}")
            ax.axis("off")
        plt.tight_layout()
        plt.savefig(
            os.path.join(output_dir, f"latent_manipulation_trajectory{suffix}.png"),
            dpi=300,
            bbox_inches="tight",
        )
        plt.close()

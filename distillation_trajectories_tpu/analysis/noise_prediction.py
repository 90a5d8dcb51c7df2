"""Noise-prediction accuracy analysis: teacher vs student ε̂ at sampled
timesteps.

Counterpart of reference
``analysis/noise_prediction/noise_analysis.py:11-320``.  The reference
recomputes ᾱ_t with an O(t) Python loop per analyzed timestep using its own
local beta formula ``β_i = β_start + (β_end−β_start)·i/T`` (noise_analysis.py
:252-258 — note: /T, not the schedule's /(T−1) linspace); we keep that exact
formula but compute all ᾱ via one cumprod, and evaluate every
(timestep × image) pair in a single batched forward per model.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..training.state import make_eval_model_fn
from ..models.unet import resize_bilinear_align_corners


def local_alpha_bars(config) -> np.ndarray:
    """ᾱ_t per the reference's local formula (noise_analysis.py:252-258)."""
    t = np.arange(config.timesteps, dtype=np.float64)
    betas = config.beta_start + (config.beta_end - config.beta_start) * t / config.timesteps
    return np.cumprod(1.0 - betas)


def calculate_noise_metrics(teacher_noise, student_noise) -> Dict[str, float]:
    """MSE / MAE / cosine similarity between ε̂ maps
    (reference noise_analysis.py:43-85)."""
    teacher_noise = jnp.asarray(teacher_noise)
    student_noise = jnp.asarray(student_noise)
    if teacher_noise.shape != student_noise.shape:
        student_noise = resize_bilinear_align_corners(
            student_noise, teacher_noise.shape[1:3]
        )
    mse = float(jnp.mean((teacher_noise - student_noise) ** 2))
    mae = float(jnp.mean(jnp.abs(teacher_noise - student_noise)))
    t_flat = teacher_noise.reshape(teacher_noise.shape[0], -1)
    s_flat = student_noise.reshape(student_noise.shape[0], -1)
    t_norm = t_flat / jnp.linalg.norm(t_flat, axis=1, keepdims=True)
    s_norm = s_flat / jnp.linalg.norm(s_flat, axis=1, keepdims=True)
    cosine = float(jnp.mean(jnp.sum(t_norm * s_norm, axis=1)))
    return {"mse": mse, "mae": mae, "cosine_similarity": cosine}


def visualize_noise_predictions(
    original_images,
    noisy_images,
    teacher_noise,
    student_noise,
    true_noise,
    output_dir: str,
    size_factor,
) -> None:
    """5-row grid: original / noisy / true ε / teacher ε̂ / student ε̂
    (reference noise_analysis.py:87-153)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_images = min(5, original_images.shape[0])
    fig, axes = plt.subplots(5, n_images, figsize=(n_images * 3, 15))
    fig.suptitle(f"Noise Prediction Comparison (Size Factor: {size_factor})",
                 fontsize=16)
    rows = [
        ("Original", original_images),
        ("Noisy", noisy_images),
        ("True Noise", true_noise),
        ("Teacher Pred", teacher_noise),
        ("Student Pred", student_noise),
    ]
    for r, (title, batch) in enumerate(rows):
        for i in range(n_images):
            img = np.asarray(batch[i])
            img = (img + 1) / 2.0
            img = np.clip(img, 0, 1)
            if img.shape[-1] == 1:
                img = img[..., 0]
            ax = axes[r, i] if n_images > 1 else axes[r]
            ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
            ax.axis("off")
            if r == 0:
                ax.set_title(f"Image {i + 1}")
        (axes[r, 0] if n_images > 1 else axes[r]).set_ylabel(title)
    plt.tight_layout()
    plt.savefig(
        os.path.join(output_dir, f"noise_predictions_size_{size_factor}.png"),
        dpi=300,
        bbox_inches="tight",
    )
    plt.close()


def plot_noise_metrics_by_timestep(
    metrics_by_timestep: Dict, output_dir: str, size_factor
) -> None:
    """3-panel MSE/MAE/cosine vs timestep (reference noise_analysis.py:155-195)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ts = sorted(metrics_by_timestep.keys())
    fig, axes = plt.subplots(3, 1, figsize=(10, 15))
    panels = [("mse", "MSE"), ("mae", "MAE"), ("cosine_similarity", "Cosine Similarity")]
    for ax, (key, label) in zip(axes, panels):
        ax.plot(ts, [metrics_by_timestep[t][key] for t in ts], "o-")
        ax.set_title(f"{label} by Timestep (Size Factor: {size_factor})")
        ax.set_ylabel(label)
        ax.set_xlabel("Timestep")
        ax.grid(True, linestyle="--", alpha=0.7)
    plt.tight_layout()
    plt.savefig(
        os.path.join(output_dir, f"noise_metrics_by_timestep_size_{size_factor}.png"),
        dpi=300,
        bbox_inches="tight",
    )
    plt.close()


def analyze_noise_prediction(
    teacher_model,
    student_model,
    config,
    output_dir: Optional[str] = None,
    size_factor: Optional[float] = None,
    fixed_samples=None,
    teacher_variables=None,
    student_variables=None,
    n_timesteps: int = 10,
    seed: int = 0,
) -> Dict:
    """Full noise-prediction analysis
    (reference noise_analysis.py:197-320; same txt/plot outputs)."""
    if output_dir is None:
        output_dir = os.path.join(
            config.analysis_dir, "noise_prediction", f"size_{size_factor}"
        )
    os.makedirs(output_dir, exist_ok=True)
    print(f"Analyzing noise prediction for size factor {size_factor}...")

    teacher_fn = make_eval_model_fn(teacher_model, teacher_variables)
    student_fn = make_eval_model_fn(student_model, student_variables)

    if fixed_samples is not None:
        print(f"Using {len(fixed_samples)} fixed samples for consistent comparison")
        images = jnp.asarray(fixed_samples)
    else:
        from ..data import get_real_images

        images = jnp.asarray(get_real_images(config, 10))

    ts = np.linspace(0, config.timesteps - 1, n_timesteps).astype(np.int64)
    alpha_bars = local_alpha_bars(config)

    key = jax.random.PRNGKey(seed)

    @jax.jit
    def one_timestep(t_scalar, alpha_bar, noise):
        noisy = jnp.sqrt(alpha_bar) * images + jnp.sqrt(1 - alpha_bar) * noise
        tvec = jnp.full((images.shape[0],), t_scalar, dtype=jnp.float32)
        teacher_pred = teacher_fn(noisy, tvec)
        student_pred = student_fn(noisy, tvec)
        return noisy, teacher_pred, student_pred

    metrics_by_timestep: Dict[int, Dict[str, float]] = {}
    for idx, t in enumerate(ts):
        key, nk = jax.random.split(key)
        noise = jax.random.normal(nk, images.shape)
        noisy, teacher_pred, student_pred = one_timestep(
            jnp.float32(t), jnp.float32(alpha_bars[t]), noise
        )
        metrics_by_timestep[int(t)] = calculate_noise_metrics(
            teacher_pred, student_pred
        )
        if idx == 0:
            visualize_noise_predictions(
                images, noisy, teacher_pred, student_pred, noise,
                output_dir, size_factor,
            )

    plot_noise_metrics_by_timestep(metrics_by_timestep, output_dir, size_factor)

    avg_mse = float(np.mean([m["mse"] for m in metrics_by_timestep.values()]))
    avg_mae = float(np.mean([m["mae"] for m in metrics_by_timestep.values()]))
    avg_cos = float(
        np.mean([m["cosine_similarity"] for m in metrics_by_timestep.values()])
    )
    results = {
        "avg_mse": avg_mse,
        "avg_mae": avg_mae,
        "avg_cosine_similarity": avg_cos,
        "metrics_by_timestep": metrics_by_timestep,
    }

    with open(
        os.path.join(output_dir, f"noise_metrics_size_{size_factor}.txt"), "w"
    ) as f:
        f.write(f"Average MSE: {avg_mse:.6f}\n")
        f.write(f"Average MAE: {avg_mae:.6f}\n")
        f.write(f"Average Cosine Similarity: {avg_cos:.6f}\n\n")
        f.write("Metrics by Timestep:\n")
        for t, m in sorted(metrics_by_timestep.items()):
            f.write(f"  Timestep {t}:\n")
            f.write(f"    MSE: {m['mse']:.6f}\n")
            f.write(f"    MAE: {m['mae']:.6f}\n")
            f.write(f"    Cosine Similarity: {m['cosine_similarity']:.6f}\n")

    print(f"  Average MSE: {avg_mse:.6f}")
    print(f"  Average MAE: {avg_mae:.6f}")
    print(f"  Average Cosine Similarity: {avg_cos:.6f}")
    return results

"""Standalone evaluation metrics: LPIPS, FID, trajectory divergence.

Counterpart of reference ``evaluation/metrics.py:22-265`` (library-only in
the reference — no in-repo callers — reproduced for API completeness):

* ``compute_lpips`` — real LPIPS when a backend exists: the ``lpips`` torch
  package when importable (reference parity, evaluation/metrics.py:22-49),
  else the Flax AlexNet-LPIPS (metrics/lpips.py) when ported weights are
  present; only when neither backend is available does it return the
  reference's own placeholder 0.5 per pair (evaluation/metrics.py:35-37).
* ``compute_fid`` — the reference's second independent FID implementation;
  here it delegates to the single fid core (metrics/fid.py) — one
  implementation, not two inconsistent ones (SURVEY.md §2.3 stance).
* ``compute_trajectory_divergence`` — per-step L2 + cosine + length ratio as
  one vectorized evaluation (ref :118-183).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from .fid import InceptionModel, calculate_fid


_LPIPS_CACHE: Dict[str, object] = {}


def compute_lpips(images1, images2, weights_path: Optional[str] = None) -> List[float]:
    """LPIPS per image pair (inputs in [0, 1], reference convention).

    Backend order: ``lpips`` torch package (reference parity) → Flax
    AlexNet-LPIPS with ported weights (TPU path) → the reference's own
    placeholder 0.5 per pair (evaluation/metrics.py:35-37).
    """
    n = min(len(images1), len(images2))
    x = np.asarray(images1)[:n].astype(np.float32)
    y = np.asarray(images2)[:n].astype(np.float32)
    # [0,1] → [-1,1] (reference evaluation/metrics.py:41-43)
    x = 2.0 * x - 1.0
    y = 2.0 * y - 1.0

    # ``None`` is the failure sentinel: a broken lpips.LPIPS construction
    # (e.g. the no-egress backbone download) is attempted ONCE per process —
    # without it every compute_lpips call would re-pay the download timeout
    # before falling back (round-2 advisor finding).
    if _LPIPS_CACHE.get("torch", "unset") is not None:
        try:
            import lpips
            import torch

            if "torch" not in _LPIPS_CACHE:
                # lpips.LPIPS(net="alex") downloads the torchvision backbone
                # on first construction — in a no-egress environment that
                # raises a URLError/RuntimeError, not ImportError, so catch
                # broadly and fall through to the Flax backend.
                _LPIPS_CACHE["torch"] = lpips.LPIPS(net="alex")
            loss_fn = _LPIPS_CACHE["torch"]

            def to_nchw(a):
                if a.ndim == 3:  # [N,H,W] grayscale
                    a = a[:, None]
                elif a.shape[-1] in (1, 3):  # NHWC → NCHW
                    a = a.transpose(0, 3, 1, 2)
                if a.shape[1] == 1:
                    a = np.repeat(a, 3, axis=1)
                return torch.from_numpy(np.ascontiguousarray(a))

            with torch.no_grad():
                d = loss_fn(to_nchw(x), to_nchw(y))
            return [float(v) for v in d.reshape(-1)]
        except ImportError:
            _LPIPS_CACHE["torch"] = None
        except Exception as e:
            _LPIPS_CACHE["torch"] = None
            print(f"Warning: lpips package backend unavailable ({e}); "
                  "trying the Flax backend")

    from .lpips import _weights_search_paths, create_lpips

    # Cache keyed on the effective weights path so a first call without
    # weights does not permanently pin the placeholder scorer; additionally,
    # a cached NON-pretrained scorer is rebuilt when a weights file has
    # appeared since it was constructed (round-2 advisor finding).
    flax_key = ("flax", weights_path)
    cached = _LPIPS_CACHE.get(flax_key)
    weights_available = any(
        p and os.path.exists(p)
        for p in ([weights_path] if weights_path else _weights_search_paths())
    )
    if cached is None or (not cached[1] and weights_available):
        _LPIPS_CACHE[flax_key] = create_lpips(weights_path)
    scorer, pretrained = _LPIPS_CACHE[flax_key]
    if pretrained:
        if x.ndim == 3:
            x, y = x[..., None], y[..., None]
        return [float(v) for v in scorer(x, y)]

    print(
        "Warning: no LPIPS backend (lpips package absent, no ported "
        "weights); returning placeholder 0.5 per pair (matches reference "
        "fallback)"
    )
    return [0.5] * n


def compute_fid(
    real_images, generated_images, inception: Optional[InceptionModel] = None
) -> float:
    """FID between two image sets (reference evaluation/metrics.py:51-116),
    delegating to the unified FID core."""
    if inception is None:
        inception = InceptionModel()
    f1 = inception.get_features(jnp.asarray(real_images))
    f2 = inception.get_features(jnp.asarray(generated_images))
    return calculate_fid(f1, f2)


def _images(traj):
    if isinstance(traj[0], tuple):
        traj = [item[0] for item in traj]
    return np.stack([np.asarray(x) for x in traj]) if isinstance(
        traj, (list, tuple)
    ) else np.asarray(traj)


def compute_trajectory_divergence(trajectory1, trajectory2) -> Dict:
    """Per-step L2 distance, cosine similarity, and path-length ratio
    (reference evaluation/metrics.py:118-183)."""
    x = _images(trajectory1)
    y = _images(trajectory2)
    n = min(x.shape[0], y.shape[0])
    xf = jnp.asarray(x[:n].reshape(n, -1), dtype=jnp.float32)
    yf = jnp.asarray(y[:n].reshape(n, -1), dtype=jnp.float32)

    distances = np.asarray(jnp.linalg.norm(xf - yf, axis=1))
    xn = xf / jnp.linalg.norm(xf, axis=1, keepdims=True)
    yn = yf / jnp.linalg.norm(yf, axis=1, keepdims=True)
    similarities = np.asarray(jnp.sum(xn * yn, axis=1))
    length1 = float(jnp.sum(jnp.linalg.norm(xf[1:] - xf[:-1], axis=1)))
    length2 = float(jnp.sum(jnp.linalg.norm(yf[1:] - yf[:-1], axis=1)))

    return {
        "distances": distances.tolist(),
        "similarities": similarities.tolist(),
        "avg_distance": float(np.mean(distances)),
        "max_distance": float(np.max(distances)),
        "avg_similarity": float(np.mean(similarities)),
        "min_similarity": float(np.min(similarities)),
        "length_ratio": length2 / length1 if length1 > 0 else float("inf"),
    }


def visualize_evaluation_metrics(
    metrics: Dict, output_dir: str, size_factor: Optional[float] = None
) -> None:
    """Plots + metrics_summary.txt (reference evaluation/metrics.py:185-265)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)

    if "lpips" in metrics:
        plt.figure(figsize=(10, 6))
        plt.bar(range(len(metrics["lpips"])), metrics["lpips"])
        plt.axhline(
            y=np.mean(metrics["lpips"]), color="r", linestyle="--",
            label=f'Mean: {np.mean(metrics["lpips"]):.4f}',
        )
        plt.title(
            f"LPIPS Distances (Size Factor: {size_factor})"
            if size_factor
            else "LPIPS Distances"
        )
        plt.xlabel("Sample")
        plt.ylabel("LPIPS Distance")
        plt.legend()
        plt.grid(True, linestyle="--", alpha=0.7)
        plt.savefig(
            os.path.join(output_dir, "lpips_distances.png"), dpi=300,
            bbox_inches="tight",
        )
        plt.close()

    if "fid" in metrics:
        plt.figure(figsize=(8, 5))
        plt.bar(["FID Score"], [metrics["fid"]])
        plt.title(
            f"FID Score (Size Factor: {size_factor})" if size_factor else "FID Score"
        )
        plt.ylabel("FID")
        plt.grid(True, linestyle="--", alpha=0.7)
        plt.savefig(
            os.path.join(output_dir, "fid_score.png"), dpi=300, bbox_inches="tight"
        )
        plt.close()

    if "trajectory_divergence" in metrics:
        td = metrics["trajectory_divergence"]
        for key, avg_key, name, ylabel in (
            ("distances", "avg_distance", "trajectory_distances", "Distance"),
            (
                "similarities",
                "avg_similarity",
                "trajectory_similarities",
                "Cosine Similarity",
            ),
        ):
            plt.figure(figsize=(12, 6))
            plt.plot(td[key])
            plt.axhline(
                y=td[avg_key], color="r", linestyle="--",
                label=f"Mean: {td[avg_key]:.4f}",
            )
            title = name.replace("_", " ").title()
            plt.title(
                f"{title} (Size Factor: {size_factor})" if size_factor else title
            )
            plt.xlabel("Step")
            plt.ylabel(ylabel)
            plt.legend()
            plt.grid(True, linestyle="--", alpha=0.7)
            plt.savefig(
                os.path.join(output_dir, f"{name}.png"), dpi=300, bbox_inches="tight"
            )
            plt.close()

    with open(os.path.join(output_dir, "metrics_summary.txt"), "w") as f:
        f.write(
            f"Evaluation Metrics Summary (Size Factor: "
            f"{size_factor if size_factor else 'N/A'})\n"
        )
        f.write("=" * 50 + "\n\n")
        if "lpips" in metrics:
            f.write(f"LPIPS Mean: {np.mean(metrics['lpips']):.4f}\n")
        if "fid" in metrics:
            f.write(f"FID Score: {metrics['fid']:.4f}\n")
        if "trajectory_divergence" in metrics:
            td = metrics["trajectory_divergence"]
            f.write("\nTrajectory Divergence:\n")
            f.write(f"  Average Distance: {td['avg_distance']:.4f}\n")
            f.write(f"  Maximum Distance: {td['max_distance']:.4f}\n")
            f.write(f"  Average Similarity: {td['avg_similarity']:.4f}\n")
            f.write(f"  Minimum Similarity: {td['min_similarity']:.4f}\n")
            f.write(f"  Length Ratio: {td['length_ratio']:.4f}\n")


# Reference naming alias (evaluation/metrics.py defines ``visualize_metrics``;
# renamed here to avoid clashing with the trajectory-metrics visualizer).
visualize_metrics = visualize_evaluation_metrics

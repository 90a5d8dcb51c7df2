"""Dimensionality-reduction trajectory analysis (PCA / t-SNE / UMAP).

Counterpart of reference
``analysis/dimensionality/dimensionality_reduction.py:100-326``.  PCA is done
with a thin numpy SVD (no sklearn dependency needed on the hot path); t-SNE
uses sklearn; UMAP is gated on availability (umap-learn is not installed in
this image) with a logged skip.  Plot structure/filenames match the
reference: ``{output}/size_{sf}/trajectory_{i}/{pca,tsne,umap}_trajectory.png``.

The reference defines this function twice, with the first (shadowed) version
referencing an undefined variable (SURVEY.md §2 item 17); only the operative
version is reproduced.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def pca_fit_transform(data: np.ndarray, n_components: int):
    """PCA via SVD; returns (embedding, explained_variance_ratio, components,
    mean)."""
    mean = data.mean(axis=0)
    centered = data - mean
    u, s, vt = np.linalg.svd(centered, full_matrices=False)
    var = (s**2) / max(len(data) - 1, 1)
    ratio = var / var.sum() if var.sum() > 0 else var
    emb = centered @ vt[:n_components].T
    return emb, ratio[:n_components], vt[:n_components], mean


def _traj_images(traj):
    if isinstance(traj[0], tuple):
        traj = [item[0] for item in traj]
    return np.stack([np.asarray(x) for x in traj]) if isinstance(
        traj, (list, tuple)
    ) else np.asarray(traj)


def _plot_embedding(
    teacher_emb, student_emb, title, xlabel, ylabel, path
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 8))
    teacher_colors = plt.cm.Blues(np.linspace(0.3, 1.0, len(teacher_emb)))
    student_colors = plt.cm.Oranges(np.linspace(0.3, 1.0, len(student_emb)))

    for emb, colors in ((teacher_emb, teacher_colors), (student_emb, student_colors)):
        for i in range(len(emb) - 1):
            plt.scatter(emb[i, 0], emb[i, 1], color=colors[i], marker="o", s=50,
                        alpha=0.7)
            plt.arrow(
                emb[i, 0], emb[i, 1],
                emb[i + 1, 0] - emb[i, 0], emb[i + 1, 1] - emb[i, 1],
                color=colors[i], width=0.01, head_width=0.1, alpha=0.5,
            )
    plt.scatter(teacher_emb[-1, 0], teacher_emb[-1, 1], color=teacher_colors[-1],
                marker="*", s=200, alpha=0.7, label="Teacher End")
    plt.scatter(student_emb[-1, 0], student_emb[-1, 1], color=student_colors[-1],
                marker="*", s=200, alpha=0.7, label="Student End")
    plt.scatter(teacher_emb[0, 0], teacher_emb[0, 1], color="blue", marker="D",
                s=100, alpha=1.0, label="Teacher Start")
    plt.scatter(student_emb[0, 0], student_emb[0, 1], color="orange", marker="D",
                s=100, alpha=1.0, label="Student Start")
    plt.title(title)
    plt.xlabel(xlabel)
    plt.ylabel(ylabel)
    plt.grid(True, linestyle="--", alpha=0.7)
    plt.legend()
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()


def dimensionality_reduction_analysis(
    teacher_trajectories,
    student_trajectories,
    config,
    output_dir: Optional[str] = None,
    size_factor: Optional[float] = None,
    max_trajectories: int = 3,
) -> str:
    """Joint 2-D embeddings of paired trajectories with direction arrows.

    Matches reference behavior: max 3 trajectories; t-SNE skipped when the
    combined point count exceeds 500; per-trajectory subdirectories.
    """
    output_dir = config.dimensionality_dir
    if size_factor is not None:
        output_dir = os.path.join(output_dir, f"size_{size_factor}")
    os.makedirs(output_dir, exist_ok=True)
    print(
        f"Performing dimensionality reduction analysis for size factor "
        f"{size_factor}..."
    )

    for traj_idx, (teacher_traj, student_traj) in enumerate(
        zip(teacher_trajectories, student_trajectories)
    ):
        if traj_idx >= max_trajectories:
            break
        traj_dir = os.path.join(output_dir, f"trajectory_{traj_idx}")
        os.makedirs(traj_dir, exist_ok=True)

        t_imgs = _traj_images(teacher_traj)
        s_imgs = _traj_images(student_traj)
        t_flat = t_imgs.reshape(t_imgs.shape[0], -1)
        s_flat = s_imgs.reshape(s_imgs.shape[0], -1)
        combined = np.vstack([t_flat, s_flat])

        # PCA
        print(f"  Performing PCA for trajectory {traj_idx}...")
        emb, ratio, _, _ = pca_fit_transform(combined, 2)
        _plot_embedding(
            emb[: len(t_flat)],
            emb[len(t_flat) :],
            f"PCA - Trajectory {traj_idx} (Size Factor: {size_factor})",
            f"Principal Component 1 (Variance: {ratio[0]:.2%})",
            f"Principal Component 2 (Variance: {ratio[1]:.2%})",
            os.path.join(traj_dir, "pca_trajectory.png"),
        )

        # t-SNE (≤500 points, ref :199-200)
        if len(combined) <= 500:
            print(f"  Performing t-SNE for trajectory {traj_idx}...")
            try:
                from sklearn.manifold import TSNE

                tsne = TSNE(
                    n_components=2,
                    perplexity=min(30, max(len(combined) // 5, 2)),
                    random_state=42,
                )
                emb = tsne.fit_transform(combined)
                _plot_embedding(
                    emb[: len(t_flat)],
                    emb[len(t_flat) :],
                    f"t-SNE - Trajectory {traj_idx} (Size Factor: {size_factor})",
                    "t-SNE Dimension 1",
                    "t-SNE Dimension 2",
                    os.path.join(traj_dir, "tsne_trajectory.png"),
                )
            except Exception as e:
                print(f"  Error performing t-SNE: {e}")
        else:
            print(f"  Skipping t-SNE for trajectory {traj_idx} (too many points)")

        # UMAP (gated: umap-learn not installed in this image)
        print(f"  Performing UMAP for trajectory {traj_idx}...")
        try:
            import umap

            reducer = umap.UMAP(
                n_components=2,
                random_state=42,
                n_neighbors=min(15, max(len(combined) // 3, 2)),
                min_dist=0.1,
            )
            emb = reducer.fit_transform(combined)
            _plot_embedding(
                emb[: len(t_flat)],
                emb[len(t_flat) :],
                f"UMAP - Trajectory {traj_idx} (Size Factor: {size_factor})",
                "UMAP Dimension 1",
                "UMAP Dimension 2",
                os.path.join(traj_dir, "umap_trajectory.png"),
            )
        except ImportError:
            print("  Skipping UMAP (umap-learn not installed)")
        except Exception as e:
            print(f"  Error performing UMAP: {e}")

    print(
        f"Dimensionality reduction analysis completed for size factor {size_factor}"
    )
    return os.path.abspath(output_dir)

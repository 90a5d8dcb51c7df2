"""3-D latent-space trajectory visualization.

Counterpart of reference ``analysis/dimensionality/latent_space.py:12-187``:
joint 3-component PCA of a paired trajectory, a 3-D plot, 8 rotation-angle
views, and a top-down 2-D view under
``analysis/latent_space/size_{sf}/``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .dimensionality import pca_fit_transform, _traj_images


def generate_latent_space_visualization(
    teacher_trajectory,
    student_trajectory,
    config,
    size_factor: Optional[float] = None,
) -> str:
    output_dir = config.latent_space_dir
    if size_factor is not None:
        output_dir = os.path.join(output_dir, f"size_{size_factor}")
    os.makedirs(output_dir, exist_ok=True)
    print(
        f"Generating 3D latent space visualization for size factor {size_factor}..."
    )

    # Accept a list of trajectories (use the first) or a single trajectory
    if (
        isinstance(teacher_trajectory, list)
        and len(teacher_trajectory)
        and isinstance(teacher_trajectory[0], (list, np.ndarray))
        and np.asarray(teacher_trajectory[0]).ndim >= 3
    ):
        teacher_traj = teacher_trajectory[0]
        student_traj = student_trajectory[0]
    else:
        teacher_traj = teacher_trajectory
        student_traj = student_trajectory

    t_imgs = _traj_images(teacher_traj)
    s_imgs = _traj_images(student_traj)
    t_flat = t_imgs.reshape(t_imgs.shape[0], -1)
    s_flat = s_imgs.reshape(s_imgs.shape[0], -1)
    combined = np.vstack([t_flat, s_flat])

    try:
        emb, ratio, _, _ = pca_fit_transform(combined, 3)
        teacher_pca = emb[: len(t_flat)]
        student_pca = emb[len(t_flat) :]

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        teacher_colors = plt.cm.Blues(np.linspace(0.3, 1.0, len(teacher_pca)))
        student_colors = plt.cm.Oranges(np.linspace(0.3, 1.0, len(student_pca)))

        fig = plt.figure(figsize=(12, 10))
        ax = fig.add_subplot(111, projection="3d")
        for pca_pts, colors, line_color, label in (
            (teacher_pca, teacher_colors, "blue", "Teacher"),
            (student_pca, student_colors, "orange", "Student"),
        ):
            for i in range(len(pca_pts) - 1):
                ax.scatter(*pca_pts[i, :3], color=colors[i], marker="o", s=50,
                           alpha=0.7)
                ax.plot(
                    [pca_pts[i, 0], pca_pts[i + 1, 0]],
                    [pca_pts[i, 1], pca_pts[i + 1, 1]],
                    [pca_pts[i, 2], pca_pts[i + 1, 2]],
                    color=line_color, alpha=0.5, linewidth=1.5,
                )
            ax.scatter(*pca_pts[-1, :3], color=colors[-1], marker="*", s=200,
                       alpha=0.7, label=f"{label} End")
            ax.scatter(*pca_pts[0, :3], color=line_color, marker="D", s=100,
                       alpha=1.0, label=f"{label} Start")

        ax.set_xlabel(f"Principal Component 1 (Variance: {ratio[0]:.2%})")
        ax.set_ylabel(f"Principal Component 2 (Variance: {ratio[1]:.2%})")
        ax.set_zlabel(f"Principal Component 3 (Variance: {ratio[2]:.2%})")
        ax.set_title(f"3D Latent Space Trajectory (Size Factor: {size_factor})")
        ax.legend()
        plt.savefig(
            os.path.join(output_dir, "3d_latent_space.png"),
            dpi=300,
            bbox_inches="tight",
        )
        for angle in range(0, 360, 45):  # 8 rotation views (ref :122-127)
            ax.view_init(elev=20, azim=angle)
            plt.savefig(
                os.path.join(output_dir, f"3d_latent_space_angle_{angle}.png"),
                dpi=300,
                bbox_inches="tight",
            )
        plt.close()

        # Top-down 2-D view (ref :131-180)
        fig = plt.figure(figsize=(12, 10))
        ax = fig.add_subplot(111)
        for pca_pts, colors, line_color, label in (
            (teacher_pca, teacher_colors, "blue", "Teacher"),
            (student_pca, student_colors, "orange", "Student"),
        ):
            for i in range(len(pca_pts) - 1):
                ax.scatter(pca_pts[i, 0], pca_pts[i, 1], color=colors[i],
                           marker="o", s=50, alpha=0.7)
                ax.plot(
                    [pca_pts[i, 0], pca_pts[i + 1, 0]],
                    [pca_pts[i, 1], pca_pts[i + 1, 1]],
                    color=line_color, alpha=0.5, linewidth=1.5,
                )
            ax.scatter(pca_pts[-1, 0], pca_pts[-1, 1], color=colors[-1],
                       marker="*", s=200, alpha=0.7, label=f"{label} End")
            ax.scatter(pca_pts[0, 0], pca_pts[0, 1], color=line_color, marker="D",
                       s=100, alpha=1.0, label=f"{label} Start")
        ax.set_xlabel(f"Principal Component 1 (Variance: {ratio[0]:.2%})")
        ax.set_ylabel(f"Principal Component 2 (Variance: {ratio[1]:.2%})")
        ax.set_title(f"2D Latent Space Trajectory (Size Factor: {size_factor})")
        ax.legend()
        ax.grid(True, linestyle="--", alpha=0.7)
        plt.savefig(
            os.path.join(output_dir, "2d_latent_space.png"),
            dpi=300,
            bbox_inches="tight",
        )
        plt.close()

        print(f"Latent space visualization completed for size factor {size_factor}")
        return os.path.abspath(output_dir)
    except Exception as e:
        print(f"Error generating latent space visualization: {e}")
        return output_dir

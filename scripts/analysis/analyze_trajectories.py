"""Trajectory PCA visualization CLI: one size factor × guidance-scale sweep.

Counterpart of reference ``scripts/analysis/analyze_trajectories.py:25-513``
(same flags and output filenames): generate N seeded paired trajectories per
guidance scale, average them elementwise across samples (ref :462-486), fit
PCA(3) on the reference (first-scale) trajectory, and emit 2-D/3-D plots,
8 view angles, final-image strips, and the teacher-vs-student overlay.

TPU-native: all (sample × scale) chains are scan-compiled and vmapped on
device; averaging is a device reduction.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import load_teacher_from_arg, load_student, parse_float_list, preflight_probe, project_root  # noqa: E402

import numpy as np  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser(
        description="Visualize denoising trajectories under CFG via PCA",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--teacher_model", type=str, default=None,
                        help="Teacher checkpoint name; latest when omitted")
    parser.add_argument("--size_factor", type=float, default=0.5,
                        help="Student size factor to compare")
    parser.add_argument("--guidance_scales", type=str,
                        default="1.0,2.0,5.0,10.0,20.0,50.0,100.0",
                        help="Comma-separated guidance scales")
    parser.add_argument("--timesteps", type=int, default=50)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num_samples", type=int, default=5,
                        help="Trajectories averaged per guidance scale")
    parser.add_argument("--output_dir", type=str,
                        default="analysis/trajectories")
    return parser.parse_args()


def _pca_fit(features, n=3):
    from distillation_trajectories_tpu.analysis import pca_fit_transform

    _, ratio, components, mean = pca_fit_transform(features, n)
    return components, mean


def _project(features, components, mean):
    return (features - mean) @ components.T


def visualize_trajectories_pca(trajectories, guidance_scales, output_dir,
                               size_factor, model_type):
    """2-D/3-D PCA plots + 8 angles (reference :52-168; same filenames)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    print(f"Visualizing {model_type} trajectories with PCA...")
    reference = trajectories[guidance_scales[0]]
    ref_features = reference.reshape(reference.shape[0], -1)
    components, mean = _pca_fit(ref_features, 3)

    fig_2d, ax_2d = plt.subplots(figsize=(16, 12))
    fig_3d = plt.figure(figsize=(16, 14))
    ax_3d = fig_3d.add_subplot(111, projection="3d")
    cmap = plt.cm.viridis
    norm = plt.Normalize(min(guidance_scales), max(guidance_scales))

    for g_scale in guidance_scales:
        traj = trajectories[g_scale]
        features = traj.reshape(traj.shape[0], -1)
        traj_pca = _project(features, components, mean)
        color = cmap(norm(g_scale))
        ax_2d.plot(traj_pca[:, 0], traj_pca[:, 1], "-o", color=color,
                   alpha=0.8, markersize=4, label=f"w={g_scale}")
        ax_3d.plot(traj_pca[:, 0], traj_pca[:, 1], traj_pca[:, 2], "-o",
                   color=color, alpha=0.8, markersize=4, label=f"w={g_scale}")
        ax_3d.scatter(*traj_pca[0, :3], color=color, s=100, marker="o",
                      edgecolor="black", linewidth=1.5)
        ax_3d.scatter(*traj_pca[-1, :3], color=color, s=100, marker="*",
                      edgecolor="black", linewidth=1.5)

    ax_2d.legend(bbox_to_anchor=(1.15, 1), loc="upper left", fontsize=10)
    sm = plt.cm.ScalarMappable(cmap=cmap, norm=norm)
    sm.set_array([])
    fig_2d.colorbar(sm, ax=ax_2d, label="Guidance Scale", pad=0.01)
    ax_2d.set_title(
        f"{model_type} Trajectories with Different Guidance Scales (2D)\n"
        f"(Size Factor: {size_factor})"
    )
    ax_2d.set_xlabel("First Principal Component")
    ax_2d.set_ylabel("Second Principal Component")
    ax_3d.set_title(
        f"{model_type} Trajectories with Different Guidance Scales (3D)\n"
        f"(Size Factor: {size_factor})"
    )
    ax_3d.set_xlabel("First Principal Component")
    ax_3d.set_ylabel("Second Principal Component")
    ax_3d.set_zlabel("Third Principal Component")
    ax_3d.legend(bbox_to_anchor=(1.15, 1), loc="upper left", fontsize=10)

    path_2d = os.path.join(
        output_dir,
        f"{model_type.lower()}_trajectories_pca_2d_size_{size_factor}.png",
    )
    fig_2d.savefig(path_2d)
    print(f"Saving 2D PCA visualization to {path_2d}")
    path_3d = os.path.join(
        output_dir,
        f"{model_type.lower()}_trajectories_pca_3d_size_{size_factor}.png",
    )
    fig_3d.savefig(path_3d)
    for angle in range(0, 360, 45):
        ax_3d.view_init(elev=30, azim=angle)
        fig_3d.savefig(
            os.path.join(
                output_dir,
                f"{model_type.lower()}_trajectories_pca_3d_angle_{angle}"
                f"_size_{size_factor}.png",
            )
        )
    plt.close(fig_2d)
    plt.close(fig_3d)


def visualize_final_images(trajectories, guidance_scales, output_dir,
                           size_factor, model_type):
    """Final-image strip per guidance scale (reference :170-216)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    print(f"Visualizing {model_type} final images...")
    fig, axes = plt.subplots(1, len(guidance_scales), figsize=(16, 4))
    axes = np.atleast_1d(axes)
    for i, g_scale in enumerate(guidance_scales):
        img = np.asarray(trajectories[g_scale][-1])
        img = np.clip((img + 1) / 2, 0, 1)
        if img.shape[-1] == 1:
            img = img[..., 0]
        axes[i].imshow(img, cmap="gray" if img.ndim == 2 else None)
        axes[i].set_title(f"w={g_scale}")
        axes[i].axis("off")
    fig.suptitle(
        f"{model_type} Final Images with Different Guidance Scales "
        f"(Size Factor: {size_factor})"
    )
    plt.tight_layout()
    path = os.path.join(
        output_dir, f"{model_type.lower()}_final_images_size_{size_factor}.png"
    )
    plt.savefig(path)
    plt.close()
    print(f"Saving final images to {path}")


def visualize_trajectory_comparison(teacher_trajectories, student_trajectories,
                                    guidance_scales, output_dir, size_factor):
    """Teacher (solid) vs student (dashed) overlay on joint PCA
    (reference :218-375)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    print("Visualizing teacher vs student trajectory comparison...")
    reference = teacher_trajectories[guidance_scales[0]]
    components, mean = _pca_fit(reference.reshape(reference.shape[0], -1), 3)

    fig_2d, ax_2d = plt.subplots(figsize=(16, 12))
    fig_3d = plt.figure(figsize=(16, 14))
    ax_3d = fig_3d.add_subplot(111, projection="3d")
    cmap = plt.cm.viridis
    norm = plt.Normalize(min(guidance_scales), max(guidance_scales))

    for g_scale in guidance_scales:
        color = cmap(norm(g_scale))
        for trajs, style, label in (
            (teacher_trajectories, "-", "teacher"),
            (student_trajectories, "--", "student"),
        ):
            traj = trajs[g_scale]
            p = _project(traj.reshape(traj.shape[0], -1), components, mean)
            ax_2d.plot(p[:, 0], p[:, 1], style, color=color, alpha=0.8,
                       label=f"{label} w={g_scale}")
            ax_3d.plot(p[:, 0], p[:, 1], p[:, 2], style, color=color,
                       alpha=0.8, label=f"{label} w={g_scale}")

    for ax, dims in ((ax_2d, 2), (ax_3d, 3)):
        ax.set_title(
            f"Teacher vs Student Trajectories ({dims}D)\n"
            f"(Size Factor: {size_factor})"
        )
        ax.set_xlabel("First Principal Component")
        ax.set_ylabel("Second Principal Component")
        ax.legend(bbox_to_anchor=(1.15, 1), loc="upper left", fontsize=8)
    ax_3d.set_zlabel("Third Principal Component")

    fig_2d.savefig(
        os.path.join(output_dir, f"comparison_pca_2d_size_{size_factor}.png")
    )
    fig_3d.savefig(
        os.path.join(output_dir, f"comparison_pca_3d_size_{size_factor}.png")
    )
    for angle in range(0, 360, 45):
        ax_3d.view_init(elev=30, azim=angle)
        fig_3d.savefig(
            os.path.join(
                output_dir,
                f"comparison_pca_3d_angle_{angle}_size_{size_factor}.png",
            )
        )
    plt.close(fig_2d)
    plt.close(fig_3d)


def main():
    args = parse_args()
    preflight_probe()

    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.diffusion.sampling import (
        CFG_COND_PAIRS,
        NOCFG_COND_PAIRS,
    )
    from distillation_trajectories_tpu.trajectories import (
        make_sweep_trajectory_fn,
    )

    config = Config()
    config.timesteps = args.timesteps

    output_dir = os.path.join(project_root, args.output_dir)
    os.makedirs(output_dir, exist_ok=True)
    guidance_scales = parse_float_list(args.guidance_scales)

    teacher_model, teacher_vars = load_teacher_from_arg(config, args.teacher_model)
    student_model, student_vars = load_student(config, args.size_factor)

    # Seeded noise/seed batch shared across guidance scales (ref :452-460);
    # one vmapped draw (row i == the scalar call with seed args.seed+i).
    seeds = jnp.arange(args.seed, args.seed + args.num_samples, dtype=jnp.int32)
    shape = (config.image_size, config.image_size, config.channels)
    noises = jax.jit(
        jax.vmap(lambda s: jax.random.normal(jax.random.PRNGKey(s), shape))
    )(seeds)

    # One unified graph per model (CFG choice is the runtime cond-pair
    # table; see engine.make_sweep_trajectory_fn) — teacher and student
    # chains share per-step (seed, t) fold-in noise exactly like the old
    # paired graph.
    fns = {
        "teacher": make_sweep_trajectory_fn(
            teacher_model, teacher_vars, config.timesteps, config
        ),
        "student": make_sweep_trajectory_fn(
            student_model, student_vars, config.timesteps, config
        ),
    }

    teacher_trajs, student_trajs = {}, {}
    for gs in guidance_scales:
        pairs = jnp.asarray(CFG_COND_PAIRS if gs > 1.0 else NOCFG_COND_PAIRS)
        t = fns["teacher"](noises, seeds, pairs, jnp.float32(gs))
        s = fns["student"](noises, seeds, pairs, jnp.float32(gs))
        # elementwise average across samples (ref :462-486)
        teacher_trajs[gs] = np.asarray(jnp.mean(t, axis=0))
        student_trajs[gs] = np.asarray(jnp.mean(s, axis=0))
        print(f"Generated trajectories for guidance scale {gs}")

    for trajs, model_type in ((teacher_trajs, "Teacher"), (student_trajs, "Student")):
        visualize_trajectories_pca(
            trajs, guidance_scales, output_dir, args.size_factor, model_type
        )
        visualize_final_images(
            trajs, guidance_scales, output_dir, args.size_factor, model_type
        )
    visualize_trajectory_comparison(
        teacher_trajs, student_trajs, guidance_scales, output_dir,
        args.size_factor,
    )
    print(f"\nTrajectory analysis completed; results in {output_dir}")


if __name__ == "__main__":
    main()

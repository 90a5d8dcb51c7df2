"""Dimensionality-reduction analysis CLI.

Advertised by the reference's ``run_analysis.py:31-37`` but never shipped
(SURVEY.md §2 item 27) — implemented here: per-size trajectory pairs →
PCA/t-SNE/UMAP embeddings + 3-D latent-space views.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import load_teacher_from_arg, load_student, parse_float_list, preflight_probe, project_root  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Dimensionality-reduction analysis of trajectory pairs",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--teacher_model", type=str, default=None)
    parser.add_argument("--size_factors", type=str, default="0.1,0.5,1.0")
    parser.add_argument("--num_samples", type=int, default=3)
    parser.add_argument("--timesteps", type=int, default=50)
    args = parser.parse_args()
    preflight_probe()

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.analysis import (
        dimensionality_reduction_analysis,
        generate_latent_space_visualization,
    )
    from distillation_trajectories_tpu.trajectories import TrajectoryManager

    config = Config()
    config.timesteps = args.timesteps
    config.create_directories()

    teacher_model, teacher_vars = load_teacher_from_arg(config, args.teacher_model)

    for sf in parse_float_list(args.size_factors):
        try:
            student_model, student_vars = load_student(config, sf)
        except FileNotFoundError:
            print(f"No student model for size {sf}; skipping")
            continue
        manager = TrajectoryManager(
            teacher_model, student_model, config, size_factor=sf,
            teacher_variables=teacher_vars, student_variables=student_vars,
        )
        pairs = [manager.generate_trajectory(seed=i)
                 for i in range(args.num_samples)]
        teacher_trajs = [p[0] for p in pairs]
        student_trajs = [p[1] for p in pairs]
        dimensionality_reduction_analysis(
            teacher_trajs, student_trajs, config, size_factor=sf
        )
        generate_latent_space_visualization(
            teacher_trajs[0], student_trajs[0], config, size_factor=sf
        )


if __name__ == "__main__":
    main()

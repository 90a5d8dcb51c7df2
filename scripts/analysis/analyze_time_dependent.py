"""Time-dependent distance analysis CLI.

Advertised by the reference's ``run_analysis.py:31-37`` but never shipped
(SURVEY.md §2 item 27) — implemented here: per-size consecutive-step
distances + cross-size grid/combined/divergence plots.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import load_teacher_from_arg, load_student, parse_float_list, preflight_probe, project_root  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Per-timestep distance analysis across model sizes",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--teacher_model", type=str, default=None)
    parser.add_argument("--size_factors", type=str, default="0.1,0.5,1.0")
    parser.add_argument("--num_samples", type=int, default=5)
    parser.add_argument("--timesteps", type=int, default=50)
    args = parser.parse_args()
    preflight_probe()

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.analysis import (
        plot_time_dependent_grid,
        plot_time_dependent_combined,
        plot_trajectory_divergence_vs_timestep,
        generate_3d_model_size_visualization,
    )
    from distillation_trajectories_tpu.metrics import (
        analyze_time_dependent_distances,
    )
    from distillation_trajectories_tpu.trajectories import TrajectoryManager

    config = Config()
    config.timesteps = args.timesteps
    config.create_directories()

    teacher_model, teacher_vars = load_teacher_from_arg(config, args.teacher_model)

    time_distances = {}
    all_metrics = {}
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
        manager.generate_and_save_trajectories(num_samples=args.num_samples)
        pairs = manager.load_trajectories()
        time_distances[sf] = analyze_time_dependent_distances(
            [p[0] for p in pairs], [p[1] for p in pairs], config,
            size_factor=sf, save_dir=config.time_dependent_dir,
        )
        all_metrics[sf] = manager.compute_trajectory_metrics_batch()

    plot_time_dependent_grid(time_distances, config)
    plot_time_dependent_combined(time_distances, config)
    plot_trajectory_divergence_vs_timestep(all_metrics, config)
    generate_3d_model_size_visualization(all_metrics, config)


if __name__ == "__main__":
    main()

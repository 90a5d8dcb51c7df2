"""Noise-prediction analysis CLI.

Advertised by the reference's ``run_analysis.py:31-37`` but never shipped
(SURVEY.md §2 item 27) — implemented here over the library function
``analyze_noise_prediction``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import load_teacher_from_arg, load_student, parse_float_list, preflight_probe, project_root  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Teacher-vs-student noise-prediction accuracy analysis",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--teacher_model", type=str, default=None)
    parser.add_argument("--size_factors", type=str, default="0.1,0.5,1.0")
    parser.add_argument("--timesteps", type=int, default=None)
    args = parser.parse_args()
    preflight_probe()

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.analysis import analyze_noise_prediction

    config = Config()
    if args.timesteps:
        config.timesteps = args.timesteps
    config.create_directories()

    teacher_model, teacher_vars = load_teacher_from_arg(config, args.teacher_model)
    for sf in parse_float_list(args.size_factors):
        try:
            student_model, student_vars = load_student(config, sf)
        except FileNotFoundError:
            print(f"No student model for size {sf}; skipping")
            continue
        analyze_noise_prediction(
            teacher_model, student_model, config, size_factor=sf,
            teacher_variables=teacher_vars, student_variables=student_vars,
        )


if __name__ == "__main__":
    main()

"""FID analysis CLI.

Advertised by the reference's ``run_analysis.py:31-37`` but never shipped
(SURVEY.md §2 item 27) — implemented here: FID between teacher and student
samples per size factor + FID-vs-size summary plot.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import load_teacher_from_arg, load_student, parse_float_list, preflight_probe, project_root  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="FID analysis across student size factors",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--teacher_model", type=str, default=None)
    parser.add_argument("--size_factors", type=str, default="0.1,0.5,1.0")
    parser.add_argument("--num_samples", type=int, default=50)
    parser.add_argument("--timesteps", type=int, default=None)
    parser.add_argument("--dataset", choices=["MNIST", "CIFAR10"], default=None)
    parser.add_argument("--num_channels", type=int, default=None)
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--base_dir", type=str, default=None,
                        help="Override the output root directory")
    args = parser.parse_args()
    preflight_probe()

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.metrics import InceptionModel
    from distillation_trajectories_tpu.metrics.fid import fid_across_sizes

    overrides = {}
    if args.dataset:
        overrides["dataset"] = args.dataset
    if args.num_channels:
        overrides["channels"] = args.num_channels
    if args.image_size:
        overrides["image_size"] = args.image_size
    if args.base_dir:
        overrides["base_dir"] = args.base_dir
    config = Config(**overrides)
    if args.timesteps:
        config.timesteps = args.timesteps
        config.sample_steps = args.timesteps
    config.create_directories()

    teacher_model, teacher_vars = load_teacher_from_arg(config, args.teacher_model)
    inception = InceptionModel()

    students = {}
    for sf in parse_float_list(args.size_factors):
        try:
            students[sf] = load_student(config, sf)
        except FileNotFoundError:
            print(f"No student model for size {sf}; skipping")

    fid_by_size = fid_across_sizes(
        teacher_model, teacher_vars, students, config,
        inception=inception, num_samples=args.num_samples,
    )

    if fid_by_size:
        import json

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        sizes = sorted(fid_by_size)
        plt.figure(figsize=(10, 6))
        plt.plot(sizes, [fid_by_size[s] for s in sizes], "o-", linewidth=2)
        plt.xlabel("Model Size Factor")
        plt.ylabel("FID (teacher vs student samples)")
        plt.title("FID vs Student Size Factor")
        plt.grid(True, linestyle="--", alpha=0.7)
        plt.savefig(os.path.join(config.fid_dir, "fid_vs_size.png"),
                    dpi=300, bbox_inches="tight")
        plt.close()
        with open(os.path.join(config.fid_dir, "fid_summary.txt"), "w") as f:
            # Feature provenance INLINE in the human-read artifact (not just
            # the json): seeded-random scores are self-consistent but not
            # ImageNet-FID-comparable (reference fid_score.py:19-34).
            f.write(
                "features: "
                + ("pretrained-torchvision" if inception.pretrained
                   else "seeded-random (NOT ImageNet-FID-comparable; set "
                   "INCEPTION_WEIGHTS to a torchvision state dict)")
                + "\n"
            )
            for s in sizes:
                f.write(f"size_{s}: {fid_by_size[s]:.4f}\n")
        # Machine-readable artifact with the feature PROVENANCE stamped in:
        # without pretrained torchvision weights the scores rank models under
        # deterministic random features (self-consistent, NOT comparable to
        # ImageNet-FID — reference fid_score.py:19-34).  Stamped here so any
        # cross-repo comparison reads it from the artifact, not stdout.
        with open(os.path.join(config.fid_dir, "fid_summary.json"), "w") as f:
            json.dump({
                "features": (
                    "pretrained-torchvision" if inception.pretrained
                    else "seeded-random"
                ),
                "imagenet_fid_comparable": bool(inception.pretrained),
                "num_samples": args.num_samples,
                "fid_by_size": {str(s): fid_by_size[s] for s in sizes},
            }, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()

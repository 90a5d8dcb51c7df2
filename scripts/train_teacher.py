"""Teacher training CLI (reference scripts/train_teacher.py:112-173 —
same flags)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import project_root, add_mesh_flag, apply_mesh_arg  # noqa: E402,F401


def main():
    parser = argparse.ArgumentParser(
        description="Train a diffusion model teacher",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--epochs", type=int, default=None,
                        help="Override the number of epochs for training")
    parser.add_argument("--dataset", type=str, default=None,
                        choices=["MNIST", "CIFAR10"],
                        help="Dataset to use for training")
    parser.add_argument("--image_size", type=int, default=None,
                        help="Size of images to use for training")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="Batch size for training")
    parser.add_argument("--timesteps", type=int, default=None,
                        help="Number of timesteps for diffusion process")
    parser.add_argument("--seed", type=int, default=0)
    # TPU-native extensions (defaults preserve reference behavior)
    parser.add_argument("--noise_schedule", type=str, default=None,
                        choices=["linear", "cosine"])
    parser.add_argument("--dropout", type=float, default=None)
    parser.add_argument("--full_res_head", action="store_true",
                        help="Use the enc1-skip full-resolution decoder head")
    parser.add_argument("--sample_mode", type=str, default=None,
                        choices=["reference", "ancestral"])
    parser.add_argument("--base_dir", type=str, default=None,
                        help="Override the output root directory")
    add_mesh_flag(parser)
    parser.add_argument("--limit_batches", type=int, default=None,
                        help="Cap batches per epoch (smoke runs)")
    parser.add_argument("--num_samples", type=int, default=None,
                        help="Samples in the per-save-interval grid "
                        "(0 skips grid generation)")
    parser.add_argument("--checkpoint_sharded", action="store_true",
                        help="Save checkpoints through the sharding-"
                        "preserving orbax lane (pod-scale; pairs with "
                        "--mesh). Default stays the msgpack contract.")
    args = parser.parse_args()

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.training import train_teacher

    config = Config(base_dir=args.base_dir) if args.base_dir else Config()
    if args.noise_schedule is not None:
        config.noise_schedule = args.noise_schedule
    if args.dropout is not None:
        config.dropout = args.dropout
    if args.full_res_head:
        config.full_res_head = True
    if args.sample_mode is not None:
        config.sample_mode = args.sample_mode
    if args.epochs is not None:
        config.epochs = args.epochs
    if args.dataset is not None:
        config.dataset = args.dataset
    if args.image_size is not None:
        config.image_size = args.image_size
    if args.batch_size is not None:
        config.batch_size = args.batch_size
    if args.timesteps is not None:
        config.timesteps = args.timesteps
        config.sample_steps = args.timesteps
        config.teacher_steps = args.timesteps
        config.student_steps = args.timesteps
    apply_mesh_arg(config, args)
    if args.checkpoint_sharded:
        config.checkpoint_sharded = True
    if args.limit_batches is not None:
        config.limit_batches_per_epoch = args.limit_batches
    if args.num_samples is not None:
        config.num_samples_to_generate = args.num_samples
    config.create_directories()

    train_teacher(config, seed=args.seed)


if __name__ == "__main__":
    main()

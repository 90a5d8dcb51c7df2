"""Resume teacher training CLI (reference scripts/continue_training.py —
same --start_epoch/--epochs/--timesteps/--batch_size flags)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import project_root, add_mesh_flag, apply_mesh_arg  # noqa: E402,F401


def main():
    parser = argparse.ArgumentParser(
        description="Continue training a teacher model from a checkpoint",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--start_epoch", type=int, required=True,
                        help="Checkpoint epoch to resume from")
    parser.add_argument("--epochs", type=int, default=10,
                        help="Number of additional epochs to train")
    parser.add_argument("--timesteps", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--dataset", type=str, default=None,
                        choices=["MNIST", "CIFAR10"])
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--base_dir", type=str, default=None,
                        help="Override the output root directory")
    parser.add_argument("--limit_batches", type=int, default=None,
                        help="Cap batches per epoch (smoke runs)")
    parser.add_argument("--checkpoint_sharded", action="store_true",
                        help="Save checkpoints through the sharding-"
                        "preserving orbax lane (pod-scale; pairs with "
                        "--mesh). Default stays the msgpack contract.")
    parser.add_argument("--num_samples", type=int, default=None,
                        help="Samples in the per-save-interval grid "
                        "(0 skips grid generation)")
    add_mesh_flag(parser)
    args = parser.parse_args()

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.training import continue_training

    config = Config(base_dir=args.base_dir) if args.base_dir else Config()
    config.epochs = args.epochs
    if args.timesteps is not None:
        config.timesteps = args.timesteps
        config.sample_steps = args.timesteps
    if args.batch_size is not None:
        config.batch_size = args.batch_size
    if args.dataset is not None:
        config.dataset = args.dataset
    if args.image_size is not None:
        config.image_size = args.image_size
    apply_mesh_arg(config, args)
    if args.checkpoint_sharded:
        config.checkpoint_sharded = True
    if args.limit_batches is not None:
        config.limit_batches_per_epoch = args.limit_batches
    if args.num_samples is not None:
        config.num_samples_to_generate = args.num_samples
    config.create_directories()

    print(f"Starting from epoch: {args.start_epoch}")
    continue_training(config, args.start_epoch)


if __name__ == "__main__":
    main()

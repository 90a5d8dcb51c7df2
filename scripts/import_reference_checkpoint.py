"""Convert a reference torch ``.pt`` checkpoint to this framework's format.

Migration lane for users of the reference repo: their teachers/students are
bare ``model.state_dict()`` files (reference ``train_teacher.py:86``,
``train_students.py:187``).  This CLI ports one onto the Flax U-Net
(``models/torch_port.py`` — output parity proven against the actual
reference model in ``tests/test_unet_torch_port.py``) and saves it under
the same directory contract every CLI here reads
(``model_epoch_{e}.msgpack`` in ``output/models/teacher`` or
``output/models/students/size_{sf}``), so an imported model immediately
works with train/analyze/editing commands.

Usage:
    python scripts/import_reference_checkpoint.py path/to/model_epoch_10.pt
    python scripts/import_reference_checkpoint.py model.pt \
        --role student --size_factor 0.3 --epoch 5 --base_dir /data/run1
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import project_root  # noqa: E402,F401


def main():
    parser = argparse.ArgumentParser(
        description="Import a reference torch U-Net checkpoint",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("checkpoint", type=str, help="reference .pt file")
    parser.add_argument("--role", choices=["teacher", "student"],
                        default="teacher",
                        help="which models/ subdirectory to save under")
    parser.add_argument("--size_factor", type=float, default=None,
                        help="architecture size factor; inferred from the "
                        "tensor shapes when omitted")
    parser.add_argument("--epoch", type=int, default=1,
                        help="epoch label for the saved checkpoint name")
    parser.add_argument("--dataset", choices=["MNIST", "CIFAR10"],
                        default=None)
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--base_dir", type=str, default=None)
    parser.add_argument("--out", type=str, default=None,
                        help="explicit output DIRECTORY (overrides --role)")
    args = parser.parse_args()

    # The port is pure host math (torch tensor -> numpy relayout) plus one
    # tiny jitted init to get the variable-tree structure: force the CPU
    # backend so the CLI never touches the tunneled TPU — it works during
    # outages and never contends with a measured run holding the chip.
    # (The axon plugin ignores JAX_PLATFORMS; jax.config is the one switch.)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.models.torch_port import (
        import_reference_unet_checkpoint,
    )
    from distillation_trajectories_tpu.training.checkpoints import (
        save_checkpoint,
    )

    overrides = {}
    if args.dataset:
        overrides["dataset"] = args.dataset
    if args.image_size:
        overrides["image_size"] = args.image_size
    if args.base_dir:
        overrides["base_dir"] = args.base_dir
    config = Config(**overrides).create_directories()

    model, variables = import_reference_unet_checkpoint(
        args.checkpoint, config, size_factor=args.size_factor
    )
    sf = model.size_factor
    if args.out:
        out_dir = args.out
    elif args.role == "teacher":
        out_dir = config.teacher_models_dir
    else:
        out_dir = os.path.join(config.student_models_dir, f"size_{sf}")

    path = save_checkpoint(
        out_dir, args.epoch,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        extra={"imported_from": os.path.abspath(args.checkpoint),
               "size_factor": sf},
    )
    print(f"[torch-port] {args.checkpoint} (size_factor={sf}) -> {path}")


if __name__ == "__main__":
    main()

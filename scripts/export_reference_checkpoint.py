"""Convert a framework checkpoint back to a reference torch ``.pt`` file.

Inverse of ``import_reference_checkpoint.py``, completing the migration
lane both ways: a TPU-trained teacher/student exports to a state dict the
reference loads with a strict ``model.load_state_dict(...)`` (reference
``scripts/continue_training.py:54`` / ``scripts/train_students.py:249``
load pattern), via ``models/torch_port.py`` whose inverse mapping is
proven bit-exact in ``tests/test_unet_torch_port.py``.

Usage:
    python scripts/export_reference_checkpoint.py out.pt            # teacher, latest
    python scripts/export_reference_checkpoint.py out.pt \
        --role student --size_factor 0.3 --epoch 5 --base_dir /data/run1
    python scripts/export_reference_checkpoint.py out.pt \
        --checkpoint output/models/teacher/model_epoch_10.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import project_root  # noqa: E402,F401


def main():
    parser = argparse.ArgumentParser(
        description="Export a checkpoint as a reference torch .pt file",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("out", type=str, help="output .pt path")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="explicit .msgpack file (overrides --role)")
    parser.add_argument("--role", choices=["teacher", "student"],
                        default="teacher")
    parser.add_argument("--size_factor", type=float, default=None,
                        help="student size factor (required for --role "
                        "student without --checkpoint)")
    parser.add_argument("--epoch", type=int, default=None,
                        help="checkpoint epoch (latest when omitted)")
    parser.add_argument("--dataset", choices=["MNIST", "CIFAR10"],
                        default=None)
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--base_dir", type=str, default=None)
    args = parser.parse_args()

    # Pure host math (msgpack -> numpy relayout -> torch.save): force the
    # CPU backend so the CLI works during tunnel outages and never contends
    # with a measured run holding the chip.
    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.models.torch_port import (
        unet_torch_state_dict_from_variables,
    )
    from distillation_trajectories_tpu.training.checkpoints import (
        latest_epoch,
        load_checkpoint,
    )

    overrides = {}
    if args.dataset:
        overrides["dataset"] = args.dataset
    if args.image_size:
        overrides["image_size"] = args.image_size
    if args.base_dir:
        overrides["base_dir"] = args.base_dir
    config = Config(**overrides)

    if args.checkpoint:
        from flax import serialization

        with open(args.checkpoint, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        src = args.checkpoint
    else:
        if args.role == "teacher":
            directory = config.teacher_models_dir
        else:
            if args.size_factor is None:
                parser.error("--size_factor is required for --role student")
            directory = os.path.join(
                config.student_models_dir, f"size_{args.size_factor}"
            )
        epoch = args.epoch if args.epoch is not None else latest_epoch(directory)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints found in {directory}")
        payload = load_checkpoint(directory, epoch)
        src = os.path.join(directory, f"model_epoch_{epoch}.msgpack")

    variables = {"params": payload["params"]}
    if payload.get("batch_stats"):
        variables["batch_stats"] = payload["batch_stats"]
    state_dict = unet_torch_state_dict_from_variables(variables)
    state_dict = {k: torch.from_numpy(v.copy()) for k, v in state_dict.items()}
    out_dir = os.path.dirname(os.path.abspath(args.out))
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    torch.save(state_dict, args.out)
    print(f"[torch-port] {src} -> {args.out} "
          f"({len(state_dict)} state-dict entries)")


if __name__ == "__main__":
    main()

"""Progressive step-halving distillation CLI (opt-in, beyond-reference).

Trains same-architecture students that sample in half the steps of their
teacher, iterated ``--rounds`` times (50 → 25 → 12 → …); see
``training/progressive.py`` for the method.  Reads the teacher from the
usual checkpoint directory (``model_epoch_N``), writes each round's student
to ``output/models/progressive/steps_{n}/``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import load_teacher_from_arg, preflight_probe  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Progressive step-halving distillation",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--teacher_model", type=str, default=None,
                        help="Teacher checkpoint name (model_epoch_N); "
                        "latest when omitted")
    parser.add_argument("--rounds", type=int, default=2,
                        help="Number of step-halvings")
    parser.add_argument("--epochs", type=int, default=None,
                        help="Epochs per round (Config.epochs when omitted)")
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--timesteps", type=int, default=None,
                        help="Teacher sampling steps to start halving from "
                        "(Config.teacher_steps when omitted)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--limit_batches", type=int, default=None)
    parser.add_argument("--base_dir", type=str, default=None)
    parser.add_argument("--guidance_range", type=str, default=None,
                        help="lo,hi: ALSO distill classifier-free guidance "
                        "into the student (w ~ U[lo,hi] per sample; the "
                        "w-conditioned student replaces the teacher's two "
                        "CFG forwards with one guided forward). Checkpoints "
                        "go to progressive_cfg/steps_{n}/")
    args = parser.parse_args()

    preflight_probe()

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.training import progressive_distill

    config = Config(base_dir=args.base_dir) if args.base_dir else Config()
    if args.dataset:
        config.dataset = args.dataset
    if args.image_size:
        config.image_size = args.image_size
    if args.batch_size:
        config.batch_size = args.batch_size
    if args.timesteps:
        config.teacher_steps = args.timesteps
    if args.limit_batches:
        config.limit_batches_per_epoch = args.limit_batches
    config.create_directories()

    teacher_model, teacher_vars = load_teacher_from_arg(config, args.teacher_model)
    model, variables, steps = progressive_distill(
        config,
        teacher_model,
        teacher_vars,
        rounds=args.rounds,
        seed=args.seed,
        epochs_per_round=args.epochs,
        guidance_range=(
            tuple(float(x) for x in args.guidance_range.split(","))
            if args.guidance_range else None
        ),
    )
    print(f"[progressive] done: fastest model samples in {steps} steps "
          f"(teacher: {config.teacher_steps})"
          + (f", guidance-conditioned on w in [{args.guidance_range}]"
             if args.guidance_range else ""))


if __name__ == "__main__":
    main()

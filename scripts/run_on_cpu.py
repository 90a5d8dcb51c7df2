"""Force-CPU dispatcher (reference scripts/run_on_cpu.py).

On TPU images the analog of masking CUDA is forcing the JAX CPU backend
before any jax import; then dispatches to the chosen script's main().
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import project_root  # noqa: E402,F401


def main():
    parser = argparse.ArgumentParser(
        description="Run a training/analysis script on CPU",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument(
        "script", type=str,
        choices=["train_teacher", "train_students", "run_analysis"],
        help="Which script to run on CPU",
    )
    parser.add_argument("--args", type=str, default="",
                        help="Additional arguments to pass to the script")
    args = parser.parse_args()

    # Force the CPU backend (JAX analog of CUDA_VISIBLE_DEVICES='')
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    print("\n" + "=" * 80)
    print("RUNNING ON CPU")
    print("=" * 80)
    print(f"Script to run: {args.script}")

    if args.script == "train_teacher":
        from train_teacher import main as script_main
    elif args.script == "train_students":
        from train_students import main as script_main
    else:
        sys.path.insert(0, project_root)
        from run_analysis import main as script_main

    if args.args:
        sys.argv = [sys.argv[0]] + args.args.split()
    print(f"Running {args.script} on CPU...")
    script_main()


if __name__ == "__main__":
    main()

"""Editing demo CLI: runs all three editing capabilities on the teacher.

The reference's editing modules have no in-repo callers (SURVEY.md §2 item
23-25: 'library-only, no script in the repo calls these'); this CLI closes
that gap — it loads the trained teacher and emits inpainting, latent
manipulation, and prompt-editing artifacts under
``output/analysis/editing/``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import load_teacher_from_arg, project_root  # noqa: E402

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Run inpainting / latent-manipulation / prompt-editing demos",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--teacher_model", type=str, default=None)
    parser.add_argument("--timesteps", type=int, default=50)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--strength", type=float, default=2.0,
                        help="Latent manipulation strength")
    parser.add_argument("--base_dir", type=str, default=None)
    parser.add_argument("--full_res_head", action="store_true")
    parser.add_argument("--noise_schedule", type=str, default=None)
    parser.add_argument("--spatial", type=str, default=None,
                        help="D,S: run the editing forwards spatially "
                        "partitioned over a (data, spatial) mesh — image "
                        "rows sharded S-way with GSPMD halo exchange, the "
                        "beyond-HBM big-image lane (parallel/spatial.py)")
    parser.add_argument("--sample_mode", type=str, default="engine",
                        choices=["engine", "ancestral"])
    args = parser.parse_args()

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.data import get_real_images
    from distillation_trajectories_tpu.editing import (
        apply_latent_manipulation,
        apply_masked_inpainting,
        apply_prompt_editing,
        create_random_mask,
        find_semantic_directions,
        visualize_inpainting,
        visualize_latent_manipulation,
        visualize_prompt_editing,
    )

    config = Config(base_dir=args.base_dir) if args.base_dir else Config()
    if args.full_res_head:
        config.full_res_head = True
    if args.noise_schedule:
        config.noise_schedule = args.noise_schedule
    config.timesteps = args.timesteps
    if args.spatial:
        config.spatial_shape = tuple(
            int(x) for x in args.spatial.split(","))
    if args.dataset:
        config.dataset = args.dataset
    if args.image_size:
        config.image_size = args.image_size
    output_dir = os.path.join(config.analysis_dir, "editing")
    os.makedirs(output_dir, exist_ok=True)

    teacher_model, teacher_vars = load_teacher_from_arg(config, args.teacher_model)

    print("\n[1/3] Masked inpainting...")
    real = get_real_images(config, 1)[0]
    real01 = (real + 1.0) / 2.0  # editing API takes [0,1] images
    mask = create_random_mask(
        config.image_size, config.image_size,
        rng=np.random.default_rng(args.seed),
    )
    result = apply_masked_inpainting(
        teacher_model, config, real01, mask=mask, variables=teacher_vars,
        seed=args.seed, mode=args.sample_mode,
    )
    visualize_inpainting(result, output_dir)

    print("\n[2/3] Latent manipulation (PCA semantic directions)...")
    directions = find_semantic_directions(
        teacher_model, config, variables=teacher_vars, num_samples=32,
        mode=args.sample_mode,
    )
    result = apply_latent_manipulation(
        teacher_model, config, direction=directions["pca_0"],
        strength=args.strength, variables=teacher_vars, seed=args.seed,
        mode=args.sample_mode,
    )
    visualize_latent_manipulation(result, output_dir)

    print("\n[3/3] Prompt editing (simulated)...")
    result = apply_prompt_editing(
        teacher_model, config, "a digit", "another digit",
        variables=teacher_vars, seed=args.seed, mode=args.sample_mode,
    )
    visualize_prompt_editing(result, output_dir)

    print(f"\nEditing demos saved under {output_dir}")


if __name__ == "__main__":
    main()

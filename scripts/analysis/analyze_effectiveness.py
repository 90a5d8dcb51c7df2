"""Consolidated CFG-effectiveness graphs across model sizes.

Counterpart of reference ``scripts/analysis/analyze_effectiveness.py:43-240``
(same flags/filenames/poster colors).  The reference only plotted *synthetic
demonstration data* (its :96-125, a noted gap, SURVEY.md §2 item 30); this
implementation computes the real quantities — per-(size, guidance-scale)
cosine similarity and Euclidean distance between paired teacher/student
trajectories — and falls back to the reference's synthetic formulas only
when no trained models exist (logged).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import load_teacher_from_arg, load_student, parse_float_list, preflight_probe, project_root  # noqa: E402

import numpy as np  # noqa: E402

# Poster colors, lightest→darkest (reference analyze_effectiveness.py:72-85)
POSTER_COLORS = [
    "#35b07c", "#41a086", "#47988b", "#4d9090", "#59809a", "#5f789f", "#6b68a9",
]
STANDARD_SIZE_FACTORS = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]


def parse_args():
    parser = argparse.ArgumentParser(
        description="Consolidated CFG effectiveness graphs across model sizes",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--size_factors", type=str,
                        default="0.1,0.2,0.4,0.6,0.8,1.0")
    parser.add_argument("--guidance_scales", type=str,
                        default="1.0,2.0,3.0,5.0,7.0")
    parser.add_argument("--output_dir", type=str,
                        default="analysis/effectiveness")
    parser.add_argument("--teacher_model", type=str, default=None)
    parser.add_argument("--num_samples", type=int, default=3)
    parser.add_argument("--timesteps", type=int, default=50)
    return parser.parse_args()


def compute_real_metrics(config, size_factors, guidance_scales, num_samples,
                         teacher_model_arg):
    """Real per-(size, scale) cosine similarity / Euclidean distance between
    paired trajectories; None if models are unavailable."""
    try:
        import jax
        import jax.numpy as jnp

        from distillation_trajectories_tpu.diffusion.sampling import (
            CFG_COND_PAIRS,
            NOCFG_COND_PAIRS,
        )
        from distillation_trajectories_tpu.trajectories import (
            make_sweep_trajectory_fn,
        )

        teacher_model, teacher_vars = load_teacher_from_arg(
            config, teacher_model_arg
        )
    except (FileNotFoundError, OSError) as e:
        print(f"Teacher model unavailable ({e}); using synthetic demo data")
        return None

    seeds = jnp.arange(num_samples, dtype=jnp.int32)
    shape = (config.image_size, config.image_size, config.channels)
    noises = jax.jit(
        jax.vmap(lambda s: jax.random.normal(jax.random.PRNGKey(s), shape))
    )(seeds)
    # One unified graph per model (runtime cond-pair table selects CFG).
    # Teacher chains depend only on gs (fixed noises/seeds), so they are
    # generated once per gs and reused across every size factor — the
    # engine sweep (trajectories/engine.py) hoists exactly this.
    teacher_fn = make_sweep_trajectory_fn(
        teacher_model, teacher_vars, config.timesteps, config
    )
    teacher_chains = {}

    cosine, euclid = {}, {}
    for sf in size_factors:
        try:
            student_model, student_vars = load_student(config, sf)
        except FileNotFoundError:
            print(f"No student for size {sf}; skipping")
            continue
        student_fn = make_sweep_trajectory_fn(
            student_model, student_vars, config.timesteps, config
        )
        cos_row, euc_row = [], []
        for gs in guidance_scales:
            pairs = jnp.asarray(
                CFG_COND_PAIRS if gs > 1.0 else NOCFG_COND_PAIRS
            )
            if gs not in teacher_chains:
                teacher_chains[gs] = teacher_fn(
                    noises, seeds, pairs, jnp.float32(gs)
                )
            t = teacher_chains[gs]
            s = student_fn(noises, seeds, pairs, jnp.float32(gs))
            tf = t.reshape(t.shape[0], t.shape[1], -1)
            sf_flat = s.reshape(s.shape[0], s.shape[1], -1)
            tn = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
            sn = sf_flat / jnp.linalg.norm(sf_flat, axis=-1, keepdims=True)
            cos_row.append(float(jnp.mean(jnp.sum(tn * sn, axis=-1))))
            euc_row.append(
                float(jnp.mean(jnp.linalg.norm(tf - sf_flat, axis=-1)))
            )
        cosine[sf] = cos_row
        euclid[sf] = euc_row
    return (cosine, euclid) if cosine else None


def synthetic_metrics(size_factors, guidance_scales):
    """The reference's synthetic demonstration formulas
    (analyze_effectiveness.py:102-125)."""
    cosine, euclid = {}, {}
    mx = max(size_factors)
    for sf in size_factors:
        base_similarity = 0.85 + 0.1 * (1 - sf / mx)
        cosine[sf] = [
            base_similarity + 0.02 * gs * (1 - sf / mx) for gs in guidance_scales
        ]
        base_distance = 0.2 + 0.3 * (sf / mx)
        euclid[sf] = [
            base_distance - 0.03 * gs * (1 - sf / mx) for gs in guidance_scales
        ]
    return cosine, euclid


def create_consolidated_cfg_graph(output_dir, size_factors, guidance_scales,
                                  cosine, euclid):
    """Cosine-sim + Euclidean-dist vs guidance scale, and the effectiveness
    ratio plot (reference :127-209)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    colors = list(POSTER_COLORS)
    while len(colors) < len(STANDARD_SIZE_FACTORS):
        colors += colors
    color_mapping = {
        sf: colors[i % len(colors)] for i, sf in enumerate(STANDARD_SIZE_FACTORS)
    }

    plt.figure(figsize=(12, 10))
    plt.subplot(2, 1, 1)
    for sf in size_factors:
        if sf not in cosine:
            continue
        plt.plot(guidance_scales, cosine[sf], "-o",
                 color=color_mapping.get(sf, colors[0]),
                 label=f"Size {sf}")
    plt.title("Cosine Similarity vs Guidance Scale")
    plt.xlabel("Guidance Scale")
    plt.ylabel("Cosine Similarity")
    plt.legend()
    plt.grid(True, linestyle="--", alpha=0.7)

    plt.subplot(2, 1, 2)
    for sf in size_factors:
        if sf not in euclid:
            continue
        plt.plot(guidance_scales, euclid[sf], "-o",
                 color=color_mapping.get(sf, colors[0]),
                 label=f"Size {sf}")
    plt.title("Euclidean Distance vs Guidance Scale")
    plt.xlabel("Guidance Scale")
    plt.ylabel("Euclidean Distance")
    plt.legend()
    plt.grid(True, linestyle="--", alpha=0.7)
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "consolidated_cfg_metrics.png"),
                dpi=300, bbox_inches="tight")
    plt.close()

    # Effectiveness ratio: similarity gain per unit guidance
    plt.figure(figsize=(12, 6))
    for sf in size_factors:
        if sf not in cosine:
            continue
        base = cosine[sf][0]
        ratio = [
            (c - base) / gs if gs > 0 else 0.0
            for c, gs in zip(cosine[sf], guidance_scales)
        ]
        plt.plot(guidance_scales, ratio, "-o",
                 color=color_mapping.get(sf, colors[0]), label=f"Size {sf}")
    plt.title("CFG Effectiveness Ratio by Model Size")
    plt.xlabel("Guidance Scale")
    plt.ylabel("Effectiveness (Δ similarity / scale)")
    plt.legend()
    plt.grid(True, linestyle="--", alpha=0.7)
    plt.savefig(os.path.join(output_dir, "cfg_effectiveness_ratio.png"),
                dpi=300, bbox_inches="tight")
    plt.close()
    print(f"Saved consolidated CFG graphs to {output_dir}")


def main():
    args = parse_args()
    preflight_probe()

    from distillation_trajectories_tpu import Config

    config = Config()
    config.timesteps = args.timesteps
    size_factors = parse_float_list(args.size_factors)
    guidance_scales = parse_float_list(args.guidance_scales)
    output_dir = os.path.join(project_root, args.output_dir)

    real = compute_real_metrics(
        config, size_factors, guidance_scales, args.num_samples,
        args.teacher_model,
    )
    if real is not None:
        cosine, euclid = real
        print("Using real trajectory metrics")
    else:
        cosine, euclid = synthetic_metrics(size_factors, guidance_scales)
        print("Using synthetic demonstration data (no trained models found)")

    create_consolidated_cfg_graph(
        output_dir, size_factors, guidance_scales, cosine, euclid
    )


if __name__ == "__main__":
    main()

"""Flagship CFG-sweep analysis: heatmaps + radar plots across model sizes
and guidance scales.

Counterpart of reference
``scripts/analysis/analyze_trajectory_metrics.py:28-526`` with the same CLI
flags, colormap, and output filenames.  The underlying sweep runs as
vmapped scan-compiled trajectory batches on device (trajectories/engine.py)
instead of the reference's 160k sequential U-Net forwards (SURVEY.md §3.3).
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from _common import (  # noqa: E402
    add_mesh_flag,
    apply_mesh_arg,
    load_teacher_from_arg,
    load_student,
    parse_float_list,
    preflight_probe,
    project_root,
)

import numpy as np  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser(
        description=(
            "Analyze CFG impact across different model sizes using "
            "trajectory generation"
        ),
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument(
        "--teacher_model", type=str, default=None,
        help="Teacher checkpoint name (model_epoch_N); latest when omitted",
    )
    parser.add_argument(
        "--size_factors", type=str, default="0.05,0.75,0.1,0.2,0.4,0.6,0.8,1.0",
        help="Comma-separated list of size factors to compare",
    )
    parser.add_argument(
        "--guidance_scales", type=str,
        default="1.0,2.0,3.0,5.0,7.5,10.0,15.0,20.0,30.0,50.0",
        help="Comma-separated list of guidance scales to use",
    )
    parser.add_argument("--timesteps", type=int, default=100,
                        help="Number of timesteps for the diffusion process")
    parser.add_argument("--num_samples", type=int, default=10,
                        help="Number of noise samples to average over")
    parser.add_argument("--output_dir", type=str, default="analysis/heatmaps",
                        help="Directory to save analysis results")
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--num_channels", type=int, default=None)
    parser.add_argument("--base_dir", type=str, default=None,
                        help="Override the output root directory "
                        "(checkpoints are read from <base_dir>/output/models)")
    parser.add_argument(
        "--jobs", type=str, default=None,
        help="JSON list of jobs to run in ONE process, e.g. "
        '\'[{"output_dir": "analysis/heatmaps"}, {"size_factors": '
        '"0.1,0.5,0.9", "timesteps": 50, "output_dir": "analysis/trio"}]\'. '
        "Each job may override size_factors/guidance_scales/timesteps/"
        "num_samples/output_dir; unset fields inherit the top-level flags. "
        "Checkpoints are loaded once, every job's executables compile in "
        "one concurrent pool, and teacher chains are shared across jobs "
        "with matching (T, scale, samples) cells.",
    )
    add_mesh_flag(parser)
    return parser.parse_args()


# Poster teal→purple colormap (reference analyze_trajectory_metrics.py:99-120)
POSTER_COLORS = [
    "#65d0a0", "#50c090", "#41a086", "#47988b", "#4d9090",
    "#538895", "#59809a", "#5f789f", "#6570a4", "#6b68a9",
]

METRICS_TO_ANALYZE = [
    ("path_length_similarity", "Path Length Similarity"),
    ("trajectory_mse", "Trajectory MSE Similarity"),
    ("mean_directional_consistency", "Directional Consistency"),
    ("distribution_similarity", "Distribution Similarity"),
]


def _poster_cmap(plt):
    return plt.cm.colors.LinearSegmentedColormap.from_list(
        "poster_colors", POSTER_COLORS, N=256
    )


def _savefig(fig_or_plt, path, **kwargs):
    """savefig with fast PNG encoding (zlib level 1 via Pillow).

    Identical pixels, ~2x faster encode at dpi=300 (measured; the plot
    phase is serial matplotlib on the 1-core host, part of the flagship
    sweep's wall-clock).  Falls back to the default encoder when Pillow
    isn't available.
    """
    try:
        fig_or_plt.savefig(path, pil_kwargs={"compress_level": 1}, **kwargs)
    except TypeError:
        fig_or_plt.savefig(path, **kwargs)


def _transformed(metrics, gs):
    from distillation_trajectories_tpu.metrics import transform_metrics

    sm = metrics["student_metrics"][gs]
    return transform_metrics(
        sm["path_length_similarity"],
        sm["trajectory_mse"],
        sm["mean_directional_consistency"],
        sm["distribution_similarity"],
    )


def visualize_cfg_heatmap(metrics_by_size, output_dir, guidance_scales):
    """Per-metric CFG heatmaps + combined 2×2 figure
    (reference :54-241; same filenames/annotations)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    size_factors = sorted(metrics_by_size.keys())
    cmap = _poster_cmap(plt)

    def data_matrix(metric_key):
        data = np.zeros((len(size_factors), len(guidance_scales)))
        for i, sf in enumerate(size_factors):
            for j, gs in enumerate(guidance_scales):
                data[i, j] = _transformed(metrics_by_size[sf], gs)[metric_key]
        return data

    # One figure reused across the four per-metric heatmaps: only the image
    # data, color limits, title, and cell annotations change between frames
    # (figure/axes/colorbar construction is reused; rendered output is
    # unchanged vs fresh figures).
    fig = plt.figure(figsize=(12, 8))
    ax = fig.add_subplot(111)
    im = ax.imshow(
        np.zeros((len(size_factors), len(guidance_scales))),
        cmap=cmap, aspect="auto", interpolation="nearest",
    )
    cbar = fig.colorbar(im)
    ax.set_xlabel("Guidance Scale", fontsize=12)
    ax.set_ylabel("Model Size Factor", fontsize=12)
    ax.set_xticks(np.arange(len(guidance_scales)))
    ax.set_xticklabels([str(gs) for gs in guidance_scales])
    ax.set_yticks(np.arange(len(size_factors)))
    ax.set_yticklabels([str(sf) for sf in size_factors])
    texts = [
        [
            ax.text(j, i, "", ha="center", va="center", color="white",
                    fontsize=10, fontweight="bold")
            for j in range(len(guidance_scales))
        ]
        for i in range(len(size_factors))
    ]
    for metric_key, metric_name in METRICS_TO_ANALYZE:
        data = data_matrix(metric_key)
        im.set_data(data)
        im.set_clim(data.min(), data.max())
        cbar.set_label(f"{metric_name} Value", fontsize=12)
        ax.set_title(
            f"Impact of CFG on {metric_name}\nAcross Model Sizes and "
            "Guidance Scales",
            fontsize=14,
            pad=20,
        )
        for i in range(len(size_factors)):
            for j in range(len(guidance_scales)):
                texts[i][j].set_text(f"{data[i, j]:.3f}")
        fig.tight_layout()
        output_path = os.path.join(output_dir, f"cfg_heatmap_{metric_key}.png")
        _savefig(fig, output_path, dpi=300, bbox_inches="tight")
        print(f"Saved {metric_name} heatmap to {output_path}")
    plt.close(fig)

    # Combined 2×2
    fig, axs = plt.subplots(2, 2, figsize=(16, 12))
    axs = axs.flatten()
    for i, (metric_key, metric_name) in enumerate(METRICS_TO_ANALYZE):
        ax = axs[i]
        data = data_matrix(metric_key)
        im = ax.imshow(data, cmap=cmap, aspect="auto", interpolation="nearest")
        cbar = fig.colorbar(im, ax=ax)
        cbar.set_label(f"{metric_name} Value", fontsize=10)
        ax.set_title(metric_name, fontsize=14)
        ax.set_xlabel("Guidance Scale", fontsize=12)
        ax.set_ylabel("Model Size Factor", fontsize=12)
        ax.set_xticks(np.arange(len(guidance_scales)))
        ax.set_xticklabels([str(gs) for gs in guidance_scales])
        ax.set_yticks(np.arange(len(size_factors)))
        ax.set_yticklabels([str(sf) for sf in size_factors])
        for i_sf in range(len(size_factors)):
            for j_gs in range(len(guidance_scales)):
                ax.text(j_gs, i_sf, f"{data[i_sf, j_gs]:.3f}", ha="center",
                        va="center", color="white", fontsize=8,
                        fontweight="bold")
    fig.suptitle(
        "Impact of CFG Across Different Model Sizes and Guidance Scales",
        fontsize=16, y=0.98,
    )
    plt.tight_layout(rect=[0, 0, 1, 0.95])
    output_path = os.path.join(output_dir, "cfg_heatmap_combined.png")
    _savefig(plt, output_path, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"Saved combined heatmap to {output_path}")


def create_radar_plot_grid(metrics_by_size, output_dir, guidance_scales):
    """Per-guidance-scale grid of per-size radar plots (reference :243-320)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    size_factors = sorted(metrics_by_size.keys())

    # One figure reused across guidance scales: polar-subplot creation is
    # ~60% of each frame's cost (measured on the 1-core host); only the data
    # artists and titles change between frames, so they are replaced in
    # place.  Same rendered output as fresh per-gs figures — the data line
    # color is pinned to the cycle start ("C0") a fresh axes would use.
    n_sizes = len(size_factors)
    n_cols = min(3, n_sizes)
    n_rows = (n_sizes + n_cols - 1) // n_cols
    angles = np.linspace(0, 2 * np.pi, len(METRICS_TO_ANALYZE), endpoint=False)
    angles_closed = np.concatenate((angles, [angles[0]]))

    fig = plt.figure(figsize=(15, 10))
    axes = []
    for idx in range(n_sizes):
        ax = plt.subplot(n_rows, n_cols, idx + 1, projection="polar")
        ax.set_xticks(angles)
        ax.set_xticklabels([label for _, label in METRICS_TO_ANALYZE])
        ax.set_ylim(0, 1)
        # Placeholder reserving the two-line title box: tight_layout runs
        # once on THIS geometry, and the per-gs set_title below only swaps
        # the text — without it the layout would be computed title-less and
        # lower-row titles could collide with the axes above.
        ax.set_title(" \n ")
        axes.append(ax)
    fig.tight_layout()

    for gs in guidance_scales:
        for ax, sf in zip(axes, size_factors):
            for artist in ax.lines[:] + ax.patches[:]:
                artist.remove()
            t = _transformed(metrics_by_size[sf], gs)
            values = [t[k] for k, _ in METRICS_TO_ANALYZE]
            values = np.concatenate((values, [values[0]]))
            ax.plot(angles_closed, values, "o-", linewidth=2, color="C0")
            ax.fill(angles_closed, values, alpha=0.25, color="C0")
            ax.set_title(f"Size Factor: {sf:.2f}\nGuidance Scale: {gs:.1f}")
        _savefig(fig, os.path.join(output_dir, f"radar_plots_gs_{gs:.1f}.png"))
    plt.close(fig)


def create_composite_radar_plot(metrics_by_size, output_dir, guidance_scales):
    """One radar per guidance scale with all sizes overlaid
    (reference :322-399)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    size_factors = sorted(metrics_by_size.keys())
    colors = plt.cm.viridis(np.linspace(0, 1, len(size_factors)))
    angles = np.linspace(0, 2 * np.pi, len(METRICS_TO_ANALYZE), endpoint=False)
    angles_closed = np.concatenate((angles, [angles[0]]))

    # Figure reused across guidance scales (see create_radar_plot_grid);
    # per-size colors are already explicit so the rendered output is
    # unchanged.
    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(111, projection="polar")
    ax.set_xticks(angles)
    ax.set_xticklabels([label for _, label in METRICS_TO_ANALYZE])
    ax.set_ylim(0, 1)

    for gs in guidance_scales:
        for artist in ax.lines[:] + ax.patches[:]:
            artist.remove()
        for color, sf in zip(colors, size_factors):
            t = _transformed(metrics_by_size[sf], gs)
            values = [t[k] for k, _ in METRICS_TO_ANALYZE]
            values = np.concatenate((values, [values[0]]))
            ax.plot(angles_closed, values, "o-", linewidth=2, color=color,
                    label=f"Size {sf:.2f}")
            ax.fill(angles_closed, values, alpha=0.1, color=color)
        ax.set_title(f"Composite Radar Plot\nGuidance Scale: {gs:.1f}")
        ax.legend(loc="upper right", bbox_to_anchor=(1.3, 1.1))
        _savefig(fig, os.path.join(output_dir, f"composite_radar_plot_gs_{gs:.1f}.png"))
    plt.close(fig)


def main():
    import time as _time

    t_start = _time.perf_counter()

    def _phase(name, t0):
        print(f"[timing] {name}: {_time.perf_counter() - t0:.1f}s")
        return _time.perf_counter()

    args = parse_args()
    preflight_probe()

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.trajectories import (
        sweep_compare_trajectories_multi,
    )

    config = Config(base_dir=args.base_dir) if args.base_dir else Config()
    apply_mesh_arg(config, args)
    config.timesteps = args.timesteps
    if args.dataset:
        config.dataset = args.dataset
    if args.image_size:
        config.image_size = args.image_size
    if args.num_channels:
        config.channels = args.num_channels

    def _abs_dir(d):
        return d if os.path.isabs(d) else os.path.join(project_root, d)

    # --jobs: several sweep configurations share ONE process (one
    # checkpoint load, one compile pool, cross-job teacher-chain cache —
    # see sweep_compare_trajectories_multi).  Unset job fields inherit the
    # top-level flags; the flagless invocation is exactly a one-job list.
    if args.jobs:
        import json as _json

        job_specs = _json.loads(args.jobs)
        if not isinstance(job_specs, list) or not job_specs:
            raise SystemExit("--jobs must be a non-empty JSON list")
    else:
        job_specs = [{}]
    for spec in job_specs:
        spec.setdefault("size_factors", args.size_factors)
        spec.setdefault("guidance_scales", args.guidance_scales)
        spec.setdefault("timesteps", args.timesteps)
        spec.setdefault("num_samples", args.num_samples)
        spec.setdefault("output_dir", args.output_dir)
        for key in ("size_factors", "guidance_scales"):
            v = spec[key]
            spec[key] = (
                [float(x) for x in v] if isinstance(v, (list, tuple))
                else parse_float_list(v)
            )
        spec["output_dir"] = _abs_dir(spec["output_dir"])
        os.makedirs(spec["output_dir"], exist_ok=True)

    t0 = _phase("imports", t_start)
    teacher_model, teacher_vars = load_teacher_from_arg(config, args.teacher_model)

    # Load the UNION of size factors once; jobs share the loaded objects so
    # the engine's (model, variables, T) executable cache dedups across jobs.
    students = {}
    for size_factor in sorted({sf for s in job_specs for sf in s["size_factors"]}):
        try:
            students[size_factor] = load_student(config, size_factor)
        except FileNotFoundError:
            print(f"Warning: No models found for size factor {size_factor}")
            continue
        print(f"\nProcessing student model with size factor {size_factor}")
        print(f"Computing CFG impact for size factor {size_factor}...")

    t0 = _phase("checkpoint loading", t0)
    engine_jobs = [
        {
            "students": {
                sf: students[sf] for sf in spec["size_factors"]
                if sf in students
            },
            "guidance_scales": spec["guidance_scales"],
            "num_samples": spec["num_samples"],
            "timesteps": spec["timesteps"],
        }
        for spec in job_specs
    ]
    live = [j for j, ej in zip(job_specs, engine_jobs) if ej["students"]]
    engine_jobs = [ej for ej in engine_jobs if ej["students"]]
    if not engine_jobs:
        print("No student models found; nothing to analyze")
        return
    results = sweep_compare_trajectories_multi(
        teacher_model, teacher_vars, engine_jobs, config
    )
    t_sweep_end = _phase("trajectory sweep (trace+compile+run)", t0)
    shared_s = t_sweep_end - t_start

    for i, (spec, metrics_by_size) in enumerate(zip(live, results)):
        t_job = _time.perf_counter()
        output_dir = spec["output_dir"]
        guidance_scales = spec["guidance_scales"]
        print("\nVisualizing CFG heatmaps...")
        visualize_cfg_heatmap(metrics_by_size, output_dir, guidance_scales)
        print("\nCreating radar plots...")
        create_radar_plot_grid(metrics_by_size, output_dir, guidance_scales)
        create_composite_radar_plot(metrics_by_size, output_dir, guidance_scales)
        print("\nCFG analysis completed")
        print(f"Results saved in {output_dir}")
        # Marginal per-job seconds (plots only; load/compile/generation are
        # shared) — the workload runner parses these lines to split stage
        # attribution when several stages ride one process.
        print(f"[jobs] job {i} ({os.path.basename(output_dir)}): "
              f"marginal {_time.perf_counter() - t_job:.1f}s")
    print(f"[jobs] shared (imports+load+compile+generate): {shared_s:.1f}s")
    _phase("total", t_start)


if __name__ == "__main__":
    main()

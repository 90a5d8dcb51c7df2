"""CFG-sweep CLI plotting wiring (scripts/analysis/analyze_trajectory_metrics).

Drives the heatmap/radar rendering with synthetic metric dicts shaped exactly
like sweep_compare_trajectories output, so CLI-side regressions (key names,
transform wiring, filenames — reference analyze_trajectory_metrics.py:54-399)
are caught without on-chip trajectory generation.
"""

import importlib.util
import os
import sys

import numpy as np

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "analysis", "analyze_trajectory_metrics.py",
)


def _load_cli():
    sys.path.insert(0, os.path.dirname(os.path.dirname(_SCRIPT)))
    spec = importlib.util.spec_from_file_location("atm_cli", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_metrics_by_size(size_factors, guidance_scales, rng):
    out = {}
    for sf in size_factors:
        per_gs = {}
        for gs in guidance_scales:
            per_gs[gs] = {
                "path_length_similarity": float(rng.uniform(0.2, 0.9)),
                "trajectory_mse": float(rng.uniform(1e-4, 5e-3)),
                "mean_directional_consistency": float(rng.uniform(-0.2, 0.8)),
                "distribution_similarity": float(rng.uniform(0.1, 0.95)),
            }
        out[sf] = {"teacher_metrics": per_gs, "student_metrics": per_gs}
    return out


import pytest


@pytest.mark.slow
def test_cfg_sweep_cli_end_to_end(tmp_path, monkeypatch):
    """The flagship CLI main(): checkpoints -> sweep engine -> artifacts."""
    import jax

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.models import make_unet, init_unet
    from distillation_trajectories_tpu.training import save_checkpoint

    cfg = Config(
        dataset="MNIST", image_size=16, channels=1, batch_size=8,
        sample_steps=8, timesteps=8, compute_dtype="float32",
        base_dir=str(tmp_path),
    )
    cfg.create_directories()
    teacher = make_unet(cfg, size_factor=1.0)
    tvars = init_unet(teacher, cfg, jax.random.PRNGKey(0))
    save_checkpoint(cfg.teacher_models_dir, 1, tvars["params"],
                    batch_stats=tvars["batch_stats"])
    student = make_unet(cfg, size_factor=0.25)
    svars = init_unet(student, cfg, jax.random.PRNGKey(1))
    save_checkpoint(cfg.student_dir(0.25), 1, svars["params"],
                    batch_stats=svars["batch_stats"])

    out_dir = tmp_path / "heatmaps"
    monkeypatch.setattr(sys, "argv", [
        "analyze_trajectory_metrics.py",
        "--size_factors", "0.25",
        "--guidance_scales", "1.0,3.0",
        "--timesteps", "8",
        "--num_samples", "2",
        "--dataset", "MNIST",
        "--image_size", "16",
        "--num_channels", "1",
        "--base_dir", str(tmp_path),
        "--output_dir", str(out_dir),
    ])
    _load_cli().main()
    for name in ("cfg_heatmap_combined.png", "radar_plots_gs_1.0.png"):
        assert os.path.exists(os.path.join(str(out_dir), name)), name


def test_cfg_sweep_plot_contract(tmp_path):
    cli = _load_cli()
    rng = np.random.default_rng(0)
    size_factors = [0.1, 0.5]
    guidance_scales = [1.0, 3.0]
    metrics_by_size = _fake_metrics_by_size(size_factors, guidance_scales, rng)
    out = str(tmp_path)

    cli.visualize_cfg_heatmap(metrics_by_size, out, guidance_scales)
    cli.create_radar_plot_grid(metrics_by_size, out, guidance_scales)
    cli.create_composite_radar_plot(metrics_by_size, out, guidance_scales)

    expected = [
        "cfg_heatmap_path_length_similarity.png",
        "cfg_heatmap_trajectory_mse.png",
        "cfg_heatmap_mean_directional_consistency.png",
        "cfg_heatmap_distribution_similarity.png",
        "cfg_heatmap_combined.png",
        "radar_plots_gs_1.0.png",
        "radar_plots_gs_3.0.png",
        "composite_radar_plot_gs_1.0.png",
        "composite_radar_plot_gs_3.0.png",
    ]
    for name in expected:
        path = os.path.join(out, name)
        assert os.path.exists(path), name
        assert os.path.getsize(path) > 1024, name


@pytest.mark.slow
def test_cfg_sweep_cli_jobs_mode(tmp_path, monkeypatch, capsys):
    """--jobs: two sweep configurations (different T/output dirs) in one
    process produce both artifact sets + per-job marginal timing lines."""
    import jax

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.models import make_unet, init_unet
    from distillation_trajectories_tpu.training import save_checkpoint

    cfg = Config(
        dataset="MNIST", image_size=16, channels=1, batch_size=8,
        sample_steps=8, timesteps=8, compute_dtype="float32",
        base_dir=str(tmp_path),
    )
    cfg.create_directories()
    teacher = make_unet(cfg, size_factor=1.0)
    tvars = init_unet(teacher, cfg, jax.random.PRNGKey(0))
    save_checkpoint(cfg.teacher_models_dir, 1, tvars["params"],
                    batch_stats=tvars["batch_stats"])
    student = make_unet(cfg, size_factor=0.25)
    svars = init_unet(student, cfg, jax.random.PRNGKey(1))
    save_checkpoint(cfg.student_dir(0.25), 1, svars["params"],
                    batch_stats=svars["batch_stats"])

    import json

    jobs = [
        {"output_dir": str(tmp_path / "heatmaps")},
        {"timesteps": 6, "output_dir": str(tmp_path / "trio")},
    ]
    monkeypatch.setattr(sys, "argv", [
        "analyze_trajectory_metrics.py",
        "--size_factors", "0.25",
        "--guidance_scales", "1.0,3.0",
        "--timesteps", "8",
        "--num_samples", "2",
        "--dataset", "MNIST",
        "--image_size", "16",
        "--num_channels", "1",
        "--base_dir", str(tmp_path),
        "--jobs", json.dumps(jobs),
    ])
    _load_cli().main()
    for d in ("heatmaps", "trio"):
        for name in ("cfg_heatmap_combined.png", "radar_plots_gs_1.0.png"):
            assert os.path.exists(str(tmp_path / d / name)), (d, name)
    out = capsys.readouterr().out
    assert "[jobs] job 0 (heatmaps): marginal" in out
    assert "[jobs] job 1 (trio): marginal" in out

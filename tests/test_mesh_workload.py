"""End-to-end mesh/placement workload through the PRODUCT CLIs (VERDICT r2
item 5): teacher ``--mesh 4,2`` → students ``--sweep_parallel`` → CFG
metric sweep ``--mesh 4,2`` (sharded samples), all on the virtual 8-device
CPU mesh — proving the three stages COMPOSE under SPMD through the same
argv entry points users run, not just per-stage units."""

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "scripts", "analysis")
)


@pytest.mark.slow
def test_full_workload_through_mesh_clis(tmp_path, monkeypatch):
    base = str(tmp_path)
    tiny = [
        "--dataset", "MNIST",
        "--epochs", "1",
        "--timesteps", "8",
        "--image_size", "16",
        "--batch_size", "8",
        "--limit_batches", "2",
        "--num_samples", "0",
        "--base_dir", base,
    ]

    train_teacher_cli = importlib.import_module("train_teacher")
    monkeypatch.setattr(
        sys, "argv", ["train_teacher.py", "--mesh", "4,2", *tiny]
    )
    train_teacher_cli.main()
    assert os.path.exists(
        os.path.join(base, "output", "models", "teacher", "model_epoch_1.msgpack")
    )

    train_students_cli = importlib.import_module("train_students")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "train_students.py",
            "--custom_size_factors", "0.25,0.5",
            "--sweep_parallel",
            *tiny,
        ],
    )
    train_students_cli.main()
    for sf in ("0.25", "0.5"):
        assert os.path.exists(
            os.path.join(
                base, "output", "models", "students", f"size_{sf}",
                "model_epoch_1.msgpack",
            )
        )

    # CFG metric sweep with the sample axis sharded over the data mesh axis
    # (8 samples over data=4).  The sweep CLI reads checkpoints from
    # --base_dir and writes heatmap/radar artifacts to --output_dir.
    out_dir = os.path.join(base, "heatmaps")
    atm = importlib.import_module("analyze_trajectory_metrics")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "analyze_trajectory_metrics.py",
            "--mesh", "4,2",
            "--size_factors", "0.25,0.5",
            "--guidance_scales", "1.0,3.0",
            "--timesteps", "8",
            "--num_samples", "8",
            "--image_size", "16",
            "--num_channels", "3",
            "--base_dir", base,
            "--output_dir", out_dir,
        ],
    )
    atm.main()
    for artifact in (
        "cfg_heatmap_combined.png",
        "cfg_heatmap_trajectory_mse.png",
        "radar_plots_gs_1.0.png",
        "composite_radar_plot_gs_3.0.png",
    ):
        path = os.path.join(out_dir, artifact)
        assert os.path.exists(path), artifact
        assert os.path.getsize(path) > 1024, artifact

"""Config contract tests: field defaults and directory tree
(reference config/config.py:5-140)."""

import os

from distillation_trajectories_tpu import Config


def test_default_fields(tmp_path):
    cfg = Config(base_dir=str(tmp_path))
    # Reference defaults (config/config.py:9-34)
    assert cfg.dataset == "CIFAR10"
    assert cfg.image_size == 32
    assert cfg.channels == 3
    assert cfg.batch_size == 128
    assert cfg.latent_dim == 128
    assert cfg.hidden_dims == [128, 256, 256, 256]
    assert cfg.dropout == 0.3
    assert cfg.sample_steps == 100
    assert cfg.timesteps == 100
    assert cfg.beta_start == 1e-4
    assert cfg.beta_end == 0.02
    assert cfg.epochs == 10
    assert cfg.lr == 1e-4
    assert cfg.save_interval == 1
    assert cfg.ema_rate == 0.9999
    assert cfg.student_size_factors == [
        0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0
    ]
    assert cfg.teacher_steps == cfg.timesteps
    assert cfg.student_steps == cfg.timesteps
    assert cfg.num_samples_to_generate == 16
    assert cfg.samples_grid_size == 4


def test_directory_contract(tmp_path):
    cfg = Config(base_dir=str(tmp_path))
    cfg.create_directories()
    # Reference directory tree (config/config.py:37-65, :97-140)
    expected = [
        "output",
        "output/results",
        "output/models",
        "output/models/teacher",
        "output/models/students",
        "data",
        "data/trajectories",
        "output/analysis",
        "output/analysis/metrics",
        "output/analysis/model_comparisons",
        "output/analysis/time_dependent",
        "output/analysis/size_dependent",
        "output/analysis/dimensionality",
        "output/analysis/latent_space",
        "output/analysis/attention",
        "output/analysis/noise_prediction",
        "output/analysis/denoising",
        "output/analysis/fid",
    ]
    for rel in expected:
        assert os.path.isdir(tmp_path / rel), rel
    for sf in cfg.student_size_factors:
        assert os.path.isdir(tmp_path / f"output/models/students/size_{sf}")


def test_student_dir_naming(tmp_path):
    cfg = Config(base_dir=str(tmp_path))
    assert cfg.student_dir(0.5).endswith("students/size_0.5")


def test_timestep_override_propagates(tmp_path):
    cfg = Config(base_dir=str(tmp_path), timesteps=50)
    assert cfg.teacher_steps == 50
    assert cfg.student_steps == 50

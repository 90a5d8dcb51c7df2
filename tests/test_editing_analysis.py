"""Smoke tests for editing, analysis, and observability modules."""

import os

import jax
import numpy as np
import pytest

from distillation_trajectories_tpu.models import make_unet, init_unet


@pytest.fixture(scope="module")
def small_model():
    from distillation_trajectories_tpu import Config

    cfg = Config(
        dataset="MNIST",
        image_size=16,
        channels=1,
        batch_size=4,
        sample_steps=6,
        timesteps=6,
        compute_dtype="float32",
        base_dir="/tmp/test_editing",
    )
    cfg.create_directories()
    model = make_unet(cfg, size_factor=0.1)
    variables = init_unet(model, cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


def test_masked_inpainting(small_model, tmp_path):
    from distillation_trajectories_tpu.editing import (
        apply_masked_inpainting,
        create_random_mask,
        visualize_inpainting,
    )

    cfg, model, variables = small_model
    original = np.random.default_rng(0).uniform(0, 1, (16, 16, 1)).astype(
        np.float32
    )
    mask = create_random_mask(16, 16, rng=np.random.default_rng(1))
    result = apply_masked_inpainting(
        model, cfg, original, mask=mask, variables=variables, seed=0
    )
    assert result["inpainted_image"].shape == (1, 16, 16, 1)
    # unmasked region preserved exactly (mask reimposition semantics)
    m = result["mask"][0]
    inpainted = result["inpainted_image"][0]
    np.testing.assert_allclose(
        inpainted[m[..., 0] == 0], original[m[..., 0] == 0], atol=1e-5
    )
    assert "trajectory" in result
    visualize_inpainting(result, str(tmp_path))
    assert os.path.exists(tmp_path / "inpainting.png")


def test_latent_manipulation_and_directions(small_model, tmp_path):
    from distillation_trajectories_tpu.editing import (
        apply_latent_manipulation,
        find_semantic_directions,
        visualize_latent_manipulation,
    )

    cfg, model, variables = small_model
    result = apply_latent_manipulation(
        model, cfg, strength=2.0, variables=variables, seed=0
    )
    assert result["manipulated_image"].shape == (1, 16, 16, 1)
    assert not np.allclose(
        result["original_image"], result["manipulated_image"]
    )
    visualize_latent_manipulation(result, str(tmp_path))

    directions = find_semantic_directions(
        model, cfg, variables=variables, num_samples=12
    )
    assert len(directions) == 10
    assert directions["pca_0"].shape == (16 * 16 * 1,)


def test_prompt_editing(small_model, tmp_path):
    from distillation_trajectories_tpu.editing import (
        apply_prompt_editing,
        visualize_prompt_editing,
    )

    cfg, model, variables = small_model
    result = apply_prompt_editing(
        model, cfg, "a", "b", variables=variables, seed=3
    )
    assert not np.allclose(result["original_image"], result["edited_image"])
    visualize_prompt_editing(result, str(tmp_path))
    assert os.path.exists(tmp_path / "prompt_editing.png")


def test_dimensionality_and_latent_space(small_model):
    from distillation_trajectories_tpu.analysis import (
        dimensionality_reduction_analysis,
        generate_latent_space_visualization,
    )

    cfg, model, variables = small_model
    rng = np.random.default_rng(0)
    trajs = [rng.standard_normal((7, 16, 16, 1)).astype(np.float32)
             for _ in range(2)]
    out = dimensionality_reduction_analysis(trajs, trajs, cfg, size_factor=0.1)
    assert os.path.isdir(out)
    assert os.path.exists(
        os.path.join(out, "trajectory_0", "pca_trajectory.png")
    )
    # UMAP artifact exists even without umap-learn (numpy fallback)
    assert os.path.exists(
        os.path.join(out, "trajectory_0", "umap_trajectory.png")
    )
    out2 = generate_latent_space_visualization(
        trajs[0], trajs[1], cfg, size_factor=0.1
    )
    assert os.path.exists(os.path.join(out2, "3d_latent_space.png"))


def test_umap_fallback_separates_clusters():
    """The numpy UMAP fallback keeps well-separated clusters separated."""
    from distillation_trajectories_tpu.analysis.dimensionality import (
        umap_fallback_embedding,
    )

    rng = np.random.default_rng(0)
    a = rng.normal(0.0, 0.05, (30, 20))
    b = rng.normal(5.0, 0.05, (30, 20))
    emb = umap_fallback_embedding(np.vstack([a, b]), n_neighbors=10)
    assert emb.shape == (60, 2)
    assert np.isfinite(emb).all()
    # every point sits nearer its own cluster centroid than the other's
    ca, cb = emb[:30].mean(axis=0), emb[30:].mean(axis=0)
    da = np.linalg.norm(emb - ca, axis=1)
    db = np.linalg.norm(emb - cb, axis=1)
    assert (da[:30] < db[:30]).all() and (db[30:] < da[30:]).all()
    assert np.linalg.norm(ca - cb) > max(emb[:30].std(), emb[30:].std())


def test_noise_prediction_analysis(small_model):
    from distillation_trajectories_tpu.analysis import analyze_noise_prediction

    cfg, model, variables = small_model
    samples = np.random.default_rng(0).uniform(-1, 1, (4, 16, 16, 1)).astype(
        np.float32
    )
    results = analyze_noise_prediction(
        model, model, cfg, size_factor=0.1, fixed_samples=samples,
        teacher_variables=variables, student_variables=variables,
        n_timesteps=3,
    )
    # identical models ⇒ zero error, cosine 1
    assert results["avg_mse"] < 1e-10
    np.testing.assert_allclose(results["avg_cosine_similarity"], 1.0, rtol=1e-5)


def test_time_dependent_and_viz(small_model):
    from distillation_trajectories_tpu.analysis import (
        plot_time_dependent_grid,
        plot_time_dependent_combined,
        plot_trajectory_divergence_vs_timestep,
        generate_3d_model_size_visualization,
    )
    from distillation_trajectories_tpu.metrics import (
        analyze_time_dependent_distances,
    )

    cfg, _, _ = small_model
    rng = np.random.default_rng(0)
    trajs = [rng.standard_normal((7, 16, 16, 1)).astype(np.float32)
             for _ in range(2)]
    results = analyze_time_dependent_distances(
        trajs, trajs, cfg, size_factor=0.5, save_dir=cfg.time_dependent_dir
    )
    assert len(results["teacher_avg_per_timestep"]) == 6
    assert results["teacher_avg_distance"] > 0
    td = {0.5: results, 1.0: results}
    plot_time_dependent_grid(td, cfg)
    plot_time_dependent_combined(td, cfg)
    assert os.path.exists(
        os.path.join(cfg.time_dependent_dir, "time_dependent_grid.png")
    )
    metrics = {
        0.5: {"wasserstein_distances_per_timestep": [[0.1] * 7, [0.2] * 7]},
        1.0: {"wasserstein_distances_per_timestep": [[0.05] * 7]},
    }
    plot_trajectory_divergence_vs_timestep(metrics, cfg)
    out = generate_3d_model_size_visualization(metrics, cfg)
    assert out["status"] == "ok"


def test_evaluation_trajectory_divergence():
    from distillation_trajectories_tpu.metrics import (
        compute_trajectory_divergence,
    )

    rng = np.random.default_rng(0)
    t1 = rng.standard_normal((6, 8, 8, 1)).astype(np.float32)
    out = compute_trajectory_divergence(t1, t1)
    np.testing.assert_allclose(out["avg_distance"], 0.0, atol=1e-6)
    np.testing.assert_allclose(out["avg_similarity"], 1.0, rtol=1e-5)
    np.testing.assert_allclose(out["length_ratio"], 1.0, rtol=1e-6)


def test_profiling_utils(tmp_path):
    from distillation_trajectories_tpu.utils import (
        MetricsLogger,
        dump_phase_times,
        phase_timer,
        phase_times,
        reset_phase_times,
    )

    reset_phase_times()
    with phase_timer("unit"):
        pass
    assert phase_times()["unit"]["count"] == 1
    dump_phase_times(str(tmp_path / "times.json"))
    assert (tmp_path / "times.json").exists()

    logger = MetricsLogger(str(tmp_path / "metrics.jsonl"))
    logger.log("train_step", loss=0.5, epoch=1)
    logger.close()
    import json

    rec = json.loads((tmp_path / "metrics.jsonl").read_text().strip())
    assert rec["event"] == "train_step" and rec["loss"] == 0.5


def test_metric_visualization_contract(small_model, tmp_path):
    """visualize_metrics works on raw compute output (the reference's own
    pipeline raised KeyError here) and writes the summary contract."""
    from distillation_trajectories_tpu.metrics import (
        compute_trajectory_metrics,
        visualize_metrics,
    )

    rng = np.random.default_rng(0)
    t1 = rng.standard_normal((7, 16, 16, 1)).astype(np.float32)
    t2 = t1 + 0.05 * rng.standard_normal((7, 16, 16, 1)).astype(np.float32)
    m = compute_trajectory_metrics(t1, t2)
    visualize_metrics(m, str(tmp_path), size_factor=0.3)
    summary = (tmp_path / "summary.txt").read_text()
    for field in (
        "Endpoint Distance:",
        "Path Length Ratio (Student/Teacher):",
        "Mean Wasserstein Distance:",
        "Teacher Path Length:",
    ):
        assert field in summary, field


def test_batch_metric_summary_golden(small_model, tmp_path):
    """visualize_batch_metrics writes the reference's summary field names in
    order (trajectory_metrics.py:678-708 contract)."""
    from distillation_trajectories_tpu.metrics import visualize_batch_metrics

    cfg, _, _ = small_model
    batch = {
        "wasserstein_distances": [0.1, 0.2],
        "endpoint_distances": [1.0, 2.0],
        "teacher_path_lengths": [2.0, 2.2],
        "student_path_lengths": [1.8, 2.0],
        "teacher_efficiency": [0.2, 0.25],
        "student_efficiency": [0.15, 0.2],
        "path_length_similarity_avg": 0.6,
        "efficiency_similarity_avg": 0.55,
        "mean_velocity_similarity_avg": 0.8,
        "mean_directional_consistency_avg": 0.7,
        "mean_position_difference_avg": 3.0,
        "distribution_similarity_avg": 0.5,
        "wasserstein_distances_per_timestep": [[0.1] * 5, [0.2] * 5],
    }
    summary = visualize_batch_metrics(
        batch, cfg, size_factor=0.5, output_dir=str(tmp_path)
    )
    text = (tmp_path / "summary_size_0.5.txt").read_text()
    lines = [l.split(":")[0] for l in text.splitlines() if ":" in l]
    assert lines == [
        "Size Factor",
        "Mean Endpoint Distance",
        "Mean Path Length Ratio (Student/Teacher)",
        "Mean Teacher Path Length",
        "Mean Student Path Length",
        "Mean Efficiency Ratio (Student/Teacher)",
        "Mean Teacher Efficiency",
        "Mean Student Efficiency",
        "Mean Wasserstein Distance",
        "Path Length Similarity",
        "Efficiency Similarity",
        "Mean Velocity Similarity",
        "Mean Directional Consistency",
        "Mean Position Difference",
        "Distribution Similarity",
    ]
    assert summary["path_length_ratio"] == (1.9 / 2.1)

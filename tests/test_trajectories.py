"""Trajectory engine + manager tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from distillation_trajectories_tpu.models import make_unet, init_unet
from distillation_trajectories_tpu.trajectories import (
    generate_trajectory,
    compare_trajectories,
    TrajectoryManager,
    generate_trajectories_with_disk_storage,
)


def _models(test_config):
    teacher = make_unet(test_config, size_factor=0.2)
    t_vars = init_unet(teacher, test_config, jax.random.PRNGKey(0))
    student = make_unet(test_config, size_factor=0.1)
    s_vars = init_unet(student, test_config, jax.random.PRNGKey(1))
    return teacher, t_vars, student, s_vars


def test_generate_trajectory_shape(test_config):
    teacher, t_vars, _, _ = _models(test_config)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 1))
    traj = generate_trajectory(
        teacher, t_vars, noise, test_config.timesteps, seed=3, config=test_config
    )
    assert traj.shape == (test_config.timesteps + 1, 1, 16, 16, 1)
    # no-op final step duplicated
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(traj[-2]))


def test_compare_trajectories_contract(test_config):
    teacher, t_vars, student, s_vars = _models(test_config)
    out = compare_trajectories(
        teacher,
        student,
        test_config,
        guidance_scales=[1.0, 3.0],
        num_samples=2,
        teacher_variables=t_vars,
        student_variables=s_vars,
    )
    assert set(out.keys()) == {"teacher_metrics", "student_metrics"}
    for gs in (1.0, 3.0):
        metrics = out["teacher_metrics"][gs]
        for k in (
            "endpoint_distance",
            "path_length_similarity",
            "trajectory_mse",
            "mean_directional_consistency",
            "distribution_similarity",
            "mean_wasserstein",
        ):
            assert k in metrics and np.isfinite(metrics[k]), k
    # CFG at gs=3 must differ from gs=1
    assert (
        out["teacher_metrics"][1.0]["endpoint_distance"]
        != out["teacher_metrics"][3.0]["endpoint_distance"]
    )


def test_manager_roundtrip_and_batch_metrics(test_config):
    teacher, t_vars, student, s_vars = _models(test_config)
    manager = TrajectoryManager(
        teacher,
        student,
        test_config,
        size_factor=0.1,
        teacher_variables=t_vars,
        student_variables=s_vars,
    )
    paths = manager.generate_and_save_trajectories(num_samples=3)
    assert len(paths) == 3
    assert all(os.path.exists(p) for p in paths)
    assert "trajectory_size_0.1_sample_0" in paths[0]

    pairs = manager.load_trajectories()
    assert len(pairs) == 3
    t0, s0 = pairs[0]
    assert t0.shape == (test_config.teacher_steps + 1, 16, 16, 1)

    batch = manager.compute_trajectory_metrics_batch()
    assert len(batch["endpoint_distances"]) == 3
    assert "mean_directional_consistency_avg" in batch
    assert np.isfinite(batch["wasserstein_distances_avg"])

    # cache-aware front door skips regeneration
    m2 = generate_trajectories_with_disk_storage(
        teacher,
        student,
        test_config,
        size_factor=0.1,
        num_samples=3,
        teacher_variables=t_vars,
        student_variables=s_vars,
    )
    assert len(m2.load_trajectories()) == 3


def test_trajectory_seed_parity_between_models(test_config):
    """Teacher/student chains share identical per-step noise for same seed:
    with the same model both trajectories must be bitwise identical."""
    teacher, t_vars, _, _ = _models(test_config)
    manager = TrajectoryManager(
        teacher,
        teacher,
        test_config,
        size_factor=1.0,
        teacher_variables=t_vars,
        student_variables=t_vars,
    )
    t_traj, s_traj = manager.generate_trajectory(seed=5)
    np.testing.assert_array_equal(t_traj, s_traj)

"""Progressive step-halving distillation (training/progressive.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distillation_trajectories_tpu.diffusion import (
    generate_trajectory_scan,
    get_diffusion_params,
)
from distillation_trajectories_tpu.models import make_unet, init_unet


def test_eps_target_closed_form(test_config):
    """The analytic ε̂* really lands the student's engine update on the
    teacher's two-step composition: with a teacher that predicts a constant
    ε, composing two engine updates and solving for ε* then applying the
    student update reproduces x_target exactly."""
    from distillation_trajectories_tpu.training.progressive import _engine_c

    T, S = 10, 5
    dp_t = get_diffusion_params(T, test_config)
    dp_s = get_diffusion_params(S, test_config)
    a_t = np.asarray(dp_t["alphas"])
    a_s = np.asarray(dp_s["alphas"])
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)

    j = 2
    t = 2 * j
    c1a, c2a = _engine_c(jnp.float32(a_t[t]), jnp.float32(a_t[t - 1]))
    x_mid = float(c1a) * x - float(c2a) * eps
    c1b, c2b = _engine_c(jnp.float32(a_t[t - 1]), jnp.float32(a_t[t - 2]))
    x_target = float(c1b) * x_mid - float(c2b) * eps

    c1s, c2s = _engine_c(jnp.float32(a_s[j]), jnp.float32(a_s[j - 1]))
    eps_star = (float(c1s) * x - x_target) / float(c2s)
    x_student = float(c1s) * x - float(c2s) * eps_star
    np.testing.assert_allclose(x_student, x_target, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_progressive_distill_round(test_config):
    """One halving round on a tiny teacher: runs through the real trainer,
    writes the steps_{n} checkpoint, halves the step count, and the
    resulting model samples finitely at its new step count with the engine
    sampler (the schedule it was trained against)."""
    import os

    from distillation_trajectories_tpu.training import progressive_distill
    from distillation_trajectories_tpu.training.state import make_eval_model_fn

    test_config.teacher_steps = 8
    test_config.limit_batches_per_epoch = 2
    test_config.create_directories()
    teacher = make_unet(test_config, size_factor=0.25)
    teacher_vars = init_unet(teacher, test_config, jax.random.PRNGKey(0))

    model, variables, steps = progressive_distill(
        test_config, teacher, teacher_vars, rounds=1, seed=0,
        epochs_per_round=1,
    )
    assert steps == 4
    assert os.path.exists(
        os.path.join(
            test_config.models_dir, "progressive", "steps_4",
            "model_epoch_1.msgpack",
        )
    )
    # Teacher variables survived state donation (they seed the student init).
    for leaf in jax.tree_util.tree_leaves(teacher_vars):
        assert np.isfinite(np.asarray(leaf)).all()

    dp = get_diffusion_params(steps, test_config)
    traj = generate_trajectory_scan(
        make_eval_model_fn(model, variables),
        jnp.zeros((1, 16, 16, 1)),
        steps,
        dp["alphas"],
        seed=0,
    )
    assert traj.shape == (steps + 1, 1, 16, 16, 1)
    assert np.isfinite(np.asarray(traj)).all()

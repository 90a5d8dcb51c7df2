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


def test_guided_target_is_cfg_combine(test_config):
    """Guided distillation's regression target composes two CFG-combined
    teacher steps: with a teacher whose cond/uncond predictions are known
    constants, the analytic ε̂* applied through the student's single engine
    update lands exactly on the w-weighted two-step composition."""
    from distillation_trajectories_tpu.training.progressive import _engine_c

    T, S = 10, 5
    dp_t = get_diffusion_params(T, test_config)
    dp_s = get_diffusion_params(S, test_config)
    a_t = np.asarray(dp_t["alphas"])
    a_s = np.asarray(dp_s["alphas"])
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    eps_u = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    eps_c = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    w = 3.5
    eps_w = eps_u + w * (eps_c - eps_u)

    j = 2
    t = 2 * j
    c1a, c2a = _engine_c(jnp.float32(a_t[t]), jnp.float32(a_t[t - 1]))
    x_mid = float(c1a) * x - float(c2a) * eps_w
    c1b, c2b = _engine_c(jnp.float32(a_t[t - 1]), jnp.float32(a_t[t - 2]))
    x_target = float(c1b) * x_mid - float(c2b) * eps_w

    c1s, c2s = _engine_c(jnp.float32(a_s[j]), jnp.float32(a_s[j - 1]))
    eps_star = (float(c1s) * x - x_target) / float(c2s)
    x_student = float(c1s) * x - float(c2s) * eps_star
    np.testing.assert_allclose(x_student, x_target, rtol=1e-5, atol=1e-6)


def test_make_guided_eval_fn_feeds_w(test_config):
    """The guided wrapper ignores the sampler's cond/mask inputs and feeds
    (w, 1) to the model — identical to calling the model with cond=w
    directly, and different from the no-CFG (0, 0) path."""
    from distillation_trajectories_tpu.training import make_guided_eval_fn
    from distillation_trajectories_tpu.training.state import make_eval_model_fn

    model = make_unet(test_config, size_factor=0.25)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))
    base = make_eval_model_fn(model, variables)
    guided = make_guided_eval_fn(model, variables, guidance_value=4.0)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    t = jnp.full((2,), 3.0)
    zeros = jnp.zeros((2, 1))
    ones = jnp.ones((2, 1))
    out_guided = guided(x, t, zeros, zeros)  # sampler passes (0, 0)
    out_direct = base(x, t, jnp.full((2, 1), 4.0), ones)
    np.testing.assert_allclose(
        np.asarray(out_guided), np.asarray(out_direct), rtol=1e-6
    )
    out_nocfg = base(x, t, zeros, zeros)
    assert not np.allclose(np.asarray(out_guided), np.asarray(out_nocfg))


@pytest.mark.slow
def test_guided_progressive_round(test_config):
    """One GUIDED halving round end-to-end: trains through the real trainer
    with w ~ U[1, 5], writes under progressive_cfg/, and the w-conditioned
    student samples finitely in a single guided forward per step."""
    import os

    from distillation_trajectories_tpu.training import (
        make_guided_eval_fn,
        progressive_distill,
    )

    test_config.teacher_steps = 8
    test_config.limit_batches_per_epoch = 2
    test_config.create_directories()
    teacher = make_unet(test_config, size_factor=0.25)
    teacher_vars = init_unet(teacher, test_config, jax.random.PRNGKey(0))

    model, variables, steps = progressive_distill(
        test_config, teacher, teacher_vars, rounds=1, seed=0,
        epochs_per_round=1, guidance_range=(1.0, 5.0),
    )
    assert steps == 4
    assert os.path.exists(
        os.path.join(
            test_config.models_dir, "progressive_cfg", "steps_4",
            "model_epoch_1.msgpack",
        )
    )
    dp = get_diffusion_params(steps, test_config)
    traj = generate_trajectory_scan(
        make_guided_eval_fn(model, variables, guidance_value=3.0),
        jnp.zeros((1, 16, 16, 1)),
        steps,
        dp["alphas"],
        seed=0,
        guidance_scale=None,  # single forward per step: w rides as cond
    )
    assert traj.shape == (steps + 1, 1, 16, 16, 1)
    assert np.isfinite(np.asarray(traj)).all()

    # Measure-only round-trip contract (scripts/bench_progressive.py
    # --measure_only): the progressive_cfg/steps_{S} checkpoint reloads to
    # exactly the variables the trainer returned.
    from distillation_trajectories_tpu.training import (
        load_checkpoint,
        variables_from_checkpoint,
    )

    reloaded = variables_from_checkpoint(
        load_checkpoint(
            os.path.join(test_config.models_dir, "progressive_cfg", "steps_4")
        )
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        reloaded["params"],
        variables["params"],
    )


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


def test_bench_fast_cli_contract(test_config, tmp_path, monkeypatch):
    """scripts/bench_fast.py (the composed student×quant lane) end-to-end
    on CPU at tiny scale: JSON record contract, all four student arms."""
    import json
    import os
    import runpy
    import sys

    from distillation_trajectories_tpu.training import save_checkpoint

    # Tiny teacher + w-conditioned student checkpoints under a tmp root.
    test_config.create_directories()
    model = make_unet(test_config, size_factor=0.05)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))
    save_checkpoint(test_config.teacher_models_dir, 1,
                    variables["params"], variables.get("batch_stats"))
    sdir = os.path.join(test_config.models_dir, "progressive_cfg", "steps_2")
    save_checkpoint(sdir, 1, variables["params"],
                    variables.get("batch_stats"))

    out = tmp_path / "bench_fast.json"
    monkeypatch.setattr(sys, "argv", [
        "bench_fast.py", "--batch", "2", "--iters", "1",
        "--teacher_steps", "4", "--student_steps", "2",
        "--size_factor", "0.05", "--base_dir", test_config.base_dir,
        "--image_size", str(test_config.image_size),
        "--channels", str(test_config.channels),
        "--w_sweep", "1.0,3.0", "--fid_samples", "4",
        "--out", str(out),
    ])
    monkeypatch.syspath_prepend("scripts")
    runpy.run_path("scripts/bench_fast.py", run_name="__main__")
    rec = json.loads(out.read_text())
    for key in ("teacher_traj_per_s", "best_arm", "best_traj_per_s",
                "best_speedup", "arms", "preflight", "w_sweep_best_arm",
                "fid_teacher_vs_best"):
        assert key in rec, key
    for arm in ("teacher_cfg_bf16", "student_bf16", "student_int8",
                "student_int8_static", "student_int8_static_mixed"):
        assert arm in rec["arms"], arm
    for name, arm in rec["arms"].items():
        assert arm["traj_per_s"] > 0, name
        if name.startswith("student_"):
            assert np.isfinite(arm["endpoint_mse_vs_teacher"]), name
    assert rec["best_arm"].startswith("student_")

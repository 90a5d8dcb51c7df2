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


def test_sweep_matches_paired_path(test_config):
    """sweep_compare_trajectories (teacher cached once, student-only graphs)
    reproduces the paired-scan path's metrics for every (size, scale)."""
    from distillation_trajectories_tpu.trajectories import (
        sweep_compare_trajectories,
    )
    from distillation_trajectories_tpu.trajectories.engine import (
        make_paired_trajectory_fn,
        _batch_metrics,
    )

    teacher, t_vars, student, s_vars = _models(test_config)
    gs_list = [1.0, 3.0]
    num_samples = 2
    out = sweep_compare_trajectories(
        teacher,
        t_vars,
        {0.1: (student, s_vars)},
        test_config,
        guidance_scales=gs_list,
        num_samples=num_samples,
        verbose=False,
    )[0.1]

    # Manual per-size reference computation via the paired scan.
    seeds = np.array([42 + i for i in range(num_samples)], dtype=np.int32)
    noises = jnp.stack(
        [
            jax.random.normal(jax.random.PRNGKey(int(s)), (16, 16, 1))
            for s in seeds
        ]
    )
    keys = jax.random.split(jax.random.PRNGKey(42), num_samples)
    for gs in gs_list:
        pair_fn = make_paired_trajectory_fn(
            teacher, t_vars, student, s_vars,
            test_config.timesteps, test_config, use_cfg=gs > 1.0,
        )
        t_trajs, s_trajs = pair_fn(noises, jnp.asarray(seeds), jnp.float32(gs))
        expected = {
            k: float(np.mean(np.asarray(v)))
            for k, v in _batch_metrics(t_trajs, s_trajs, keys).items()
            if np.asarray(v).ndim == 1
        }
        for k, v in expected.items():
            np.testing.assert_allclose(
                out["student_metrics"][gs][k], v, rtol=1e-5, atol=1e-6,
                err_msg=f"gs={gs} metric={k}",
            )


def test_batch_scan_matches_per_sample_scan(test_config):
    """The unified sweep sampler (samples on the model batch axis, CFG via
    runtime cond_pairs) reproduces the per-sample generate_trajectory_scan
    for both CFG and no-CFG, and its no-CFG output is invariant to the
    guidance-scale argument (preds[1] == preds[0] makes the combine exact)."""
    from distillation_trajectories_tpu.diffusion import (
        CFG_COND_PAIRS,
        NOCFG_COND_PAIRS,
        generate_trajectory_batch_scan,
        generate_trajectory_scan,
        get_diffusion_params,
    )
    from distillation_trajectories_tpu.training.state import make_eval_model_fn

    teacher, t_vars, _, _ = _models(test_config)
    model_fn = make_eval_model_fn(teacher, t_vars)
    dp = get_diffusion_params(test_config.timesteps, test_config)
    seeds = np.array([42, 43, 44], dtype=np.int32)
    noises = jnp.stack(
        [
            jax.random.normal(jax.random.PRNGKey(int(s)), (16, 16, 1))
            for s in seeds
        ]
    )

    for gs, pairs, use_cfg in (
        (3.0, CFG_COND_PAIRS, True),
        (1.0, NOCFG_COND_PAIRS, False),
    ):
        batched = generate_trajectory_batch_scan(
            model_fn, noises, test_config.timesteps, dp["alphas"],
            jnp.asarray(seeds), jnp.asarray(pairs), jnp.float32(gs),
        )
        for i, s in enumerate(seeds):
            ref = generate_trajectory_scan(
                model_fn, noises[i][None], test_config.timesteps,
                dp["alphas"], int(s), guidance_scale=gs, use_cfg=use_cfg,
            )[:, 0]
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(ref), rtol=2e-5, atol=2e-6,
                err_msg=f"gs={gs} sample={i}",
            )

    # no-CFG result must not depend on gs (one graph serves every scale).
    a = generate_trajectory_batch_scan(
        model_fn, noises, test_config.timesteps, dp["alphas"],
        jnp.asarray(seeds), jnp.asarray(NOCFG_COND_PAIRS), jnp.float32(1.0),
    )
    b = generate_trajectory_batch_scan(
        model_fn, noises, test_config.timesteps, dp["alphas"],
        jnp.asarray(seeds), jnp.asarray(NOCFG_COND_PAIRS), jnp.float32(17.5),
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sweep_output_contract(test_config):
    """Pins the sweep result contract: teacher_metrics/student_metrics carry
    equal VALUES (the reference stores the same pair metrics under both keys,
    trajectory_engine.py:162-164) but are independent dict objects, and the
    surviving scalar keys cover exactly what the heatmap/radar CLIs and
    transform_metrics consume."""
    from distillation_trajectories_tpu.trajectories import (
        sweep_compare_trajectories,
    )

    teacher, t_vars, student, s_vars = _models(test_config)
    out = sweep_compare_trajectories(
        teacher,
        t_vars,
        {0.1: (student, s_vars)},
        test_config,
        guidance_scales=[3.0],
        num_samples=2,
        verbose=False,
    )[0.1]
    tm, sm = out["teacher_metrics"], out["student_metrics"]
    assert tm == sm  # value equality (reference quirk preserved)
    assert tm is not sm and tm[3.0] is not sm[3.0]  # no aliasing
    tm[3.0]["endpoint_distance"] = -1.0
    assert sm[3.0]["endpoint_distance"] != -1.0  # mutation does not leak
    # Keys needed by scripts/analysis/analyze_trajectory_metrics.py
    # (transform_metrics inputs) must all survive the scalar-only filter.
    needed = {
        "path_length_similarity",
        "trajectory_mse",
        "mean_directional_consistency",
        "distribution_similarity",
    }
    assert needed <= set(sm[3.0].keys())
    # Vector metrics are intentionally dropped from sweep output.
    assert "teacher_velocities" not in sm[3.0]
    assert "wasserstein_distances" not in sm[3.0]


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


def test_sweep_multi_matches_single_jobs(test_config, monkeypatch):
    """sweep_compare_trajectories_multi: per-job results identical to the
    single-job path, teacher chains generated once per shared (T, gs) cell
    across jobs, and executables deduped across jobs by (model, vars, T)."""
    from distillation_trajectories_tpu.trajectories import (
        sweep_compare_trajectories,
        sweep_compare_trajectories_multi,
    )
    from distillation_trajectories_tpu.trajectories import engine

    teacher, t_vars, student, s_vars = _models(test_config)
    gs_list = [1.0, 3.0]

    calls = {"made": 0, "executed": 0}
    real_make = engine.make_sweep_trajectory_fn

    class _Counting:
        def __init__(self, fn):
            self._fn = fn

        def __call__(self, *a, **kw):
            calls["executed"] += 1
            return self._fn(*a, **kw)

        def lower(self, *a, **kw):
            return self._fn.lower(*a, **kw)

    def counting_make(model, variables, timesteps, config=None):
        calls["made"] += 1
        return _Counting(real_make(model, variables, timesteps, config))

    monkeypatch.setattr(engine, "make_sweep_trajectory_fn", counting_make)

    # Job 0 and job 1 share T (teacher chains + executables reused); job 2
    # runs at a different T (fresh executables, fresh chains).
    t_short = test_config.timesteps - 2
    jobs = [
        {"students": {0.1: (student, s_vars)},
         "guidance_scales": gs_list, "num_samples": 2},
        {"students": {0.2: (teacher, t_vars)},
         "guidance_scales": gs_list, "num_samples": 2},
        {"students": {0.1: (student, s_vars)},
         "guidance_scales": gs_list, "num_samples": 2,
         "timesteps": t_short},
    ]
    multi = sweep_compare_trajectories_multi(
        teacher, t_vars, jobs, test_config, verbose=False
    )
    # fns made: teacher@T, student@T, teacher-as-student@T (same (model,
    # vars, T) as teacher@T -> cached), teacher@t_short, student@t_short.
    assert calls["made"] == 4
    # executions: per gs — 1 teacher chain shared by jobs 0+1, 2 student
    # chains (job0 sf=0.1, job1 sf=0.2), then job2: 1 teacher + 1 student
    # at t_short.  Total per gs = 5; x2 scales = 10.  Without the cross-job
    # teacher cache this would be 12.
    assert calls["executed"] == 10

    monkeypatch.setattr(engine, "make_sweep_trajectory_fn", real_make)
    for job, got in zip(jobs, multi):
        cfg = test_config
        if job.get("timesteps"):
            import dataclasses

            cfg = dataclasses.replace(test_config, timesteps=job["timesteps"]) \
                if dataclasses.is_dataclass(test_config) else test_config
            if cfg is test_config:
                import copy

                cfg = copy.copy(test_config)
                cfg.timesteps = job["timesteps"]
        single = sweep_compare_trajectories(
            teacher, t_vars, job["students"], cfg,
            guidance_scales=job["guidance_scales"],
            num_samples=job["num_samples"], verbose=False,
        )
        for sf in job["students"]:
            for gs in job["guidance_scales"]:
                for k, v in single[sf]["student_metrics"][gs].items():
                    np.testing.assert_allclose(
                        got[sf]["student_metrics"][gs][k], v,
                        rtol=1e-5, atol=1e-6,
                        err_msg=f"sf={sf} gs={gs} {k}",
                    )

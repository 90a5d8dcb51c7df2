"""Training stack tests: teacher step, distillation step, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from distillation_trajectories_tpu.diffusion import get_diffusion_params
from distillation_trajectories_tpu.models import make_unet, init_unet
from distillation_trajectories_tpu.training import (
    create_train_state,
    make_optimizer,
    make_teacher_train_step,
    make_distill_train_step,
    save_checkpoint,
    load_checkpoint,
    latest_epoch,
    available_epochs,
    variables_from_checkpoint,
)


def _setup(test_config, sf=0.1):
    model = make_unet(test_config, size_factor=sf)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))
    tx = make_optimizer(test_config)
    state = create_train_state(model, variables, tx)
    return model, variables, tx, state


def test_teacher_train_step_decreases_loss(test_config):
    model, variables, tx, state = _setup(test_config)
    dp = get_diffusion_params(test_config.timesteps, test_config)
    step = make_teacher_train_step(model, tx, dp, test_config.timesteps)
    images = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (8, 16, 16, 1)).astype(np.float32)
    )
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        key, sk = jax.random.split(key)
        state, loss = step(state, images, sk)
        losses.append(float(loss))
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    # loss should broadly decrease on a fixed batch
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_distill_train_step_runs(test_config):
    teacher_model, teacher_vars, _, _ = _setup(test_config, sf=0.2)
    student_model, student_vars, tx, state = _setup(test_config, sf=0.1)
    dp = get_diffusion_params(test_config.teacher_steps, test_config)
    step = make_distill_train_step(
        teacher_model,
        teacher_vars,
        student_model,
        tx,
        dp,
        test_config.teacher_steps,
        test_config.student_steps,
    )
    images = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (8, 16, 16, 1)).astype(np.float32)
    )
    losses = []
    state0_params = jax.tree_util.tree_leaves(state.params)[0].copy()
    key = jax.random.PRNGKey(2)
    for _ in range(4):
        key, sk = jax.random.split(key)
        state, loss = step(state, images, sk)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert not np.allclose(
        state0_params, jax.tree_util.tree_leaves(state.params)[0]
    )


def test_shared_arch_build_dedup(test_config):
    """Size factors that floor to the same derived architecture (e.g. 0.01
    and 0.05 both clamp to 16 channels / 16 time-emb dims) share ONE jitted
    train step and grid fn — the duplicate build costs no new traces or
    compiles — while still initializing independent params, and the shared
    step runs correctly on the second student's state."""
    from distillation_trajectories_tpu.training.students import _build_student

    m1 = make_unet(test_config, size_factor=0.01)
    m2 = make_unet(test_config, size_factor=0.05)
    assert (tuple(m1.dims), m1.time_emb_dim) == (tuple(m2.dims), m2.time_emb_dim)

    teacher = make_unet(test_config, size_factor=0.2)
    teacher_vars = init_unet(teacher, test_config, jax.random.PRNGKey(0))
    test_config.num_samples_to_generate = 0  # skip grid fn for speed

    b1 = _build_student(teacher, teacher_vars, test_config, 0.01, seed=0)
    b2 = _build_student(teacher, teacher_vars, test_config, 0.05, seed=0,
                        _shared=b1)
    assert b2["train_step"] is b1["train_step"]
    assert b2["grid_fn"] is b1["grid_fn"]
    # Independent inits: different PRNG stream per size factor.
    p1 = jax.tree_util.tree_leaves(b1["variables"]["params"])[0]
    p2 = jax.tree_util.tree_leaves(b2["variables"]["params"])[0]
    assert p1.shape == p2.shape and not np.allclose(p1, p2)

    images = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (8, 16, 16, 1)).astype(np.float32)
    )
    state2, loss = b1["train_step"](b2["state"], images, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip_and_latest(test_config, tmp_path):
    model, variables, tx, state = _setup(test_config)
    d = str(tmp_path / "ckpts")
    for epoch in (1, 2, 10):
        save_checkpoint(d, epoch, state.params, batch_stats=state.batch_stats,
                        opt_state=state.opt_state)
    assert available_epochs(d) == [1, 2, 10]
    assert latest_epoch(d) == 10
    payload = load_checkpoint(d)  # latest
    assert payload["epoch"] == 10
    restored = variables_from_checkpoint(payload)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored["params"]),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    payload5 = load_checkpoint(d, 2)
    assert payload5["epoch"] == 2


def test_async_checkpoint_writer_donation_safe(test_config, tmp_path):
    """AsyncCheckpointWriter snapshots before the train step donates the
    state: the written checkpoint must hold the PRE-step values even when
    the step runs (and invalidates the old buffers) before flush."""
    from distillation_trajectories_tpu.training import AsyncCheckpointWriter

    model, variables, tx, state = _setup(test_config)
    dp = get_diffusion_params(test_config.timesteps, test_config)
    step = make_teacher_train_step(model, tx, dp, test_config.timesteps)
    images = jnp.zeros((8, 16, 16, 1))

    expected = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    writer = AsyncCheckpointWriter()
    d = str(tmp_path / "async_ckpts")
    writer.save(d, 1, state.params, batch_stats=state.batch_stats,
                opt_state=state.opt_state)
    # Donate the old state buffers immediately.
    state, _ = step(state, images, jax.random.PRNGKey(0))
    writer.close()

    payload = load_checkpoint(d, 1)
    got = np.asarray(jax.tree_util.tree_leaves(payload["params"])[0])
    np.testing.assert_array_equal(got, expected)
    assert payload["epoch"] == 1
    assert "opt_state" in payload
    assert not os.path.exists(os.path.join(d, "model_epoch_1.msgpack.tmp"))


def test_async_checkpoint_writer_surfaces_failures(test_config, tmp_path):
    """A failed background save raises on the NEXT save() (not silently at
    close), flush joins ALL futures before raising, and close still shuts
    the pool down after a failure (round-2 advisor finding)."""
    import pytest

    from distillation_trajectories_tpu.training import AsyncCheckpointWriter

    model, variables, tx, state = _setup(test_config)

    # Unwritable directory target: the background write must fail.
    blocked = tmp_path / "blocked"
    blocked.write_text("a file, not a directory")
    writer = AsyncCheckpointWriter()
    writer.save(str(blocked), 1, state.params)
    import time as _t

    for _ in range(100):  # let the background write settle
        if not writer._futures or writer._futures[0].done():
            break
        _t.sleep(0.05)
    with pytest.raises(Exception):
        writer.save(str(tmp_path / "ok"), 2, state.params)
    # close() must not hang or leak the pool even after failures.
    try:
        writer.close()
    except Exception:
        pass
    assert writer._pool._shutdown

    # Healthy writer: flush is clean and joins everything.
    w2 = AsyncCheckpointWriter()
    d = str(tmp_path / "healthy")
    w2.save(d, 1, state.params)
    w2.save(d, 2, state.params)
    w2.flush()
    assert not w2._futures
    w2.close()
    assert os.path.exists(os.path.join(d, "model_epoch_2.msgpack"))


def test_data_loader(test_config):
    from distillation_trajectories_tpu.data import get_data_loader, get_real_images

    loader = get_data_loader(test_config)
    batches = list(iter(loader))
    assert len(batches) == len(loader) > 0
    images, labels = batches[0]
    assert images.shape == (8, 16, 16, 1)
    assert images.min() >= -1.0 and images.max() <= 1.0
    real = get_real_images(test_config, 5)
    assert real.shape == (5, 16, 16, 1)


def test_teacher_ema_updates(test_config):
    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu.diffusion import get_diffusion_params

    model = make_unet(test_config, size_factor=0.1)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))
    tx = make_optimizer(test_config)
    state = create_train_state(model, variables, tx, use_ema=True)
    dp = get_diffusion_params(test_config.timesteps, test_config)
    step = make_teacher_train_step(
        model, tx, dp, test_config.timesteps, ema_rate=0.9
    )
    images = jnp.zeros((4, 16, 16, 1))
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, _ = step(state, images, jax.random.PRNGKey(1))
    ema = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    new = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    # ema = 0.9*old + 0.1*new
    np.testing.assert_allclose(ema, 0.9 * p0 + 0.1 * new, rtol=1e-5, atol=1e-7)


def test_train_students_skip_existing(test_config, monkeypatch):
    """skip_existing: size factors with a final-epoch checkpoint are loaded
    instead of retrained (the workload runner's outage-resume path); the
    rest train normally and both land in the returned dict."""
    import jax

    from distillation_trajectories_tpu.models import make_unet
    from distillation_trajectories_tpu.training import students as st
    from distillation_trajectories_tpu.training.checkpoints import save_checkpoint

    cfg = test_config
    cfg.epochs = 1
    x0 = np.zeros((1, cfg.image_size, cfg.image_size, cfg.channels), np.float32)
    t0 = np.zeros((1,), np.int32)

    teacher = make_unet(cfg, size_factor=1.0)
    tvars = teacher.init(jax.random.PRNGKey(0), x0, t0)
    save_checkpoint(cfg.teacher_models_dir, 1, tvars["params"],
                    batch_stats=tvars.get("batch_stats"))

    done = make_unet(cfg, size_factor=0.25)
    dvars = done.init(jax.random.PRNGKey(1), x0, t0)
    save_checkpoint(cfg.student_dir(0.25), cfg.epochs, dvars["params"],
                    batch_stats=dvars.get("batch_stats"))

    trained = []

    def fake_distill(teacher_model, teacher_variables, config,
                     size_factor=1.0, **kw):
        trained.append(size_factor)
        return object(), {"params": {}, "batch_stats": {}}

    monkeypatch.setattr(st, "distill_diffusion_model", fake_distill)
    # distill is mocked — the AOT precompile pool would only burn suite time
    monkeypatch.setenv("DTT_PRECOMPILE", "0")

    out = st.train_students(
        cfg, custom_size_factors=[0.25, 0.5], skip_existing=True
    )
    assert trained == [0.5], trained  # only the unfinished size trains
    assert set(out) == {0.25, 0.5}
    # The skipped entry is a real loaded model+variables pair.
    loaded_model, loaded_vars = out[0.25]
    assert "params" in loaded_vars

    # Without the flag, everything (re)trains.
    trained.clear()
    out2 = st.train_students(cfg, custom_size_factors=[0.25, 0.5])
    assert trained == [0.25, 0.5], trained

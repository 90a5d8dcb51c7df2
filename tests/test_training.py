"""Training stack tests: teacher step, distillation step, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    # Epoch-scan mode builds epoch_fn instead of the per-batch step; the
    # dedup contract covers whichever executable family is active.
    assert b2["train_step"] is b1["train_step"]
    assert b2["epoch_fn"] is b1["epoch_fn"]
    assert b2["grid_fn"] is b1["grid_fn"]
    # Independent inits: different PRNG stream per size factor.
    p1 = jax.tree_util.tree_leaves(b1["variables"]["params"])[0]
    p2 = jax.tree_util.tree_leaves(b2["variables"]["params"])[0]
    assert p1.shape == p2.shape and not np.allclose(p1, p2)

    images = np.random.default_rng(1).uniform(
        -1, 1, (8, 16, 16, 1)
    ).astype(np.float32)
    if b1["epoch_fn"] is not None:
        idx = np.arange(8, dtype=np.int32).reshape(1, 8)
        state2, _key, losses = b1["epoch_fn"](
            b2["state"], jnp.asarray(images), idx, jax.random.PRNGKey(3)
        )
        loss = losses[0]
    else:
        state2, loss = b1["train_step"](
            b2["state"], jnp.asarray(images), jax.random.PRNGKey(3)
        )
    assert np.isfinite(float(loss))


def test_state_init_fn_matches_eager(test_config):
    """make_state_init_fn's ONE-graph init (model init + tx.init fused,
    force_jit=True — the accelerator sweep path) must produce the same
    TrainState as the eager init_unet + create_train_state sequence the
    CPU path uses: same pytree structure (stack_train_states and the
    AOT-lowered epoch graphs key on it) and identical leaf values."""
    from distillation_trajectories_tpu.training import make_state_init_fn

    model = make_unet(test_config, size_factor=0.1)
    tx = make_optimizer(test_config)
    key = jax.random.PRNGKey(42)

    eager = create_train_state(
        model, init_unet(model, test_config, key), tx)
    jitted = make_state_init_fn(model, test_config, tx, force_jit=True)(key)

    t_e = jax.tree_util.tree_structure(eager)
    t_j = jax.tree_util.tree_structure(jitted)
    assert t_e == t_j
    for le, lj in zip(jax.tree_util.tree_leaves(eager),
                      jax.tree_util.tree_leaves(jitted)):
        np.testing.assert_allclose(np.asarray(le), np.asarray(lj),
                                   rtol=0, atol=0)


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


def test_epoch_scan_matches_batch_loop(test_config):
    """The epoch-level lax.scan path (device-resident dataset, one dispatch
    per epoch) reproduces the per-batch python loop EXACTLY: same key-split
    sequence, same gathered batches, same losses and params."""
    from distillation_trajectories_tpu.data.datasets import DataLoader
    from distillation_trajectories_tpu.training.state import (
        create_train_state,
        make_distill_epoch_fn,
        make_distill_train_step,
        make_optimizer,
        make_teacher_epoch_fn,
        make_teacher_train_step,
    )

    cfg = test_config
    rng = np.random.default_rng(0)
    n, b = 20, 4
    images_all = rng.standard_normal(
        (n, cfg.image_size, cfg.image_size, cfg.channels)
    ).astype(np.float32)
    labels = np.zeros(n, dtype=np.int32)
    dp = get_diffusion_params(cfg.timesteps, cfg)

    teacher = make_unet(cfg, size_factor=0.2)
    t_vars = init_unet(teacher, cfg, jax.random.PRNGKey(0))
    student = make_unet(cfg, size_factor=0.1)
    s_vars = init_unet(student, cfg, jax.random.PRNGKey(1))
    tx = make_optimizer(cfg)

    def run(mode, make_step, make_epoch, *factory_args):
        state = create_train_state(student, jax.tree_util.tree_map(
            jnp.copy, s_vars), tx)
        loader = DataLoader(images_all, labels, b, shuffle=True, seed=7)
        key = jax.random.PRNGKey(5)
        losses_out = []
        if mode == "loop":
            step = make_step(*factory_args)
            for _ in range(2):  # epochs
                losses = []
                for images, _lbl in loader:
                    key, sk = jax.random.split(key)
                    state, loss = step(state, jnp.asarray(images), sk)
                    losses.append(loss)
                losses_out.append(np.asarray(jax.device_get(losses)))
        else:
            epoch_fn = make_epoch(*factory_args)
            dataset = jnp.asarray(images_all)
            for _ in range(2):
                idx = loader.epoch_indices()
                state, key, losses = epoch_fn(state, dataset, idx, key)
                losses_out.append(np.asarray(jax.device_get(losses)))
        return losses_out, jax.device_get(state.params)

    # Distillation step family (the dominant workload stage).
    d_args = (dp, cfg.timesteps, max(cfg.timesteps // 2, 1))
    loop_losses, loop_params = run(
        "loop",
        lambda *a: make_distill_train_step(teacher, t_vars, student, tx, *a),
        None,
        *d_args,
    )
    scan_losses, scan_params = run(
        "scan",
        None,
        lambda *a: make_distill_epoch_fn(teacher, t_vars, student, tx, *a),
        *d_args,
    )
    for lo, sc in zip(loop_losses, scan_losses):
        np.testing.assert_allclose(lo, sc, rtol=1e-6, atol=1e-7)
    # Losses tight (epoch-2 losses depend on epoch-1 params, so 1e-6
    # agreement proves the paths are semantically identical); params loose —
    # the scan and the unrolled step are DIFFERENT XLA compilations, and
    # reduction-order drift is amplified by Adam on near-zero second
    # moments (same convention as the SPMD parity in __graft_entry__.py).
    for a, c in zip(
        jax.tree_util.tree_leaves(loop_params),
        jax.tree_util.tree_leaves(scan_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-2, atol=2e-3)

    # Teacher step family.
    def run_teacher(mode):
        model = teacher
        state = create_train_state(model, jax.tree_util.tree_map(
            jnp.copy, t_vars), tx)
        loader = DataLoader(images_all, labels, b, shuffle=True, seed=3)
        key = jax.random.PRNGKey(9)
        if mode == "loop":
            step = make_teacher_train_step(model, tx, dp, cfg.timesteps)
            losses = []
            for images, _lbl in loader:
                key, sk = jax.random.split(key)
                state, loss = step(state, jnp.asarray(images), sk)
                losses.append(loss)
            return np.asarray(jax.device_get(losses)), jax.device_get(state.params)
        epoch_fn = make_teacher_epoch_fn(model, tx, dp, cfg.timesteps)
        idx = loader.epoch_indices()
        state, key, losses = epoch_fn(state, jnp.asarray(images_all), idx, key)
        return np.asarray(jax.device_get(losses)), jax.device_get(state.params)

    tl, tp = run_teacher("loop")
    sl, sp = run_teacher("scan")
    np.testing.assert_allclose(tl, sl, rtol=1e-6, atol=1e-7)
    for a, c in zip(jax.tree_util.tree_leaves(tp),
                    jax.tree_util.tree_leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-2, atol=2e-3)


def test_epoch_indices_match_iterator(test_config):
    """DataLoader.epoch_indices reproduces the iterator's batch composition
    (same shuffle stream, same drop-last truncation)."""
    from distillation_trajectories_tpu.data.datasets import DataLoader

    rng = np.random.default_rng(1)
    images = rng.standard_normal((19, 4, 4, 1)).astype(np.float32)
    labels = np.arange(19, dtype=np.int32)
    a = DataLoader(images, labels, 4, shuffle=True, seed=11)
    b = DataLoader(images, labels, 4, shuffle=True, seed=11)
    for _epoch in range(3):
        idx = a.epoch_indices()
        iterated = list(b)
        assert idx.shape == (len(b), 4)
        for row, (batch_images, batch_labels) in zip(idx, iterated):
            np.testing.assert_array_equal(images[row], batch_images)
            np.testing.assert_array_equal(labels[row], batch_labels)


@pytest.mark.slow
def test_vmapped_group_matches_sequential(test_config):
    """Identical-architecture students trained as ONE vmapped graph
    (Config.vmap_students, state.make_multi_distill_epoch_fn) produce the
    SAME per-student losses and params as the sequential trainer — the
    member axis is a layout decision, never a semantics change."""
    import dataclasses
    import json

    import jax

    from distillation_trajectories_tpu.models import make_unet, init_unet
    from distillation_trajectories_tpu.training import save_checkpoint
    from distillation_trajectories_tpu.training.students import train_students

    cfg = test_config
    cfg.epochs = 2
    cfg.limit_batches_per_epoch = 2
    cfg.num_samples_to_generate = 4
    cfg.samples_grid_size = 2

    teacher = make_unet(cfg, size_factor=1.0)
    tvars = init_unet(teacher, cfg, jax.random.PRNGKey(7))
    save_checkpoint(cfg.teacher_models_dir, 1, tvars["params"],
                    batch_stats=tvars["batch_stats"])

    # 0.01 and 0.05 floor to the SAME U-Net (dims AND time_emb_dim);
    # 0.25 stays a distinct arch and must train sequentially alongside.
    sfs = [0.01, 0.05, 0.25]
    a = make_unet(cfg, size_factor=0.01)
    b = make_unet(cfg, size_factor=0.05)
    assert (a.dims, a.time_emb_dim) == (b.dims, b.time_emb_dim)

    vm = train_students(cfg, custom_size_factors=sfs, seed=0)
    vm_losses = {}
    for sf in sfs:
        path = os.path.join(cfg.results_dir,
                            f"distill_metrics_size_{sf}.jsonl")
        with open(path) as f:
            vm_losses[sf] = [json.loads(l)["avg_loss"] for l in f
                             if "avg_loss" in l]
        # Per-member artifacts keep the sequential trainer's contracts.
        assert os.path.exists(os.path.join(
            cfg.student_dir(sf), f"model_epoch_{cfg.epochs}.msgpack"))
        assert os.path.exists(os.path.join(
            cfg.results_dir,
            f"student_samples_size_{sf}_epoch_{cfg.epochs}.png"))

    cfg_seq = dataclasses.replace(
        cfg, vmap_students=False, base_dir=str(cfg.base_dir) + "_seq")
    cfg_seq.create_directories()
    save_checkpoint(cfg_seq.teacher_models_dir, 1, tvars["params"],
                    batch_stats=tvars["batch_stats"])
    seq = train_students(cfg_seq, custom_size_factors=sfs, seed=0)

    for sf in sfs:
        path = os.path.join(cfg_seq.results_dir,
                            f"distill_metrics_size_{sf}.jsonl")
        with open(path) as f:
            seq_losses = [json.loads(l)["avg_loss"] for l in f
                          if "avg_loss" in l]
        # Two-pronged parity, same rationale as the SPMD dryrun
        # (__graft_entry__.py): losses tight (a semantics bug shows up in
        # the loss immediately), params loose (vmapped convs change
        # summation order; Adam amplifies the drift on near-zero second
        # moments).
        np.testing.assert_allclose(
            vm_losses[sf], seq_losses, rtol=1e-5,
            err_msg=f"sf={sf} losses diverged between vmapped and sequential")
        for x, y in zip(jax.tree_util.tree_leaves(vm[sf][1]["params"]),
                        jax.tree_util.tree_leaves(seq[sf][1]["params"])):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-2, atol=5e-4,
                err_msg=f"sf={sf} params diverged")

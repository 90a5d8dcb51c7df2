"""Student distillation across size factors (reference scripts/train_students.py).

Each size factor is a distinct architecture (different channel widths), so
students cannot be vmapped together; the sweep runs sequentially per size but
each student's step is a single donated jitted function with the teacher's
eval forward fused in (4 U-Net forwards + 1 backward per batch,
train_students.py:117-176).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import get_data_loader
from ..diffusion import get_diffusion_params, p_sample_loop
from ..models import make_unet, init_unet, param_count, param_size_mb
from ..parallel import mesh_from_config, shard_params, shard_train_state
from ..parallel.mesh import replicated
from ..utils.profiling import (
    MetricsLogger,
    add_phase_time,
    dump_phase_times,
    phase_timer,
    phase_times,
)
from ..utils.viz import save_image_grid
from .loop import run_train_epoch
from .checkpoints import (
    AsyncCheckpointWriter,
    latest_epoch,
    load_checkpoint,
    save_checkpoint,
    save_checkpoint_sharded,
    variables_from_checkpoint,
)
from .state import (
    create_train_state,
    epoch_scan_enabled as _epoch_scan_enabled,
    make_distill_epoch_fn,
    make_distill_train_step,
    make_multi_distill_epoch_fn,
    make_optimizer,
    make_state_init_fn,
    stack_train_states,
    unstack_train_state,
)


def print_size_factor_info(size_factors: List[float]) -> None:
    """Size-factor tier table with sf² param estimates
    (reference train_students.py:28-63)."""
    param_counts = {sf: sf**2 for sf in size_factors}
    tiny = [sf for sf in size_factors if sf < 0.1]
    small = [sf for sf in size_factors if 0.1 <= sf < 0.3]
    medium = [sf for sf in size_factors if 0.3 <= sf < 0.7]
    large = [sf for sf in size_factors if sf >= 0.7]
    print("Student model size factors:")
    for category, factors in [
        ("Tiny", tiny),
        ("Small", small),
        ("Medium", medium),
        ("Large", large),
    ]:
        if factors:
            lo, hi = min(factors), max(factors)
            print(
                f"  {category}: {param_counts[lo]:.4f}x to "
                f"{param_counts[hi]:.4f}x parameters"
            )


def _build_student(teacher_model, teacher_variables, config, size_factor,
                   seed, _shared=None, _init_fn=None, _state_init_fn=None):
    """Everything distillation needs before the first batch: student model +
    init, train state (mesh-sharded when configured), and the jitted step.

    Split out of :func:`distill_diffusion_model` so the sequential sweep can
    construct all students up front and AOT-compile their train steps
    concurrently (utils/compile_pool.py).

    ``_shared`` (a previous build with the IDENTICAL derived architecture —
    the 16-channel floor maps e.g. sf 0.01 and 0.05 to the same U-Net)
    reuses that build's jitted ``train_step``/``grid_fn``/module so the
    duplicate costs zero extra traces/compiles: this student's state has
    the same avals, so execution lands in the shared fn's dispatch cache.
    Params are still initialised independently per size factor.

    ``_init_fn`` (a pre-jitted/pre-compiled init from models.make_init_fn,
    one per distinct architecture) replaces the internal ``init_unet`` call
    so the sweep's init graphs compile concurrently instead of one ~15s
    serial compile per architecture (25% of the r04 students stage).

    ``_state_init_fn`` (state.make_state_init_fn, supersedes ``_init_fn``)
    goes further: model init AND optimizer init in one graph — the eager
    ``tx.init`` was ~2 device zeros per param leaf × tunnel RTT, 80.9 s
    across the r05 sweep's 13 builds (SWEEP_r05.json phases.builds_s).
    """
    key = jax.random.PRNGKey(seed + int(size_factor * 1000))
    key, init_key = jax.random.split(key)

    teacher_params_d = get_diffusion_params(config.teacher_steps, config)

    student_model = (
        _shared["model"] if _shared else make_unet(config, size_factor=size_factor)
    )
    tx = make_optimizer(config)
    with phase_timer("students/init_unet"):
        if _state_init_fn is not None:
            state = _state_init_fn(init_key)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
        elif _init_fn is not None:
            variables = _init_fn(init_key)
        else:
            variables = init_unet(student_model, config, init_key)
    if _state_init_fn is None:
        state = create_train_state(student_model, variables, tx)

    # Config.mesh_shape != (1,1): SPMD distillation — student state + teacher
    # params channel-TP over "model", batches over "data" (parallel/mesh.py).
    mesh = mesh_from_config(config)
    if mesh is not None:
        state = shard_train_state(state, mesh)
        teacher_variables = {
            k: shard_params(v, mesh) for k, v in teacher_variables.items()
        }
        print(f"[distill sf={size_factor}] SPMD over mesh {dict(mesh.shape)}")

    if _shared is not None:
        return {
            "key": key,
            "model": student_model,
            "variables": variables,
            "state": state,
            "train_step": _shared["train_step"],
            "epoch_fn": _shared["epoch_fn"],
            "grid_fn": _shared["grid_fn"],
            "mesh": mesh,
        }

    # Epoch-scan mode replaces the per-batch step with one scan-compiled
    # epoch executable (state.make_distill_epoch_fn); the per-batch step is
    # only built where it is actually dispatched (mesh runs).
    if _epoch_scan_enabled(config, mesh):
        train_step = None
        epoch_fn = make_distill_epoch_fn(
            teacher_model,
            teacher_variables,
            student_model,
            tx,
            teacher_params_d,
            config.teacher_steps,
            config.student_steps,
        )
    else:
        epoch_fn = None
        train_step = make_distill_train_step(
            teacher_model,
            teacher_variables,
            student_model,
            tx,
            teacher_params_d,
            config.teacher_steps,
            config.student_steps,
        )

    # End-of-training sample-grid loop as a jitted function of the FINAL
    # params (same avals as the initial state), so the sweep can AOT-compile
    # it alongside the train step.
    grid_fn = None
    if config.num_samples_to_generate > 0:
        student_params_d = get_diffusion_params(config.student_steps, config)
        shape = (
            config.num_samples_to_generate,
            config.image_size,
            config.image_size,
            config.channels,
        )

        @jax.jit
        def grid_fn(params, batch_stats, sample_key):
            def model_fn(x, t, cond=None, cond_mask=None):
                return student_model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x, t, cond=cond, cond_mask=cond_mask, train=False,
                )

            return p_sample_loop(
                model_fn,
                shape,
                config.student_steps,
                student_params_d,
                sample_key,
                num_timesteps=config.timesteps,
                mode=getattr(config, "sample_mode", "reference"),
            )

    return {
        "key": key,
        "model": student_model,
        "variables": variables,
        "state": state,
        "train_step": train_step,
        "epoch_fn": epoch_fn,
        "grid_fn": grid_fn,
        "mesh": mesh,
    }


def distill_diffusion_model(
    teacher_model,
    teacher_variables,
    config,
    size_factor: float = 1.0,
    seed: int = 0,
    log_every: int = 50,
    _prebuilt: Optional[dict] = None,
    ckpt_writer: Optional[AsyncCheckpointWriter] = None,
):
    """Distill one student of the given size factor from the teacher.

    Reference ``train_students.py:65-212``.  Returns (model, variables).
    ``_prebuilt`` accepts the output of :func:`_build_student` (same
    size_factor/seed) so a sweep can AOT-compile all steps first;
    ``ckpt_writer`` lets a sweep share one async checkpoint writer so saves
    from student *i* overlap student *i+1*'s training.
    """
    own_writer = ckpt_writer is None
    writer = ckpt_writer or AsyncCheckpointWriter()
    built = _prebuilt or _build_student(
        teacher_model, teacher_variables, config, size_factor, seed
    )
    key = built["key"]
    student_model = built["model"]
    variables = built["variables"]
    state = built["state"]
    train_step = built["train_step"]
    mesh = built["mesh"]

    teacher_mb = param_size_mb(teacher_variables["params"])
    student_mb = param_size_mb(variables["params"])
    print(f"Teacher model size: {teacher_mb:.2f} MB")
    print(
        f"Student model size: {student_mb:.2f} MB "
        f"({student_mb / teacher_mb:.2%} of teacher)"
    )

    loader = built.get("loader") or get_data_loader(config, seed=seed)
    metrics_log = MetricsLogger(
        os.path.join(config.results_dir, f"distill_metrics_size_{size_factor}.jsonl")
    )

    from ..utils.compile_pool import arm_watchdog, cancel_watchdog

    epoch_fn = built.get("epoch_fn")
    use_scan = epoch_fn is not None and _epoch_scan_enabled(config, mesh)
    dataset_dev = None
    if use_scan:
        # Device-resident dataset, uploaded ONCE (and shared across the
        # whole sweep via _prebuilt): the per-batch loop re-uploads every
        # ~1.5 MB batch each epoch over the tunnel.
        dataset_dev = built.get("dataset_dev")
        if dataset_dev is None:
            with phase_timer("students/dataset_upload"):
                dataset_dev = jax.device_put(loader.images)
                dataset_dev.block_until_ready()

    try:
        for epoch in range(config.epochs):
            t0 = time.time()
            # Per-epoch tunnel-hang watchdog (no-op on CPU): a dropped RPC
            # mid-epoch otherwise blocks until the workload runner's stage
            # timeout (observed: 3600s burned on one hang).  Epoch 0 may pay a
            # full from-scratch jit compile when the AOT pool was skipped
            # (single size factor, DTT_PRECOMPILE=0) — budget the known ~5min
            # compile envelope with 2x variance; later epochs are execution
            # only (worst measured ~70s).
            arm_watchdog(1800.0 if epoch == 0 else 600.0)
            with phase_timer(f"distill_epoch_sf{size_factor}"):
                state, key, avg_loss, _ = run_train_epoch(
                    state,
                    key,
                    use_scan=use_scan,
                    epoch_fn=epoch_fn,
                    train_step=train_step,
                    loader=loader,
                    dataset_dev=dataset_dev,
                    config=config,
                    mesh=mesh,
                    progress_desc=(
                        f"Distillation Epoch {epoch + 1}/{config.epochs}"
                    ),
                    log_label=f"[distill sf={size_factor}] epoch {epoch + 1}",
                    log_every=log_every,
                    loss_fmt=".6f",
                )
            print(
                f"[distill sf={size_factor}] epoch {epoch + 1}/{config.epochs} "
                f"avg loss {avg_loss:.6f} "
                f"({time.time() - t0:.1f}s)"
            )
            metrics_log.log(
                "epoch", epoch=epoch + 1, size_factor=size_factor,
                avg_loss=avg_loss, seconds=time.time() - t0,
            )

            if (epoch + 1) % config.save_interval == 0 or epoch == config.epochs - 1:
                size_dir = config.student_dir(size_factor)
                if config.checkpoint_sharded:
                    # Pod-scale lane: per-device shard writes, no host
                    # gather (checkpoints.py sharded lane).
                    save_checkpoint_sharded(
                        size_dir,
                        epoch + 1,
                        state.params,
                        batch_stats=state.batch_stats,
                        opt_state=state.opt_state,
                    )
                else:
                    writer.save(
                        size_dir,
                        epoch + 1,
                        state.params,
                        batch_stats=state.batch_stats,
                        opt_state=state.opt_state,
                    )
                if epoch == config.epochs - 1 and config.num_samples_to_generate > 0:
                    # End-of-training sample grid (train_students.py:190-210).
                    # Dispatch only; the host fetch (~tunnel RTT + transfer)
                    # and PNG render ride the async writer's pool so the
                    # next student's training overlaps them — grid_fn does
                    # not donate its args, so the result buffer stays valid.
                    key, sample_key = jax.random.split(key)
                    with phase_timer("students/grid"):
                        samples_dev = built["grid_fn"](
                            state.params, state.batch_stats, sample_key
                        )
                    grid_path = os.path.join(
                        config.results_dir,
                        f"student_samples_size_{size_factor}_epoch_{epoch + 1}.png",
                    )
                    writer.submit(
                        save_image_grid,
                        samples_dev,
                        grid_path,
                        config.samples_grid_size,
                        config.samples_figure_size,
                    )

    finally:
        cancel_watchdog()
    metrics_log.close()
    if own_writer:
        writer.close()
    return student_model, {"params": state.params, "batch_stats": state.batch_stats}


def _distill_group_vmapped(
    teacher_model,
    teacher_variables,
    config,
    size_factors: List[float],
    prebuilt: Dict[float, dict],
    multi_epoch_fn,
    writer: AsyncCheckpointWriter,
) -> Dict[float, Tuple[object, dict]]:
    """Train an identical-architecture student group as ONE batched graph.

    Per-member artifacts (metrics jsonl, checkpoints, end-of-training
    sample grids) match the sequential trainer's file contracts exactly;
    the logged epoch ``seconds`` is the GROUP epoch wall (the members train
    simultaneously).  See state.make_multi_distill_epoch_fn for the parity
    contract.
    """
    sfs = list(size_factors)
    builts = [prebuilt[sf] for sf in sfs]
    model = builts[0]["model"]
    states = stack_train_states([b["state"] for b in builts])
    keys = jnp.stack([b["key"] for b in builts])
    loader = builts[0]["loader"]
    dataset_dev = builts[0]["dataset_dev"]
    logs = {
        sf: MetricsLogger(os.path.join(
            config.results_dir, f"distill_metrics_size_{sf}.jsonl"))
        for sf in sfs
    }
    print(f"[distill group {sfs}] one vmapped graph "
          f"({len(sfs)} members, shared architecture)")

    from ..utils.compile_pool import arm_watchdog, cancel_watchdog

    try:
        for epoch in range(config.epochs):
            t0 = time.time()
            arm_watchdog(1800.0 if epoch == 0 else 600.0)
            with phase_timer(f"distill_epoch_group{sfs}"):
                # The ONE epoch driver (loop.run_train_epoch) handles the
                # idx gather + dispatch + empty-epoch guard; unreduced
                # losses come back as the [n_batches, N] member matrix.
                states, keys, losses_host, _ = run_train_epoch(
                    states, keys,
                    use_scan=True, epoch_fn=multi_epoch_fn, train_step=None,
                    loader=loader, dataset_dev=dataset_dev, config=config,
                    mesh=None, progress_desc=f"distill group {sfs}",
                    log_label=f"[distill group {sfs}]", log_every=0,
                    reduce_loss=False,
                )
            secs = time.time() - t0
            for j, sf in enumerate(sfs):
                avg_loss = (float(np.mean(losses_host[:, j]))
                            if losses_host.size else 0.0)
                print(f"[distill sf={sf}] epoch {epoch + 1}/{config.epochs} "
                      f"avg loss {avg_loss:.6f} ({secs:.1f}s group wall)")
                logs[sf].log("epoch", epoch=epoch + 1, size_factor=sf,
                             avg_loss=avg_loss, seconds=secs)

            if (epoch + 1) % config.save_interval == 0 \
                    or epoch == config.epochs - 1:
                for j, sf in enumerate(sfs):
                    member = unstack_train_state(states, j)
                    writer.save(
                        config.student_dir(sf),
                        epoch + 1,
                        member.params,
                        batch_stats=member.batch_stats,
                        opt_state=member.opt_state,
                    )
                if epoch == config.epochs - 1 \
                        and config.num_samples_to_generate > 0:
                    grid_fn = builts[0]["grid_fn"]
                    for j, sf in enumerate(sfs):
                        member = unstack_train_state(states, j)
                        _, sample_key = jax.random.split(keys[j])
                        # Dispatch only; fetch + PNG render ride the async
                        # writer (see the sequential lane above).
                        with phase_timer("students/grid"):
                            samples_dev = grid_fn(
                                member.params, member.batch_stats,
                                sample_key,
                            )
                        writer.submit(
                            save_image_grid,
                            samples_dev,
                            os.path.join(
                                config.results_dir,
                                f"student_samples_size_{sf}_"
                                f"epoch_{epoch + 1}.png",
                            ),
                            config.samples_grid_size,
                            config.samples_figure_size,
                        )
    finally:
        cancel_watchdog()
        for log in logs.values():
            log.close()

    out: Dict[float, Tuple[object, dict]] = {}
    for j, sf in enumerate(sfs):
        member = unstack_train_state(states, j)
        out[sf] = (model, {"params": member.params,
                           "batch_stats": member.batch_stats})
    return out


def _adopt_pool_executables(pool, size_factor, prebuilt, use_scan,
                            vmap_group_of, group_info) -> None:
    """Replace a student's jitted fns with the pool's AOT executables.

    ``Lowered.compile()`` never lands in the jit dispatch cache, so
    dispatching the jitted fn after the pool re-traces the graph (seconds
    per epoch-scan graph on this 1-core host — the r05i students stage's
    124.8 s train wall was mostly these re-traces) and re-compiles against
    the backend cache.  Producer order (train_students): the
    step/epoch/group fn is items[0]; the grid fn, when present, is last.
    Idempotent — shared-arch builds and vmap-group members may be adopted
    more than once.  Every swap keeps the jitted fn as a fallback for aval
    drift (CompiledWithFallback).
    """
    from ..utils.compile_pool import CompiledWithFallback

    execs = pool.executables(size_factor)
    if not execs:
        return
    b = prebuilt[size_factor]
    if size_factor in vmap_group_of:
        arch = vmap_group_of[size_factor]
        multi_fn, sfs = group_info[arch]
        if not isinstance(multi_fn, CompiledWithFallback):
            group_info[arch] = (
                CompiledWithFallback(
                    execs[0], multi_fn, label=f"multi-distill {sfs}"),
                sfs,
            )
    elif use_scan:
        if not isinstance(b["epoch_fn"], CompiledWithFallback):
            b["epoch_fn"] = CompiledWithFallback(
                execs[0], b["epoch_fn"], label=f"distill epoch sf={size_factor}")
    else:
        if not isinstance(b["train_step"], CompiledWithFallback):
            b["train_step"] = CompiledWithFallback(
                execs[0], b["train_step"], label=f"distill step sf={size_factor}")
    if b["grid_fn"] is not None and not isinstance(
            b["grid_fn"], CompiledWithFallback):
        b["grid_fn"] = CompiledWithFallback(
            execs[-1], b["grid_fn"], label=f"student grid sf={size_factor}")


def load_teacher(config, epoch: Optional[int] = None):
    """Load the teacher model + variables from its checkpoint directory.

    The reference hardcodes ``model_epoch_200.pt`` (train_students.py:235);
    we accept any epoch and default to the latest available, which closes
    that usability gap while keeping the same directory contract.
    """
    payload = load_checkpoint(config.teacher_models_dir, epoch)
    model = make_unet(config, size_factor=1.0)
    return model, variables_from_checkpoint(payload)


def train_students(
    config,
    custom_size_factors: Optional[List[float]] = None,
    seed: int = 0,
    sweep_parallel: bool = False,
    skip_existing: bool = False,
) -> Dict[float, Tuple[object, dict]]:
    """Distill students for every size factor (reference train_students.py:214-268).

    ``sweep_parallel=True`` distributes the sweep itself across devices —
    student *i* pinned to device ``i % n`` with async-dispatched steps
    (parallel/sweep.py) — instead of the reference's sequential loop.

    ``skip_existing=True`` skips (and loads instead) any size factor whose
    FINAL-epoch checkpoint already exists — the workload runner's stage
    retry passes this so a sweep interrupted by a tunnel outage resumes at
    the first unfinished student instead of retraining everything.  Off by
    default: a fresh timed run must not silently reuse a previous run's
    checkpoints.
    """
    with phase_timer("students/teacher_load"):
        teacher_model, teacher_variables = load_teacher(config)
    size_factors = (
        custom_size_factors if custom_size_factors else config.student_size_factors
    )

    preloaded: Dict[float, Tuple[object, dict]] = {}
    if skip_existing:
        # Only checkpoints NEWER than the current teacher's latest count as
        # "this run's own work": a student distilled from an older teacher
        # (a previous sweep's leftover in the same output dir) must retrain,
        # or every downstream stage would compare the new teacher against
        # stale mismatched students.
        from .checkpoints import checkpoint_path, latest_epoch

        t_epoch = latest_epoch(config.teacher_models_dir)
        teacher_mtime = (
            os.path.getmtime(checkpoint_path(config.teacher_models_dir, t_epoch))
            if t_epoch is not None else 0.0
        )
        remaining = []
        for sf in size_factors:
            final = os.path.join(
                config.student_dir(sf), f"model_epoch_{config.epochs}.msgpack"
            )
            if os.path.exists(final) and os.path.getmtime(final) >= teacher_mtime:
                payload = load_checkpoint(config.student_dir(sf), config.epochs)
                # Host-resident on purpose: the resume path's caller (the
                # workload runner via the CLI) discards the return value, so
                # device-materializing up to 12 finished students would be
                # pure wasted tunnel transfer.  In-process consumers should
                # variables_from_checkpoint/device_put what they keep.
                variables = {"params": payload["params"]}
                if "batch_stats" in payload:
                    variables["batch_stats"] = payload["batch_stats"]
                preloaded[sf] = (make_unet(config, size_factor=sf), variables)
                print(f"[students] sf={sf}: final checkpoint exists, skipping "
                      f"({final})")
            else:
                remaining.append(sf)
        size_factors = remaining
        if not size_factors:
            print("[students] all requested sizes already trained")
            return preloaded

    print_size_factor_info(size_factors)

    if sweep_parallel:
        from ..parallel.sweep import distill_students_parallel

        if tuple(getattr(config, "mesh_shape", (1, 1)) or (1, 1)) != (1, 1):
            print(
                "[students] WARNING: sweep_parallel uses per-device student "
                f"placement and ignores mesh_shape={config.mesh_shape}; each "
                "student trains unsharded on its own device. Drop --mesh or "
                "--sweep_parallel to get SPMD sharding."
            )
        parallel_students = distill_students_parallel(
            config, teacher_model, teacher_variables, size_factors, seed=seed
        )
        parallel_students.update(preloaded)
        return parallel_students

    # Build every student up front and AOT-compile all distill steps in a
    # thread pool: each size factor is a distinct architecture with its own
    # ~minutes-long XLA compile, which dominated the sequential sweep's
    # wall-clock (SWEEP_r02: 13 serial compiles ≈ 80% of the stage).
    prebuilt: Dict[float, dict] = {}
    compile_pool = None
    vmap_group_of: Dict[float, tuple] = {}
    group_info: Dict[tuple, tuple] = {}
    if len(size_factors) > 1 and os.environ.get("DTT_PRECOMPILE", "1") != "0":
        from ..utils.compile_pool import AsyncCompilePool, compile_concurrently

        # The 16-channel floor maps several small size factors onto the
        # SAME derived architecture (e.g. 0.01 and 0.05); everything below
        # dedups per distinct architecture.
        arch_of: Dict[float, tuple] = {}
        for size_factor in size_factors:
            m = make_unet(config, size_factor=size_factor)
            arch_of[size_factor] = (tuple(m.dims), m.time_emb_dim)

        # Concurrent STATE-INIT compiles (accelerator backends; CPU init is
        # eager by design): one jitted ``key -> TrainState`` graph per
        # distinct architecture (model init + optimizer init fused —
        # state.make_state_init_fn), all compiling in the pool at once.
        # The serial ~15s-per-arch init compiles were 25% of the r04
        # students stage; the eager per-leaf tx.init dispatches were 80.9s
        # of r05's builds phase.
        arch_init: Dict[tuple, object] = {}
        if jax.default_backend() != "cpu":
            with phase_timer("students/init_compile"):
                key_aval = jax.ShapeDtypeStruct(
                    jnp.shape(jax.random.PRNGKey(0)),
                    jax.random.PRNGKey(0).dtype,
                )
                init_producers = []
                init_archs = []
                for size_factor in size_factors:
                    arch = arch_of[size_factor]
                    if arch not in arch_init:
                        fn = make_state_init_fn(
                            make_unet(config, size_factor=size_factor),
                            config, make_optimizer(config), force_jit=True,
                        )
                        arch_init[arch] = fn
                        init_archs.append(arch)
                        init_producers.append(
                            lambda fn=fn: fn.lower(key_aval))
                init_compiled = compile_concurrently(
                    init_producers,
                    label=f"student state-inits x{len(init_producers)}",
                    per_item_budget=120.0,
                    keep=True,
                )
                # Call the AOT executables directly — the jitted init would
                # re-trace + re-compile at dispatch (the pool never fills
                # the jit dispatch cache; see CompiledWithFallback).
                from ..utils.compile_pool import CompiledWithFallback

                for arch, compiled in zip(init_archs, init_compiled):
                    arch_init[arch] = CompiledWithFallback(
                        compiled, arch_init[arch],
                        label=f"state init dims={arch[0]}")

        with phase_timer("students/builds"):
            arch_canonical: Dict[tuple, dict] = {}
            for size_factor in size_factors:
                arch = arch_of[size_factor]
                prebuilt[size_factor] = _build_student(
                    teacher_model, teacher_variables, config, size_factor,
                    seed, _shared=arch_canonical.get(arch),
                    _state_init_fn=arch_init.get(arch),
                )
                arch_canonical.setdefault(arch, prebuilt[size_factor])
        # Example avals must match execution exactly (shape, dtype, AND
        # sharding) or the dispatch cache misses and the step recompiles.
        mesh = next(iter(prebuilt.values()))["mesh"]
        images_shape = (
            config.batch_size, config.image_size, config.image_size,
            config.channels,
        )
        use_scan = _epoch_scan_enabled(config, mesh)
        if use_scan:
            # One loader + ONE device-resident dataset for the whole sweep
            # (each distill call was re-loading + re-uploading the same
            # data; the epoch scan gathers batches on device instead).
            with phase_timer("students/dataset_upload"):
                shared_loader = get_data_loader(config, seed=seed)
                dataset_dev = jax.device_put(shared_loader.images)
                dataset_dev.block_until_ready()
            n_batches = len(shared_loader)
            if config.limit_batches_per_epoch is not None:
                n_batches = min(n_batches, config.limit_batches_per_epoch)
            idx_aval = jax.ShapeDtypeStruct(
                (n_batches, config.batch_size), jnp.int32
            )
            from ..data.datasets import DataLoader

            for b in prebuilt.values():
                # Fresh per-student loader VIEW over the shared arrays: the
                # per-batch path constructs a new loader per student, so
                # each student's shuffle stream restarts at epoch 1 —
                # sharing one loader would silently change batch
                # composition vs that path.
                b["loader"] = DataLoader(
                    shared_loader.images, shared_loader.labels,
                    config.batch_size, shuffle=True, seed=seed,
                )
                b["dataset_dev"] = dataset_dev
            key_example = jax.random.PRNGKey(0)
        elif mesh is not None:
            from ..parallel.mesh import batch_sharding

            images_aval = jax.ShapeDtypeStruct(
                images_shape, jnp.float32, sharding=batch_sharding(mesh)
            )
            key_example = jax.device_put(
                jax.random.PRNGKey(0), replicated(mesh)
            )
        else:
            images_aval = jax.ShapeDtypeStruct(images_shape, jnp.float32)
            key_example = jax.random.PRNGKey(0)
        # Grid keys are plain (uncommitted) at execution time in both the
        # mesh and single-device paths — lower with a plain key to match.
        grid_key = jax.random.PRNGKey(0)

        # Identical-architecture groups train as ONE vmapped graph
        # (Config.vmap_students, state.make_multi_distill_epoch_fn): the
        # group's single-student epoch fns are then never dispatched — the
        # group needs ONE epoch executable instead of N dispatch chains.
        # Epoch-scan path only; the sharded-checkpoint lane keeps the
        # sequential trainer (its save path is per-member device-sharded).
        if (use_scan and getattr(config, "vmap_students", True)
                and not config.checkpoint_sharded):
            by_arch: Dict[tuple, List[float]] = {}
            for size_factor in size_factors:
                by_arch.setdefault(arch_of[size_factor], []).append(
                    size_factor)
            teacher_params_d = get_diffusion_params(
                config.teacher_steps, config)
            for arch, sfs in by_arch.items():
                if len(sfs) < 2:
                    continue
                multi_fn = make_multi_distill_epoch_fn(
                    teacher_model,
                    teacher_variables,
                    prebuilt[sfs[0]]["model"],
                    make_optimizer(config),
                    teacher_params_d,
                    config.teacher_steps,
                    config.student_steps,
                )
                group_info[arch] = (multi_fn, sfs)
                for sf in sfs:
                    vmap_group_of[sf] = arch

        # COMPILE-AHEAD pool (round-5 cut): graphs are traced up front
        # (serial — interleaved tracing starves this 1-core host) but
        # compile in the background WHILE earlier students train: training
        # dispatch mostly waits on device RPCs with the GIL released, and
        # compiles run server-side, so student 1's epochs hide students
        # 2..N's compile tail.  Each student waits only for its own graphs.
        # Shared-arch duplicates reuse the same jit objects — lowered once
        # via the memo, so dup size factors map to the SAME compile future.
        _lower_memo: Dict[int, object] = {}

        def _once(obj, produce):
            def make():
                if id(obj) not in _lower_memo:
                    _lower_memo[id(obj)] = produce()
                return _lower_memo[id(obj)]
            return make

        producer_map: Dict[float, list] = {}
        for size_factor, b in prebuilt.items():
            items = []
            if size_factor in vmap_group_of:
                mf, sfs = group_info[vmap_group_of[size_factor]]
                items.append(_once(mf, lambda mf=mf, sfs=sfs: mf.lower(
                    stack_train_states([prebuilt[s]["state"] for s in sfs]),
                    dataset_dev, idx_aval,
                    jnp.stack([prebuilt[s]["key"] for s in sfs]))))
            elif use_scan:
                ef = b["epoch_fn"]
                items.append(_once(ef, lambda ef=ef, b=b: ef.lower(
                    b["state"], dataset_dev, idx_aval, key_example)))
            else:
                ts_ = b["train_step"]
                items.append(_once(ts_, lambda ts_=ts_, b=b: ts_.lower(
                    b["state"], images_aval, key_example)))
            if b["grid_fn"] is not None:
                gf = b["grid_fn"]
                items.append(_once(gf, lambda gf=gf, b=b: gf.lower(
                    b["state"].params, b["state"].batch_stats, grid_key)))
            producer_map[size_factor] = items
        with phase_timer("students/compile_trace"):
            compile_pool = AsyncCompilePool(
                producer_map,
                label=(
                    f"distill {'epochs' if use_scan else 'steps'} + grids "
                    f"({len(size_factors)} sizes, shared-arch dedup, "
                    "compile-ahead)"
                ),
                # Train-step graphs compile in minutes (vs ~30s trajectory
                # scans); budget the hang deadline accordingly.
                per_item_budget=400.0,
                # Device-bound training releases the GIL between dispatches,
                # so later students' traces run while earlier ones train —
                # the r05 stage paid 97.3s of up-front serial tracing here.
                # On CPU training is host-bound; keep the trace synchronous
                # (interleaving starves the 1-core host — compile_pool.py).
                trace_in_background=(jax.default_backend() != "cpu"),
            )

    students: Dict[float, Tuple[object, dict]] = {}
    # One shared async writer: saves from student i overlap student i+1's
    # training; joined once at the end of the sweep.
    writer = AsyncCheckpointWriter()
    try:
        for size_factor in size_factors:
            if size_factor in students:
                continue  # trained as part of an earlier vmapped group
            print(
                f"\nDistilling to student model with size factor {size_factor}..."
            )
            if compile_pool is not None:
                with phase_timer("students/compile_wait"):
                    waited = compile_pool.wait(size_factor)
                if waited > 0.5:
                    print(f"[students] sf={size_factor}: waited "
                          f"{waited:.1f}s for its executables")
                # Swap the jitted fns for their AOT executables (producer
                # order: step/epoch/group fn first, grid last).  Dispatching
                # the jitted fn would re-trace each graph on this 1-core
                # host and re-compile against the backend cache — the pool's
                # compiles never land in the jit dispatch cache.
                _adopt_pool_executables(
                    compile_pool, size_factor, prebuilt, use_scan,
                    vmap_group_of, group_info,
                )
            if size_factor in vmap_group_of:
                multi_fn, sfs = group_info[vmap_group_of[size_factor]]
                if compile_pool is not None:
                    # Later group members' grids render right after the
                    # shared vmapped training — adopt their executables too.
                    for s in sfs:
                        _adopt_pool_executables(
                            compile_pool, s, prebuilt, use_scan,
                            vmap_group_of, group_info,
                        )
                    multi_fn, sfs = group_info[vmap_group_of[size_factor]]
                students.update(_distill_group_vmapped(
                    teacher_model,
                    teacher_variables,
                    config,
                    sfs,
                    prebuilt,
                    multi_fn,
                    writer,
                ))
                continue
            students[size_factor] = distill_diffusion_model(
                teacher_model,
                teacher_variables,
                config,
                size_factor=size_factor,
                seed=seed,
                _prebuilt=prebuilt.get(size_factor),
                ckpt_writer=writer,
            )
    finally:
        # pool.close() re-raises the first failed compile (f.result());
        # the nested finally guarantees queued checkpoint saves are still
        # flushed (and their errors surfaced) even when the pool is red.
        try:
            if compile_pool is not None:
                with phase_timer("students/compile_drain"):
                    compile_pool.close()
        finally:
            with phase_timer("students/ckpt_flush"):
                writer.close()
    if compile_pool is not None and compile_pool.traced_in_background:
        # The trace wall no longer sits on the critical path (it overlaps
        # training on a daemon thread) — record it separately so the SWEEP
        # phase attribution still accounts for the host work.
        add_phase_time("students/trace_overlapped",
                       compile_pool.trace_seconds)
    # Wall-clock attribution for the sweep (init/build/grid/flush phases are
    # the "unaccounted" gap between epoch time and stage wall — see
    # PERFORMANCE.md's students-stage breakdown).
    summary = {
        k: round(v["total_s"], 1)
        for k, v in phase_times().items()
        if k.startswith("students/")
    }
    if summary:
        print(f"[students] phase totals (s): {summary}")
        dump_phase_times(
            os.path.join(config.results_dir, "students_phase_times.json")
        )
    students.update(preloaded)
    return students

"""Resume teacher training from a checkpoint epoch.

Reference ``scripts/continue_training.py:23-177`` reloads only model weights
(Adam moments reset — a noted gap, SURVEY.md §5).  We restore optimizer state
too when the checkpoint has it, and fall back to a fresh optimizer otherwise,
preserving the ``model_epoch_{start + i}`` filename numbering.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..data import get_data_loader
from ..diffusion import get_diffusion_params
from ..models import make_unet
from ..parallel import mesh_from_config, shard_train_state
from .checkpoints import (
    AsyncCheckpointWriter,
    load_checkpoint,
    save_checkpoint,
    save_checkpoint_sharded,
)
from .loop import run_train_epoch
from .state import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_teacher_train_step,
)
from .teacher import generate_sample_grid  # noqa: F401 (API re-export)


def continue_training(config, start_epoch: int, seed: int = 0, log_every: int = 50):
    """Continue teacher training from ``model_epoch_{start_epoch}``.

    Trains ``config.epochs`` further epochs, saving as
    ``model_epoch_{start_epoch + i}`` (reference continue_training.py:48-65).
    """
    key = jax.random.PRNGKey(seed + start_epoch)

    payload = load_checkpoint(config.teacher_models_dir, start_epoch)
    model = make_unet(config, size_factor=1.0)
    tx = make_optimizer(config)
    variables = {
        "params": payload["params"],
        "batch_stats": payload.get("batch_stats", {}),
    }
    state = create_train_state(model, variables, tx)
    if "opt_state" in payload:
        # Restore Adam moments (fixing the reference's reset-on-resume gap).
        from flax import serialization

        state = state.replace(
            opt_state=serialization.from_state_dict(
                state.opt_state, payload["opt_state"]
            )
        )

    mesh = mesh_from_config(config)
    if mesh is not None:
        state = shard_train_state(state, mesh)
        print(f"[continue] SPMD over mesh {dict(mesh.shape)}")

    diffusion_params = get_diffusion_params(config.timesteps, config)
    loader = get_data_loader(config, seed=seed + start_epoch)
    # Resume gets the same epoch-scan fast path as fresh teacher training:
    # one dispatch + zero per-batch uploads per epoch (state.py rationale).
    from .state import epoch_scan_enabled, make_teacher_epoch_fn

    use_scan = epoch_scan_enabled(config, mesh)
    train_step = epoch_fn = dataset_dev = None
    if use_scan:
        epoch_fn = make_teacher_epoch_fn(
            model, tx, diffusion_params, config.timesteps
        )
        dataset_dev = jax.device_put(loader.images)
        dataset_dev.block_until_ready()
    else:
        train_step = make_teacher_train_step(
            model, tx, diffusion_params, config.timesteps
        )
    ckpt_writer = AsyncCheckpointWriter()
    # One executable for all epochs' sample grids (see teacher.make_grid_fn).
    from .teacher import make_grid_fn

    grid_jit = (
        make_grid_fn(model, config, diffusion_params)
        if config.num_samples_to_generate > 0
        else None
    )

    for i in range(config.epochs):
        epoch = start_epoch + i
        t0 = time.time()
        # Shared epoch driver (training/loop.py): device-side loss
        # accumulation, mesh batch sharding, identical key-split sequence.
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
            progress_desc=f"Continue Epoch {epoch + 1}",
            log_label=f"[continue] epoch {epoch + 1}",
            log_every=log_every,
            loss_fmt=".5f",
        )
        print(
            f"[continue] epoch {epoch + 1} avg loss "
            f"{avg_loss:.5f} ({time.time() - t0:.1f}s)"
        )
        if (epoch + 1) % config.save_interval == 0 or i == config.epochs - 1:
            if config.checkpoint_sharded:
                # Pod-scale lane (see teacher.py): per-device shard writes.
                save_checkpoint_sharded(
                    config.teacher_models_dir,
                    epoch + 1,
                    state.params,
                    batch_stats=state.batch_stats,
                    opt_state=state.opt_state,
                )
            else:
                ckpt_writer.save(
                    config.teacher_models_dir,
                    epoch + 1,
                    state.params,
                    batch_stats=state.batch_stats,
                    opt_state=state.opt_state,
                )
            key, sample_key = jax.random.split(key)
            if grid_jit is not None:
                from ..utils.viz import save_image_grid

                samples = grid_jit(state.params, state.batch_stats, sample_key)
                save_image_grid(
                    np.asarray(samples),
                    os.path.join(
                        config.results_dir, f"samples_epoch_{epoch + 1}.png"
                    ),
                    nrow=config.samples_grid_size,
                    figsize=config.samples_figure_size,
                )

    ckpt_writer.close()
    return model, {"params": state.params, "batch_stats": state.batch_stats}

"""Shared one-epoch driver for the teacher and distillation trainers.

The key-split sequence and per-batch math here are parity-critical: the
epoch-scan path (state._scan_epoch) is bitwise-interchangeable with the
per-batch loop ONLY because both produce the identical
``key, step_key = split(key)`` sequence and the identical empty-epoch loss
guard.  Keeping the driver in one place (instead of the former near
line-for-line copies in teacher.py/students.py) means a fix to either
contract cannot silently desynchronize the trainers.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import shard_batch
from ..parallel.mesh import replicated


def progress_iter(loader, desc, config):
    """tqdm progress bar honoring the reference's progress_bar_* config
    (config.py:83-86); plain iterator when tqdm is unavailable or disabled."""
    try:
        from tqdm import tqdm

        return tqdm(
            loader,
            desc=desc,
            leave=config.progress_bar_leave,
            ncols=config.progress_bar_ncols,
            position=config.progress_bar_position,
            # keep piped logs clean — bars only on a real terminal
            disable=not sys.stderr.isatty(),
        )
    except ImportError:
        return loader


def run_train_epoch(
    state,
    key,
    *,
    use_scan: bool,
    epoch_fn,
    train_step,
    loader,
    dataset_dev,
    config,
    mesh,
    progress_desc: str,
    log_label: str,
    log_every: int,
    loss_fmt: str = ".5f",
    reduce_loss: bool = True,
):
    """Run ONE training epoch; returns ``(state, key, avg_loss, n_batches)``.

    ``reduce_loss=False`` returns the fetched per-step loss ARRAY in place
    of ``avg_loss`` (still empty-guarded) — the multi-student vmapped lane
    needs per-member means from a ``[n_batches, N]`` loss matrix.

    Scan mode (``use_scan``): one jitted dispatch over the whole epoch
    against the device-resident ``dataset_dev``; losses stay on device
    until a single fetch here (a float(loss) per step costs one tunnel RTT
    per batch on the axon backend and blocks async dispatch pipelining).

    Loop mode: per-batch jitted ``train_step`` with device-side loss
    accumulation, mesh batch sharding when SPMD, and a running-loss print
    (or tqdm postfix) every ``log_every`` batches formatted with
    ``loss_fmt`` under ``log_label``.

    The empty-epoch guard (``limit_batches_per_epoch=0`` or a dataset
    smaller than one batch) returns 0.0 in BOTH modes — np.mean([]) is NaN
    plus a RuntimeWarning.
    """
    if use_scan:
        idx = loader.epoch_indices(config.limit_batches_per_epoch)
        state, key, losses_dev = epoch_fn(state, dataset_dev, idx, key)
        losses_host = jax.device_get(losses_dev)
        if not reduce_loss:
            return state, key, losses_host, int(idx.shape[0])
        avg_loss = float(np.mean(losses_host)) if len(losses_host) else 0.0
        return state, key, avg_loss, int(idx.shape[0])

    losses = []
    progress = progress_iter(loader, progress_desc, config)
    for batch_idx, (images, _) in enumerate(progress):
        if (
            config.limit_batches_per_epoch is not None
            and batch_idx >= config.limit_batches_per_epoch
        ):
            break
        key, step_key = jax.random.split(key)
        if mesh is not None:
            images = shard_batch(images, mesh)
            step_key = jax.device_put(step_key, replicated(mesh))
        else:
            images = jnp.asarray(images)
        state, loss = train_step(state, images, step_key)
        losses.append(loss)
        if log_every and (batch_idx + 1) % log_every == 0:
            running = float(np.mean(jax.device_get(losses)))
            if hasattr(progress, "set_postfix"):
                progress.set_postfix(loss=running)
            else:
                print(
                    f"{log_label} batch {batch_idx + 1}/{len(loader)} "
                    f"loss {running:{loss_fmt}}"
                )
    losses_host = np.asarray(jax.device_get(losses)) if losses else np.zeros(0)
    if not reduce_loss:
        return state, key, losses_host, len(losses)
    avg_loss = float(np.mean(losses_host)) if losses else 0.0
    return state, key, avg_loss, len(losses)

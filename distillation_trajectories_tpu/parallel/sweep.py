"""Device-parallel student sweep: the 11-size-factor distillation sweep
distributed across devices.

The reference trains students strictly sequentially
(scripts/train_students.py:257-266).  Students of different size factors are
*different architectures* (different channel widths), so they cannot be
vmapped or SPMD-sharded together; the TPU-native way to parallelize the
sweep is placement parallelism: pin student *i* to device ``i % n_devices``
and dispatch every student's train step per batch **without blocking** — the
JAX runtime executes computations on distinct devices concurrently, so the
sweep's wall-clock approaches max(per-student time) instead of sum().

Semantics are kept identical to the sequential trainer
(``training.students.distill_diffusion_model``): same per-student PRNG
stream ``PRNGKey(seed + sf*1000)``, same batch order (the shared loader
reproduces the per-student loader's epoch shuffle), same checkpoint naming
and end-of-training sample grids.  ``tests/test_sweep_parallel.py`` asserts
loss parity with the sequential path.
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
from ..models import make_unet, init_unet
from ..utils.profiling import MetricsLogger


class _StudentSlot:
    """One student's device-pinned training context."""

    def __init__(self, size_factor: float, device, model, state, train_step, key):
        self.size_factor = size_factor
        self.device = device
        self.model = model
        self.state = state
        self.train_step = train_step
        self.key = key  # host-side PRNG stream, matches sequential trainer
        self.loss_sum = jnp.zeros((), jnp.float32)
        self.n_batches = 0

    def begin_epoch(self):
        self.loss_sum = jax.device_put(jnp.zeros((), jnp.float32), self.device)
        self.n_batches = 0


def distill_students_parallel(
    config,
    teacher_model,
    teacher_variables,
    size_factors: List[float],
    seed: int = 0,
    devices: Optional[List] = None,
) -> Dict[float, Tuple[object, dict]]:
    """Distill all students concurrently, one device per student (round-robin).

    Returns {size_factor: (model, variables)} like
    ``training.students.train_students``.
    """
    from ..training.state import (
        create_train_state,
        make_distill_train_step,
        make_eval_model_fn,
        make_optimizer,
    )
    from ..utils.viz import save_image_grid

    if devices is None:
        devices = jax.devices()
    teacher_params_d = get_diffusion_params(config.teacher_steps, config)
    student_params_d = get_diffusion_params(config.student_steps, config)
    tx = make_optimizer(config)

    print(
        f"[sweep] distilling {len(size_factors)} students over "
        f"{min(len(size_factors), len(devices))} devices (round-robin)"
    )

    slots: List[_StudentSlot] = []
    for i, sf in enumerate(size_factors):
        dev = devices[i % len(devices)]
        # Same stream as distill_diffusion_model: PRNGKey(seed + sf*1000).
        key = jax.random.PRNGKey(seed + int(sf * 1000))
        key, init_key = jax.random.split(key)
        model = make_unet(config, size_factor=sf)
        variables = init_unet(model, config, init_key)
        state = jax.device_put(create_train_state(model, variables, tx), dev)
        teacher_on_dev = jax.device_put(teacher_variables, dev)
        step = make_distill_train_step(
            teacher_model,
            teacher_on_dev,
            model,
            tx,
            teacher_params_d,
            config.teacher_steps,
            config.student_steps,
        )
        slots.append(_StudentSlot(sf, dev, model, state, step, key))

    # One shared loader pass per epoch; every student sees the identical
    # batch sequence the sequential trainer would give it (same seed, same
    # epoch counter ⇒ same shuffle permutation).
    loader = get_data_loader(config, seed=seed)
    metrics_log = MetricsLogger(
        os.path.join(config.results_dir, "sweep_parallel_metrics.jsonl")
    )
    from ..training.checkpoints import AsyncCheckpointWriter

    ckpt_writer = AsyncCheckpointWriter()

    for epoch in range(config.epochs):
        t0 = time.time()
        for slot in slots:
            slot.begin_epoch()
        for batch_idx, (images, _) in enumerate(loader):
            if (
                config.limit_batches_per_epoch is not None
                and batch_idx >= config.limit_batches_per_epoch
            ):
                break
            for slot in slots:
                slot.key, step_key = jax.random.split(slot.key)
                images_d = jax.device_put(images, slot.device)
                step_key = jax.device_put(step_key, slot.device)
                # Async dispatch: no host sync here — steps on distinct
                # devices overlap.
                slot.state, loss = slot.train_step(slot.state, images_d, step_key)
                slot.loss_sum = slot.loss_sum + loss
                slot.n_batches += 1
        # Epoch barrier: one float() per student (the only host sync).
        dt = time.time() - t0
        for slot in slots:
            avg = float(slot.loss_sum) / max(slot.n_batches, 1)
            print(
                f"[sweep sf={slot.size_factor}] epoch {epoch + 1}/"
                f"{config.epochs} avg loss {avg:.6f} ({dt:.1f}s wall, shared)"
            )
            metrics_log.log(
                "epoch", epoch=epoch + 1, size_factor=slot.size_factor,
                avg_loss=avg, seconds=dt,
            )

        if (epoch + 1) % config.save_interval == 0 or epoch == config.epochs - 1:
            for slot in slots:
                ckpt_writer.save(
                    config.student_dir(slot.size_factor),
                    epoch + 1,
                    slot.state.params,
                    batch_stats=slot.state.batch_stats,
                    opt_state=slot.state.opt_state,
                )

    # End-of-training sample grids (sequential trainer parity,
    # training/students.py end-of-epoch block; skipped when
    # num_samples_to_generate == 0).
    for slot in slots if config.num_samples_to_generate > 0 else []:
        slot.key, sample_key = jax.random.split(slot.key)
        model_fn = make_eval_model_fn(
            slot.model,
            {"params": slot.state.params, "batch_stats": slot.state.batch_stats},
        )
        samples = p_sample_loop(
            model_fn,
            (
                config.num_samples_to_generate,
                config.image_size,
                config.image_size,
                config.channels,
            ),
            config.student_steps,
            student_params_d,
            sample_key,
            num_timesteps=config.timesteps,
            mode=getattr(config, "sample_mode", "reference"),
        )
        save_image_grid(
            np.asarray(samples),
            os.path.join(
                config.results_dir,
                f"student_samples_size_{slot.size_factor}_epoch_{config.epochs}.png",
            ),
            nrow=config.samples_grid_size,
            figsize=config.samples_figure_size,
        )

    metrics_log.close()
    ckpt_writer.close()
    return {
        slot.size_factor: (
            slot.model,
            {"params": slot.state.params, "batch_stats": slot.state.batch_stats},
        )
        for slot in slots
    }

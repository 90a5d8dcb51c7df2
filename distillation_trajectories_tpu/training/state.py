"""Train state and jitted train-step factories.

TPU-native training core: a single donated jitted step per model holding
params, BatchNorm batch_stats, optimizer state, and optional EMA params.
Covers the reference teacher loop (train_teacher.py:55-82: dual
conditional/unconditional ε-MSE loss) and the distillation loop
(train_students.py:117-176: 4-forward teacher/student matching loss).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion.process import q_sample


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None


def create_train_state(
    model, variables, tx: optax.GradientTransformation, use_ema: bool = False
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        # EMA starts as a COPY: aliasing the same buffers would make the
        # donated train step fail with "donate the same buffer twice".
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
    )


def make_optimizer(config) -> optax.GradientTransformation:
    """Adam with torch defaults (β=(0.9, 0.999), eps=1e-8).

    The reference declares adam_beta1=0.8 in Config (config.py:32) but its
    trainers use ``optim.Adam(params, lr)`` with torch defaults
    (train_teacher.py:49, train_students.py:108) — we match what actually
    runs.
    """
    return optax.adam(config.lr, b1=0.9, b2=0.999, eps=1e-8)


def make_state_init_fn(
    model,
    config,
    tx: optax.GradientTransformation,
    use_ema: bool = False,
    force_jit: Optional[bool] = None,
):
    """Build ``key -> TrainState`` as ONE graph: model init + optimizer init.

    Eager construction pays one tunnel RTT per op on the axon backend —
    model.init dispatches every initializer separately (hence
    models.make_init_fn), but ``tx.init`` then dispatches ~2 zeros_like per
    param leaf on top: measured ~6 s per student, 80.9 s of the r05 students
    stage across 13 builds (SWEEP_r05.json phases.builds_s).  Fusing both
    inits into one jitted graph makes a build one dispatch; like
    make_init_fn it stays eager on CPU (no RTT to save; pytest would pay a
    compile per architecture) unless ``force_jit`` overrides.

    Exposed as a factory so sweeps can ``lower()`` one graph per distinct
    architecture and compile them concurrently (utils/compile_pool.py).
    """
    from ..models import make_init_fn

    init = make_init_fn(model, config, force_jit=False)

    def _state(key):
        return create_train_state(model, init(key), tx, use_ema=use_ema)

    jit_it = (jax.default_backend() != "cpu") if force_jit is None else force_jit
    return jax.jit(_state) if jit_it else _state


def make_eval_model_fn(model, variables) -> Callable:
    """Eval-mode forward closure: (x, t, cond, cond_mask) -> ε̂."""

    def model_fn(x, t, cond=None, cond_mask=None):
        return model.apply(variables, x, t, cond=cond, cond_mask=cond_mask, train=False)

    return model_fn


def make_eval_fn_from_config(model, variables, config) -> Callable:
    """Config-aware eval forward: the single dispatcher every eval consumer
    (trajectory engine, editing flows) routes through.

    * ``Config.sampler_quant="int8"`` — the folded/quantized forward
      (models/quantized.py); call in a traced context so the fold/quant ops
      stay inside the caller's jitted graph.
    * ``Config.spatial_shape=(d, s)`` — the spatially partitioned forward
      (parallel/spatial.py): image rows sharded s-way with GSPMD halo
      exchange, the beyond-HBM big-image lane for sampling AND editing.
    * default — the plain eval forward.

    The two opt-ins are mutually exclusive: the quantized forward bypasses
    the Block modules the spatial constraints intercept.
    """
    spatial = config is not None and getattr(config, "spatial_shape", None)
    if config is not None and getattr(config, "sampler_quant", "none") == "int8":
        if spatial:
            raise ValueError(
                "spatial_shape and sampler_quant='int8' cannot combine: the "
                "quantized forward bypasses the Block modules the spatial "
                "constraints intercept"
            )
        from ..models.quantized import make_quantized_eval_fn

        return make_quantized_eval_fn(model, variables)
    if spatial:
        from ..parallel.spatial import make_spatial_forward, make_spatial_mesh

        mesh = make_spatial_mesh(tuple(spatial))
        fwd = make_spatial_forward(model, mesh)

        def model_fn(x, t, cond=None, cond_mask=None):
            return fwd(variables, x, t, cond, cond_mask)

        return model_fn
    return make_eval_model_fn(model, variables)


def _train_apply(model, params, batch_stats, x, t, cond, cond_mask, dropout_key):
    """One train-mode forward, returning (output, updated batch_stats)."""
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        t,
        cond=cond,
        cond_mask=cond_mask,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": dropout_key},
    )
    return out, mutated["batch_stats"]


def _teacher_step_core(
    model,
    tx: optax.GradientTransformation,
    diffusion_params,
    timesteps: int,
    ema_rate: Optional[float] = None,
):
    """Unjitted teacher step body shared by the per-batch jitted step and
    the epoch-level scan (:func:`make_teacher_epoch_fn`)."""

    def train_step(state: TrainState, images: jnp.ndarray, key: jax.Array):
        b = images.shape[0]
        kt, kn1, kn2, kd1, kd2 = jax.random.split(key, 5)
        t = jax.random.randint(kt, (b,), 0, timesteps)
        ones = jnp.ones((b, 1), dtype=images.dtype)
        zeros = jnp.zeros((b, 1), dtype=images.dtype)

        def loss_fn(params):
            bs = state.batch_stats
            x_noisy1, noise1 = q_sample(images, t, diffusion_params, kn1)
            pred1, bs = _train_apply(model, params, bs, x_noisy1, t, ones, ones, kd1)
            loss_cond = jnp.mean((pred1 - noise1) ** 2)

            x_noisy2, noise2 = q_sample(images, t, diffusion_params, kn2)
            pred2, bs = _train_apply(model, params, bs, x_noisy2, t, zeros, zeros, kd2)
            loss_uncond = jnp.mean((pred2 - noise2) ** 2)

            return (loss_cond + loss_uncond) / 2.0, bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_rate is not None and state.ema_params is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: ema_rate * e + (1.0 - ema_rate) * p,
                state.ema_params,
                new_params,
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, loss

    return train_step


def make_teacher_train_step(
    model,
    tx: optax.GradientTransformation,
    diffusion_params,
    timesteps: int,
    ema_rate: Optional[float] = None,
):
    """Jitted teacher step: dual cond/uncond ε-MSE (reference
    train_teacher.py:68-78).  Both losses share the same ``t`` but use
    independent noise draws, matching the reference's two separate
    ``p_losses`` calls."""
    core = _teacher_step_core(model, tx, diffusion_params, timesteps, ema_rate)
    return partial(jax.jit, donate_argnums=(0,))(core)


def epoch_scan_enabled(config, mesh) -> bool:
    """Epoch-level lax.scan path: single-device only (mesh runs need
    per-batch shard_batch placement); DTT_EPOCH_SCAN=0 force-disables."""
    import os

    return (
        bool(getattr(config, "epoch_scan", True))
        and mesh is None
        and os.environ.get("DTT_EPOCH_SCAN", "1") != "0"
    )


def _scan_epoch(step_core, state, dataset, idx, key):
    """lax.scan over one epoch's batch indices with a device-resident
    dataset: key-split sequence and per-batch math are IDENTICAL to the
    per-batch python loop (``key, sk = split(key)`` then step), so the
    scan path is bitwise-interchangeable with it."""

    def body(carry, batch_idx):
        state, key = carry
        key, step_key = jax.random.split(key)
        images = jnp.take(dataset, batch_idx, axis=0)
        state, loss = step_core(state, images, step_key)
        return (state, key), loss

    (state, key), losses = jax.lax.scan(body, (state, key), idx)
    return state, key, losses


def make_teacher_epoch_fn(
    model,
    tx: optax.GradientTransformation,
    diffusion_params,
    timesteps: int,
    ema_rate: Optional[float] = None,
):
    """Epoch-level teacher training: ONE jitted lax.scan over a whole
    epoch's batches against a device-resident dataset.

    TPU-native rationale: the per-batch loop pays a tunnel RTT per dispatch
    plus a host→device upload of every batch (~1.5 MB × ~78 batches ×
    every epoch); here the dataset uploads ONCE per process and an epoch is
    one dispatch.  ``dataset`` and the shuffled ``idx`` ([n_batches, B]
    int32, from DataLoader.epoch_indices) ride as jit ARGUMENTS — never
    closure constants (see make_distill_train_step's rationale).

    Returns ``epoch_fn(state, dataset, idx, key) -> (state, key', losses)``
    where ``key'`` continues the exact split sequence the per-batch loop
    would have produced.
    """
    core = _teacher_step_core(model, tx, diffusion_params, timesteps, ema_rate)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state, dataset, idx, key):
        return _scan_epoch(core, state, dataset, idx, key)

    return epoch_fn


def make_distill_train_step(
    teacher_model,
    teacher_variables,
    student_model,
    tx: optax.GradientTransformation,
    teacher_diffusion_params,
    teacher_steps: int,
    student_steps: int,
):
    """Jitted distillation step (reference train_students.py:125-172).

    Per batch: sample t_teacher ~ U[0, T), convert t_student =
    ⌊t·S/T⌋ (train_students.py:114), noise images with the *teacher's*
    schedule, run teacher cond/uncond in eval mode (no grad), student
    cond/uncond in train mode, and minimize the average of the two MSEs
    between student and teacher predictions.
    """
    core = _distill_step_core(
        teacher_model, student_model, tx, teacher_diffusion_params,
        teacher_steps, student_steps,
    )
    # teacher_variables is an ARGUMENT of the jitted step, not a closure:
    # closed-over param trees are embedded in the lowered IR, and the axon
    # backend hashes the whole module per compile for its server-side cache
    # (minutes for ~40 MB of inline constants, and a new cache key for
    # every retrained teacher).  See engine._VariablesAsArgFn.
    _train_step = partial(jax.jit, donate_argnums=(1,))(core)

    class _DistillStep:
        """step(state, images, key) with teacher vars pre-bound; ``lower``
        exposed for AOT compile pools (utils/compile_pool.py)."""

        def __call__(self, state, images, key):
            return _train_step(teacher_variables, state, images, key)

        def lower(self, state, images, key):
            return _train_step.lower(teacher_variables, state, images, key)

        @property
        def aot_prefix(self):
            # Re-prepended when an AOT Compiled built from lower() is
            # called directly (compile_pool.CompiledWithFallback).
            return (teacher_variables,)

    return _DistillStep()


def _distill_step_core(
    teacher_model,
    student_model,
    tx: optax.GradientTransformation,
    teacher_diffusion_params,
    teacher_steps: int,
    student_steps: int,
):
    """Unjitted distillation step body shared by the per-batch jitted step
    and the epoch-level scan (:func:`make_distill_epoch_fn`)."""
    ratio = student_steps / teacher_steps

    def _train_step(t_vars, state: TrainState, images: jnp.ndarray, key: jax.Array):
        teacher_fn = make_eval_model_fn(teacher_model, t_vars)
        b = images.shape[0]
        kt, kn, kd1, kd2 = jax.random.split(key, 4)
        t_teacher = jax.random.randint(kt, (b,), 0, teacher_steps)
        t_student = jnp.floor(t_teacher * ratio).astype(jnp.int32)
        ones = jnp.ones((b, 1), dtype=images.dtype)
        zeros = jnp.zeros((b, 1), dtype=images.dtype)

        x_noisy, _ = q_sample(images, t_teacher, teacher_diffusion_params, kn)
        teacher_cond = jax.lax.stop_gradient(teacher_fn(x_noisy, t_teacher, ones, ones))
        teacher_uncond = jax.lax.stop_gradient(
            teacher_fn(x_noisy, t_teacher, zeros, zeros)
        )

        def loss_fn(params):
            bs = state.batch_stats
            student_cond, bs = _train_apply(
                student_model, params, bs, x_noisy, t_student, ones, ones, kd1
            )
            student_uncond, bs = _train_apply(
                student_model, params, bs, x_noisy, t_student, zeros, zeros, kd2
            )
            loss_cond = jnp.mean((student_cond - teacher_cond) ** 2)
            loss_uncond = jnp.mean((student_uncond - teacher_uncond) ** 2)
            return (loss_cond + loss_uncond) / 2.0, bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, loss

    return _train_step


def make_distill_epoch_fn(
    teacher_model,
    teacher_variables,
    student_model,
    tx: optax.GradientTransformation,
    teacher_diffusion_params,
    teacher_steps: int,
    student_steps: int,
):
    """Epoch-level distillation: ONE jitted lax.scan per epoch against a
    device-resident dataset (see make_teacher_epoch_fn's rationale — this
    is the dominant workload stage's per-batch-RTT/upload fix).

    Returns ``epoch(state, dataset, idx, key) -> (state, key', losses)``
    with teacher variables pre-bound as a jit ARGUMENT and ``lower``
    exposed for AOT compile pools.
    """
    core = _distill_step_core(
        teacher_model, student_model, tx, teacher_diffusion_params,
        teacher_steps, student_steps,
    )

    @partial(jax.jit, donate_argnums=(1,))
    def _epoch(t_vars, state, dataset, idx, key):
        return _scan_epoch(
            lambda s, im, k: core(t_vars, s, im, k), state, dataset, idx, key
        )

    class _DistillEpoch:
        def __call__(self, state, dataset, idx, key):
            return _epoch(teacher_variables, state, dataset, idx, key)

        def lower(self, state, dataset, idx, key):
            return _epoch.lower(teacher_variables, state, dataset, idx, key)

        @property
        def aot_prefix(self):
            return (teacher_variables,)

    return _DistillEpoch()


def stack_train_states(states):
    """Stack same-architecture TrainStates along a leading member axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_train_state(states, i: int):
    """Member ``i`` of a stacked TrainState pytree."""
    return jax.tree_util.tree_map(lambda x: x[i], states)


def make_multi_distill_epoch_fn(
    teacher_model,
    teacher_variables,
    student_model,
    tx: optax.GradientTransformation,
    teacher_diffusion_params,
    teacher_steps: int,
    student_steps: int,
):
    """Epoch-level distillation for N SAME-ARCHITECTURE students as ONE
    batched graph (the vmapped multi-student step, VERDICT r4 #5).

    The 16-channel floor maps several size factors onto one derived U-Net
    (e.g. sf 0.01 and 0.05), and the reference trains its sweep strictly
    sequentially (train_students.py:257-266).  Here the whole identical-arch
    group rides a single ``lax.scan(vmap(step))`` graph: one dispatch per
    epoch for the group, one shared batch gather, and the member axis keeps
    the MXU fed where one tiny student's convs underutilize it.

    Parity contract: each member's math is EXACTLY the sequential trainer's
    — the same per-batch ``key, step_key = split(key)`` stream per member,
    the same shared batch composition (all sequential students use
    same-seed loader views, so their epoch indices are identical), and the
    same step core — pinned by tests/test_training.py's vmapped-vs-
    sequential parity test.

    Returns ``epoch(states, dataset, idx, keys) -> (states, keys', losses)``
    where ``states``/``keys`` carry a leading member axis (see
    :func:`stack_train_states`) and ``losses`` is ``[n_batches, N]``.
    Teacher variables pre-bound as a jit ARGUMENT; ``lower`` exposed for
    AOT compile pools.
    """
    core = _distill_step_core(
        teacher_model, student_model, tx, teacher_diffusion_params,
        teacher_steps, student_steps,
    )

    @partial(jax.jit, donate_argnums=(1,))
    def _epoch(t_vars, states, dataset, idx, keys):
        # vmap of the ONE epoch driver (_scan_epoch) over the member axis:
        # the key-split sequence and empty-epoch semantics are inherited,
        # not re-inlined, so they cannot drift from the sequential lane.
        def member_epoch(state, key):
            return _scan_epoch(
                lambda s, images, sk: core(t_vars, s, images, sk),
                state, dataset, idx, key,
            )

        states, keys, losses = jax.vmap(member_epoch)(states, keys)
        return states, keys, losses.T  # [n_batches, N]

    class _MultiDistillEpoch:
        def __call__(self, states, dataset, idx, keys):
            return _epoch(teacher_variables, states, dataset, idx, keys)

        def lower(self, states, dataset, idx, keys):
            return _epoch.lower(teacher_variables, states, dataset, idx, keys)

        @property
        def aot_prefix(self):
            return (teacher_variables,)

    return _MultiDistillEpoch()

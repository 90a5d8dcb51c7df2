"""Progressive step-halving distillation (opt-in, beyond-reference).

The round-2 scan-ablation showed the engine sampler at its practical
roofline (U-Net forwards are 96.9% of step time at 60.9% MFU) — the one
remaining throughput lever is FEWER FORWARDS.  This module implements
progressive distillation in the style of Salimans & Ho (2022, "Progressive
Distillation for Fast Sampling of Diffusion Models"), adapted to this
framework's engine-formulation sampler (diffusion/sampling.py
``engine_update``, reference trajectory_engine.py:96-110): a student
running N/2 steps is trained so ONE of its deterministic engine updates
lands where TWO consecutive teacher updates land; iterating rounds halves
the step count again each time (50 → 25 → 12 → …).

It builds on the existing distillation machinery (training/students.py's
⌊t·S/T⌋ time-mapping convention; reference counterpart
train_students.py:114) but is a separate opt-in mode — the reference's own
distillation trains same-step-count students of smaller width, which this
composes with.

Schedule consistency: at sampling time a model with S steps runs
``generate_trajectory_scan`` over ``get_diffusion_params(S)`` per-step
alphas, so the student is TRAINED against exactly those alphas — its
single step at index j (reading ``alphas_S[j], alphas_S[j-1]``) is matched
to the teacher's deterministic composition of steps 2j and 2j−1 on the
teacher's own schedule.  The student's ε̂-target is solved in closed form
from the engine update, so whatever c₁/c₂ mismatch exists between the two
schedules is absorbed into the regression target.  The stochastic σ terms
are omitted from the target (standard in progressive distillation: the
student learns the deterministic map; sampling may still add noise).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion import get_diffusion_params
from ..diffusion.process import q_sample
from .checkpoints import AsyncCheckpointWriter, save_checkpoint_sharded
from .state import (
    TrainState,
    _train_apply,
    create_train_state,
    make_eval_model_fn,
    make_optimizer,
)


def _engine_c(alpha_t, alpha_prev):
    """(c1, c2) of the deterministic engine update (kept in sync with
    engine_update's algebra, diffusion/sampling.py:154-172)."""
    c1 = jnp.sqrt(alpha_prev) / jnp.sqrt(alpha_t)
    c2 = jnp.sqrt(1.0 - alpha_prev) - jnp.sqrt(alpha_prev / alpha_t) * jnp.sqrt(
        1.0 - alpha_t
    )
    return c1, c2


def make_guided_eval_fn(model, variables, guidance_value: float,
                        quant: Optional[str] = None, **quant_kw):
    """Eval-mode model fn for a w-CONDITIONED student: ignores the sampler's
    (cond, cond_mask) inputs and feeds ``cond=w, mask=1`` so
    ``generate_trajectory_scan(..., guidance_scale=None)`` runs the guided
    map in a SINGLE forward per step — the student's replacement for the
    teacher's two-forward CFG combine at scale w.

    ``quant="int8"`` composes the two throughput axes: the fewer-forwards
    win of the w-conditioned student times the int8-MXU win of the
    quantized forward (models/quantized.py).  Extra ``quant_kw``
    (``act_scales``, ``quant_blocks``) pass through to
    ``make_quantized_eval_fn`` — the static-scale / mixed-precision arms."""
    if quant == "int8":
        from ..models.quantized import make_quantized_eval_fn

        base = make_quantized_eval_fn(model, variables, **quant_kw)
    else:
        base = make_eval_model_fn(model, variables)

    def fn(x, t, cond, cond_mask):
        b = x.shape[0]
        w = jnp.full((b, 1), guidance_value, dtype=x.dtype)
        return base(x, t, w, jnp.ones((b, 1), dtype=x.dtype))

    return fn


def make_progressive_distill_step(
    teacher_model,
    student_model,
    tx: optax.GradientTransformation,
    teacher_alphas: jnp.ndarray,
    student_alphas: jnp.ndarray,
    teacher_steps: int,
    teacher_cumprod_params,
    guidance_range: Optional[Tuple[float, float]] = None,
    teacher_guided: bool = False,
):
    """Jitted progressive-distillation step factory.

    Per batch: draw x₀ ~ data, student step indices j ~ U[1, S); map to the
    teacher pair (t, t−1) = (2j, 2j−1); noise x₀ to the teacher's x_t via
    the cumulative schedule; compose two deterministic teacher engine
    updates x_t → x_{t−2}; solve the student's single engine update for the
    ε̂* that lands there and regress the student prediction onto it.  The
    x-space loss is weighted per sample by min(1, C2²/1e-4) — the
    truncated-SNR idea of Salimans & Ho §3.2 — so near-zero-C2 steps don't
    dominate via the 1/C2² amplification in ε̂*.

    ``guidance_range=(lo, hi)`` switches on GUIDED distillation in the
    style of Meng et al. 2023 ("On Distillation of Guided Diffusion
    Models"): a per-sample w ~ U[lo, hi] is drawn, the teacher's ε̂ at each
    of the two composed steps is the CFG combine u + w·(c − u) (the engine
    sampler's two-forward formulation, trajectory_engine.py:68-80), and the
    student is conditioned on w directly through the model's cond pathway
    (cond=w, mask=1) — one student forward replaces the teacher's two.
    ``teacher_guided=True`` marks the teacher as ALREADY w-conditioned (a
    previous guided round's student), evaluated in a single forward at
    cond=w; later halvings therefore cost 2 teacher forwards, not 4.

    Schedule-consistency caveat (deliberate, do NOT "fix" one side alone):
    j ~ U[1, S) maps to teacher pairs (2j, 2j−1), covering teacher steps
    2..2S−2 — the teacher's TOP step t = 2S−1 (its first update from pure
    noise) is never distilled, and the student's own top step j = S−1
    trains on q_sample inputs at t = 2S−2 while receiving pure noise at
    sampling time.  This mismatch is forced by the reference sampler's odd
    step count (a T-step chain makes 2S−1 real updates, not 2(S−1); see
    generate_trajectory_scan's no-op t=0 step), and measured quality impact
    is small (PERFORMANCE.md progressive results).  Any remapping must keep
    the train-time pair composition and the sample-time schedule consistent
    with each other — shifting one without the other silently changes what
    the student's top step means.

    Returns a callable factory: ``make_...(...)(teacher_variables)`` gives
    ``step(state, images, key) -> (state, loss)`` with ``lower`` exposed for
    AOT compile pools; teacher variables ride as a jit ARGUMENT (see
    state.make_distill_train_step's rationale).
    """
    student_steps = student_alphas.shape[0]
    assert teacher_steps // 2 == student_steps, (teacher_steps, student_steps)

    @partial(jax.jit, donate_argnums=(1,))
    def _step(t_vars, state: TrainState, images: jnp.ndarray, key: jax.Array):
        # Converted INSIDE the trace so the host schedule constants embed
        # into the IR from host memory (see get_diffusion_params).
        teacher_alphas_ = jnp.asarray(teacher_alphas)
        student_alphas_ = jnp.asarray(student_alphas)
        teacher_fn = make_eval_model_fn(teacher_model, t_vars)
        b = images.shape[0]
        kj, kn, kd, kw = jax.random.split(key, 4)
        # Student step index j ∈ [1, S): reads student_alphas[j], [j-1] and
        # replaces teacher steps t=2j (alphas[2j], alphas[2j-1]) then
        # t=2j-1 (alphas[2j-1], alphas[2j-2]); t-2 = 2j-2 ≥ 0.
        j = jax.random.randint(kj, (b,), 1, student_steps)
        t = 2 * j

        x_t, _ = q_sample(images, t, teacher_cumprod_params, kn)
        zeros = jnp.zeros((b, 1), dtype=images.dtype)
        ones = jnp.ones((b, 1), dtype=images.dtype)

        if guidance_range is not None:
            lo, hi = guidance_range
            w_cfg = jax.random.uniform(
                kw, (b, 1), minval=lo, maxval=hi, dtype=images.dtype
            )

            def teacher_eps(x, tvec):
                if teacher_guided:
                    # Teacher is a previous guided round's student: already
                    # w-conditioned, one forward.
                    return teacher_fn(x, tvec, w_cfg, ones)
                u = teacher_fn(x, tvec, zeros, ones)
                c = teacher_fn(x, tvec, ones, ones)
                return u + w_cfg[:, :, None, None] * (c - u)

            student_cond, student_mask = w_cfg, ones
        else:

            def teacher_eps(x, tvec):
                # No-CFG forward — cond 0, mask 0 — matching the engine
                # sampler's gs≤1 path.
                return teacher_fn(x, tvec, zeros, zeros)

            student_cond, student_mask = zeros, zeros

        def bcast(v):
            return v.reshape(b, 1, 1, 1)

        # Two deterministic teacher engine steps.
        eps1 = jax.lax.stop_gradient(teacher_eps(x_t, t.astype(jnp.float32)))
        c1a, c2a = _engine_c(teacher_alphas_[t], teacher_alphas_[t - 1])
        x_mid = bcast(c1a) * x_t - bcast(c2a) * eps1
        eps2 = jax.lax.stop_gradient(
            teacher_eps(x_mid, (t - 1).astype(jnp.float32))
        )
        c1b, c2b = _engine_c(teacher_alphas_[t - 1], teacher_alphas_[t - 2])
        x_target = bcast(c1b) * x_mid - bcast(c2b) * eps2

        # Student single step at index j on ITS OWN sampling schedule.
        c1s, c2s = _engine_c(student_alphas_[j], student_alphas_[j - 1])
        eps_star = (bcast(c1s) * x_t - x_target) / bcast(c2s)

        def loss_fn(params):
            bs = state.batch_stats
            pred, bs = _train_apply(
                student_model, params, bs, x_t, j.astype(jnp.float32),
                student_cond, student_mask, kd,
            )
            per = jnp.mean((pred - eps_star) ** 2, axis=(1, 2, 3))
            w = jnp.minimum(1.0, (c2s * c2s) / 1e-4)
            return jnp.mean(w * per), bs

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

    class _Step:
        def __init__(self, t_vars):
            self._t_vars = t_vars

        def __call__(self, state, images, key):
            return _step(self._t_vars, state, images, key)

        def lower(self, state, images, key):
            return _step.lower(self._t_vars, state, images, key)

    return _Step


def progressive_distill(
    config,
    teacher_model,
    teacher_variables,
    rounds: int = 1,
    seed: int = 0,
    epochs_per_round: Optional[int] = None,
    guidance_range: Optional[Tuple[float, float]] = None,
) -> Tuple[object, dict, int]:
    """Iterated step-halving: returns (model, final_variables, final_steps).

    Round r distills the current fastest model (initially the teacher at
    ``config.teacher_steps``) into a SAME-architecture student running half
    the steps; the student then becomes the next round's teacher.  Students
    are initialised FROM the teacher's params (the task is near-identity at
    init — standard in progressive distillation).  Checkpoints land in
    ``<teacher_models_dir>/../progressive/steps_{n}/`` with the usual epoch
    naming, so ``generate_trajectory_scan(model, timesteps=n)`` reproduces
    the distilled sampler directly.

    ``guidance_range=(lo, hi)`` additionally distills CLASSIFIER-FREE
    GUIDANCE into the student (see make_progressive_distill_step): round 1
    regresses onto the real teacher's two-forward CFG combine at per-sample
    w ~ U[lo, hi]; every later round's teacher is the previous w-conditioned
    student (single guided forward).  Checkpoints then land under
    ``progressive_cfg/steps_{n}/`` and sampling uses
    ``make_guided_eval_fn(model, vars, w)`` — ONE forward per step where the
    CFG teacher pays two, on top of the step-count halving.
    """
    from ..data import get_data_loader
    from ..utils.compile_pool import arm_watchdog, cancel_watchdog

    epochs = epochs_per_round or config.epochs
    cur_model, cur_vars = teacher_model, teacher_variables
    cur_steps = int(config.teacher_steps)
    writer = AsyncCheckpointWriter()
    # Tunnel-hang watchdog (no-op on CPU): a dropped axon RPC mid-epoch
    # otherwise hangs the round forever.  Budget adapts to the measured
    # epoch time; DTT_COMPILE_TIMEOUT overrides.
    prev_epoch_s = 0.0
    try:
        for r in range(rounds):
            next_steps = cur_steps // 2
            if next_steps < 2:
                print(f"[progressive] {cur_steps} steps cannot halve further")
                break
            dp_teacher = get_diffusion_params(cur_steps, config)
            dp_student = get_diffusion_params(next_steps, config)
            tx = make_optimizer(config)
            # COPY the init: the train step donates the state, and the
            # teacher variables (passed as the un-donated arg) must survive.
            student_vars = jax.tree_util.tree_map(jnp.copy, cur_vars)
            state = create_train_state(cur_model, student_vars, tx)
            step_fn = make_progressive_distill_step(
                cur_model,
                cur_model,
                tx,
                dp_teacher["alphas"],
                dp_student["alphas"],
                cur_steps,
                dp_teacher,
                guidance_range=guidance_range,
                # Round 1's teacher is the real CFG teacher (two forwards);
                # every later round's teacher is the previous w-conditioned
                # student (one guided forward).
                teacher_guided=(guidance_range is not None and r > 0),
            )(cur_vars)
            loader = get_data_loader(config, seed=seed + r)
            key = jax.random.PRNGKey(seed + 1000 * r)
            print(
                f"[progressive] round {r + 1}/{rounds}: {cur_steps} -> "
                f"{next_steps} steps, {epochs} epochs"
            )
            for epoch in range(epochs):
                # First epoch of a round pays the jit compile (~5 min on
                # the tunneled chip); later epochs get 4x the last measured
                # epoch as headroom.
                arm_watchdog(
                    max(1800.0, 4.0 * prev_epoch_s) if epoch == 0
                    else max(900.0, 4.0 * prev_epoch_s)
                )
                t0 = time.time()
                losses = []
                for batch_idx, (images, _) in enumerate(loader):
                    if (
                        config.limit_batches_per_epoch is not None
                        and batch_idx >= config.limit_batches_per_epoch
                    ):
                        break
                    key, sk = jax.random.split(key)
                    state, loss = step_fn(state, jnp.asarray(images), sk)
                    losses.append(loss)
                avg = float(np.mean(jax.device_get(losses))) if losses else 0.0
                prev_epoch_s = time.time() - t0
                print(
                    f"[progressive] steps={next_steps} epoch "
                    f"{epoch + 1}/{epochs} loss {avg:.6f} "
                    f"({time.time() - t0:.1f}s)"
                )
                # Per-epoch async saves (teacher.py cadence) incl. opt_state
                # — a tunnel drop mid-round then costs one epoch, not the
                # round, and completed epochs stay optimizer-resumable.
                if (epoch + 1) % config.save_interval == 0 or epoch == epochs - 1:
                    ckpt_family = (
                        "progressive" if guidance_range is None
                        else "progressive_cfg"
                    )
                    ckpt_dir = os.path.join(
                        config.models_dir, ckpt_family, f"steps_{next_steps}"
                    )
                    if getattr(config, "checkpoint_sharded", False):
                        # Pod-scale lane (see teacher.py): per-device
                        # shard writes, no host gather.
                        save_checkpoint_sharded(
                            ckpt_dir,
                            epoch + 1,
                            state.params,
                            batch_stats=state.batch_stats,
                            opt_state=state.opt_state,
                        )
                    else:
                        writer.save(
                            ckpt_dir,
                            epoch + 1,
                            state.params,
                            batch_stats=state.batch_stats,
                            opt_state=state.opt_state,
                        )
            cur_vars = {
                "params": state.params, "batch_stats": state.batch_stats
            }
            cur_steps = next_steps
    finally:
        cancel_watchdog()
        writer.close()
    return cur_model, cur_vars, cur_steps

"""Parallel-in-time trajectory generation via Picard fixed-point iteration.

Latency-oriented companion to the sequential ``generate_trajectory_scan``:
instead of T sequential model calls, the whole chain is treated as a
fixed-point problem and iterated in sweeps, each sweep evaluating the model
at ALL timesteps in one ``(T−1)·B``-batch forward (ParaDiGMS-style parallel
sampling, Shih et al. 2023 — see PAPERS.md; implementation here is original
and tailored to the engine formulation).

Because this framework's per-step noise is deterministic in ``(seed, t)``
(diffusion/sampling.py), the sequential chain is a deterministic function of
the initial noise, and Picard iteration converges to it EXACTLY: after k
sweeps the first k steps are exact, so ``sweeps=T−1`` reproduces the
sequential trajectory bit-for-bit (tested), while in practice the iteration
contracts much faster and an early-exit tolerance stops in far fewer sweeps.

Measured status (v5e, T=50, sf=1.0): the plain full-chain iteration does NOT
contract fast enough to early-exit under this noise-injecting update (all
T−1 sweeps needed at tol=1e-3), and the sequential scan at B=1 already takes
only ~20 ms — so this sampler is currently an exactness-verified capability,
not a speedup; a sliding-window variant with coarse-trajectory
initialization (the full ParaDiGMS recipe) is the future-work path
(PERFORMANCE.md).  Throughput workloads should use the sequential scan.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .sampling import engine_update

ModelFn = Callable[..., jnp.ndarray]


def parallel_generate_trajectory(
    model_fn: ModelFn,
    noise: jnp.ndarray,
    timesteps: int,
    alphas: jnp.ndarray,
    seed,
    guidance_scale: Optional[float] = None,
    use_cfg: Optional[bool] = None,
    max_sweeps: Optional[int] = None,
    tol: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trajectory via Picard sweeps.

    Args:
        noise: ``[B, H, W, C]`` initial noise.
        max_sweeps: sweep budget; ``None`` → T−1 (exact convergence bound).
        tol: early-exit when the max-abs state update falls below this
            (0.0 → run the full budget; exact result).

    Returns:
        ``(trajectory [T+1, B, H, W, C], sweeps_used)`` — same layout as
        ``generate_trajectory_scan`` (entry 0 = noise, last two identical).
    """
    alphas = jnp.asarray(alphas)  # host constants (see get_diffusion_params)
    if use_cfg is None:
        use_cfg = guidance_scale is not None and (
            not isinstance(guidance_scale, (int, float)) or guidance_scale > 1.0
        )
    gs = 1.0 if guidance_scale is None else guidance_scale
    T = timesteps
    n_steps = T - 1  # updates happen for t = T-1 .. 1
    if max_sweeps is None:
        max_sweeps = n_steps
    b = noise.shape[0]
    base_key = jax.random.PRNGKey(seed) if jnp.ndim(seed) == 0 else seed

    # Static per-step tensors: t values (descending), noises, alpha pairs.
    ts = jnp.arange(T - 1, 0, -1, dtype=jnp.int32)  # [n_steps]
    step_noises = jax.vmap(
        lambda t: jax.random.normal(
            jax.random.fold_in(base_key, t), noise.shape, dtype=noise.dtype
        )
    )(ts)  # [n_steps, B, H, W, C]
    alpha_t = alphas[ts]
    alpha_prev = alphas[ts - 1]

    def sweep_once(states):
        """states[i] = input to step i (state before applying t=ts[i]).
        states[0] is pinned to the initial noise."""
        flat = states.reshape((n_steps * b,) + noise.shape[1:])
        tvec = jnp.repeat(ts.astype(jnp.float32), b)
        if use_cfg:
            zeros = jnp.zeros((n_steps * b, 1), flat.dtype)
            ones = jnp.ones((n_steps * b, 1), flat.dtype)
            pred_u = model_fn(flat, tvec, zeros, ones)
            pred_c = model_fn(flat, tvec, ones, ones)
            eps = pred_u + gs * (pred_c - pred_u)
        else:
            zeros = jnp.zeros((n_steps * b, 1), flat.dtype)
            eps = model_fn(flat, tvec, zeros, zeros)
        eps = eps.reshape(states.shape)
        outputs = engine_update(
            states,
            eps,
            step_noises,
            alpha_t.reshape((n_steps,) + (1,) * (states.ndim - 1)),
            alpha_prev.reshape((n_steps,) + (1,) * (states.ndim - 1)),
        )  # outputs[i] = state after step i = input to step i+1
        new_states = jnp.concatenate([states[:1], outputs[:-1]], axis=0)
        return new_states, outputs

    init_states = jnp.broadcast_to(noise, (n_steps,) + noise.shape)

    def cond(carry):
        _, _, delta, k = carry
        return (k < max_sweeps) & (delta > tol)

    def body(carry):
        states, _, _, k = carry
        new_states, outputs = sweep_once(states)
        delta = jnp.max(jnp.abs(new_states - states))
        return new_states, outputs, delta, k + 1

    # One sweep to initialize outputs, then iterate to tolerance.
    states, outputs = sweep_once(init_states)
    states, outputs, _, sweeps = jax.lax.while_loop(
        cond, body, (states, outputs, jnp.inf, jnp.asarray(1))
    )

    trajectory = jnp.concatenate(
        [noise[None], outputs, outputs[-1:]], axis=0
    )
    return trajectory, sweeps


def sliding_window_trajectory(
    model_fn: ModelFn,
    noise: jnp.ndarray,
    timesteps: int,
    alphas: jnp.ndarray,
    seed,
    guidance_scale: Optional[float] = None,
    use_cfg: Optional[bool] = None,
    window: int = 8,
    tol: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sliding-window ParaDiGMS (Shih et al. 2023): batched-window Picard
    with per-step convergence slide-out.

    A window of ``W`` consecutive steps is iterated together: one sweep
    evaluates the model at all W timesteps as a single ``W·B`` batch, then
    the leading positions whose *inputs* moved less than ``tol`` (RMS per
    pixel) are finalized and the window slides past them.  Position 0's
    input is always exact (it is the finalized frontier), so every sweep
    finalizes ≥ 1 step — worst case equals sequential latency in sweep
    count, best case finalizes several steps per sweep, converting model
    latency into batch width (the TPU trade that wins at small B where the
    chip is underutilized).

    ``tol=0`` finalizes exactly one step per sweep and reproduces the
    sequential chain bit-for-bit (the window positions ahead only serve as
    warm starts).  With ``tol>0`` later steps may be accepted within
    tolerance of the exact chain; callers should validate metric deltas
    (see PERFORMANCE.md for measured speed/accuracy numbers).

    Returns ``(trajectory [T+1, B, H, W, C], sweeps_used)``.
    """
    alphas = jnp.asarray(alphas)  # host constants (see get_diffusion_params)
    if use_cfg is None:
        use_cfg = guidance_scale is not None and (
            not isinstance(guidance_scale, (int, float)) or guidance_scale > 1.0
        )
    gs = 1.0 if guidance_scale is None else guidance_scale
    T = timesteps
    n_steps = T - 1
    W = min(window, n_steps)
    b = noise.shape[0]
    img_shape = noise.shape[1:]
    base_key = jax.random.PRNGKey(seed) if jnp.ndim(seed) == 0 else seed

    ts = jnp.arange(T - 1, 0, -1, dtype=jnp.int32)  # [n_steps]
    # Pad with t=1 so window positions past the end stay valid (their
    # outputs are masked out of the trajectory writes).
    ts_pad = jnp.concatenate([ts, jnp.ones((W,), jnp.int32)])

    def window_sweep(f, states):
        """One sweep over window positions f..f+W-1.

        Returns (outputs [W,B,...], new_inputs [W,B,...])."""
        t_w = jax.lax.dynamic_slice_in_dim(ts_pad, f, W)  # [W]
        flat = states.reshape((W * b,) + img_shape)
        tvec = jnp.repeat(t_w.astype(jnp.float32), b)
        if use_cfg:
            zeros = jnp.zeros((W * b, 1), flat.dtype)
            ones = jnp.ones((W * b, 1), flat.dtype)
            pred_u = model_fn(flat, tvec, zeros, ones)
            pred_c = model_fn(flat, tvec, ones, ones)
            eps = pred_u + gs * (pred_c - pred_u)
        else:
            zeros = jnp.zeros((W * b, 1), flat.dtype)
            eps = model_fn(flat, tvec, zeros, zeros)
        eps = eps.reshape(states.shape)
        step_noise = jax.vmap(
            lambda t: jax.random.normal(
                jax.random.fold_in(base_key, t), (b,) + img_shape, noise.dtype
            )
        )(t_w)
        bshape = (W,) + (1,) * (states.ndim - 1)
        outputs = engine_update(
            states,
            eps,
            step_noise,
            alphas[t_w].reshape(bshape),
            alphas[t_w - 1].reshape(bshape),
        )
        new_inputs = jnp.concatenate([states[:1], outputs[:-1]], axis=0)
        return outputs, new_inputs

    traj_buf = jnp.zeros((T + 1, b) + img_shape, noise.dtype)
    traj_buf = traj_buf.at[0].set(noise)

    def cond(carry):
        f, _, _, _ = carry
        return f < n_steps

    def body(carry):
        f, states, buf, sweeps = carry
        outputs, new_inputs = window_sweep(f, states)
        # RMS input drift per window position; position 0 is pinned-exact.
        drift = jnp.sqrt(
            jnp.mean((new_inputs - states) ** 2, axis=tuple(range(1, states.ndim)))
        )
        converged = drift <= tol
        # k = 1 (position 0 output is exact) + length of converged run at 1..
        run = jnp.cumprod(converged[1:].astype(jnp.int32))
        k = 1 + jnp.sum(run)
        k = jnp.minimum(k, n_steps - f)

        j = jnp.arange(W)
        write_idx = jnp.where((j < k), f + 1 + j, T + 1)  # T+1 → dropped
        buf = buf.at[write_idx].set(outputs, mode="drop")

        # Slide: new position j takes new_inputs[j+k]; past the window end,
        # warm-start from the newest output.
        src = jnp.clip(j + k, 0, W - 1)
        shifted = jnp.take(new_inputs, src, axis=0)
        frontier_fill = jnp.broadcast_to(outputs[-1], states.shape)
        states = jnp.where(
            (j + k <= W - 1).reshape((W,) + (1,) * (states.ndim - 1)),
            shifted,
            frontier_fill,
        )
        # Re-pin position 0 to the exact frontier input (= output of the
        # last finalized step, which we just wrote at buf[f+k]).
        states = states.at[0].set(
            jax.lax.dynamic_index_in_dim(buf, f + k, 0, keepdims=False)
        )
        return f + k, states, buf, sweeps + 1

    init_states = jnp.broadcast_to(noise, (W, b) + img_shape)
    f, states, traj_buf, sweeps = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), init_states, traj_buf, jnp.asarray(0))
    )
    # Reference layout: the t=0 iteration is a no-op — duplicate the final
    # state (diffusion/sampling.py::generate_trajectory_scan).
    traj_buf = traj_buf.at[T].set(traj_buf[T - 1])
    return traj_buf, sweeps

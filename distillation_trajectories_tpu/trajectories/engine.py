"""Trajectory generation and teacher/student comparison.

TPU-native counterpart of reference ``analysis/trajectory_engine.py:24-179``.
The reference's per-step device↔host ping-pong (160k sequential U-Net
forwards for the default sweep, SURVEY.md §3.3) becomes: one scan-compiled
chain per (model, guidance-scale) pair, vmapped across noise samples, with
the whole ``[S, T+1, H, W, C]`` trajectory batch staying on device until
metrics are reduced.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import get_diffusion_params
from ..diffusion.sampling import generate_trajectory_scan
from ..metrics.trajectory_metrics import _metrics_core, compute_trajectory_metrics
from ..parallel import mesh_from_config
from ..parallel.mesh import DATA_AXIS, batch_sharding
from ..training.state import make_eval_model_fn


def _store_dtype(config):
    """Trajectory storage dtype from ``Config.trajectory_store_dtype``."""
    name = getattr(config, "trajectory_store_dtype", "float32") or "float32"
    if name == "bfloat16":
        return jnp.bfloat16
    if name != "float32":
        raise ValueError(
            f"trajectory_store_dtype must be 'float32' or 'bfloat16', got {name!r}"
        )
    return None


def generate_trajectory(
    model,
    variables,
    noise,
    timesteps: int,
    seed: Optional[int] = None,
    guidance_scale: Optional[float] = None,
    config=None,
):
    """Generate one denoising trajectory (reference trajectory_engine.py:24-115).

    Args:
        noise: ``[B, H, W, C]`` starting noise.
    Returns:
        ``[T+1, B, H, W, C]`` on-device trajectory array.

    ``Config.parallel_sampling="window"`` switches to the sliding-window
    ParaDiGMS sampler (latency-oriented; see PERFORMANCE.md for measured
    speed/accuracy at each window/tol).
    """
    model_fn = make_eval_model_fn(model, variables)
    dp = get_diffusion_params(timesteps, config)
    if config is not None and getattr(config, "parallel_sampling", "off") == "window":
        from ..diffusion.parallel_sampling import sliding_window_trajectory

        traj, _ = sliding_window_trajectory(
            model_fn,
            jnp.asarray(noise),
            timesteps,
            dp["alphas"],
            0 if seed is None else seed,
            guidance_scale=guidance_scale,
            window=getattr(config, "paradigms_window", 8),
            tol=getattr(config, "paradigms_tol", 1e-3),
        )
        store = _store_dtype(config)
        return traj if store is None else traj.astype(store)
    return generate_trajectory_scan(
        model_fn,
        jnp.asarray(noise),
        timesteps,
        dp["alphas"],
        seed=0 if seed is None else seed,
        guidance_scale=guidance_scale,
        store_dtype=_store_dtype(config),
        use_pallas=getattr(config, "pallas_cfg_update", False),
    )


def make_paired_trajectory_fn(
    teacher_model,
    teacher_variables,
    student_model,
    student_variables,
    timesteps: int,
    config=None,
    use_cfg: bool = True,
):
    """Build a jitted function generating paired teacher/student trajectories
    for a batch of (noise, seed) samples at one (traced) guidance scale.

    vmapped over samples; teacher and student chains share per-step noise via
    the same (seed, t) fold-in, mirroring the reference's reseeding
    (trajectory_engine.py:88-95).
    Returns: fn(noises [S,H,W,C], seeds [S], gs scalar) ->
        (teacher_trajs, student_trajs) each [S, T+1, H, W, C].
    """
    t_fn = make_eval_model_fn(teacher_model, teacher_variables)
    s_fn = make_eval_model_fn(student_model, student_variables)
    dp = get_diffusion_params(timesteps, config)
    alphas = dp["alphas"]

    def one_sample(noise_hwc, seed, gs):
        noise = noise_hwc[None]  # model batch dim
        kwargs = dict(
            guidance_scale=gs,
            use_cfg=use_cfg,
            store_dtype=_store_dtype(config),
            use_pallas=getattr(config, "pallas_cfg_update", False),
        )
        t_traj = generate_trajectory_scan(
            t_fn, noise, timesteps, alphas, seed, **kwargs
        )
        s_traj = generate_trajectory_scan(
            s_fn, noise, timesteps, alphas, seed, **kwargs
        )
        return t_traj[:, 0], s_traj[:, 0]

    batched = jax.vmap(one_sample, in_axes=(0, 0, None))
    return jax.jit(batched)


def compare_trajectories(
    teacher_model,
    student_model,
    config,
    guidance_scales: Sequence[float] = (1.0, 3.0, 5.0),
    size_factor: float = 1.0,
    num_samples: int = 3,
    teacher_variables=None,
    student_variables=None,
    base_seed: int = 42,
) -> Dict[str, Dict[float, Dict[str, float]]]:
    """Compare teacher/student trajectories across guidance scales.

    Reference ``trajectory_engine.py:117-179``: for each of ``num_samples``
    noise draws (seed = 42+i) and each guidance scale, generate paired
    trajectories from the *same* noise and average the scalar metrics.

    TPU-native: all samples for a guidance scale run as one vmapped batch;
    scales >1 share one compiled CFG graph (gs is traced), gs≤1 uses the
    no-CFG graph — matching the reference's branch at
    trajectory_engine.py:65-83.  Metrics are computed on device, vmapped
    across samples, then averaged.

    Returns ``{"teacher_metrics": {gs: {...}}, "student_metrics": {...}}``
    (the reference stores the same pair metrics under both keys,
    trajectory_engine.py:162-164 — preserved).
    """
    if teacher_variables is None or student_variables is None:
        raise ValueError("teacher_variables and student_variables are required")

    timesteps = config.timesteps
    seeds = np.array([base_seed + i for i in range(num_samples)], dtype=np.int32)
    # Per-sample noise from the sample seed (reference seeds torch's global
    # generator with 42+i then draws the noise; we use the same seed for the
    # JAX draw — parity is at the distribution level, SURVEY.md §7).
    noises = jnp.stack(
        [
            jax.random.normal(
                jax.random.PRNGKey(int(s)),
                (config.image_size, config.image_size, config.channels),
            )
            for s in seeds
        ]
    )
    seeds = jnp.asarray(seeds)

    # Config.mesh_shape != (1,1): shard the sample axis over the data mesh
    # axis so each device generates its own trajectory pairs (the vmapped
    # scan runs SPMD; no collectives needed until the metric means).
    mesh = mesh_from_config(config) if config is not None else None
    if mesh is not None:
        if num_samples % mesh.shape[DATA_AXIS] == 0:
            sh = batch_sharding(mesh)
            noises = jax.device_put(noises, sh)
            seeds = jax.device_put(seeds, sh)
        else:
            print(
                f"[engine] num_samples={num_samples} not divisible by data "
                f"axis {mesh.shape[DATA_AXIS]}; running unsharded"
            )
            mesh = None

    pair_fns = {
        True: make_paired_trajectory_fn(
            teacher_model, teacher_variables, student_model, student_variables,
            timesteps, config, use_cfg=True,
        ),
        False: make_paired_trajectory_fn(
            teacher_model, teacher_variables, student_model, student_variables,
            timesteps, config, use_cfg=False,
        ),
    }

    @jax.jit
    def batch_metrics(t_trajs, s_trajs, keys):
        return jax.vmap(lambda t, s, k: _metrics_core(t, s, k))(t_trajs, s_trajs, keys)

    avg_metrics: Dict[float, Dict[str, float]] = {}
    for gs in guidance_scales:
        use_cfg = gs is not None and gs > 1.0
        t_trajs, s_trajs = pair_fns[use_cfg](noises, seeds, jnp.float32(gs))
        keys = jax.random.split(jax.random.PRNGKey(base_seed), num_samples)
        if mesh is not None:
            keys = jax.device_put(keys, batch_sharding(mesh))
        metrics = batch_metrics(t_trajs, s_trajs, keys)
        scalars: Dict[str, float] = {}
        for k, v in metrics.items():
            arr = np.asarray(v)
            if arr.ndim == 1 and arr.shape[0] == num_samples:
                scalars[k] = float(np.mean(arr))
        avg_metrics[gs] = scalars

    return {"teacher_metrics": avg_metrics, "student_metrics": avg_metrics}

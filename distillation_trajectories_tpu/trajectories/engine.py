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
from ..diffusion.sampling import (
    CFG_COND_PAIRS,
    NOCFG_COND_PAIRS,
    generate_trajectory_batch_scan,
    generate_trajectory_scan,
)
from ..metrics.trajectory_metrics import _metrics_core, compute_trajectory_metrics
from ..parallel import mesh_from_config
from ..parallel.mesh import DATA_AXIS, batch_sharding
from ..training.state import make_eval_model_fn
from ..utils.compile_pool import VariablesAsArgFn as _VariablesAsArgFn


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

        if getattr(config, "pallas_cfg_update", False):
            print(
                "[engine] parallel_sampling='window' has no Pallas update "
                "path; pallas_cfg_update is ignored for this trajectory"
            )

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
    dp = get_diffusion_params(timesteps, config)
    alphas = dp["alphas"]

    def batched(variables, noises, seeds, gs):
        t_vars, s_vars = variables
        t_fn = make_eval_model_fn(teacher_model, t_vars)
        s_fn = make_eval_model_fn(student_model, s_vars)

        def one_sample(noise_hwc, seed):
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

        return jax.vmap(one_sample)(noises, seeds)

    return _VariablesAsArgFn(
        jax.jit(batched), (teacher_variables, student_variables)
    )


def make_batch_trajectory_fn(
    model,
    variables,
    timesteps: int,
    config=None,
    use_cfg: bool = True,
):
    """Single-model version of :func:`make_paired_trajectory_fn`.

    Returns a jitted ``fn(noises [S,H,W,C], seeds [S], gs scalar) ->
    trajs [S, T+1, H, W, C]``.  Used by the sweep path so the teacher chain
    (independent of student size) is generated and compiled once, and each
    per-size compile covers only the student graph — the reference's sweep
    recomputes the teacher for every size (trajectory_engine.py:117-179).
    """
    dp = get_diffusion_params(timesteps, config)
    alphas = dp["alphas"]

    def batched(vars_, noises, seeds, gs):
        model_fn = make_eval_model_fn(model, vars_)

        def one_sample(noise_hwc, seed):
            traj = generate_trajectory_scan(
                model_fn,
                noise_hwc[None],
                timesteps,
                alphas,
                seed,
                guidance_scale=gs,
                use_cfg=use_cfg,
                store_dtype=_store_dtype(config),
                use_pallas=getattr(config, "pallas_cfg_update", False),
            )
            return traj[:, 0]

        return jax.vmap(one_sample)(noises, seeds)

    return _VariablesAsArgFn(jax.jit(batched), variables)


def make_sweep_trajectory_fn(model, variables, timesteps: int, config=None):
    """One-executable-per-model trajectory batcher for the flagship sweep.

    Returns a jitted ``fn(noises [S,H,W,C], seeds [S], cond_pairs [2,2],
    gs scalar) -> trajs [S, T+1, H, W, C]`` built on
    :func:`generate_trajectory_batch_scan`: samples ride the model batch
    axis (no outer vmap) and the CFG/no-CFG choice is the *runtime*
    ``cond_pairs`` input, so each model traces and compiles exactly one
    graph for the whole sweep — the round-2 two-graphs-per-model layout's
    trace wall (19 graphs, 93–200s) was the last obstacle to the ≥50×
    sweep target.
    """
    dp = get_diffusion_params(timesteps, config)
    alphas = dp["alphas"]

    def batched(vars_, noises, seeds, cond_pairs, gs):
        model_fn = make_eval_model_fn(model, vars_)
        return generate_trajectory_batch_scan(
            model_fn,
            noises,
            timesteps,
            alphas,
            seeds,
            cond_pairs,
            gs,
            store_dtype=_store_dtype(config),
            use_pallas=getattr(config, "pallas_cfg_update", False),
        )

    return _VariablesAsArgFn(jax.jit(batched), variables)


@jax.jit
def _batch_metrics(t_trajs, s_trajs, keys):
    """Metric suite vmapped over the sample axis; module-level jit so the
    sweep compiles it once per process (shapes are size-independent), not
    once per size factor."""
    return jax.vmap(lambda t, s, k: _metrics_core(t, s, k))(t_trajs, s_trajs, keys)


def _sweep_inputs(config, num_samples: int, base_seed: int):
    """(noises, seeds, mesh) shared by every size factor in a sweep."""
    seeds = np.array([base_seed + i for i in range(num_samples)], dtype=np.int32)
    # Per-sample noise from the sample seed (reference seeds torch's global
    # generator with 42+i then draws the noise; we use the same seed for the
    # JAX draw — parity is at the distribution level, SURVEY.md §7).
    # ONE vmapped+jitted draw for all samples: a per-seed Python loop
    # compiles a fresh tiny executable per sample on the tunneled backend
    # (constant-folded seed), costing seconds before the sweep starts.
    # Values are identical — vmap(normal ∘ PRNGKey) row i == the scalar
    # call with seed i.
    seeds = jnp.asarray(seeds)
    shape = (config.image_size, config.image_size, config.channels)
    noises = jax.jit(
        jax.vmap(lambda s: jax.random.normal(jax.random.PRNGKey(s), shape))
    )(seeds)

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
    return noises, seeds, mesh


def _sweep_compare_impl(
    teacher_model,
    teacher_variables,
    students,
    config,
    guidance_scales: Sequence[float] = (1.0, 3.0, 5.0),
    num_samples: int = 3,
    base_seed: int = 42,
    compile_workers: int = None,
    verbose: bool = True,
) -> Dict[float, Dict[str, Dict[float, Dict[str, float]]]]:
    """Teacher-vs-student metric sweep over many student sizes at once.

    Same per-(size, scale) results as calling :func:`compare_trajectories`
    per size (reference sweep loop, analyze_trajectory_metrics.py:433-466),
    restructured for compile efficiency on TPU:

    * teacher trajectories are generated ONCE per guidance scale and shared
      across all sizes (they do not depend on the student);
    * each size factor compiles a student-only scan (roughly half the graph
      of the old paired teacher+student scan);
    * the metric suite compiles once per process (module-level jit);
    * all executables are AOT-compiled concurrently up front
      (``jit.lower().compile()`` in ``compile_workers`` threads) — XLA
      compilation releases the GIL and the axon backend compiles
      server-side, so the sweep's compile wall-clock approaches the single
      slowest graph instead of the sum.

    Args:
        students: ``{size_factor: (student_model, student_variables)}``.
    Returns:
        ``{size_factor: {"teacher_metrics": {gs: {...}},
        "student_metrics": {gs: {...}}}}`` — per size, the same structure
        :func:`compare_trajectories` returns.
    """
    import time as _time

    from ..utils.compile_pool import arm_watchdog, compile_concurrently

    # Tunnel-hang watchdog (utils/compile_pool.py): re-armed per phase so a
    # dropped RPC in any of inputs/tracing, compile, or execution dumps
    # stacks and exits instead of hanging forever — callers
    # (run_full_sweep.py) treat the non-zero exit as transient and retry.
    timesteps = config.timesteps
    # Deadlines scale with workload size (a bigger sweep — more samples,
    # scales, sizes, or steps — must not be hard-killed mid-legitimate-run);
    # DTT_COMPILE_TIMEOUT still overrides every phase (arm_watchdog).
    work_scale = max(
        1.0,
        (len(students) + 1)
        * len(guidance_scales)
        * num_samples
        * timesteps
        / (9.0 * 10 * 10 * 100),
    )
    arm_watchdog(300.0 * work_scale)  # inputs + tracing
    t_setup = _time.perf_counter()
    noises, seeds, mesh = _sweep_inputs(config, num_samples, base_seed)
    gs_example = jnp.float32(1.0)
    cfg_pairs = jnp.asarray(CFG_COND_PAIRS)
    nocfg_pairs = jnp.asarray(NOCFG_COND_PAIRS)

    teacher_fn = make_sweep_trajectory_fn(
        teacher_model, teacher_variables, timesteps, config
    )
    student_fns = {
        sf: make_sweep_trajectory_fn(model, variables, timesteps, config)
        for sf, (model, variables) in students.items()
    }
    if verbose:
        print(f"[sweep] inputs+fns setup: {_time.perf_counter() - t_setup:.1f}s")

    # AOT-compile every needed executable concurrently — ONE graph per model
    # (CFG vs no-CFG is the runtime cond_pairs input; see
    # make_sweep_trajectory_fn).  Tracing/lowering happens via .lower() in
    # the calling thread; the expensive XLA compile happens inside the pool.
    keys = jax.random.split(jax.random.PRNGKey(base_seed), num_samples)
    if mesh is not None:
        keys = jax.device_put(keys, batch_sharding(mesh))

    producers = [
        lambda f=f: f.lower(noises, seeds, cfg_pairs, gs_example)
        for f in [teacher_fn] + list(student_fns.values())
    ]
    if mesh is None:
        # The trajectory avals are known statically — no need to eval_shape
        # (a full extra trace of the teacher graph).  Skipped under a mesh:
        # these avals carry no shardings, so the AOT compile would miss the
        # dispatch cache exactly in the multi-device case.
        traj_aval = jax.ShapeDtypeStruct(
            (
                num_samples, timesteps + 1, config.image_size,
                config.image_size, config.channels,
            ),
            _store_dtype(config) or jnp.float32,
        )
        producers.append(
            lambda: _batch_metrics.lower(traj_aval, traj_aval, keys)
        )
    compile_concurrently(
        producers,
        workers=compile_workers,
        label=(
            f"sweep ({len(students)} sizes + teacher"
            f"{' + metrics' if mesh is None else ''}, 1 graph each)"
        ),
        verbose=verbose,
    )

    # Dispatch the whole sweep asynchronously (JAX queues executions) and
    # fetch every metric scalar in ONE device_get at the end: per-scalar
    # np.asarray would pay a host↔device round-trip per metric per (size,
    # scale) — ~1200 tunnel RTTs for the default sweep, which measured ~10x
    # the actual compute time on the axon-tunneled chip.
    arm_watchdog(600.0 * work_scale)  # execution + host fetch
    t0 = _time.perf_counter()
    pending = {sf: {} for sf in students}
    for gs in guidance_scales:
        use_cfg = gs is not None and gs > 1.0
        pairs = cfg_pairs if use_cfg else nocfg_pairs
        gs_arr = jnp.float32(1.0 if gs is None else gs)
        t_trajs = teacher_fn(noises, seeds, pairs, gs_arr)
        for sf, fn in student_fns.items():
            s_trajs = fn(noises, seeds, pairs, gs_arr)
            pending[sf][gs] = _batch_metrics(t_trajs, s_trajs, keys)
    host_metrics = jax.device_get(pending)
    results: Dict[float, Dict[float, Dict[str, float]]] = {}
    for sf, per_gs in host_metrics.items():
        results[sf] = {}
        for gs, metrics in per_gs.items():
            # Sweep output keeps only the per-sample SCALAR metrics (shape
            # [num_samples], averaged) — vector metrics (per-step velocities,
            # per-step Wasserstein) are intentionally dropped: the sweep
            # consumers (heatmap/radar CLIs, transform_metrics) need exactly
            # the scalar suite, pinned by
            # tests/test_trajectories.py::test_sweep_output_contract.  Use
            # compute_trajectory_metrics for the full per-pair suite.
            results[sf][gs] = {
                k: float(np.mean(v))
                for k, v in metrics.items()
                if np.ndim(v) == 1 and np.shape(v)[0] == num_samples
            }
    if verbose:
        n = len(guidance_scales) * len(students) * num_samples
        dt = _time.perf_counter() - t0
        print(
            f"[sweep] generated+scored {n} trajectory pairs in {dt:.1f}s "
            f"({n / dt:.1f} pairs/s)"
        )

    # The reference stores the same pair-metric dict under both keys
    # (trajectory_engine.py:162-164).  We keep the VALUE equality but return
    # independent dict objects per key so a downstream writer mutating one
    # view cannot silently corrupt the other (round-2 review finding).
    return {
        sf: {
            "teacher_metrics": {gs: dict(m) for gs, m in per_gs.items()},
            "student_metrics": {gs: dict(m) for gs, m in per_gs.items()},
        }
        for sf, per_gs in results.items()
    }


def sweep_compare_trajectories(
    teacher_model,
    teacher_variables,
    students,
    config,
    guidance_scales: Sequence[float] = (1.0, 3.0, 5.0),
    num_samples: int = 3,
    base_seed: int = 42,
    compile_workers: int = None,
    verbose: bool = True,
) -> Dict[float, Dict[str, Dict[float, Dict[str, float]]]]:
    """Public front door for :func:`_sweep_compare_impl` (see its docstring
    for the compile-efficiency design).  Guarantees the tunnel-flake
    watchdog timer is disarmed on every exit path, so an exception mid-sweep
    cannot leave an exit-timer armed in the calling process."""
    from ..utils.compile_pool import cancel_watchdog

    try:
        return _sweep_compare_impl(
            teacher_model,
            teacher_variables,
            students,
            config,
            guidance_scales=guidance_scales,
            num_samples=num_samples,
            base_seed=base_seed,
            compile_workers=compile_workers,
            verbose=verbose,
        )
    finally:
        cancel_watchdog()


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
    across samples, then averaged.  (Multi-size sweeps should prefer
    :func:`sweep_compare_trajectories`, which shares the teacher chains and
    overlaps compiles across sizes.)

    Returns ``{"teacher_metrics": {gs: {...}}, "student_metrics": {...}}``
    (the reference stores the same pair metrics under both keys,
    trajectory_engine.py:162-164 — preserved).
    """
    if teacher_variables is None or student_variables is None:
        raise ValueError("teacher_variables and student_variables are required")

    out = sweep_compare_trajectories(
        teacher_model,
        teacher_variables,
        {size_factor: (student_model, student_variables)},
        config,
        guidance_scales=guidance_scales,
        num_samples=num_samples,
        base_seed=base_seed,
        verbose=False,
    )
    return out[size_factor]

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
from ..utils.compile_pool import CompiledWithFallback as _CompiledWithFallback
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


def _eval_fn(model, variables, config):
    """Config-aware eval forward (state.make_eval_fn_from_config): plain,
    int8-quantized (``Config.sampler_quant``) or spatially partitioned
    (``Config.spatial_shape``)."""
    from ..training.state import make_eval_fn_from_config

    return make_eval_fn_from_config(model, variables, config)


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
    model_fn = _eval_fn(model, variables, config)
    dp = get_diffusion_params(timesteps, config)
    if config is not None and getattr(config, "spatial_shape", None):
        # Place the starting noise with the (data, spatial) layout BEFORE
        # branching on the sampler, so both the scan and the sliding-window
        # path start (and stay) row-sharded — and both hit the loud
        # divisibility guard up front instead of a GSPMD surprise mid-jit.
        from ..parallel.spatial import make_spatial_mesh, shard_batch_spatial

        noise = shard_batch_spatial(
            noise, make_spatial_mesh(tuple(config.spatial_shape)))
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
        t_fn = _eval_fn(teacher_model, t_vars, config)
        s_fn = _eval_fn(student_model, s_vars, config)

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
        model_fn = _eval_fn(model, vars_, config)

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
        model_fn = _eval_fn(model, vars_, config)
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


def _sweep_compare_multi_impl(
    teacher_model,
    teacher_variables,
    jobs: Sequence[dict],
    config,
    compile_workers: int = None,
    verbose: bool = True,
) -> List[Dict[float, Dict[str, Dict[float, Dict[str, float]]]]]:
    """Teacher-vs-student metric sweeps over many (students, T) JOBS at once.

    Same per-(size, scale) results as calling :func:`compare_trajectories`
    per size (reference sweep loop, analyze_trajectory_metrics.py:433-466),
    restructured for compile efficiency on TPU:

    * teacher trajectories are generated ONCE per (T, guidance scale) cell
      and cached ACROSS jobs (they do not depend on the student), so e.g.
      two jobs sharing T reuse every teacher chain;
    * each size factor compiles a student-only scan (roughly half the graph
      of the old paired teacher+student scan), deduped across jobs by
      (model, variables, T) identity;
    * the metric suite compiles once per (T, samples) shape (module-level
      jit);
    * ALL jobs' executables are AOT-compiled in ONE concurrent pool
      (``jit.lower().compile()`` in ``compile_workers`` threads) — XLA
      compilation releases the GIL and the axon backend compiles
      server-side, so the combined compile wall-clock approaches the single
      slowest graph instead of the per-job sums (the round-3 workload ran
      the flagship sweep and the trio comparison as separate processes,
      paying two pools and two checkpoint loads);
    * every job's executions are dispatched asynchronously and ALL metric
      scalars are fetched in one ``device_get``.

    Args:
        jobs: each a dict with keys ``students`` (``{sf: (model, vars)}``),
            ``guidance_scales``, ``num_samples``, ``base_seed``, and
            ``timesteps`` (defaults to ``config.timesteps``).
    Returns:
        One result per job: ``{size_factor: {"teacher_metrics": {gs: {...}},
        "student_metrics": {gs: {...}}}}`` — the same structure
        :func:`compare_trajectories` returns.
    """
    import time as _time

    from ..utils.compile_pool import arm_watchdog, compile_concurrently

    jobs = [dict(job) for job in jobs]
    for job in jobs:
        job.setdefault("guidance_scales", (1.0, 3.0, 5.0))
        job.setdefault("num_samples", 3)
        job.setdefault("base_seed", 42)
        job.setdefault("timesteps", config.timesteps)

    # Tunnel-hang watchdog (utils/compile_pool.py): re-armed per phase so a
    # dropped RPC in any of inputs/tracing, compile, or execution dumps
    # stacks and exits instead of hanging forever — callers
    # (run_full_sweep.py) treat the non-zero exit as transient and retry.
    # Deadlines scale with workload size (a bigger sweep — more samples,
    # scales, sizes, steps, or jobs — must not be hard-killed
    # mid-legitimate-run); DTT_COMPILE_TIMEOUT still overrides every phase.
    work_scale = max(
        1.0,
        sum(
            (len(job["students"]) + 1)
            * len(job["guidance_scales"])
            * job["num_samples"]
            * job["timesteps"]
            for job in jobs
        )
        / (9.0 * 10 * 10 * 100),
    )
    arm_watchdog(300.0 * work_scale)  # inputs + tracing
    t_setup = _time.perf_counter()
    gs_example = jnp.float32(1.0)
    cfg_pairs = jnp.asarray(CFG_COND_PAIRS)
    nocfg_pairs = jnp.asarray(NOCFG_COND_PAIRS)

    # Shared-input / executable caches across jobs.  Identity keys are safe:
    # callers (the multi-job CLI) load each checkpoint once and pass the
    # same model/variables objects to every job that uses them.
    inputs_cache: Dict[tuple, tuple] = {}      # (S, seed) -> (noises, seeds, mesh)
    keys_cache: Dict[tuple, jax.Array] = {}    # (S, seed, mesh?) -> metric keys
    fn_cache: Dict[tuple, object] = {}         # (id(model), id(vars), T) -> fn

    def job_inputs(job):
        k = (job["num_samples"], job["base_seed"])
        if k not in inputs_cache:
            inputs_cache[k] = _sweep_inputs(config, *k)
        return inputs_cache[k]

    def job_keys(job, mesh):
        k = (job["num_samples"], job["base_seed"], mesh is not None)
        if k not in keys_cache:
            keys = jax.random.split(
                jax.random.PRNGKey(job["base_seed"]), job["num_samples"]
            )
            if mesh is not None:
                keys = jax.device_put(keys, batch_sharding(mesh))
            keys_cache[k] = keys
        return keys_cache[k]

    def model_fn_for(model, variables, timesteps):
        k = (id(model), id(variables), timesteps)
        if k not in fn_cache:
            fn_cache[k] = make_sweep_trajectory_fn(
                model, variables, timesteps, config
            )
        return fn_cache[k]

    # Per-job fn tables (teacher + students), built through the caches.
    job_teacher_fns = []
    job_student_fns = []
    for job in jobs:
        t = job["timesteps"]
        job_teacher_fns.append(
            model_fn_for(teacher_model, teacher_variables, t)
        )
        job_student_fns.append({
            sf: model_fn_for(model, variables, t)
            for sf, (model, variables) in job["students"].items()
        })
    if verbose:
        print(f"[sweep] inputs+fns setup: {_time.perf_counter() - t_setup:.1f}s")

    # AOT-compile every needed executable concurrently — ONE graph per
    # (model, T) pair across ALL jobs (CFG vs no-CFG is the runtime
    # cond_pairs input; see make_sweep_trajectory_fn).  Tracing/lowering
    # happens via .lower() in the calling thread; the expensive XLA compile
    # happens inside the pool.
    producers = []
    producer_keys = []
    seen_fn_inputs = set()
    seen_metric_shapes = set()
    n_graphs = 0
    for job, teacher_fn, student_fns in zip(
        jobs, job_teacher_fns, job_student_fns
    ):
        noises, seeds, mesh = job_inputs(job)
        for f in [teacher_fn] + list(student_fns.values()):
            # Key on the function + input AVALS only: base_seed changes the
            # noise/seed VALUES, not the lowered graph — including it would
            # compile identical graphs once per seed.
            k = (id(f), job["num_samples"])
            if k in seen_fn_inputs:
                continue
            seen_fn_inputs.add(k)
            n_graphs += 1
            producer_keys.append(("fn",) + k)
            producers.append(
                lambda f=f, n=noises, s=seeds: f.lower(
                    n, s, cfg_pairs, gs_example
                )
            )
        if mesh is None:
            # The trajectory avals are known statically — no need to
            # eval_shape (a full extra trace of the teacher graph).  Skipped
            # under a mesh: these avals carry no shardings, so the AOT
            # compile would miss the dispatch cache exactly in the
            # multi-device case.
            mk = (job["num_samples"], job["timesteps"])
            if mk not in seen_metric_shapes:
                seen_metric_shapes.add(mk)
                producer_keys.append(("metric",) + mk)
                traj_aval = jax.ShapeDtypeStruct(
                    (
                        job["num_samples"], job["timesteps"] + 1,
                        config.image_size, config.image_size,
                        config.channels,
                    ),
                    _store_dtype(config) or jnp.float32,
                )
                keys = job_keys(job, mesh)
                producers.append(
                    lambda a=traj_aval, k=keys: _batch_metrics.lower(a, a, k)
                )
    n_sizes = sum(len(job["students"]) for job in jobs)
    compiled_by_key = dict(zip(producer_keys, compile_concurrently(
        producers,
        workers=compile_workers,
        label=(
            f"sweep ({n_sizes} sizes + teacher across {len(jobs)} job(s), "
            f"{n_graphs} model graphs + {len(seen_metric_shapes)} metric "
            "graphs)"
        ),
        verbose=verbose,
        keep=True,
    )))

    # Swap each job's fns for their AOT executables (dispatching the jitted
    # fn would re-trace every graph on this 1-core host and re-compile
    # against the backend cache — the pool never fills the jit dispatch
    # cache).  The same fn object serves several jobs through fn_cache, so
    # wrap per job; a key absent from the pool (e.g. mesh jobs skip the
    # metric AOT) keeps the jitted fn.
    job_batch_metrics = []
    for ji, (job, teacher_fn, student_fns) in enumerate(zip(
        jobs, job_teacher_fns, job_student_fns
    )):
        n = job["num_samples"]
        c = compiled_by_key.get(("fn", id(teacher_fn), n))
        if c is not None:
            job_teacher_fns[ji] = _CompiledWithFallback(
                c, teacher_fn, label="sweep teacher graph")
        job_student_fns[ji] = {
            sf: (_CompiledWithFallback(
                    compiled_by_key[("fn", id(f), n)], f,
                    label=f"sweep student sf={sf}")
                 if ("fn", id(f), n) in compiled_by_key else f)
            for sf, f in student_fns.items()
        }
        mc = compiled_by_key.get(("metric", n, job["timesteps"]))
        job_batch_metrics.append(
            _batch_metrics if mc is None else _CompiledWithFallback(
                mc, _batch_metrics, label="sweep metric graph"))

    # Dispatch every job's sweep asynchronously (JAX queues executions) and
    # fetch every metric scalar in ONE device_get at the end: per-scalar
    # np.asarray would pay a host↔device round-trip per metric per (size,
    # scale) — ~1200 tunnel RTTs for the default sweep, which measured ~10x
    # the actual compute time on the axon-tunneled chip.
    arm_watchdog(600.0 * work_scale)  # execution + host fetch
    t0 = _time.perf_counter()
    # Teacher chains cached across jobs keyed on the full generation cell
    # (T, scale, seed, samples) — the checkpoint is fixed per call (VERDICT
    # r3 #3's cross-stage cache, realized at the process level).  Student
    # chains stay transient: reuse across jobs is rare and holding every
    # per-(sf, gs) chain would pin ~1 GB of HBM for the default workload.
    teacher_chain_cache: Dict[tuple, jax.Array] = {}
    pendings = []
    for job, teacher_fn, student_fns, batch_metrics_fn in zip(
        jobs, job_teacher_fns, job_student_fns, job_batch_metrics
    ):
        noises, seeds, mesh = job_inputs(job)
        keys = job_keys(job, mesh)
        pending = {sf: {} for sf in job["students"]}
        for gs in job["guidance_scales"]:
            use_cfg = gs is not None and gs > 1.0
            pairs = cfg_pairs if use_cfg else nocfg_pairs
            gs_host = float(1.0 if gs is None else gs)
            # Cache key from the HOST value: float(device_scalar) is a
            # synchronous per-scalar tunnel fetch (one RTT per (job, scale)).
            gs_arr = jnp.float32(gs_host)
            ck = (
                job["timesteps"], use_cfg, gs_host,
                job["base_seed"], job["num_samples"],
            )
            t_trajs = teacher_chain_cache.get(ck)
            if t_trajs is None:
                t_trajs = teacher_fn(noises, seeds, pairs, gs_arr)
                teacher_chain_cache[ck] = t_trajs
            for sf, fn in student_fns.items():
                s_trajs = fn(noises, seeds, pairs, gs_arr)
                pending[sf][gs] = batch_metrics_fn(t_trajs, s_trajs, keys)
        pendings.append(pending)
    host_metrics_all = jax.device_get(pendings)
    outputs = []
    for job, host_metrics in zip(jobs, host_metrics_all):
        num_samples = job["num_samples"]
        results: Dict[float, Dict[float, Dict[str, float]]] = {}
        for sf, per_gs in host_metrics.items():
            results[sf] = {}
            for gs, metrics in per_gs.items():
                # Sweep output keeps only the per-sample SCALAR metrics
                # (shape [num_samples], averaged) — vector metrics (per-step
                # velocities, per-step Wasserstein) are intentionally
                # dropped: the sweep consumers (heatmap/radar CLIs,
                # transform_metrics) need exactly the scalar suite, pinned by
                # tests/test_trajectories.py::test_sweep_output_contract.
                # Use compute_trajectory_metrics for the full per-pair suite.
                results[sf][gs] = {
                    k: float(np.mean(v))
                    for k, v in metrics.items()
                    if np.ndim(v) == 1 and np.shape(v)[0] == num_samples
                }
        # The reference stores the same pair-metric dict under both keys
        # (trajectory_engine.py:162-164).  We keep the VALUE equality but
        # return independent dict objects per key so a downstream writer
        # mutating one view cannot silently corrupt the other (round-2
        # review finding).
        outputs.append({
            sf: {
                "teacher_metrics": {gs: dict(m) for gs, m in per_gs.items()},
                "student_metrics": {gs: dict(m) for gs, m in per_gs.items()},
            }
            for sf, per_gs in results.items()
        })
    if verbose:
        n = sum(
            len(job["guidance_scales"]) * len(job["students"])
            * job["num_samples"]
            for job in jobs
        )
        dt = _time.perf_counter() - t0
        print(
            f"[sweep] generated+scored {n} trajectory pairs in {dt:.1f}s "
            f"({n / dt:.1f} pairs/s)"
        )
    return outputs


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
    """Single-job front half of :func:`_sweep_compare_multi_impl`."""
    return _sweep_compare_multi_impl(
        teacher_model,
        teacher_variables,
        [{
            "students": students,
            "guidance_scales": guidance_scales,
            "num_samples": num_samples,
            "base_seed": base_seed,
            "timesteps": config.timesteps,
        }],
        config,
        compile_workers=compile_workers,
        verbose=verbose,
    )[0]


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


def sweep_compare_trajectories_multi(
    teacher_model,
    teacher_variables,
    jobs: Sequence[dict],
    config,
    compile_workers: int = None,
    verbose: bool = True,
) -> List[Dict[float, Dict[str, Dict[float, Dict[str, float]]]]]:
    """Public front door for :func:`_sweep_compare_multi_impl` (see its
    docstring for the cross-job compile/chain sharing design).  Guarantees
    the tunnel-flake watchdog timer is disarmed on every exit path."""
    from ..utils.compile_pool import cancel_watchdog

    try:
        return _sweep_compare_multi_impl(
            teacher_model,
            teacher_variables,
            jobs,
            config,
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

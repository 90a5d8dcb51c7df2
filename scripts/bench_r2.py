"""Round-2 on-chip perf experiments: Pallas CFG-update kernel + sliding-window
ParaDiGMS latency.

Run on the real TPU (exclusive chip access required).  Prints one JSON line
per experiment; PERFORMANCE.md records the verdicts.

  python scripts/bench_r2.py --exp pallas      # kernel vs XLA-fused jnp tail
  python scripts/bench_r2.py --exp paradigms   # B=1 latency: scan vs window
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import project_root  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _flagship(batch):
    """Flagship sampling setup: sf=1.0 CIFAR 32x32 teacher, T=50."""
    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.diffusion import get_diffusion_params
    from distillation_trajectories_tpu.models import make_unet, init_unet
    from distillation_trajectories_tpu.training import make_eval_model_fn

    cfg = Config(base_dir="/tmp/bench_r2", sample_steps=50, timesteps=50)
    model = make_unet(cfg, size_factor=1.0)
    variables = init_unet(model, cfg, jax.random.PRNGKey(0))
    model_fn = make_eval_model_fn(model, variables)
    dp = get_diffusion_params(50, cfg)
    noise = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 32, 32, 3), jnp.float32
    )
    return cfg, model_fn, dp, noise


def _host_read(out):
    """Hard barrier: a host read of a small slice that depends on the full
    computation — block_until_ready alone can return early through the axon
    tunnel (bench.py measurement-integrity notes)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:4])


def _time(fn, *args, warmup=1, iters=5):
    """Median wall-clock with host-read barriers (bench.py conventions)."""
    for _ in range(warmup):
        _host_read(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _host_read(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def exp_pallas(batch=256):
    from distillation_trajectories_tpu.diffusion import generate_trajectory_scan

    cfg, model_fn, dp, noise = _flagship(batch)
    T = 50

    def run(use_pallas, seed):
        return generate_trajectory_scan(
            model_fn, noise, T, dp["alphas"], seed,
            guidance_scale=7.5, use_pallas=use_pallas,
        )

    jit_base = jax.jit(lambda s: run(False, s))
    jit_pall = jax.jit(lambda s: run(True, s))

    # numerical parity on chip first
    a = np.asarray(jit_base(jnp.int32(3)))
    b = np.asarray(jit_pall(jnp.int32(3)))
    max_dev = float(np.max(np.abs(a - b)))

    seeds = iter(range(100, 200))
    t_base = _time(lambda: jit_base(jnp.int32(next(seeds))))
    t_pall = _time(lambda: jit_pall(jnp.int32(next(seeds))))
    result = {
        "exp": "pallas_cfg_update",
        "batch": batch, "timesteps": T,
        "jnp_seconds": round(t_base, 4),
        "pallas_seconds": round(t_pall, 4),
        "speedup": round(t_base / t_pall, 4),
        "max_abs_deviation": max_dev,
        "traj_per_s_jnp": round(batch / t_base, 1),
        "traj_per_s_pallas": round(batch / t_pall, 1),
    }
    print(json.dumps(result))
    return result


def exp_paradigms(batch=1):
    from distillation_trajectories_tpu.diffusion import generate_trajectory_scan
    from distillation_trajectories_tpu.diffusion.parallel_sampling import (
        sliding_window_trajectory,
    )

    cfg, model_fn, dp, noise = _flagship(batch)
    T = 50

    jit_seq = jax.jit(
        lambda s: generate_trajectory_scan(
            model_fn, noise, T, dp["alphas"], s, guidance_scale=7.5
        )
    )
    exact = np.asarray(jit_seq(jnp.int32(3)))
    seeds = iter(range(100, 300))
    t_seq = _time(lambda: jit_seq(jnp.int32(next(seeds))))

    rows = []
    for window in (4, 8, 16):
        for tol in (1e-3, 3e-3, 1e-2):
            jit_win = jax.jit(
                lambda s, w=window, tl=tol: sliding_window_trajectory(
                    model_fn, noise, T, dp["alphas"], s,
                    guidance_scale=7.5, window=w, tol=tl,
                )
            )
            traj, sweeps = jit_win(jnp.int32(3))
            dev = float(np.max(np.abs(np.asarray(traj) - exact)))
            t_win = _time(lambda: jit_win(jnp.int32(next(seeds)))[0])
            rows.append({
                "window": window, "tol": tol,
                "sweeps_at_seed3": int(sweeps),
                "seconds": round(t_win, 4),
                "speedup_vs_scan": round(t_seq / t_win, 3),
                "max_abs_dev_vs_exact": round(dev, 5),
            })
            print(json.dumps({"exp": "paradigms", **rows[-1]}))

    result = {
        "exp": "paradigms_summary",
        "batch": batch, "timesteps": T,
        "sequential_seconds": round(t_seq, 4),
        "rows": rows,
    }
    print(json.dumps(result))
    return result


def exp_ablate(batch=256):
    """Attribute sampler step time by ablation, all inside on-device scans.

    Single dispatched calls over the axon tunnel cost ~30ms RTT each, and
    jax.profiler.trace hangs over the tunnel entirely — so every variant is
    a 49-iteration lax.scan (one dispatch), the same loop shape as the real
    sampler, and per-step costs come out of differences.  XLA cost_analysis
    counts the scan *body* once; multiply by the trip count for total FLOPs.
    """
    import jax.numpy as jnp

    from distillation_trajectories_tpu.diffusion import generate_trajectory_scan
    from distillation_trajectories_tpu.diffusion.sampling import engine_update
    from distillation_trajectories_tpu.models import unet as unet_mod

    cfg, model_fn, dp, noise = _flagship(batch)
    T = 50
    b = batch
    n_steps = T - 1
    tvec = jnp.full((b,), 25.0)
    ones = jnp.ones((b, 1))
    alphas = dp["alphas"]

    seeds = iter(range(100, 400))

    def scan_of(body):
        def run(x0, s):
            def step(x, t):
                return body(x, t, s), ()

            out, _ = jax.lax.scan(
                step, x0, jnp.arange(n_steps, dtype=jnp.int32)
            )
            return out

        return jax.jit(run)

    # A: the real sampler scan.
    jit_full = jax.jit(
        lambda s: generate_trajectory_scan(
            model_fn, noise, T, alphas, s, guidance_scale=3.0
        )
    )
    flops_step = jit_full.lower(jnp.int32(0)).compile().cost_analysis().get(
        "flops", float("nan")
    )
    t_full = _time(lambda: jit_full(jnp.int32(next(seeds))))

    # B: two CFG forwards per step, no update tail / PRNG / storage.
    def two_fwd(x, t, s):
        pu = model_fn(x, tvec, jnp.zeros((b, 1)), ones)
        pc = model_fn(x, tvec, ones, ones)
        return x + 1e-6 * (pu + 2.0 * pc)  # consume both, keep carry stable

    jit_two = scan_of(two_fwd)
    t_two = _time(lambda: jit_two(noise, jnp.int32(next(seeds))))

    # C: B with nearest-repeat upsample instead of the interp matmuls.
    orig = unet_mod.upsample_bilinear_x2
    try:
        unet_mod.upsample_bilinear_x2 = lambda x, _factor=2: jnp.repeat(
            jnp.repeat(x, 2, axis=1), 2, axis=2
        )
        jit_two_nou = scan_of(two_fwd)
        t_two_nou = _time(lambda: jit_two_nou(noise, jnp.int32(next(seeds))))
    finally:
        unet_mod.upsample_bilinear_x2 = orig

    # D: update tail only (PRNG fold-in + noise + c1/c2/sigma elementwise).
    def tail_only(x, t, s):
        a = jnp.asarray(alphas)  # host constants (see get_diffusion_params)
        key = jax.random.fold_in(jax.random.PRNGKey(s), t)
        step_noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        return engine_update(x, x * 1e-3, step_noise, a[t], a[t - 1])

    jit_tail = scan_of(tail_only)
    t_tail = _time(lambda: jit_tail(noise, jnp.int32(next(seeds))))

    peak_bf16 = 197e12  # v5e chip bf16 peak
    total_flops = flops_step * n_steps
    result = {
        "exp": "ablate",
        "batch": b,
        "timesteps": T,
        "full_scan_seconds": round(t_full, 4),
        "per_step_flops": flops_step,
        "mfu_vs_bf16_peak": round(total_flops / t_full / peak_bf16, 3),
        "two_fwd_scan_seconds": round(t_two, 4),
        "two_fwd_share": round(t_two / t_full, 3),
        "nearest_upsample_scan_seconds": round(t_two_nou, 4),
        "upsample_matmul_cost_share": round((t_two - t_two_nou) / t_full, 3),
        "update_tail_scan_seconds": round(t_tail, 4),
        "update_tail_share": round(t_tail / t_full, 3),
        "ms_per_step_full": round(1e3 * t_full / n_steps, 3),
        "ms_per_step_two_fwd": round(1e3 * t_two / n_steps, 3),
    }
    print(json.dumps(result))
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", type=str, default="pallas,paradigms")
    parser.add_argument("--batch", type=int, default=None)
    args = parser.parse_args()
    out = {}
    if "pallas" in args.exp:
        out["pallas"] = exp_pallas(batch=args.batch or 256)
    if "paradigms" in args.exp:
        out["paradigms"] = exp_paradigms(batch=1)
    if "ablate" in args.exp:
        out["ablate"] = exp_ablate(batch=args.batch or 256)
    path = os.path.join(project_root, "output", "results", "bench_r2.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[bench_r2] wrote {path}")


if __name__ == "__main__":
    main()

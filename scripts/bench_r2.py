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


def _time(fn, *args, warmup=1, iters=5):
    """Median wall-clock with fresh-output barriers (bench.py conventions)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
        del out
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
    path = os.path.join(project_root, "output", "results", "bench_r2.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[bench_r2] wrote {path}")


if __name__ == "__main__":
    main()

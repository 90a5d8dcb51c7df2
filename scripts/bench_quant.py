"""On-chip A/B bench: bf16 vs int8-quantized trajectory sampler.

Motivation: the flagship sampler is compute-bound at the bf16 roofline
(PERFORMANCE.md round-2 ablation — U-Net forwards are 96.9% of step time at
~61% MFU), and the v5e MXU runs int8×int8→int32 at 2× bf16 peak.  This
script measures whether XLA actually lowers the quantized Block convs
(models/quantized.py) onto the int8 MXU path, and what the quantization
costs in output fidelity — the decide-keep-or-reject measurement, same
protocol as the Pallas CFG kernel (kept off-default either way;
``Config.sampler_quant="int8"`` opts in).

Method mirrors bench.py: T=50 fused-CFG engine sampler, sf=1.0 32×32 U-Net,
B=256, per-iter fresh seeds (defeats the axon execution cache), one host
read as the barrier.  Fidelity: endpoint relative-L2 between the int8 and
float chains from identical (noise, seed) — CPU-measured forward error is
~1.0% rel-L2 (tests/test_quantized.py).

Usage:
    python scripts/bench_quant.py                       # random-init weights
    python scripts/bench_quant.py --use_checkpoint      # latest teacher ckpt
    python scripts/bench_quant.py --record_tag r04      # BENCH_QUANT_r04.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np

from _common import preflight_probe, project_root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--timesteps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--size_factor", type=float, default=1.0)
    ap.add_argument("--use_checkpoint", action="store_true",
                    help="load the latest teacher checkpoint instead of "
                    "random-init weights (quality numbers on real weights)")
    ap.add_argument("--record_tag", type=str, default=None,
                    help="also write BENCH_QUANT_{tag}.json at the repo root")
    ap.add_argument("--out", type=str,
                    default=os.path.join(project_root, "docs", "artifacts",
                                         "bench_quant.json"))
    args = ap.parse_args()

    probe = preflight_probe()
    print(f"# preflight: {probe}", file=sys.stderr)

    import jax

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.diffusion import (
        generate_trajectory_scan,
        get_diffusion_params,
    )
    from distillation_trajectories_tpu.models import init_unet, make_unet
    from distillation_trajectories_tpu.models.quantized import (
        make_quantized_eval_fn,
    )
    from distillation_trajectories_tpu.training import make_eval_model_fn
    from distillation_trajectories_tpu.utils.compile_pool import (
        arm_watchdog,
        cancel_watchdog,
    )

    t_steps = args.timesteps
    config = Config(timesteps=t_steps, sample_steps=t_steps)
    model = make_unet(config, size_factor=args.size_factor)
    weights = "random-init"
    variables = None
    if args.use_checkpoint:
        try:
            from distillation_trajectories_tpu.training import (
                load_checkpoint,
                variables_from_checkpoint,
            )

            payload = load_checkpoint(config.teacher_models_dir)
            variables = variables_from_checkpoint(payload)
            weights = "teacher-checkpoint"
        except Exception as e:  # fall through to random init, on record
            print(f"# checkpoint load failed ({e}); using random init",
                  file=sys.stderr)
    if variables is None:
        variables = init_unet(model, config, jax.random.PRNGKey(0))
    dp = get_diffusion_params(t_steps, config)

    def make_run(quant: bool):
        @jax.jit
        def run(vars_, noise, seed):
            fn = (make_quantized_eval_fn(model, vars_) if quant
                  else make_eval_model_fn(model, vars_))
            return generate_trajectory_scan(
                fn, noise, t_steps, dp["alphas"], seed,
                guidance_scale=args.guidance,
            )
        return run

    noise = jax.random.normal(
        jax.random.PRNGKey(1),
        (args.batch, config.image_size, config.image_size, config.channels),
    )

    def bench(run, label):
        # Compile envelope for the full sampler graph is ~5-6 min on the
        # tunneled chip; the watchdog converts a dropped RPC into a loud
        # exit instead of an eternal hang (try/finally per the r3 advice).
        arm_watchdog(900.0)
        try:
            t0 = time.perf_counter()
            np.asarray(run(variables, noise, 0)[-1, 0, 0, 0, :])  # compile
            compile_s = time.perf_counter() - t0
        finally:
            cancel_watchdog()
        arm_watchdog(600.0)
        try:
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = run(variables, noise, i + 1)
            np.asarray(out[-1, 0, 0, 0, :])  # one host read barriers all
            dt = time.perf_counter() - t0
        finally:
            cancel_watchdog()
        tps = args.batch * args.iters / dt
        print(f"# {label}: {tps:.1f} traj/s (compile {compile_s:.1f}s)",
              file=sys.stderr)
        return tps, compile_s

    float_tps, float_compile = bench(make_run(False), "float(bf16)")
    int8_tps, int8_compile = bench(make_run(True), "int8")

    # Fidelity: identical (noise, seed) chains, endpoint relative-L2.
    arm_watchdog(600.0)
    try:
        f_end = np.asarray(make_run(False)(variables, noise, 99)[-1])
        q_end = np.asarray(make_run(True)(variables, noise, 99)[-1])
    finally:
        cancel_watchdog()
    rel = float(np.linalg.norm(q_end - f_end) / (np.linalg.norm(f_end) + 1e-12))

    record = {
        "metric": "int8 sampler A/B (50-step CFG, sf=%g, %dx%d, B=%d)" % (
            args.size_factor, config.image_size, config.image_size, args.batch),
        "float_traj_per_s": round(float_tps, 2),
        "int8_traj_per_s": round(int8_tps, 2),
        "speedup": round(int8_tps / float_tps, 3),
        "endpoint_rel_l2": round(rel, 5),
        "float_compile_s": round(float_compile, 1),
        "int8_compile_s": round(int8_compile, 1),
        "weights": weights,
        "timesteps": t_steps,
        "guidance": args.guidance,
        "iters": args.iters,
        "preflight": probe,
        "ts_iso": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    if args.record_tag:
        with open(os.path.join(
                project_root, f"BENCH_QUANT_{args.record_tag}.json"), "w") as f:
            json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()

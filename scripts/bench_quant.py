"""On-chip A/B/n bench: bf16 vs folded vs int8 trajectory sampler arms.

Motivation: the flagship sampler is compute-bound at the bf16 roofline
(PERFORMANCE.md round-2 ablation — U-Net forwards are 96.9% of step time at
~61% MFU), and the v5e MXU runs int8×int8→int32 at 2× bf16 peak.  Round 4
measured the dynamic-int8 lane at 1.178× — far from the 2× premise — so this
script now ATTRIBUTES the gap arm by arm (the VERDICT r4 #3 protocol):

* ``float``             — bf16 ``model.apply`` baseline (bench.py's path)
* ``fold``              — BN folded into the convs, still float (isolates the
                          fold's contribution from the MXU's)
* ``int8``              — dynamic per-tensor activation scales (the round-4
                          lane: one unfusable max-reduction before EVERY conv)
* ``int8_static``       — activation scales calibrated once on states drawn
                          from a real sampler chain (kills the reductions)
* ``int8_static_mixed`` — static scales, int8 only on the ≥8×8 Blocks; the
                          4×4/2×2 levels are latency-bound, not FLOP-bound

plus a compiled-HLO census of which convolutions actually lowered with s8
operands.  Keep-or-reject is decided on the BEST int8 arm (same protocol as
the Pallas CFG kernel / ParaDiGMS entries in PERFORMANCE.md).

Method mirrors bench.py: T=50 fused-CFG engine sampler, sf=1.0 32×32 U-Net,
B=256, per-iter fresh seeds (defeats the axon execution cache), one host
read as the barrier.  Fidelity: endpoint relative-L2 between each arm and
the float chain from identical (noise, seed).

Usage:
    python scripts/bench_quant.py                       # random-init weights
    python scripts/bench_quant.py --use_checkpoint      # latest teacher ckpt
    python scripts/bench_quant.py --record_tag r05      # BENCH_QUANT_r05.json
    python scripts/bench_quant.py --arms float,int8     # subset
"""

import argparse
import json
import os
import sys
import time

import numpy as np

from _common import preflight_probe, project_root

ALL_ARMS = ("float", "fold", "int8", "int8_static", "int8_static_mixed")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--timesteps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--size_factor", type=float, default=1.0)
    ap.add_argument("--arms", type=str, default=",".join(ALL_ARMS))
    ap.add_argument("--no_hlo", action="store_true",
                    help="skip the compiled-HLO int8-conv census")
    ap.add_argument("--use_checkpoint", action="store_true",
                    help="load the latest teacher checkpoint instead of "
                    "random-init weights (quality numbers on real weights)")
    ap.add_argument("--record_tag", type=str, default=None,
                    help="also write BENCH_QUANT_{tag}.json at the repo root")
    ap.add_argument("--out", type=str,
                    default=os.path.join(project_root, "docs", "artifacts",
                                         "bench_quant.json"))
    args = ap.parse_args()
    arms = [a.strip() for a in args.arms.split(",") if a.strip()]
    unknown = set(arms) - set(ALL_ARMS)
    if unknown:
        ap.error(f"unknown arms {sorted(unknown)}; choose from {ALL_ARMS}")
    if "float" not in arms:
        arms.insert(0, "float")  # every comparison needs the baseline

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
        calibrate_activation_scales,
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

    # Blocks worth quantizing at this input size: spatial extent ≥ 8 —
    # resolution flow 32→16→8→4→2→…, so enc4/bottleneck/dec3 sit at 4×4/2×2
    # where the conv is latency-bound and requant overhead is pure loss.
    hw = config.image_size
    level_hw = {"enc1": hw, "enc2": hw // 2, "enc3": hw // 4,
                "enc4": hw // 8, "bottleneck": hw // 16,
                "dec3": hw // 8, "dec2": hw // 4, "dec1": hw // 2}
    mixed_blocks = {n for n, h in level_hw.items() if h >= 8}

    def make_run(fn_factory):
        @jax.jit
        def run(vars_, noise, seed):
            return generate_trajectory_scan(
                fn_factory(vars_), noise, t_steps, dp["alphas"], seed,
                guidance_scale=args.guidance,
            )
        return run

    noise = jax.random.normal(
        jax.random.PRNGKey(1),
        (args.batch, config.image_size, config.image_size, config.channels),
    )

    def count_int8_convs(run):
        """Census of convolution ops with s8 operands in the compiled HLO."""
        try:
            arm_watchdog(900.0)
            try:
                txt = run.lower(variables, noise, 0).compile().as_text()
            finally:
                cancel_watchdog()
            convs = [l for l in txt.splitlines() if "convolution" in l
                     and "=" in l]
            n_int8 = sum(1 for l in convs if "s8[" in l)
            return {"convs": len(convs), "int8_convs": n_int8}
        except Exception as e:
            return {"error": str(e)[:200]}

    def bench(run, label):
        # Compile envelope for the full sampler graph is ~5-6 min on the
        # tunneled chip; the watchdog converts a dropped RPC into a loud
        # exit instead of an eternal hang (try/finally per the r3 advice).
        arm_watchdog(900.0)
        try:
            t0 = time.perf_counter()
            end = np.asarray(run(variables, noise, 0)[-1])  # compile + calib
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
        return tps, compile_s, end

    # --- float baseline first; its compile chain doubles as the
    # calibration source for the static-scale arms. ---
    float_run = make_run(lambda v: make_eval_model_fn(model, v))
    results = {}
    float_tps, float_compile, _ = bench(float_run, "float(bf16)")
    results["float"] = {"traj_per_s": round(float_tps, 2),
                        "compile_s": round(float_compile, 1)}

    arm_watchdog(600.0)
    try:
        f_chain = np.asarray(float_run(variables, noise, 99))
    finally:
        cancel_watchdog()
    f_end = f_chain[-1]

    scales = None
    if any(a.startswith("int8_static") for a in arms):
        # Calibration states: K points along a REAL chain (activations grow
        # toward the noisy end) × the EXACT (cond, cond_mask) rows the
        # compiled sampler feeds the model (sampling.CFG_COND_PAIRS: the
        # uncond CFG branch is cond=0 at mask=1, NOT mask=0 — calibrating
        # off-distribution pairs mis-sizes the static scales), batch subset
        # for speed.  Host numpy in/out; scales return as host floats.
        from distillation_trajectories_tpu.diffusion.sampling import (
            CFG_COND_PAIRS,
            NOCFG_COND_PAIRS,
        )

        pairs = CFG_COND_PAIRS if args.guidance > 1.0 else NOCFG_COND_PAIRS
        cb = min(32, args.batch)
        idxs = sorted({0, t_steps // 4, t_steps // 2, (3 * t_steps) // 4,
                       t_steps - 1})
        xs, ts, conds, masks = [], [], [], []
        for idx in idxs:
            for c, m in np.unique(pairs, axis=0):
                xs.append(f_chain[idx][:cb])
                ts.append(np.full((cb,), float(t_steps - 1 - idx),
                                  np.float32))
                conds.append(np.full((cb, 1), c, np.float32))
                masks.append(np.full((cb, 1), m, np.float32))
        t0 = time.perf_counter()
        scales = calibrate_activation_scales(
            model, variables, np.stack(xs), np.stack(ts), np.stack(conds),
            np.stack(masks))
        print(f"# calibrated {sum(len(v) for v in scales.values())} static "
              f"scales in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    factories = {
        "fold": lambda v: make_quantized_eval_fn(model, v, nbits=None),
        "int8": lambda v: make_quantized_eval_fn(model, v),
        "int8_static": lambda v: make_quantized_eval_fn(
            model, v, act_scales=scales),
        "int8_static_mixed": lambda v: make_quantized_eval_fn(
            model, v, act_scales=scales, quant_blocks=mixed_blocks),
    }
    for arm in arms:
        if arm == "float":
            continue
        run = make_run(factories[arm])
        entry = {}
        if not args.no_hlo and arm != "fold":
            entry["hlo"] = count_int8_convs(run)
        tps, compile_s, end = bench(run, arm)
        rel = float(np.linalg.norm(end - f_end)
                    / (np.linalg.norm(f_end) + 1e-12))
        entry.update({
            "traj_per_s": round(tps, 2),
            "speedup_vs_float": round(tps / float_tps, 3),
            "endpoint_rel_l2": round(rel, 5),
            "compile_s": round(compile_s, 1),
        })
        results[arm] = entry

    int8_arms = {a: r for a, r in results.items()
                 if a.startswith("int8") and "traj_per_s" in r}
    best = max(int8_arms, key=lambda a: int8_arms[a]["traj_per_s"],
               default=None)
    record = {
        "metric": "int8 sampler A/B (50-step CFG, sf=%g, %dx%d, B=%d)" % (
            args.size_factor, config.image_size, config.image_size,
            args.batch),
        "float_traj_per_s": round(float_tps, 2),
        "int8_traj_per_s": (int8_arms[best]["traj_per_s"] if best else None),
        "int8_mode": best,
        "speedup": (int8_arms[best]["speedup_vs_float"] if best else None),
        "endpoint_rel_l2": (int8_arms[best]["endpoint_rel_l2"]
                            if best else None),
        "arms": results,
        "mixed_blocks": sorted(mixed_blocks),
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

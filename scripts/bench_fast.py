"""Composed fastest-trajectory lane: w-conditioned progressive student × int8.

The flagship bf16 CFG sampler has sat at its measured roofline for three
rounds (~905-911 traj/s at 60.9% MFU — PERFORMANCE.md round-2 ablation).
The two levers that beat it are both measured separately:

* the w-CONDITIONED progressive student (T=50 → T=12, one guided forward
  per step instead of two CFG forwards — BENCH_PROG: ~4.3× the teacher);
* the int8 quantized forward (BENCH_QUANT: the MXU axis).

This script measures them STACKED (VERDICT r4 #4): teacher bf16 CFG at
T=50 as the baseline, then the T=12 student in bf16 / dynamic-int8 /
static-int8(+mixed) — with the same quality columns as BENCH_PROG
(endpoint MSE vs the teacher from shared noise, per-w sweep, FID vs
teacher + self-floor) so the speedup is never quoted without its fidelity.
Multiplicativity is verified, not assumed.

Requires the checkpoints the record pipeline's earlier stages produce:
the teacher (output/models/teacher) and the guided progressive student
(output/models/progressive_cfg/steps_{T}).  Writes
docs/artifacts/bench_fast.json, plus BENCH_FAST_{tag}.json with
--record_tag.

Usage:
    python scripts/bench_fast.py --record_tag r05
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import (  # noqa: E402
    load_teacher_from_arg,
    preflight_probe,
    project_root,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--teacher_steps", type=int, default=50)
    ap.add_argument("--student_steps", type=int, default=12)
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--w_sweep", type=str, default="1.0,2.0,3.0,5.0,7.5")
    ap.add_argument("--fid_samples", type=int, default=128)
    ap.add_argument("--arms", type=str,
                    default="bf16,int8,int8_static,int8_static_mixed",
                    help="student arms (teacher baseline always runs)")
    ap.add_argument("--record_tag", type=str, default=None)
    ap.add_argument("--out", type=str,
                    default=os.path.join(project_root, "docs", "artifacts",
                                         "bench_fast.json"))
    # Tiny-scale escape hatches for the CPU contract test.
    ap.add_argument("--base_dir", type=str, default=None)
    ap.add_argument("--size_factor", type=float, default=1.0)
    ap.add_argument("--image_size", type=int, default=None)
    ap.add_argument("--channels", type=int, default=None)
    args = ap.parse_args()
    arms = [a.strip() for a in args.arms.split(",") if a.strip()]

    probe = preflight_probe()
    print(f"# preflight: {probe}", file=sys.stderr)

    import jax

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.diffusion import (
        generate_trajectory_scan,
        get_diffusion_params,
    )
    from distillation_trajectories_tpu.models.quantized import (
        calibrate_activation_scales,
    )
    from distillation_trajectories_tpu.training import (
        load_checkpoint,
        make_eval_model_fn,
        variables_from_checkpoint,
    )
    from distillation_trajectories_tpu.training.progressive import (
        make_guided_eval_fn,
    )
    from distillation_trajectories_tpu.utils.compile_pool import (
        arm_watchdog,
        cancel_watchdog,
    )

    cfg_kw = {}
    if args.base_dir:
        cfg_kw["base_dir"] = args.base_dir
    if args.image_size:
        cfg_kw.update(image_size=args.image_size, dataset="MNIST")
    if args.channels:
        cfg_kw["channels"] = args.channels
    config = Config(**cfg_kw)
    config.teacher_steps = args.teacher_steps
    if args.size_factor == 1.0:
        teacher_model, teacher_vars = load_teacher_from_arg(config, None)
    else:  # tiny-scale contract test lane
        from distillation_trajectories_tpu.models import make_unet

        payload = load_checkpoint(config.teacher_models_dir)
        teacher_model = make_unet(config, size_factor=args.size_factor)
        teacher_vars = variables_from_checkpoint(payload)
    model = teacher_model  # progressive students share the architecture
    ckpt_dir = os.path.join(
        config.models_dir, "progressive_cfg", f"steps_{args.student_steps}")
    student_vars = variables_from_checkpoint(load_checkpoint(ckpt_dir))
    print(f"# student: {ckpt_dir}", file=sys.stderr)

    dp_t = get_diffusion_params(args.teacher_steps, config)
    dp_s = get_diffusion_params(args.student_steps, config)
    w = args.guidance
    hw = config.image_size
    level_hw = {"enc1": hw, "enc2": hw // 2, "enc3": hw // 4,
                "enc4": hw // 8, "bottleneck": hw // 16,
                "dec3": hw // 8, "dec2": hw // 4, "dec1": hw // 2}
    mixed_blocks = {n for n, h in level_hw.items() if h >= 8}

    def teacher_fn_factory(v):
        return make_eval_model_fn(teacher_model, v)

    def make_run(fn_factory, steps, guidance_scale=None):
        @jax.jit
        def run(vars_, noise, seed):
            return generate_trajectory_scan(
                fn_factory(vars_), noise, steps,
                dp_t["alphas"] if steps == args.teacher_steps
                else dp_s["alphas"],
                seed, guidance_scale=guidance_scale,
            )
        return run

    shape = (args.batch, config.image_size, config.image_size,
             config.channels)
    noise = jax.random.normal(jax.random.PRNGKey(1), shape)

    def bench(run, vars_, label):
        arm_watchdog(900.0)
        try:
            t0 = time.perf_counter()
            # One-element host read barriers the compile+first run without
            # pulling the full [T+1,B,H,W,C] chain over the tunnel.
            np.asarray(run(vars_, noise, 0)[-1, 0, 0, 0, :])
            compile_s = time.perf_counter() - t0
        finally:
            cancel_watchdog()
        arm_watchdog(600.0)
        try:
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = run(vars_, noise, i + 1)
            np.asarray(out[-1, 0, 0, 0, :])  # one host read barriers all
            dt = time.perf_counter() - t0
        finally:
            cancel_watchdog()
        tps = args.batch * args.iters / dt
        print(f"# {label}: {tps:.1f} traj/s (compile {compile_s:.1f}s)",
              file=sys.stderr)
        return tps, compile_s

    # --- teacher CFG baseline ---
    t_run = make_run(teacher_fn_factory, args.teacher_steps,
                     guidance_scale=w)
    t_tps, t_compile = bench(t_run, teacher_vars,
                             f"teacher CFG bf16 T{args.teacher_steps}")
    arm_watchdog(600.0)
    try:
        # Quality reference chain: a separate seed shared with every arm.
        t_ref_end = np.asarray(t_run(teacher_vars, noise, 99)[-1])
    finally:
        cancel_watchdog()

    # --- student arms ---
    # ONE kwargs table drives every guided-eval-fn construction (arm
    # benches, w-sweep, FID) so adding an arm is a single edit; ``scales``
    # is read at CALL time, i.e. after the calibration pass below set it.
    scales = None

    def guided_fn(arm_name, wv, v):
        kw = {
            "bf16": {},
            "int8": {"quant": "int8"},
            "int8_static": {"quant": "int8", "act_scales": scales},
            "int8_static_mixed": {"quant": "int8", "act_scales": scales,
                                  "quant_blocks": mixed_blocks},
        }[arm_name]
        return make_guided_eval_fn(model, v, wv, **kw)

    results = {"teacher_cfg_bf16": {
        "steps": args.teacher_steps,
        "traj_per_s": round(t_tps, 2),
        "compile_s": round(t_compile, 1),
    }}
    arm_order = [a for a in ("bf16", "int8", "int8_static",
                             "int8_static_mixed") if a in arms]
    runs = {}
    for arm in arm_order:
        if arm.startswith("int8_static") and scales is None:
            # Calibration chain from the bf16 student graph — reuse the
            # bf16 arm's jitted run when it ran first (no retrace), and
            # slice to the calibration batch ON DEVICE so only cb samples
            # ride the tunnel, not the full [T+1, B, H, W, C] chain.
            cal_run = runs.get("bf16") or make_run(
                lambda v: guided_fn("bf16", w, v), args.student_steps)
            cb = min(32, args.batch)
            arm_watchdog(900.0)
            try:
                chain = np.asarray(cal_run(student_vars, noise, 0)[:, :cb])
            finally:
                cancel_watchdog()
            ss = args.student_steps
            idxs = sorted({0, ss // 4, ss // 2, (3 * ss) // 4, ss - 1})
            # Calibrate at every w the record later evaluates (the w-sweep
            # runs the best arm at each of these): the static scales must
            # cover the highest-w activation profile, not just w=guidance.
            cal_ws = sorted({w, *([float(x) for x in args.w_sweep.split(",")]
                                  if args.w_sweep else [])})
            xs, ts, conds, masks = [], [], [], []
            for i in idxs:
                for wv in cal_ws:
                    xs.append(chain[i])
                    ts.append(np.full((cb,), float(ss - 1 - i), np.float32))
                    conds.append(np.full((cb, 1), wv, np.float32))
                    masks.append(np.ones((cb, 1), np.float32))
            scales = calibrate_activation_scales(
                model, student_vars, np.stack(xs), np.stack(ts),
                np.stack(conds), np.stack(masks))
            print(f"# calibrated static scales on {len(idxs)} chain states "
                  f"x {len(cal_ws)} w values", file=sys.stderr)
        run = make_run(lambda v, a=arm: guided_fn(a, w, v),
                       args.student_steps)
        runs[arm] = run
        tps, compile_s = bench(run, student_vars,
                               f"student {arm} T{args.student_steps}")
        arm_watchdog(600.0)
        try:
            end = np.asarray(run(student_vars, noise, 99)[-1])
        finally:
            cancel_watchdog()
        results[f"student_{arm}"] = {
            "steps": args.student_steps,
            "traj_per_s": round(tps, 2),
            "speedup_vs_teacher": round(tps / t_tps, 3),
            "endpoint_mse_vs_teacher": float(np.mean((end - t_ref_end) ** 2)),
            "compile_s": round(compile_s, 1),
        }

    student_arms = {k: v for k, v in results.items()
                    if k.startswith("student_")}
    best = max(student_arms, key=lambda k: student_arms[k]["traj_per_s"])

    record = {
        "metric": ("composed fastest lane: w-cond progressive student "
                   f"T{args.student_steps} x quant vs CFG teacher "
                   f"T{args.teacher_steps} (sf=1.0, {hw}x{hw}, "
                   f"B={args.batch}, w={w})"),
        "teacher_traj_per_s": round(t_tps, 2),
        "best_arm": best,
        "best_traj_per_s": student_arms[best]["traj_per_s"],
        "best_speedup": student_arms[best]["speedup_vs_teacher"],
        "arms": results,
        "preflight": probe,
        "ts_iso": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
    }

    # Per-w generalization for the best arm (w rides as a RETRACE here —
    # guided_fn binds w at trace time; the sweep is small).
    if args.w_sweep:
        ws = [float(x) for x in args.w_sweep.split(",")]
        sweep = {}
        best_name = best.replace("student_", "")
        n_q = min(32, args.batch)
        q_noise = jax.random.normal(jax.random.PRNGKey(7), (
            n_q, hw, hw, config.channels))
        arm_watchdog(900.0 + 180.0 * len(ws))
        try:
            for wv in ws:
                te = np.asarray(generate_trajectory_scan(
                    make_eval_model_fn(teacher_model, teacher_vars), q_noise,
                    args.teacher_steps, dp_t["alphas"], seed=11,
                    guidance_scale=wv)[-1])
                sfn = guided_fn(best_name, wv, student_vars)
                se = np.asarray(generate_trajectory_scan(
                    sfn, q_noise, args.student_steps, dp_s["alphas"],
                    seed=11)[-1])
                sweep[str(wv)] = {
                    "endpoint_mse": float(np.mean((te - se) ** 2)),
                    "teacher_std": float(te.std()),
                    "student_std": float(se.std()),
                }
                print(f"# w={wv}: endpoint MSE "
                      f"{sweep[str(wv)]['endpoint_mse']:.2e}",
                      file=sys.stderr)
        finally:
            cancel_watchdog()
        record["w_sweep_best_arm"] = sweep

    # Distributional quality for the best arm: FID vs teacher + self floor.
    if args.fid_samples > 0:
        from distillation_trajectories_tpu.metrics.fid import (
            InceptionModel,
            calculate_fid,
        )

        arm_watchdog(1200.0)
        try:
            nf = args.fid_samples
            fid_shape = (nf, hw, hw, config.channels)
            tn = jax.random.normal(jax.random.PRNGKey(101), fid_shape)
            sn = jax.random.normal(jax.random.PRNGKey(202), fid_shape)
            t_set = generate_trajectory_scan(
                make_eval_model_fn(teacher_model, teacher_vars), tn,
                args.teacher_steps, dp_t["alphas"], seed=21,
                guidance_scale=w)[-1]
            best_name = best.replace("student_", "")
            sfn = guided_fn(best_name, w, student_vars)
            s_set = generate_trajectory_scan(
                sfn, sn, args.student_steps, dp_s["alphas"], seed=22)[-1]
            inception = InceptionModel()
            record["fid_features"] = ("pretrained-torchvision"
                                      if inception.pretrained
                                      else "seeded-random")
            t_feat = np.asarray(inception.get_features(t_set))
            s_feat = np.asarray(inception.get_features(s_set))
            record["fid_teacher_vs_best"] = float(
                calculate_fid(t_feat, s_feat))
            half = nf // 2
            if half >= 2:
                record["fid_teacher_self_floor"] = float(
                    calculate_fid(t_feat[:half], t_feat[half:]))
            print(f"# FID(teacher, {best}) = "
                  f"{record['fid_teacher_vs_best']:.3g} (floor "
                  f"{record.get('fid_teacher_self_floor', float('nan')):.3g})",
                  file=sys.stderr)
        finally:
            cancel_watchdog()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    if args.record_tag:
        p = os.path.join(project_root, f"BENCH_FAST_{args.record_tag}.json")
        with open(p, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
        print(f"# wrote {p}", file=sys.stderr)
    print(json.dumps(record))


if __name__ == "__main__":
    main()

"""On-chip measurement for progressive step-halving distillation.

Trains ``--rounds`` halvings from the checkpointed teacher (T=50 by
default, matching the BASELINE headline horizon), then measures:

* sampler throughput (trajectories/s, bench.py methodology: fresh seeds
  per timed call, host-read barrier) at the teacher's T and each halved T;
* quality evidence: from the SAME noise, teacher chains at T vs student
  chains at T/2^r — endpoint MSE / distribution similarity via the metric
  suite's kernels — plus side-by-side sample grids under
  ``output/results/progressive/``.

Writes one JSON to ``output/results/bench_progressive.json`` for
PERFORMANCE.md.  Usage:
    python scripts/bench_progressive.py [--rounds 2] [--epochs 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import (  # noqa: E402
    load_teacher_from_arg,
    preflight_probe,
    project_root,
)

import numpy as np  # noqa: E402


def measure_traj_per_s(model, variables, steps, config, batch=256, iters=3,
                       guidance_scale=None, guided_cond=None):
    """bench.py methodology: fresh seeds per timed call (the tunneled
    backend caches identical executions) and a host read that depends on
    the full computation as the barrier (block_until_ready can return
    early over the tunnel).

    ``guidance_scale`` runs the two-forward CFG path (the real teacher's
    guided sampler); ``guided_cond=w`` runs a w-CONDITIONED student in one
    guided forward per step.  Both None = the no-CFG path.
    """
    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu.diffusion import (
        generate_trajectory_scan,
        get_diffusion_params,
    )
    from distillation_trajectories_tpu.training.progressive import (
        make_guided_eval_fn,
    )
    from distillation_trajectories_tpu.training.state import make_eval_model_fn

    dp = get_diffusion_params(steps, config)

    @jax.jit
    def run(vars_, noise, seed):
        if guided_cond is not None:
            fn = make_guided_eval_fn(model, vars_, guided_cond)
        else:
            fn = make_eval_model_fn(model, vars_)
        return generate_trajectory_scan(
            fn, noise, steps, dp["alphas"], seed, guidance_scale=guidance_scale
        )

    shape = (batch, config.image_size, config.image_size, config.channels)
    key = jax.random.PRNGKey(0)
    times = []
    for i in range(iters + 1):
        key, nk = jax.random.split(key)
        noise = jax.random.normal(nk, shape)
        t0 = time.perf_counter()
        traj = run(variables, noise, jnp.int32(1234 + i))
        # host-read barrier that depends on the full computation
        _ = np.asarray(traj[-1, :2, :2, :2, 0])
        dt = time.perf_counter() - t0
        if i > 0:  # first call pays compile
            times.append(dt)
    dt = float(np.median(times))
    return batch / dt, dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rounds", type=int, default=2)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--timesteps", type=int, default=50)
    parser.add_argument("--limit_batches", type=int, default=None)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--quality_samples", type=int, default=8)
    parser.add_argument("--guidance_range", type=str, default=None,
                        help="lo,hi: guided distillation — the student is "
                        "w-conditioned and benched against the teacher's "
                        "two-forward CFG sampler at --guidance")
    parser.add_argument("--guidance", type=float, default=3.0,
                        help="CFG scale for throughput/quality comparison "
                        "in --guidance_range mode")
    parser.add_argument("--measure_only", action="store_true",
                        help="Skip training: load the last round's student "
                        "from progressive[_cfg]/steps_{T/2^rounds} and "
                        "only run the throughput/quality measurements "
                        "(for re-measuring after a degraded-tunnel run)")
    parser.add_argument("--fid_samples", type=int, default=0,
                        help="When >0: also compute FID between N teacher "
                        "samples and N student samples (fresh noise each — "
                        "a DISTRIBUTIONAL quality check, unlike the paired "
                        "endpoint MSE).  Uses the on-device Inception "
                        "featurizer (seeded random features unless "
                        "INCEPTION_WEIGHTS is set).")
    parser.add_argument("--record_tag", type=str, default=None,
                        help="When set (e.g. 'r04'): also write the result "
                        "as BENCH_PROG_{tag}.json at the repo root — the "
                        "per-round tracked record of the fewer-forwards "
                        "lane (the measured sampler roofline makes forward "
                        "count the only remaining throughput lever; see "
                        "PERFORMANCE.md round-3 sections)")
    parser.add_argument("--w_sweep", type=str, default=None,
                        help="comma list of guidance scales (e.g. "
                        "'1.0,2.0,3.0,5.0,7.5'): in --guidance_range mode, "
                        "additionally compare teacher CFG chains vs the "
                        "w-conditioned student at EACH scale (endpoint MSE "
                        "per w) — evidence the single conditioning input "
                        "generalizes across the trained range.  w rides as "
                        "a traced jit argument, so one compile per model "
                        "serves every scale.")
    args = parser.parse_args()

    probe = preflight_probe()

    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.diffusion import (
        generate_trajectory_scan,
        get_diffusion_params,
    )
    from distillation_trajectories_tpu.training import progressive_distill
    from distillation_trajectories_tpu.training.state import make_eval_model_fn
    from distillation_trajectories_tpu.utils.viz import save_image_grid

    config = Config()
    config.teacher_steps = args.timesteps
    if args.limit_batches:
        config.limit_batches_per_epoch = args.limit_batches
    config.create_directories()
    out_dir = os.path.join(config.results_dir, "progressive")
    os.makedirs(out_dir, exist_ok=True)

    teacher_model, teacher_vars = load_teacher_from_arg(config, None)
    grange = (
        tuple(float(x) for x in args.guidance_range.split(","))
        if args.guidance_range else None
    )

    if args.measure_only:
        from distillation_trajectories_tpu.training import (
            load_checkpoint,
            variables_from_checkpoint,
        )

        fast_steps = args.timesteps
        for _ in range(args.rounds):
            fast_steps //= 2
        family = "progressive_cfg" if grange else "progressive"
        ckpt_dir = os.path.join(config.models_dir, family, f"steps_{fast_steps}")
        model = teacher_model  # same architecture
        fast_vars = variables_from_checkpoint(load_checkpoint(ckpt_dir))
        train_s = 0.0
        print(f"[progressive] measure-only: loaded {ckpt_dir}")
    else:
        t0 = time.perf_counter()
        model, fast_vars, fast_steps = progressive_distill(
            config,
            teacher_model,
            teacher_vars,
            rounds=args.rounds,
            seed=0,
            epochs_per_round=args.epochs,
            guidance_range=grange,
        )
        train_s = time.perf_counter() - t0

    result = {
        "preflight": {"status": probe["status"], "detail": probe["detail"]},
        "teacher_steps": args.timesteps,
        "final_steps": fast_steps,
        "rounds": args.rounds,
        "epochs_per_round": args.epochs,
        "train_seconds": round(train_s, 1),
        "guidance_range": args.guidance_range,
        "guidance": args.guidance if grange else None,
        "throughput": {},
        "quality": {},
    }

    # Throughput at each step count.  Guided mode: the teacher pays the
    # two-forward CFG path at scale w; the student answers with ONE guided
    # forward per (halved) step.  Each measured phase re-arms the
    # tunnel-hang watchdog (no-op on CPU): the first call pays a ~5-min
    # chip compile, and a dropped RPC otherwise hangs forever.
    from distillation_trajectories_tpu.utils.compile_pool import (
        arm_watchdog,
        cancel_watchdog,
    )

    w = args.guidance
    for label, steps, variables, kw in [
        (
            f"teacher/T{args.timesteps}",
            args.timesteps,
            teacher_vars,
            {"guidance_scale": w} if grange else {},
        ),
        (
            f"student/T{fast_steps}",
            fast_steps,
            fast_vars,
            {"guided_cond": w} if grange else {},
        ),
    ]:
        arm_watchdog(900.0)
        tps, dt = measure_traj_per_s(
            model, variables, steps, config, batch=args.batch, **kw
        )
        result["throughput"][str(steps)] = {
            "traj_per_s": round(tps, 1), "batch_seconds": round(dt, 4),
        }
        print(f"[progressive] {label}: {tps:.1f} traj/s")

    # Quality: same starting noise, teacher T-step chain vs student chain.
    from distillation_trajectories_tpu.training.progressive import (
        make_guided_eval_fn,
    )

    arm_watchdog(900.0)
    n = args.quality_samples
    noise = jax.random.normal(
        jax.random.PRNGKey(7),
        (n, config.image_size, config.image_size, config.channels),
    )
    dp_t = get_diffusion_params(args.timesteps, config)
    dp_s = get_diffusion_params(fast_steps, config)
    t_final = generate_trajectory_scan(
        make_eval_model_fn(teacher_model, teacher_vars), noise,
        args.timesteps, dp_t["alphas"], seed=11,
        guidance_scale=w if grange else None,
    )[-1]
    s_final = generate_trajectory_scan(
        make_guided_eval_fn(model, fast_vars, w)
        if grange else make_eval_model_fn(model, fast_vars),
        noise,
        fast_steps, dp_s["alphas"], seed=11,
    )[-1]
    t_np, s_np = np.asarray(t_final), np.asarray(s_final)
    endpoint_mse = float(np.mean((t_np - s_np) ** 2))
    # distribution match of endpoint pixel statistics
    result["quality"] = {
        "endpoint_mse": endpoint_mse,
        "teacher_mean": float(t_np.mean()), "teacher_std": float(t_np.std()),
        "student_mean": float(s_np.mean()), "student_std": float(s_np.std()),
    }
    # Per-w generalization: teacher CFG vs w-conditioned student across the
    # trained guidance range.  Both chains are jitted ONCE with w as a
    # traced argument (generate_trajectory_scan's CFG combine u + w(c-u)
    # and the student's cond input are pure algebra in w), so the sweep
    # pays two compiles total.  Teacher variables ride as jit ARGUMENTS
    # (never closure constants — see state._DistillStep's rationale).
    if grange and args.w_sweep:
        ws = [float(x) for x in args.w_sweep.split(",")]

        @jax.jit
        def _teacher_end(vars_, noise, wv):
            fn = make_eval_model_fn(teacher_model, vars_)
            return generate_trajectory_scan(
                fn, noise, args.timesteps, dp_t["alphas"], seed=11,
                guidance_scale=wv,
            )[-1]

        @jax.jit
        def _student_end(vars_, noise, wv):
            base = make_eval_model_fn(model, vars_)

            def gfn(x, t, cond, cond_mask):
                b = x.shape[0]
                wcol = jnp.full((b, 1), 1.0, dtype=x.dtype) * wv.astype(x.dtype)
                return base(x, t, wcol, jnp.ones((b, 1), dtype=x.dtype))

            return generate_trajectory_scan(
                gfn, noise, fast_steps, dp_s["alphas"], seed=11
            )[-1]

        sweep = {}
        arm_watchdog(900.0 + 120.0 * len(ws))
        for wv in ws:
            te = np.asarray(_teacher_end(teacher_vars, noise, jnp.float32(wv)))
            se = np.asarray(_student_end(fast_vars, noise, jnp.float32(wv)))
            sweep[str(wv)] = {
                "endpoint_mse": float(np.mean((te - se) ** 2)),
                "teacher_std": float(te.std()),
                "student_std": float(se.std()),
            }
            print(f"[progressive] w={wv}: endpoint MSE "
                  f"{sweep[str(wv)]['endpoint_mse']:.2e}")
        result["quality"]["w_sweep"] = sweep

    sfx = "_cfg" if grange else ""
    save_image_grid(
        t_np, os.path.join(out_dir, f"teacher_T{args.timesteps}{sfx}.png"),
        nrow=4,
    )
    save_image_grid(
        s_np, os.path.join(out_dir, f"student_T{fast_steps}{sfx}.png"), nrow=4
    )

    # Distributional quality: FID between teacher and student sample sets
    # (fresh, different noise per set — complements the paired endpoint
    # MSE, which only measures map agreement from shared noise).
    if args.fid_samples > 0:
        from distillation_trajectories_tpu.metrics.fid import (
            InceptionModel,
            calculate_fid,
        )

        arm_watchdog(1200.0)
        nf = args.fid_samples
        fid_shape = (nf, config.image_size, config.image_size, config.channels)
        tn_noise = jax.random.normal(jax.random.PRNGKey(101), fid_shape)
        sn_noise = jax.random.normal(jax.random.PRNGKey(202), fid_shape)
        t_set = generate_trajectory_scan(
            make_eval_model_fn(teacher_model, teacher_vars), tn_noise,
            args.timesteps, dp_t["alphas"], seed=21,
            guidance_scale=w if grange else None,
        )[-1]
        s_set = generate_trajectory_scan(
            make_guided_eval_fn(model, fast_vars, w)
            if grange else make_eval_model_fn(model, fast_vars),
            sn_noise, fast_steps, dp_s["alphas"], seed=22,
        )[-1]
        inception = InceptionModel()
        result["quality"]["fid_features"] = (
            "pretrained-torchvision" if inception.pretrained
            else "seeded-random"
        )
        t_feat = np.asarray(inception.get_features(t_set))
        s_feat = np.asarray(inception.get_features(s_set))
        result["quality"]["fid_teacher_vs_student"] = float(
            calculate_fid(t_feat, s_feat)
        )
        # Self-FID floor: split the teacher set in half — the FID noise
        # floor at this sample count, for calibrating the number above.
        half = nf // 2
        if half >= 2:
            result["quality"]["fid_teacher_self_floor"] = float(
                calculate_fid(t_feat[:half], t_feat[half:])
            )
        print(f"[progressive] FID(teacher, student) = "
              f"{result['quality']['fid_teacher_vs_student']:.3g} "
              f"(self floor "
              f"{result['quality'].get('fid_teacher_self_floor', float('nan')):.3g}, "
              f"n={nf})")

    cancel_watchdog()
    path = os.path.join(config.results_dir, f"bench_progressive{sfx}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(f"[progressive] wrote {path}")
    if args.record_tag:
        rec = dict(result)
        rec["round"] = args.record_tag
        rec["recorded_unix"] = round(time.time(), 1)
        root_path = os.path.join(
            project_root, f"BENCH_PROG_{args.record_tag}.json"
        )
        with open(root_path, "w") as f:
            json.dump(rec, f, indent=2)
            f.write("\n")
        print(f"[progressive] wrote {root_path}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Full reference-default workload, timed end-to-end (BASELINE.json north
star: "the full 11-size sweep"), covering every BASELINE.json config.

Stages (all reference-default flags):
1. Teacher training            — train_teacher.py, 10 epochs, CIFAR-10 32x32
   defaults (synthetic fallback when blobs are stripped).
2. Student distillation sweep  — train_students.py, 5 epochs (reference
   README default), the 11 README size factors 0.01-1.0 PLUS 0.05/0.75 so
   the CFG-sweep CLI's own default size list is fully trainable.
3. CFG trajectory-metric sweep — analyze_trajectory_metrics.py defaults:
   8 sizes x 10 guidance scales x 10 samples, T=100 (BASELINE configs 3+4:
   CFG sweep with fused cond/uncond passes + the full CIFAR-10 32x32
   trajectory-metric suite).
4. Student-trio comparison     — the 0.1/0.5/0.9 trio vs teacher, paired
   per-timestep trajectories at T=50 (BASELINE config 2), via the same
   metric-sweep CLI.
5. FID analysis                — analyze_fid.py across ALL trained size
   factors with on-device Inception features (BASELINE config 5).

Writes SWEEP_r{N}.json at the repo root with per-stage wall-clock and the
equivalent-reference-time estimate from the measured reference rate in
.bench_baseline.json (trajectory generation only — the training stages have
no measured reference counterpart and are reported as wall-clock only).

Usage: python scripts/run_full_sweep.py [--tag r03] [--skip-training]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import project_root  # noqa: E402

from distillation_trajectories_tpu.utils.tunnel import (  # noqa: E402
    PROBE_MAX_WAIT_S,
    probe_device,
    wait_for_device,
)

SIZE_FACTORS = "0.01,0.05,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.75,0.8,0.9,1.0"


def run_stage(name, cmd, log_dir, timeout=None, retries=1,
              retry_extra_args=None, env_extra=None):
    """Run one stage as a subprocess with a hang timeout and retry.

    The tunneled TPU backend occasionally drops an RPC mid-compile and the
    client call never returns (see engine._sweep_compare_impl watchdog);
    a timed-out or crashed stage is treated as transient and retried once
    from scratch before being reported as failed.  Before a retry the
    device is re-probed: if the stage died because the tunnel went down,
    retrying into a dead tunnel would just burn the stage timeout again.
    """
    log_path = os.path.join(log_dir, f"sweep_{name}.log")
    print(f"[sweep] stage {name}: {' '.join(cmd)}")
    print(f"[sweep]   log: {log_path}")
    t0 = time.time()
    ok = False
    for attempt in range(retries + 1):
        if attempt > 0:
            # Outages of 1h+ have been observed; retrying into a dead
            # tunnel burns the full stage timeout, so wait longer than the
            # default probe budget and SKIP the retry if still down.
            probe = wait_for_device(max_wait=PROBE_MAX_WAIT_S, interval=60.0)
            print(f"[sweep] pre-retry probe: {probe['status']} "
                  f"({probe['detail']})")
            if probe["status"] == "down":
                print(f"[sweep] stage {name}: device still down; "
                      "aborting retry")
                break
        # Append with a banner so a failed attempt's log survives the retry.
        with open(log_path, "a") as log:
            log.write(f"\n===== attempt {attempt + 1} =====\n")
            log.flush()
            attempt_cmd = list(cmd)
            if attempt > 0 and retry_extra_args:
                attempt_cmd += list(retry_extra_args)
            try:
                proc = subprocess.run(
                    attempt_cmd, stdout=log, stderr=subprocess.STDOUT,
                    cwd=project_root, timeout=timeout,
                    env={**os.environ, **env_extra} if env_extra else None,
                )
                ok = proc.returncode == 0
            except subprocess.TimeoutExpired:
                log.write(f"\n[sweep] stage {name} timed out after {timeout}s\n")
                ok = False
        if ok:
            break
        if attempt < retries:
            print(f"[sweep] stage {name} attempt {attempt + 1} failed; retrying")
    dt = time.time() - t0
    print(f"[sweep] stage {name}: {'OK' if ok else 'FAILED'} in {dt:.1f}s")
    if not ok:
        with open(log_path) as f:
            print("".join(f.readlines()[-30:]))
    return {"ok": ok, "seconds": round(dt, 1), "cmd": " ".join(cmd)}


def _probe_weight_lanes() -> dict:
    """First existing pretrained-weights file per lane (None when absent).

    Mirrors the search orders in models/inception.py (_WEIGHTS_SEARCH_PATHS)
    and metrics/lpips.py (_weights_search_paths) without importing jax.
    """
    lanes = {
        "inception": [
            os.environ.get("INCEPTION_WEIGHTS", ""),
            os.path.join(project_root, "weights", "inception_v3.npz"),
            os.path.join(project_root, "weights", "inception_v3.pth"),
        ],
        "lpips": [
            os.environ.get("LPIPS_WEIGHTS", ""),
            os.path.join(project_root, "weights", "lpips_alex.npz"),
        ],
    }
    return {
        lane: next((p for p in paths if p and os.path.exists(p)), None)
        for lane, paths in lanes.items()
    }


def _job_marginal(log_path, label: str) -> float:
    """Marginal seconds of the job labeled ``label`` (output-dir basename)
    from the multi-job CLI's log.

    The CLI prints ``[jobs] job N ({label}): marginal X.Xs`` per job; match
    by LABEL, not index — the CLI numbers jobs over its FILTERED live-jobs
    list, so indices shift when a job has no trained students.  Only the
    LAST attempt counts: run_stage appends an ``===== attempt N =====``
    banner per attempt AND the log file persists across separate sweep
    runs, so the parse resets at every banner — a run (or retry) that died
    before printing its marginals must return 0.0, never inherit a stale
    value from an earlier attempt/run (the combined wall-clock then stays
    attributed to cfg_sweep, never lost or double-subtracted).
    """
    marginal = 0.0
    try:
        with open(log_path) as f:
            for line in f:
                if line.startswith("===== attempt "):
                    marginal = 0.0
                elif (line.startswith("[jobs] job ")
                        and f"({label}):" in line and "marginal" in line):
                    marginal = float(line.rsplit("marginal", 1)[1].strip().rstrip("s"))
    except (OSError, ValueError):
        pass
    return marginal


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tag", type=str, default="r02")
    parser.add_argument("--skip-training", action="store_true",
                        help="Only run the CFG sweep against existing checkpoints")
    parser.add_argument("--epochs_teacher", type=int, default=10)
    parser.add_argument("--epochs_students", type=int, default=5)
    args = parser.parse_args()

    log_dir = os.path.join(project_root, "output", "results")
    os.makedirs(log_dir, exist_ok=True)
    py = sys.executable

    # Refuse to start a measured workload on a dead or degraded tunnel:
    # numbers taken in the ~2.8 s/dispatch recovery mode are garbage
    # (observed: 2-5 s distill epochs become 170-250 s).  Wait up to 30 min
    # for recovery, then abort with the probe recorded so the failure is
    # diagnosable from the SWEEP json alone.
    # Real-weights lane probe (VERDICT r3 #8): re-check every round whether
    # pretrained Inception/LPIPS weight files have appeared so real FID /
    # LPIPS activates the moment they do; until then the FID artifact is
    # stamped "seeded-random" (analyze_fid.py fid_summary.json).
    weights_lanes = _probe_weight_lanes()
    for lane, found in weights_lanes.items():
        print(f"[sweep] weights lane {lane}: "
              f"{found if found else 'NOT FOUND (fallback features)'}")

    probe = probe_device()
    if probe["status"] != "ok":
        print(f"[sweep] device {probe['status']}: {probe['detail']}; waiting")
        probe = wait_for_device(max_wait=1800.0, interval=120.0)
    print(f"[sweep] preflight probe: {probe['status']} ({probe['detail']})")
    if probe["status"] != "ok":
        _write(args.tag, {}, time.time(), ok=False, probe=probe,
               weights=weights_lanes)
        sys.exit(1)

    stages = {}
    t_start = time.time()
    if args.skip_training:
        # Carry forward training-stage records from a previous full run so a
        # cfg-only rerun doesn't erase them from the SWEEP json.
        prev = os.path.join(project_root, f"SWEEP_{args.tag}.json")
        if os.path.exists(prev):
            with open(prev) as f:
                for k, v in json.load(f).get("stages", {}).items():
                    if k != "cfg_sweep":
                        stages[k] = v
    if not args.skip_training:
        # Training stages carry timeouts too: a dropped tunnel RPC inside a
        # train loop (observed round 3: students hung mid-epoch with no
        # stage deadline) must become a retry, not an indefinite hang.
        stages["teacher"] = run_stage(
            "teacher",
            [py, "scripts/train_teacher.py", "--epochs", str(args.epochs_teacher)],
            log_dir,
            timeout=1800,
            retries=1,
        )
        if not stages["teacher"]["ok"]:
            _write(args.tag, stages, t_start, ok=False, weights=weights_lanes)
            sys.exit(1)
        stages["students"] = run_stage(
            "students",
            [
                py, "scripts/train_students.py",
                "--epochs", str(args.epochs_students),
                "--custom_size_factors", SIZE_FACTORS,
            ],
            log_dir,
            timeout=3600,
            retries=1,
            # Resume at the first unfinished student on retry — attempt 1's
            # completed checkpoints are this run's own work, so reusing
            # them keeps the timing record honest (the outage + both
            # attempts are all inside the stage wall).
            retry_extra_args=["--skip_existing"],
        )
        _embed_students_phases(log_dir, stages["students"])
        if not stages["students"]["ok"]:
            _write(args.tag, stages, t_start, ok=False, weights=weights_lanes)
            sys.exit(1)

    # BASELINE configs 2-4 ride ONE process: the flagship CFG sweep (job 0,
    # T=100 defaults) and the student-trio comparison (job 1, 0.1/0.5/0.9 at
    # T=50) share the checkpoint load, one concurrent compile pool over both
    # jobs' executables, and the engine's cross-job teacher-chain cache —
    # round 3 ran them as separate processes (126.6s + 49.7s) paying two
    # loads and two pools.  The CLI prints per-job marginal seconds; stage
    # attribution below keeps the SWEEP json's cfg_sweep/trio split.
    combined = run_stage(
        "cfg_trio",
        [
            py, "scripts/analysis/analyze_trajectory_metrics.py",
            "--jobs",
            json.dumps([
                {"output_dir": "analysis/heatmaps"},
                {"size_factors": "0.1,0.5,0.9", "timesteps": 50,
                 "output_dir": "analysis/trio"},
            ]),
        ],
        log_dir,
        timeout=2400,
        retries=2,
        # The runner's own preflight (or the previous stage's on-chip
        # success / the pre-retry probe) already vouches for the tunnel;
        # the in-CLI probe would re-pay a full subprocess jax init.
        env_extra={"DTT_SKIP_PREFLIGHT": "1"},
    )
    trio_marginal = _job_marginal(
        os.path.join(log_dir, "sweep_cfg_trio.log"), label="trio")
    shared_note = " [shared process with trio; see sweep_cfg_trio.log]"
    stages["cfg_sweep"] = {
        "ok": combined["ok"],
        "seconds": round(combined["seconds"] - trio_marginal, 1),
        "cmd": combined["cmd"] + shared_note,
    }
    stages["trio"] = {
        "ok": combined["ok"],
        "seconds": round(trio_marginal, 1),
        "cmd": combined["cmd"]
        + " [marginal cost of the trio job in the shared process]",
    }
    # BASELINE config 5: FID across every trained size factor.
    stages["fid"] = run_stage(
        "fid",
        [
            py, "scripts/analysis/analyze_fid.py",
            "--size_factors", SIZE_FACTORS,
        ],
        log_dir,
        timeout=1800,
        retries=2,
        env_extra={"DTT_SKIP_PREFLIGHT": "1"},
    )
    ok = all(stages[k]["ok"] for k in ("cfg_sweep", "trio", "fid"))
    _write(args.tag, stages, t_start, ok=ok, probe=probe,
           weights=weights_lanes)
    sys.exit(0 if ok else 1)


def _embed_students_phases(log_dir, stage_record):
    """Wall-clock attribution for the students stage (VERDICT r4 #5: the
    next lever is invisible without a compile/train/checkpoint split):
    train_students dumps per-phase totals; embed them in the stage record
    as ``phases`` — train_epochs_s plus one entry per ``students/*`` phase
    (init/build/compile-trace/compile-wait/checkpoint walls)."""
    phases_path = os.path.join(log_dir, "students_phase_times.json")
    if not os.path.exists(phases_path):
        return
    # Stale-file guard: only embed a dump written by THIS stage.
    if (os.path.getmtime(phases_path)
            < time.time() - stage_record["seconds"] - 120):
        return
    try:
        with open(phases_path) as f:
            phases = json.load(f)
        train_s = sum(
            v["total_s"] for k, v in phases.items()
            if k.startswith("distill_epoch_"))
        stage_record["phases"] = {
            "train_epochs_s": round(train_s, 1),
            **{k.split("/", 1)[1] + "_s": round(v["total_s"], 1)
               for k, v in phases.items()
               if k.startswith("students/")},
        }
    except Exception as e:
        stage_record["phases"] = {"error": str(e)[:200]}


def _write(tag, stages, t_start, ok, probe=None, weights=None):
    # Sum of stage wall-clocks (== end-to-end wall for a full run; for a
    # --skip-training rerun it still reflects the whole workload because
    # training stages are carried forward from the previous SWEEP json).
    total = sum(s["seconds"] for s in stages.values())
    # Reference-equivalent estimate for the sweep stage only: the measured
    # reference trajectory rate (.bench_baseline.json, traj/s on this host's
    # CPU) over the sweep's 8 sizes x 10 scales x 10 samples x 2 chains.
    ref_rate = None
    baseline_path = os.path.join(project_root, ".bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref_rate = json.load(f).get("ref_traj_per_sec_cpu")
    n_traj = 8 * 10 * 10 * 2
    # ref_rate is trajectories/s at T=50 (bench.py measures per-step time and
    # divides by T_STEPS=50); the sweep's chains are T=100, so one sweep
    # trajectory costs the reference 100/50 = 2x the benched trajectory.
    t_scale = 100 / 50
    ref_equiv = round(n_traj * t_scale / ref_rate, 1) if ref_rate else None
    sweep_s = stages.get("cfg_sweep", {}).get("seconds")
    payload = {
        "tag": tag,
        "ok": ok,
        "total_seconds": round(total, 1),
        "preflight_probe": probe,
        "pretrained_weight_lanes": weights,
        "stages": stages,
        "workload": {
            "teacher_epochs": "see stages",
            "student_size_factors": SIZE_FACTORS,
            "cfg_sweep": "8 sizes x 10 guidance scales x 10 samples, T=100, "
                         "paired teacher/student chains",
            "trio": "size factors 0.1/0.5/0.9 vs teacher, paired "
                    "per-timestep chains, T=50 (BASELINE config 2)",
            "fid": f"FID across size factors {SIZE_FACTORS} with on-device "
                   "Inception features (BASELINE config 5)",
            "n_trajectories_in_sweep": n_traj,
        },
        "reference_traj_per_s_T50": ref_rate,
        "reference_equiv_sweep_seconds": ref_equiv,
        "sweep_speedup_vs_reference": (
            round(ref_equiv / sweep_s, 1) if ref_equiv and sweep_s else None
        ),
    }
    out = os.path.join(project_root, f"SWEEP_{tag}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(f"[sweep] wrote {out}: ok={ok} total={total:.1f}s")


if __name__ == "__main__":
    main()

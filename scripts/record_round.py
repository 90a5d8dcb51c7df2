"""One-command round-record pipeline: gate -> probe -> bench -> sweep -> ...

The axon tunnel regularly goes down for 1h+ (PERFORMANCE.md outage log);
round 3 ended with its flagship artifacts unrecorded because the runs were
attempted interactively late in the round.  This script is the institutional
fix: launch it in the background at the START of a round and it waits out a
dead tunnel, then records every per-round artifact in sequence on the
single-tenant chip:

0. CORRECTNESS GATE (CPU, tunnel-independent): the quick pytest lane and
   the driver multichip dryrun.  Round 4 shipped a red driver contract
   because nothing in the record path ran it; if either gate leg is red the
   pipeline REFUSES to record or commit artifacts and exits loudly
   (override for emergencies with --skip_gate).
1. ``python bench.py``                      -> BENCH ledger + stdout JSON
2. ``python scripts/run_full_sweep.py``     -> SWEEP_{tag}.json
3. ``python scripts/bench_progressive.py``  -> BENCH_PROG_{tag}.json
   (the fewer-forwards lane: w-conditioned progressive student vs the CFG
   teacher — the only remaining throughput lever at the measured 60.9% MFU
   sampler roofline)
4. ``--with_quant``: scripts/bench_quant.py -> BENCH_QUANT_{tag}.json
5. ``--with_fast``:  scripts/bench_fast.py  -> BENCH_FAST_{tag}.json
   (the composed lane — w-conditioned student × int8; needs the
   progressive stage's checkpoint, so it runs last)

Each stage gets a hard wall-clock timeout (a dropped RPC otherwise hangs
forever) and the tunnel is re-probed between stages.  Stage logs land in
``output/results/record_{tag}_{stage}.log``.

Usage:
    nohup python -u scripts/record_round.py --tag r05 > /tmp/record.log 2>&1 &
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import project_root  # noqa: E402

from distillation_trajectories_tpu.utils.tunnel import (  # noqa: E402
    probe_device,
    wait_for_device,
)


def _wait_healthy(require_streak: int = 2, interval: float = 120.0) -> None:
    """Block until the tunnel reports ``ok`` on ``require_streak``
    consecutive probes 60s apart — a single ok during a flapping recovery
    window has launched runs straight into the next outage."""
    t0 = time.time()
    streak = 0
    while True:
        r = probe_device()
        print(json.dumps({"t": round(time.time() - t0, 1), **r}, default=str),
              flush=True)
        if r["status"] == "ok":
            streak += 1
            if streak >= require_streak:
                return
            time.sleep(60)
        else:
            streak = 0
            time.sleep(interval)


def _stage(name: str, cmd: list, tag: str, timeout: float) -> bool:
    log_path = os.path.join(
        project_root, "output", "results", f"record_{tag}_{name}.log")
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    print(f"[record] stage {name}: {' '.join(cmd)} (log {log_path})",
          flush=True)
    t0 = time.time()
    # start_new_session so a timeout kills the WHOLE process group: the
    # stages here are themselves stage-runners (run_full_sweep spawns
    # train_students etc., bench_progressive spawns nothing but bench's
    # probe does) — subprocess's own timeout kill reaps only the direct
    # child, and an orphaned grandchild would keep holding the
    # single-tenant chip while the next stage launches into it.
    with open(log_path, "a") as log:
        proc = subprocess.Popen(cmd, cwd=project_root, stdout=log,
                                stderr=subprocess.STDOUT,
                                start_new_session=True)
        try:
            rc = proc.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            rc = -1
            print(f"[record] stage {name}: TIMEOUT after {timeout}s; "
                  "killing process group", flush=True)
            for sig, grace in ((signal.SIGTERM, 30.0), (signal.SIGKILL, None)):
                try:
                    os.killpg(proc.pid, sig)
                except (ProcessLookupError, PermissionError):
                    break
                if grace is not None:
                    try:
                        proc.wait(timeout=grace)
                        break
                    except subprocess.TimeoutExpired:
                        continue
                proc.wait()
    print(f"[record] stage {name}: rc={rc} in {time.time() - t0:.1f}s",
          flush=True)
    return rc == 0


def _gate(tag: str) -> dict:
    """CPU correctness gate: quick pytest lane + the driver dryrun contract.

    Both legs are tunnel-independent (tests/conftest.py and
    dryrun_multichip force the CPU backend), so the gate runs BEFORE any
    tunnel wait.  A red leg means the working tree would record artifacts
    for code the driver/judge will grade as broken — refuse.
    """
    py = sys.executable
    gate = {
        "pytest": _stage(
            "gate_pytest",
            [py, "-m", "pytest", "tests/", "-q", "-m", "not slow"],
            tag, timeout=2400),
        "driver_contract": _stage(
            "gate_driver",
            [py, "-u", "-c",
             "from __graft_entry__ import dryrun_multichip; "
             "dryrun_multichip(8)"],
            tag, timeout=2400),
    }
    print(f"[record] gate: "
          f"{{pytest: {'ok' if gate['pytest'] else 'RED'}, "
          f"driver_contract: {'ok' if gate['driver_contract'] else 'RED'}}}",
          flush=True)
    return gate


def _commit_artifacts(tag: str, results: dict) -> None:
    """Commit the per-round measured artifacts so a pipeline that finishes
    after the interactive session ends still lands durable results (the
    stages run for hours once the tunnel recovers; nobody may be around
    when they complete).

    Both the changed-check and the commit are PATHSPEC-LIMITED to the
    artifact files: a bare ``git commit`` here would sweep up any unrelated
    staged work sitting in the tree when the pipeline fires hours later.
    """
    candidates = [
        f"SWEEP_{tag}.json",
        f"BENCH_{tag}.json",
        f"MULTICHIP_{tag}.json",
        f"BENCH_PROG_{tag}.json",
        f"BENCH_QUANT_{tag}.json",
        f"BENCH_FAST_{tag}.json",
        ".bench_ledger.jsonl",
        ".bench_baseline.json",
        os.path.join("docs", "artifacts", "bench_quant.json"),
        os.path.join("docs", "artifacts", "bench_fast.json"),
    ]
    present = [p for p in candidates
               if os.path.exists(os.path.join(project_root, p))]
    if not present:
        print("[record] no artifact files to commit", flush=True)
        return
    try:
        subprocess.run(["git", "add", "--"] + present, cwd=project_root,
                       check=True, timeout=60)
        diff = subprocess.run(
            ["git", "diff", "--cached", "--quiet", "--"] + present,
            cwd=project_root, timeout=60)
        if diff.returncode == 0:
            print("[record] artifacts unchanged; nothing to commit",
                  flush=True)
            return
        ok = [k for k, v in results.items() if v]
        msg = (f"Record {tag} measured artifacts "
               f"({', '.join(ok) if ok else 'no stage ok'})")
        subprocess.run(["git", "commit", "-m", msg, "--"] + present,
                       cwd=project_root, check=True, timeout=60)
        print(f"[record] committed: {msg}", flush=True)
    except Exception as e:  # never let bookkeeping kill the pipeline exit
        print(f"[record] artifact commit failed: {e}", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tag", type=str, required=True, help="e.g. r05")
    parser.add_argument("--skip_bench", action="store_true")
    parser.add_argument("--skip_sweep", action="store_true")
    parser.add_argument("--skip_progressive", action="store_true")
    parser.add_argument("--sweep_args", type=str, default="",
                        help="extra args for run_full_sweep.py, e.g. "
                        "'--skip-training'")
    parser.add_argument("--no_git_commit", action="store_true",
                        help="skip the end-of-pipeline artifact commit")
    parser.add_argument("--with_quant", action="store_true",
                        help="append the int8-sampler A/B stage "
                        "(scripts/bench_quant.py -> BENCH_QUANT_{tag}.json)")
    parser.add_argument("--with_fast", action="store_true",
                        help="append the composed student×int8 stage "
                        "(scripts/bench_fast.py -> BENCH_FAST_{tag}.json); "
                        "needs the progressive stage's checkpoint")
    parser.add_argument("--skip_gate", action="store_true",
                        help="EMERGENCY ONLY: record even if the CPU "
                        "correctness gate is red")
    args = parser.parse_args()
    py = sys.executable

    results = {}
    if not args.skip_gate:
        gate = _gate(args.tag)
        if not all(gate.values()):
            print("[record] GATE RED — refusing to record/commit artifacts "
                  "for a broken tree (see gate_* logs; --skip_gate "
                  "overrides).", flush=True)
            print(f"[record] DONE {json.dumps({'gate': gate})}", flush=True)
            sys.exit(2)
        results["gate"] = True
    if not args.skip_bench:
        _wait_healthy()
        # Must exceed bench.py's own worst-case budget (600s probe wait +
        # 420/900/900s attempt timeouts + sleeps ≈ 2850s) so its
        # stale-record exit always runs — killing it early would reproduce
        # the opaque rc=124 tail the ledger exists to prevent.
        results["bench"] = _stage(
            "bench", [py, "-u", "bench.py"], args.tag, timeout=3300)
    if not args.skip_sweep:
        _wait_healthy()
        cmd = [py, "-u", "scripts/run_full_sweep.py", "--tag", args.tag]
        if args.sweep_args:
            cmd += args.sweep_args.split()
        # 5h: covers a healthy full run (~2000-2800s) plus one mid-run
        # outage (1800s pre-retry probe wait) and one full stage retry of
        # the largest stage (students, 3600s) with margin.  The absolute
        # worst case (every stage times out, retries, and re-probes) is
        # ~9.5h — not worth waiting for: past ~5h the run has degenerated
        # and the group-kill above guarantees the chip is released for the
        # progressive stage either way.
        results["sweep"] = _stage("sweep", cmd, args.tag, timeout=18000)
    if not args.skip_progressive:
        _wait_healthy()
        results["progressive"] = _stage(
            "progressive",
            [py, "-u", "scripts/bench_progressive.py",
             "--rounds", "2", "--epochs", "3",
             "--guidance_range", "1.0,7.5", "--guidance", "3.0",
             "--w_sweep", "1.0,2.0,3.0,5.0,7.5", "--fid_samples", "128",
             "--record_tag", args.tag],
            args.tag, timeout=5400)
    if args.with_quant:
        _wait_healthy()
        # Five full sampler compiles (float/fold/int8×3 arms, ~5-6 min each
        # over the tunnel) + measured chains + HLO census; the script's own
        # watchdogs convert dropped RPCs into loud exits well inside this.
        results["quant"] = _stage(
            "quant",
            [py, "-u", "scripts/bench_quant.py", "--use_checkpoint",
             "--record_tag", args.tag],
            args.tag, timeout=7200)
    if args.with_fast:
        _wait_healthy()
        # Teacher CFG + four student arms (~5 compiles) + w-sweep + FID.
        results["fast"] = _stage(
            "fast",
            [py, "-u", "scripts/bench_fast.py", "--record_tag", args.tag],
            args.tag, timeout=7200)
    if not args.skip_bench and not results.get("bench", True):
        # A bench attempt that landed inside a flapping recovery window
        # burns all its internal retries on dead probes (observed r05i:
        # one ok probe, then down again mid-compile).  The later stages'
        # _wait_healthy calls mean hours may have passed — one retry at
        # the end of the pipeline costs ~7 min on a genuinely healthy
        # tunnel and rescues the round's bench record.
        _wait_healthy()
        results["bench_retry"] = _stage(
            "bench_retry", [py, "-u", "bench.py"], args.tag, timeout=3300)
    if not args.no_git_commit:
        _commit_artifacts(args.tag, results)
    print(f"[record] DONE {json.dumps(results)}", flush=True)
    sys.exit(0 if all(results.values()) else 1)


if __name__ == "__main__":
    main()

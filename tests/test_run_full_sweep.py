"""Bookkeeping of the timed full-workload runner (scripts/run_full_sweep.py)."""

import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_write_speedup_math(tmp_path, monkeypatch):
    """SWEEP json totals and the reference-equivalent speedup derive from
    the measured reference rate with the T=100/T=50 scaling."""
    rfs = importlib.import_module("run_full_sweep")
    monkeypatch.setattr(rfs, "project_root", str(tmp_path))
    with open(tmp_path / ".bench_baseline.json", "w") as f:
        json.dump({"ref_traj_per_sec_cpu": 0.4}, f)

    stages = {
        "teacher": {"ok": True, "seconds": 100.0, "cmd": "t"},
        "students": {"ok": True, "seconds": 200.0, "cmd": "s"},
        "cfg_sweep": {"ok": True, "seconds": 160.0, "cmd": "c"},
        "trio": {"ok": True, "seconds": 50.0, "cmd": "tr"},
        "fid": {"ok": True, "seconds": 90.0, "cmd": "f"},
    }
    rfs._write("rtest", stages, time.time(), ok=True)

    with open(tmp_path / "SWEEP_rtest.json") as f:
        payload = json.load(f)
    assert payload["ok"] is True
    assert payload["total_seconds"] == 600.0
    # 1600 chains at T=100 = 2x the benched T=50 trajectory each.
    assert payload["reference_equiv_sweep_seconds"] == round(
        1600 * 2 / 0.4, 1
    )
    assert payload["sweep_speedup_vs_reference"] == round(
        (1600 * 2 / 0.4) / 160.0, 1
    )
    # Workload description covers all five BASELINE configs.
    wl = payload["workload"]
    assert "trio" in wl and "fid" in wl and "cfg_sweep" in wl


def test_preflight_aborts_on_dead_tunnel(tmp_path, monkeypatch):
    """main() refuses to start a measured run when the device probe never
    recovers, and records the probe verdict in the SWEEP json."""
    rfs = importlib.import_module("run_full_sweep")
    monkeypatch.setattr(rfs, "project_root", str(tmp_path))
    bad = {"status": "down", "rtt_s": None, "init_s": None, "platform": None,
           "detail": "probe timed out after 90s (hung tunnel RPC)"}
    monkeypatch.setattr(rfs, "probe_device", lambda **kw: dict(bad))
    monkeypatch.setattr(rfs, "wait_for_device", lambda **kw: dict(bad))

    # No stage subprocess may ever launch on a dead tunnel.
    def boom(*a, **kw):
        raise AssertionError("stage launched despite dead tunnel")

    monkeypatch.setattr(rfs, "run_stage", boom)
    monkeypatch.setattr(sys, "argv", ["run_full_sweep.py", "--tag", "rdead"])
    try:
        rfs.main()
    except SystemExit as e:
        assert e.code == 1
    else:
        raise AssertionError("main() should exit non-zero")
    with open(tmp_path / "SWEEP_rdead.json") as f:
        payload = json.load(f)
    assert payload["ok"] is False
    assert payload["preflight_probe"]["status"] == "down"


def test_retry_appends_extra_args_and_aborts_when_down(tmp_path, monkeypatch):
    """run_stage: attempt 2 carries retry_extra_args (the students stage's
    --skip_existing resume), and a still-down pre-retry probe aborts the
    retry instead of burning the stage timeout."""
    rfs = importlib.import_module("run_full_sweep")
    monkeypatch.setattr(rfs, "project_root", str(tmp_path))
    ok_probe = {"status": "ok", "rtt_s": 0.03, "init_s": 1.0,
                "platform": "tpu", "detail": "fine"}
    monkeypatch.setattr(rfs, "wait_for_device", lambda **kw: dict(ok_probe))

    calls = []

    class _Proc:
        def __init__(self, rc):
            self.returncode = rc

    def fake_run(cmd, **kw):
        calls.append(list(cmd))
        return _Proc(1 if len(calls) == 1 else 0)

    monkeypatch.setattr(rfs.subprocess, "run", fake_run)
    out = rfs.run_stage(
        "students", ["python", "train.py"], str(tmp_path),
        retries=1, retry_extra_args=["--skip_existing"],
    )
    assert out["ok"] is True
    assert calls[0] == ["python", "train.py"]
    assert calls[1] == ["python", "train.py", "--skip_existing"]

    # Still-down probe: no second subprocess launch.
    down = {"status": "down", "rtt_s": None, "init_s": None,
            "platform": None, "detail": "hung"}
    monkeypatch.setattr(rfs, "wait_for_device", lambda **kw: dict(down))
    calls.clear()

    def always_fail(cmd, **kw):
        calls.append(list(cmd))
        return _Proc(1)

    monkeypatch.setattr(rfs.subprocess, "run", always_fail)
    out = rfs.run_stage(
        "students", ["python", "train.py"], str(tmp_path), retries=1,
    )
    assert out["ok"] is False
    assert len(calls) == 1  # retry aborted, not launched into a dead tunnel


def test_job_marginal_parses_last_occurrence(tmp_path):
    import importlib

    rfs = importlib.import_module("run_full_sweep")
    log = tmp_path / "sweep_cfg_trio.log"
    log.write_text(
        "===== attempt 1 =====\n"
        "[jobs] job 1 (trio): marginal 99.9s\n"
        "===== attempt 2 =====\n"
        "[jobs] job 0 (heatmaps): marginal 30.2s\n"
        "[jobs] job 1 (trio): marginal 12.3s\n"
    )
    assert rfs._job_marginal(str(log), label="trio") == 12.3
    assert rfs._job_marginal(str(log), label="heatmaps") == 30.2
    # A later attempt/run that died before printing its marginals must NOT
    # inherit an earlier one's value: the log file persists across runs
    # (run_stage opens it in append mode), so stage attribution would
    # otherwise subtract a stale trio marginal from a fast-failing rerun.
    log.write_text(log.read_text() + "===== attempt 3 =====\n")
    assert rfs._job_marginal(str(log), label="trio") == 0.0
    assert rfs._job_marginal(str(log), label="heatmaps") == 0.0
    # Label-matching must survive index shifts from the CLI's live-job
    # filtering (a job with no trained students is dropped and renumbered).
    log2 = tmp_path / "filtered.log"
    log2.write_text("[jobs] job 0 (trio): marginal 7.5s\n")
    assert rfs._job_marginal(str(log2), label="trio") == 7.5
    # absent job / missing file -> 0.0 (combined wall stays on cfg_sweep)
    assert rfs._job_marginal(str(log), label="nope") == 0.0
    assert rfs._job_marginal(str(tmp_path / "nope.log"), label="trio") == 0.0


def test_embed_students_phases(tmp_path):
    """The students stage record embeds the phase split (train vs init vs
    compile vs checkpoint walls) from students_phase_times.json, with a
    stale-file guard."""
    mod = importlib.import_module("run_full_sweep")
    phases = {
        "students/init_unet": {"count": 13, "total_s": 196.5, "mean_s": 15.1},
        "students/compile_trace": {"count": 1, "total_s": 70.0, "mean_s": 70.0},
        "students/compile_wait": {"count": 13, "total_s": 40.0, "mean_s": 3.1},
        "distill_epoch_sf0.1": {"count": 5, "total_s": 2.0, "mean_s": 0.4},
        "distill_epoch_group[0.01, 0.05]": {"count": 5, "total_s": 3.0,
                                            "mean_s": 0.6},
        "unrelated_phase": {"count": 1, "total_s": 9.9, "mean_s": 9.9},
    }
    p = tmp_path / "students_phase_times.json"
    p.write_text(json.dumps(phases))

    rec = {"ok": True, "seconds": 100.0}
    mod._embed_students_phases(str(tmp_path), rec)
    assert rec["phases"]["train_epochs_s"] == 5.0
    assert rec["phases"]["init_unet_s"] == 196.5
    assert rec["phases"]["compile_trace_s"] == 70.0
    assert rec["phases"]["compile_wait_s"] == 40.0
    assert "unrelated_phase_s" not in rec["phases"]

    # Stale dump (older than the stage window) is NOT embedded.
    old = time.time() - 10_000
    os.utime(p, (old, old))
    rec2 = {"ok": True, "seconds": 100.0}
    mod._embed_students_phases(str(tmp_path), rec2)
    assert "phases" not in rec2


def test_run_stage_passes_env_extra(tmp_path, monkeypatch):
    """Chained stages run with DTT_SKIP_PREFLIGHT=1 (the runner's probe /
    the previous stage's on-chip success vouches for the tunnel) without
    polluting the runner's own environment."""
    rfs = importlib.import_module("run_full_sweep")
    monkeypatch.setattr(rfs, "project_root", str(tmp_path))
    seen = {}

    class _Proc:
        returncode = 0

    def fake_run(cmd, **kw):
        seen["env"] = kw.get("env")
        return _Proc()

    monkeypatch.setattr(rfs.subprocess, "run", fake_run)
    out = rfs.run_stage(
        "fid", ["python", "x.py"], str(tmp_path),
        env_extra={"DTT_SKIP_PREFLIGHT": "1"},
    )
    assert out["ok"] is True
    assert seen["env"]["DTT_SKIP_PREFLIGHT"] == "1"
    # The parent process env is inherited alongside the extra var...
    assert "PATH" in seen["env"]
    # ...and stages without env_extra run with the plain inherited env.
    rfs.run_stage("teacher", ["python", "x.py"], str(tmp_path))
    assert seen["env"] is None
    assert os.environ.get("DTT_SKIP_PREFLIGHT") != "1"


def test_preflight_probe_chained_skip(monkeypatch):
    """scripts/_common.preflight_probe honors DTT_SKIP_PREFLIGHT=1 without
    spawning a probe subprocess (each probe pays a full jax+tunnel init)."""
    _common = importlib.import_module("_common")

    def boom(*a, **kw):
        raise AssertionError("probe subprocess launched despite skip")

    monkeypatch.setattr(
        "distillation_trajectories_tpu.utils.tunnel.wait_for_device", boom)
    monkeypatch.setenv("DTT_SKIP_PREFLIGHT", "1")
    out = _common.preflight_probe()
    assert out["status"] == "skipped"
    assert "chained" in out["detail"]

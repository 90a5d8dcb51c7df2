"""record_round.py stage runner + healthy-streak probe logic.

Round 5+ records its artifacts through this pipeline (VERDICT r3 #1: the
round's flagship numbers must land early and unattended), so the wrapper's
failure handling is itself load-bearing: a hung stage must time out rather
than wedge the pipeline, and a flapping tunnel must not launch a run on its
first lucky probe.
"""

import importlib.util
import os
import sys

import pytest

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "record_round.py",
)


@pytest.fixture()
def rr():
    sys.path.insert(0, os.path.dirname(_SCRIPT))
    spec = importlib.util.spec_from_file_location("record_round", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stage_success_and_failure(rr, tmp_path, monkeypatch):
    monkeypatch.setattr(rr, "project_root", str(tmp_path))
    assert rr._stage("ok", [sys.executable, "-c", "print('hi')"],
                     "t", timeout=30) is True
    assert rr._stage("bad", [sys.executable, "-c", "raise SystemExit(2)"],
                     "t", timeout=30) is False
    # Stage logs land under output/results and survive both attempts.
    log = tmp_path / "output" / "results" / "record_t_ok.log"
    assert log.read_text().strip() == "hi"


def test_stage_timeout_returns_false(rr, tmp_path, monkeypatch):
    monkeypatch.setattr(rr, "project_root", str(tmp_path))
    assert rr._stage(
        "hang", [sys.executable, "-c", "import time; time.sleep(60)"],
        "t", timeout=1.0,
    ) is False


def test_stage_timeout_kills_grandchildren(rr, tmp_path, monkeypatch):
    """A timed-out stage must take its WHOLE process group down: the stages
    are stage-runners themselves (run_full_sweep spawns train_students
    etc.), and an orphaned grandchild would keep holding the single-tenant
    chip while the next stage launches into it."""
    import time

    monkeypatch.setattr(rr, "project_root", str(tmp_path))
    child_src = (
        "import subprocess, sys, time\n"
        "p = subprocess.Popen([sys.executable, '-c',"
        " 'import time; time.sleep(120)'])\n"
        "print(p.pid, flush=True)\n"
        "time.sleep(120)\n"
    )
    # Timeout must outlive the child interpreter's startup (seconds on a
    # loaded 1-core host): the grandchild pid has to hit the log BEFORE the
    # stage timeout kills the group, or there is nothing to assert against.
    assert rr._stage("orphan", [sys.executable, "-c", child_src],
                     "t", timeout=25.0) is False
    log = tmp_path / "output" / "results" / "record_t_orphan.log"
    pid_lines = log.read_text().strip().splitlines()
    assert pid_lines, "child never started within the stage timeout"
    grandchild_pid = int(pid_lines[0])
    def _alive(pid):
        # A SIGKILLed grandchild may linger as a zombie until init reaps
        # it; os.kill(pid, 0) still succeeds then — check the state field.
        try:
            with open(f"/proc/{pid}/stat") as f:
                return f.read().rsplit(")", 1)[1].split()[0] != "Z"
        except OSError:
            return False

    for _ in range(50):
        if not _alive(grandchild_pid):
            break
        time.sleep(0.1)
    else:
        os.kill(grandchild_pid, 9)
        pytest.fail("grandchild survived the stage-timeout group kill")


def test_wait_healthy_requires_streak(rr, monkeypatch):
    """One ok probe inside a flapping window must NOT launch; two
    consecutive oks must."""
    seq = iter([
        {"status": "down", "detail": "x"},
        {"status": "ok", "detail": ""},
        {"status": "degraded", "detail": "slow"},
        {"status": "ok", "detail": ""},
        {"status": "ok", "detail": ""},
    ])
    calls = []

    def fake_probe():
        r = next(seq)
        calls.append(r["status"])
        return r

    monkeypatch.setattr(rr, "probe_device", fake_probe)
    monkeypatch.setattr(rr.time, "sleep", lambda s: None)
    rr._wait_healthy(require_streak=2)
    assert calls == ["down", "ok", "degraded", "ok", "ok"]


def test_commit_artifacts_in_temp_repo(rr, tmp_path, monkeypatch):
    """The end-of-pipeline commit makes measured artifacts durable even when
    the stages finish after the interactive session ends."""
    import subprocess

    repo = tmp_path / "repo"
    repo.mkdir()
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    subprocess.run(["git", "config", "user.email", "t@t"], cwd=repo,
                   check=True)
    subprocess.run(["git", "config", "user.name", "t"], cwd=repo, check=True)
    monkeypatch.setattr(rr, "project_root", str(repo))

    # Nothing present -> no commit, no crash.
    rr._commit_artifacts("tX", {"bench": True})

    (repo / "SWEEP_tX.json").write_text('{"ok": true}')
    (repo / ".bench_ledger.jsonl").write_text('{"value": 1}\n')
    rr._commit_artifacts("tX", {"bench": True, "sweep": False})
    log = subprocess.run(["git", "log", "--oneline", "--name-only"],
                         cwd=repo, capture_output=True, text=True).stdout
    assert "Record tX measured artifacts (bench)" in log
    assert "SWEEP_tX.json" in log and ".bench_ledger.jsonl" in log

    # Unchanged artifacts -> second call is a no-op (still exactly 1 commit).
    rr._commit_artifacts("tX", {"bench": True})
    n = subprocess.run(["git", "rev-list", "--count", "HEAD"], cwd=repo,
                       capture_output=True, text=True).stdout.strip()
    assert n == "1"


def test_commit_artifacts_ignores_unrelated_staged(rr, tmp_path, monkeypatch):
    """The artifact commit is pathspec-limited: unrelated staged work in the
    tree when the pipeline fires hours later must NOT be swept into the
    'Record ... measured artifacts' commit."""
    import subprocess

    repo = tmp_path / "repo"
    repo.mkdir()
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    subprocess.run(["git", "config", "user.email", "t@t"], cwd=repo,
                   check=True)
    subprocess.run(["git", "config", "user.name", "t"], cwd=repo, check=True)
    monkeypatch.setattr(rr, "project_root", str(repo))

    (repo / "unrelated.py").write_text("wip = True\n")
    subprocess.run(["git", "add", "unrelated.py"], cwd=repo, check=True)

    # Unrelated staged content alone must not trigger a commit.
    rr._commit_artifacts("tY", {"bench": True})
    n = subprocess.run(["git", "rev-list", "--count", "HEAD"], cwd=repo,
                       capture_output=True, text=True).stdout.strip()
    assert n in ("", "0"), "committed with no artifact present"

    (repo / "SWEEP_tY.json").write_text('{"ok": true}')
    rr._commit_artifacts("tY", {"bench": True})
    log = subprocess.run(["git", "log", "--name-only", "-1"], cwd=repo,
                         capture_output=True, text=True).stdout
    assert "SWEEP_tY.json" in log
    assert "unrelated.py" not in log, "pathspec leak: unrelated file committed"
    # The unrelated file is still staged, untouched.
    staged = subprocess.run(["git", "diff", "--cached", "--name-only"],
                            cwd=repo, capture_output=True, text=True).stdout
    assert "unrelated.py" in staged


def test_gate_red_refuses_to_record(rr, monkeypatch):
    """A red CPU gate (pytest or driver contract) must abort the pipeline
    before any tunnel wait / measured stage / artifact commit."""
    calls = []
    monkeypatch.setattr(rr, "_stage",
                        lambda name, *a, **k: calls.append(name) or False)
    monkeypatch.setattr(rr, "_wait_healthy",
                        lambda *a, **k: pytest.fail("waited on tunnel"))
    monkeypatch.setattr(
        rr, "_commit_artifacts",
        lambda *a, **k: pytest.fail("committed with red gate"))
    monkeypatch.setattr(sys, "argv", ["record_round.py", "--tag", "tZ"])
    with pytest.raises(SystemExit) as e:
        rr.main()
    assert e.value.code == 2
    assert calls and calls[0] == "gate_pytest"


def test_gate_green_proceeds_to_stages(rr, monkeypatch):
    monkeypatch.setattr(rr, "_gate", lambda tag: {"pytest": True,
                                                  "driver_contract": True})
    monkeypatch.setattr(rr, "_wait_healthy", lambda *a, **k: None)
    ran = []
    monkeypatch.setattr(rr, "_stage",
                        lambda name, *a, **k: ran.append(name) or True)
    committed = []
    monkeypatch.setattr(rr, "_commit_artifacts",
                        lambda *a, **k: committed.append(a))
    monkeypatch.setattr(sys, "argv", [
        "record_round.py", "--tag", "tZ", "--with_quant", "--with_fast"])
    with pytest.raises(SystemExit) as e:
        rr.main()
    assert e.value.code == 0
    assert ran == ["bench", "sweep", "progressive", "quant", "fast"]
    assert committed


def test_bench_retry_after_flapping_window(rr, monkeypatch):
    """A failed bench stage (its internal retries burned inside a flapping
    recovery window) gets ONE retry at the end of the pipeline — hours of
    _wait_healthy later — and the retry's success flips the exit code."""
    monkeypatch.setattr(rr, "_gate", lambda tag: {"pytest": True,
                                                  "driver_contract": True})
    monkeypatch.setattr(rr, "_wait_healthy", lambda *a, **k: None)
    ran = []

    def fake_stage(name, *a, **k):
        ran.append(name)
        return name != "bench"  # bench fails; everything else (incl. retry) ok

    monkeypatch.setattr(rr, "_stage", fake_stage)
    monkeypatch.setattr(rr, "_commit_artifacts", lambda *a, **k: None)
    monkeypatch.setattr(sys, "argv", ["record_round.py", "--tag", "tZ"])
    with pytest.raises(SystemExit) as e:
        rr.main()
    assert ran == ["bench", "sweep", "progressive", "bench_retry"]
    # bench stays recorded as failed; the retry is its own entry, so the
    # exit code is 1 only when BOTH failed.
    assert e.value.code == 1

    # No retry when bench succeeded.
    ran.clear()
    monkeypatch.setattr(rr, "_stage",
                        lambda name, *a, **k: ran.append(name) or True)
    with pytest.raises(SystemExit) as e:
        rr.main()
    assert ran == ["bench", "sweep", "progressive"]
    assert e.value.code == 0

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

"""Tunnel-health probe: classification and wait-loop behavior.

The probe is the preflight for every measured run (bench.py,
scripts/run_full_sweep.py); these tests pin its three verdicts without
ever touching a real tunnel — the one real child process is forced onto
the CPU backend via DTT_PROBE_PLATFORM.
"""

import time

import pytest

from distillation_trajectories_tpu.utils import tunnel


def test_probe_ok_on_cpu(monkeypatch):
    """A healthy backend (CPU child) probes as ok with a measured RTT."""
    monkeypatch.setenv("DTT_PROBE_PLATFORM", "cpu")
    # Don't let the subprocess inherit the 8-virtual-device XLA flag cost.
    result = tunnel.probe_device(timeout=120.0)
    assert result["status"] == "ok", result
    assert result["platform"] == "cpu"
    assert result["rtt_s"] is not None and result["rtt_s"] < tunnel.DEGRADED_RTT_S
    assert result["init_s"] is not None


def test_probe_down_on_hang(monkeypatch):
    """A child that never returns (hung tunnel RPC) classifies as down."""
    monkeypatch.setattr(tunnel, "_CHILD_SRC", "import time; time.sleep(30)")
    t0 = time.monotonic()
    result = tunnel.probe_device(timeout=1.5)
    assert result["status"] == "down"
    assert "timed out" in result["detail"]
    assert time.monotonic() - t0 < 10


def test_probe_down_on_crash(monkeypatch):
    """A crashing child (backend init failure) classifies as down and
    carries the stderr tail for diagnosis."""
    monkeypatch.setattr(
        tunnel, "_CHILD_SRC",
        "import sys; print('boom: no backend', file=sys.stderr); sys.exit(3)",
    )
    result = tunnel.probe_device(timeout=30.0)
    assert result["status"] == "down"
    assert "boom: no backend" in result["detail"]


def test_probe_degraded_threshold(monkeypatch):
    """RTT above DTT_PROBE_DEGRADED_RTT classifies as degraded."""
    monkeypatch.setattr(
        tunnel, "_CHILD_SRC",
        'import json; print(json.dumps({"rtt_s": 2.8, "init_s": 1.0, '
        '"platform": "tpu"}))',
    )
    result = tunnel.probe_device(timeout=30.0)
    assert result["status"] == "degraded"
    assert result["rtt_s"] == pytest.approx(2.8)
    assert "degraded threshold" in result["detail"]


def test_wait_for_device_polls_until_ok(monkeypatch):
    """wait_for_device retries through down/degraded and returns the first
    ok probe; the sleep interval is honored between attempts."""
    verdicts = iter([
        {"status": "down", "rtt_s": None, "init_s": None, "platform": None,
         "detail": "probe timed out"},
        {"status": "degraded", "rtt_s": 2.8, "init_s": 9.0, "platform": "tpu",
         "detail": "slow"},
        {"status": "ok", "rtt_s": 0.03, "init_s": 9.0, "platform": "tpu",
         "detail": "fine"},
    ])
    sleeps = []
    monkeypatch.setattr(tunnel, "probe_device",
                        lambda timeout=90.0: next(verdicts))
    monkeypatch.setattr(tunnel.time, "sleep", sleeps.append)
    logs = []
    result = tunnel.wait_for_device(max_wait=600.0, interval=7.0,
                                    log=logs.append)
    assert result["status"] == "ok"
    assert sleeps == [7.0, 7.0]
    assert len(logs) == 2 and "down" in logs[0] and "degraded" in logs[1]


def test_wait_for_device_budget_exhausted(monkeypatch):
    """A never-recovering device returns the last (bad) probe once the
    wall-clock budget is spent instead of looping forever."""
    bad = {"status": "down", "rtt_s": None, "init_s": None, "platform": None,
           "detail": "probe timed out"}
    monkeypatch.setattr(tunnel, "probe_device", lambda timeout=90.0: dict(bad))

    clock = {"t": 0.0}
    monkeypatch.setattr(tunnel.time, "monotonic", lambda: clock["t"])

    def fake_sleep(s):
        clock["t"] += s

    monkeypatch.setattr(tunnel.time, "sleep", fake_sleep)
    result = tunnel.wait_for_device(max_wait=100.0, interval=40.0,
                                    log=lambda m: None)
    assert result["status"] == "down"
    assert clock["t"] >= 100.0 - 40.0  # stopped at/after the budget

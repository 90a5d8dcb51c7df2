"""bench.py measurement-ledger + stale-record exit (VERDICT r3 #4).

The round-3 bench artifact was an opaque rc=124 timeout tail; bench.py now
persists every successful measurement to .bench_ledger.jsonl and, when no
fresh measurement is possible, emits the last-known-good record clearly
marked stale (never a fabricated fresh-looking number) and exits nonzero.
These tests pin that contract without touching any device.
"""

import importlib.util
import json
import os
import time

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "LEDGER", str(tmp_path / "ledger.jsonl"))
    return mod


def test_ledger_roundtrip(bench):
    assert bench._ledger_last() is None
    bench._ledger_append({"ts": 1.0, "value": 900.0})
    bench._ledger_append({"ts": 2.0, "value": 905.5, "vs_baseline": 2100.0})
    last = bench._ledger_last()
    assert last["value"] == 905.5
    assert last["vs_baseline"] == 2100.0


def test_ledger_corrupt_tail_returns_none(bench):
    with open(bench.LEDGER, "w") as f:
        f.write('{"ts": 1.0, "value": 1.0}\nnot json\n')
    assert bench._ledger_last() is None


def test_stale_exit_with_history(bench, capsys):
    ts = time.time() - 3600.0
    bench._ledger_append({
        "ts": ts, "ts_iso": "2026-08-18T00:00:00+0000",
        "value": 904.89, "vs_baseline": 2100.0,
        "preflight": {"status": "ok", "rtt_s": 0.03},
    })
    with pytest.raises(SystemExit) as exc:
        bench._emit_stale_and_exit("tunnel down after probe budget")
    assert exc.value.code == 3
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["stale"] is True
    assert rec["value"] == 904.89
    assert rec["vs_baseline"] == 2100.0
    # Age must expose how old the number is (the anti-fabrication field).
    assert rec["stale_age_s"] == pytest.approx(3600.0, abs=60.0)
    assert "tunnel down" in rec["error"]


def test_ledger_skips_degraded_records(bench):
    # bench proceeds on a degraded probe by design (the number is recorded
    # with its provenance), but degraded-tunnel values run up to ~90x
    # inflated — the stale-replay path must reach past them to the most
    # recent HEALTHY measurement, never serve one as last-known-good.
    bench._ledger_append({
        "ts": 1.0, "value": 904.89,
        "preflight": {"status": "ok", "rtt_s": 0.03},
    })
    bench._ledger_append({
        "ts": 2.0, "value": 9.7,
        "preflight": {"status": "degraded", "rtt_s": 2.8},
    })
    assert bench._ledger_last()["value"] == 904.89
    # "up" is the pre-ledger r2 seed's status; missing preflight = legacy ok.
    bench._ledger_append({"ts": 3.0, "value": 906.1,
                          "preflight": {"status": "up"}})
    assert bench._ledger_last()["value"] == 906.1
    bench._ledger_append({"ts": 4.0, "value": 907.2})
    assert bench._ledger_last()["value"] == 907.2


def test_stale_exit_all_degraded_is_no_history(bench, capsys):
    bench._ledger_append({
        "ts": 1.0, "value": 9.7,
        "preflight": {"status": "degraded", "rtt_s": 2.8},
    })
    with pytest.raises(SystemExit) as exc:
        bench._emit_stale_and_exit("tunnel down; only degraded history")
    assert exc.value.code == 3
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stale"] is True and rec["value"] is None


def test_stale_exit_without_history(bench, capsys):
    with pytest.raises(SystemExit) as exc:
        bench._emit_stale_and_exit("no tunnel, no history")
    assert exc.value.code == 3
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stale"] is True and rec["value"] is None

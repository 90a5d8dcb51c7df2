"""Tunnel/device health probe for measured runs.

The axon TPU tunnel has two observed failure modes beyond plain errors
(see CLAUDE.md / PERFORMANCE.md "Measurement integrity"):

* fully DOWN — ``jax`` init or the first tiny jit dispatch hangs forever
  (a dropped RPC never returns to the client);
* DEGRADED — a recovery phase where every dispatch pays ~2.8 s RTT
  (~90x the normal ~30 ms), which silently turns 2-5 s epochs into
  170-250 s and makes every measured number garbage.

``probe_device`` runs a tiny jit in a *timeboxed subprocess* (the parent
never touches the backend, so a hang cannot take the caller down) and
classifies the result.  ``wait_for_device`` polls until healthy or a
wall-clock budget is spent.  Both are wired into ``bench.py`` and
``scripts/run_full_sweep.py`` so measured runs refuse to start blind.

No reference counterpart (the reference is a local single-device torch
codebase); this is infrastructure the tunneled-TPU environment requires.
"""

import json
import os
import subprocess
import sys
import time

# Per-dispatch RTT above this is the known degraded-recovery mode.  The
# healthy tunnel measures ~0.03 s; degraded ~2.8 s — the gap is ~100x, so
# the exact threshold is uncritical.
DEGRADED_RTT_S = float(os.environ.get("DTT_PROBE_DEGRADED_RTT", "0.5"))

# Shared wall-clock budget for "wait out an outage before a measured run /
# stage retry" callers (bench.py, run_full_sweep.py).  Outages of 1h+ have
# been observed; 30 min balances riding out the common case against not
# stalling a whole round.
PROBE_MAX_WAIT_S = float(os.environ.get("DTT_PROBE_MAX_WAIT", "1800"))

# The probe child: compile a trivial jit, then time 3 dispatches with
# varying inputs (identical args would be served from the backend's
# execution cache) and a host read as the barrier.
_CHILD_SRC = r"""
import json, os, sys, time
import jax, jax.numpy as jnp
plat = os.environ.get("DTT_PROBE_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
t_init0 = time.perf_counter()
f = jax.jit(lambda x: (x * 2.0 + 1.0).sum())
float(f(jnp.arange(8.0)))  # backend init + compile + first dispatch
init_s = time.perf_counter() - t_init0
t0 = time.perf_counter()
n = 3
for i in range(1, n + 1):
    float(f(jnp.arange(8.0) + i))
rtt = (time.perf_counter() - t0) / n
print(json.dumps({
    "rtt_s": rtt,
    "init_s": init_s,
    "platform": jax.devices()[0].platform,
}))
"""


def probe_device(timeout: float = 90.0) -> dict:
    """Timeboxed health check of the default JAX device.

    Returns ``{"status": "ok"|"degraded"|"down", "rtt_s": float|None,
    "init_s": float|None, "platform": str|None, "detail": str}``.

    ``down`` means the child timed out (a hung tunnel RPC) or crashed;
    ``degraded`` means dispatches complete but each pays more than
    ``DTT_PROBE_DEGRADED_RTT`` seconds (default 0.5 s vs the healthy
    ~0.03 s) — numbers measured in that state are not comparable.
    """
    env = dict(os.environ)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD_SRC],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            timeout=timeout,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return {
            "status": "down",
            "rtt_s": None,
            "init_s": None,
            "platform": None,
            "detail": f"probe timed out after {timeout:.0f}s (hung tunnel RPC)",
        }
    if proc.returncode != 0:
        tail = proc.stderr.decode(errors="replace").strip().splitlines()[-3:]
        return {
            "status": "down",
            "rtt_s": None,
            "init_s": None,
            "platform": None,
            "detail": "probe child failed: " + " | ".join(tail),
        }
    line = next(
        (ln for ln in reversed(proc.stdout.decode().splitlines())
         if ln.strip().startswith("{")),
        None,
    )
    if line is None:
        return {
            "status": "down",
            "rtt_s": None,
            "init_s": None,
            "platform": None,
            "detail": "probe child produced no result line",
        }
    out = json.loads(line)
    rtt = out["rtt_s"]
    status = "ok" if rtt <= DEGRADED_RTT_S else "degraded"
    return {
        "status": status,
        "rtt_s": round(rtt, 4),
        "init_s": round(out["init_s"], 2),
        "platform": out.get("platform"),
        "detail": f"per-dispatch RTT {rtt * 1e3:.0f} ms"
        + ("" if status == "ok" else
           f" (> {DEGRADED_RTT_S * 1e3:.0f} ms degraded threshold)"),
    }


def wait_for_device(
    max_wait: float = 600.0,
    interval: float = 60.0,
    probe_timeout: float = 90.0,
    log=print,
) -> dict:
    """Poll ``probe_device`` until the device is healthy or the budget runs
    out.  Returns the LAST probe result either way (caller decides whether
    a still-degraded/down device aborts the run)."""
    deadline = time.monotonic() + max_wait
    while True:
        result = probe_device(timeout=probe_timeout)
        if result["status"] == "ok" or time.monotonic() >= deadline:
            return result
        remaining = deadline - time.monotonic()
        log(
            f"[probe] device {result['status']}: {result['detail']}; "
            f"retrying in {min(interval, remaining):.0f}s "
            f"({remaining:.0f}s of wait budget left)"
        )
        time.sleep(min(interval, max(remaining, 0.0)))

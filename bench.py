"""Benchmark: trajectories/sec/chip for 50-step CFG sampling (BASELINE.json).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.json config): teacher-size (size_factor=1.0) U-Net,
CIFAR-10 32×32×3 shapes, T=50 reverse steps with fused CFG (guidance 3.0),
the trajectory-engine formulation compiled as one lax.scan — trajectories
stay on device end to end.

``vs_baseline`` measures the reference PyTorch U-Net's CPU per-step forward
cost (imported from the read-only reference mount at runtime; nothing is
copied) and extrapolates reference trajectories/sec for the same T.  If the
reference import fails, a cached measurement from ``.bench_baseline.json``
is used.
"""

import json
import os
import sys
import time

import numpy as np

T_STEPS = 50
BATCH = 256  # noise samples per trajectory batch (throughput-optimal on v5e)
GUIDANCE = 3.0
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")
# Every successful measurement is appended here (value + timestamp + tunnel
# provenance) so a dead-tunnel round can still report the last-known-good
# number WITH its age instead of an opaque rc=124 tail (VERDICT r3 #4).
LEDGER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_ledger.jsonl")


def _ledger_append(record: dict) -> None:
    try:
        with open(LEDGER, "a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError as e:
        print(f"# ledger append failed: {e}", file=sys.stderr)


def _ledger_last() -> dict:
    """Most recent HEALTHY measurement, or None.

    bench.py deliberately proceeds on a degraded probe (a number with a
    recorded degraded preflight beats no number), and that record lands in
    the ledger too — but degraded-tunnel values run up to ~90x inflated,
    so the stale-replay path must never serve one as "last-known-good".
    Skips entries whose preflight status is not ok/up ("up" is the
    pre-ledger r2 seed's status).
    """
    try:
        with open(LEDGER) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        for ln in reversed(lines):
            rec = json.loads(ln)
            status = (rec.get("preflight") or {}).get("status")
            if status in ("ok", "up", None):
                return rec
        return None
    except (OSError, json.JSONDecodeError):
        return None


def _emit_stale_and_exit(reason: str) -> None:
    """Print the last-known-good measurement (clearly marked stale, with its
    age) and exit nonzero.  Never fabricates a fresh-looking number: the
    JSON carries ``stale: true`` + age, and the process fails."""
    last = _ledger_last()
    if last is None:
        print(f"# no measurement possible and no ledger history: {reason}",
              file=sys.stderr)
        print(json.dumps({"metric": METRIC_NAME, "value": None,
                          "unit": "trajectories/s", "vs_baseline": None,
                          "stale": True, "error": reason}))
        sys.exit(3)
    age_s = round(time.time() - last.get("ts", 0.0), 1)
    print(f"# STALE: emitting last-known-good measurement from "
          f"{last.get('ts_iso', '?')} ({age_s}s ago); reason: {reason}",
          file=sys.stderr)
    print(json.dumps({
        "metric": METRIC_NAME,
        "value": last.get("value"),
        "unit": "trajectories/s",
        "vs_baseline": last.get("vs_baseline"),
        "stale": True,
        "stale_age_s": age_s,
        "stale_recorded_at": last.get("ts_iso"),
        "error": reason,
        "preflight": last.get("preflight"),
    }))
    sys.exit(3)


METRIC_NAME = ("trajectories/sec/chip (50-step CFG sampling, "
               "32x32 teacher U-Net)")


def bench_tpu() -> float:
    """Our framework's trajectories/sec on the default device."""
    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.diffusion import (
        get_diffusion_params,
        generate_trajectory_scan,
    )
    from distillation_trajectories_tpu.models import make_unet, init_unet
    from distillation_trajectories_tpu.training import make_eval_model_fn

    config = Config(base_dir="/tmp/bench", timesteps=T_STEPS, sample_steps=T_STEPS)
    model = make_unet(config, size_factor=1.0)
    variables = init_unet(model, config, jax.random.PRNGKey(0))
    model_fn = make_eval_model_fn(model, variables)
    dp = get_diffusion_params(T_STEPS, config)

    @jax.jit
    def run(noise, seed):
        return generate_trajectory_scan(
            model_fn, noise, T_STEPS, dp["alphas"], seed, guidance_scale=GUIDANCE
        )

    noise = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, config.image_size, config.image_size, 3)
    )
    # warmup/compile; per-iter seeds keep the axon backend from serving a
    # cached execution, and the final host read is a hard barrier
    # (block_until_ready alone can return early through the tunnel).
    np.asarray(run(noise, 0)[-1, 0, 0, 0, :])
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(noise, i + 1)
    np.asarray(out[-1, 0, 0, 0, :])
    dt = time.perf_counter() - t0
    return BATCH * iters / dt


def bench_reference_cpu() -> float:
    """Reference torch U-Net on CPU: extrapolated trajectories/sec.

    Times the fused-CFG forward (batch 2, trajectory_engine.py:68-80) and
    scales by T; the host-side update math is negligible in comparison.

    Best-of-k timing: the per-forward time is the MIN over several small
    batches, not one mean — on this 1-core host a contended measurement
    only ever makes the reference look slower (committed values swung
    0.34→0.50 traj/s run-to-run), and the least-interference estimate is
    the honest (and for our ``vs_baseline`` ratio, conservative) one.
    """
    try:
        import torch

        sys.path.insert(0, "/root/reference")
        from models import DiffusionUNet as RefUNet  # reference, not copied

        class _Cfg:
            channels = 3
            dropout = 0.3

        torch.set_num_threads(os.cpu_count() or 8)
        model = RefUNet(_Cfg(), size_factor=1.0).eval()
        x = torch.randn(2, 3, 32, 32)
        t = torch.tensor([25, 25])
        c = torch.cat([torch.zeros(1, 1), torch.ones(1, 1)])
        with torch.no_grad():
            for _ in range(2):  # warmup
                model(x, t, c)
            n, k = 3, 5
            step_time = float("inf")
            for _ in range(k):
                t0 = time.perf_counter()
                for _ in range(n):
                    model(x, t, c)
                step_time = min(step_time, (time.perf_counter() - t0) / n)
        traj_per_sec = 1.0 / (T_STEPS * step_time)
        with open(CACHE, "w") as f:
            json.dump({"ref_traj_per_sec_cpu": traj_per_sec,
                       "method": f"best-of-{k} batches of {n} forwards",
                       "ts_iso": time.strftime("%Y-%m-%dT%H:%M:%S+0000",
                                               time.gmtime())}, f)
        return traj_per_sec
    except Exception as e:
        print(f"# reference baseline measurement failed: {e}", file=sys.stderr)
        if os.path.exists(CACHE):
            with open(CACHE) as f:
                return json.load(f)["ref_traj_per_sec_cpu"]
        return float("nan")


def bench_metric_suite() -> float:
    """Auxiliary: paired-trajectory metric-suite throughput (pairs/s) for the
    full 15-metric on-device suite at T=50, 32×32×3 (stderr only)."""
    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu.metrics.trajectory_metrics import (
        _metrics_core,
    )

    # Measurement notes (round 2): the axon TPU backend caches executions
    # with identical (executable, args), and block_until_ready can return
    # before the remote computation finishes — both inflate naive loops by
    # orders of magnitude.  So: fresh PRNG keys per call (defeats the cache)
    # and a host read of a small output per call (a hard barrier).
    s, n = 256, T_STEPS + 1
    key = jax.random.PRNGKey(0)
    t_trajs = jax.random.normal(key, (s, n, 32, 32, 3))
    s_trajs = t_trajs + 0.1

    @jax.jit
    def run(a, b, k):
        out = jax.vmap(lambda x, y, kk: _metrics_core(x, y, kk))(a, b, k)
        # One small output that depends on EVERY metric, so XLA cannot
        # dead-code-eliminate any of the suite.
        return jnp.stack([jnp.sum(v.astype(jnp.float32)) for v in out.values()])

    np.asarray(run(t_trajs, s_trajs, jax.random.split(key, s)))  # compile
    best = float("inf")
    for trial in range(3):
        keys = jax.random.split(jax.random.PRNGKey(trial + 1), s)
        t0 = time.perf_counter()
        np.asarray(run(t_trajs, s_trajs, keys))
        best = min(best, time.perf_counter() - t0)
    return s / best


def device_bench_child():
    """Child-process mode: all device (TPU) measurements.

    Prints one JSON line ``{"ours": ..., "pairs_per_s": ...}`` to stdout.
    Isolated in a child because the tunneled backend can drop an RPC and
    hang the calling thread forever — the parent enforces a wall-clock
    timeout and retries with a fresh process/backend connection.
    """
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        ours = bench_tpu()
        try:
            pairs_per_s = bench_metric_suite()
        except Exception as e:
            print(f"# metric-suite bench failed: {e}", file=sys.stderr)
            pairs_per_s = None
    print(json.dumps({"ours": ours, "pairs_per_s": pairs_per_s}))


def run_device_bench(attempts=3, timeouts=(420, 900)):
    """Run the device bench in a child process with timeout + retry.

    Both failure modes of the axon tunnel are covered: transient errors
    (child exits non-zero -> retry) and dropped RPCs that never return
    (child killed at the attempt's timeout -> retry with a fresh
    connection).  The FIRST attempt's deadline is sized to the known
    compile envelope (~5-6 min for the full sampler graph) so a hung
    attempt costs ~7 min instead of 15 (BENCH_r02 burned the full 900s on
    an attempt-1 hang); later attempts keep the generous deadline in case
    the compile server is genuinely slow rather than hung.
    """
    import subprocess

    for attempt in range(attempts):
        timeout = timeouts[min(attempt, len(timeouts) - 1)]
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--device-bench"],
                stdout=subprocess.PIPE,
                timeout=timeout,
            )
            if proc.returncode == 0:
                for line in reversed(proc.stdout.decode().splitlines()):
                    line = line.strip()
                    if line.startswith("{"):
                        return json.loads(line)
            print(f"# device bench attempt {attempt + 1}: rc={proc.returncode}",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# device bench attempt {attempt + 1}: timed out after "
                  f"{timeout}s (tunnel hang); retrying with a fresh process",
                  file=sys.stderr)
        time.sleep(10)
    raise RuntimeError(f"device bench failed after {attempts} attempts")


def main():
    # Preflight: never benchmark into a dead or degraded tunnel (the known
    # ~2.8 s/dispatch recovery mode inflates every number ~90x).  The probe
    # runs in its own timeboxed subprocess, so a hung tunnel costs 90 s here
    # instead of a full device-bench attempt timeout.
    from distillation_trajectories_tpu.utils.tunnel import wait_for_device

    # Outages of 1h+ observed (round 3): wait out a dead tunnel rather than
    # record 90x-inflated recovery-mode numbers.  DTT_PROBE_MAX_WAIT
    # overrides, but bench.py CAPS its wait at 600s regardless: the round
    # driver killed BENCH_r03 at an outer timeout (~1800s, rc=124) while
    # the probe was still burning its full budget — the stale-record exit
    # below must happen well inside that envelope to leave an artifact.
    from distillation_trajectories_tpu.utils.tunnel import PROBE_MAX_WAIT_S

    probe = wait_for_device(
        max_wait=min(PROBE_MAX_WAIT_S, 600.0),
        interval=60.0,
        log=lambda m: print(m, file=sys.stderr),
    )
    print(f"# preflight probe: {probe['status']} ({probe['detail']})",
          file=sys.stderr)
    preflight = {"status": probe.get("status"),
                 "detail": probe.get("detail"),
                 "rtt_s": probe.get("rtt_s")}
    if probe.get("status") == "down":
        # The full probe budget expired against a dead tunnel; burning
        # another ~37 min of attempt timeouts would reproduce the opaque
        # rc=124 tail of BENCH_r03.  Emit the last-known-good record with
        # its age and fail loudly instead.
        _emit_stale_and_exit(
            f"tunnel down after probe budget ({probe.get('detail')})")
        return
    # 'degraded' proceeds — the attempt loop below has its own timeouts and
    # the tunnel may recover mid-run — but the probe result is embedded in
    # the output JSON so a ~90x-inflated number is explainable.

    try:
        result = run_device_bench()
    except RuntimeError as e:
        _emit_stale_and_exit(str(e))
        return
    ours = result["ours"]
    pairs_per_s = result.get("pairs_per_s")
    if pairs_per_s:
        print(f"# metric-suite: {pairs_per_s:.1f} trajectory-pairs/s "
              f"(15 metrics, T={T_STEPS})", file=sys.stderr)
    import contextlib

    # Keep stdout to the single JSON line (the reference model constructor
    # prints to stdout); route everything else to stderr.
    with contextlib.redirect_stdout(sys.stderr):
        ref = bench_reference_cpu()
    vs = ours / ref if ref and np.isfinite(ref) else None
    record = {
        "metric": METRIC_NAME,
        "value": round(ours, 3),
        "unit": "trajectories/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "preflight": preflight,
    }
    _ledger_append({
        "ts": time.time(),
        "ts_iso": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "value": record["value"],
        "vs_baseline": record["vs_baseline"],
        "pairs_per_s": round(pairs_per_s, 1) if pairs_per_s else None,
        "preflight": preflight,
    })
    print(json.dumps(record))


if __name__ == "__main__":
    if "--device-bench" in sys.argv:
        device_bench_child()
    else:
        main()

"""Capture and summarize an op-level TPU profile of the flagship sampler.

Runs a few 50-step CFG sampling batches under ``jax.profiler.trace`` and
prints the top XLA ops by self time (via tensorboard_plugin_profile's
xplane converter).

NOTE: ``jax.profiler.trace`` HANGS over the axon-tunneled TPU in this
harness (even a trivial trace) — this script is for directly-attached TPUs.
On the tunnel, use the scan-ablation attribution instead:
``python scripts/bench_r2.py --exp ablate`` (PERFORMANCE.md).

Usage:

    python scripts/profile_sampler.py [--logdir /tmp/dtt_profile]
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import project_root  # noqa: E402


def capture(logdir, batch=256):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.diffusion import (
        generate_trajectory_scan,
        get_diffusion_params,
    )
    from distillation_trajectories_tpu.models import make_unet, init_unet
    from distillation_trajectories_tpu.training import make_eval_model_fn

    config = Config(base_dir="/tmp/bench", timesteps=50, sample_steps=50)
    model = make_unet(config, size_factor=1.0)
    variables = init_unet(model, config, jax.random.PRNGKey(0))
    model_fn = make_eval_model_fn(model, variables)
    dp = get_diffusion_params(50, config)

    @jax.jit
    def run(noise, seed):
        return generate_trajectory_scan(
            model_fn, noise, 50, dp["alphas"], seed, guidance_scale=3.0
        )

    noise = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 32, 3))
    np.asarray(run(noise, 0)[-1, 0, 0, 0, :])  # compile + barrier
    with jax.profiler.trace(logdir):
        for i in range(3):
            out = run(noise, i + 1)
        np.asarray(out[-1, 0, 0, 0, :])


def summarize(logdir, top=25):
    """Print top ops by self time from the captured xplane."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xplanes = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        raise SystemExit(f"no xplane.pb under {logdir}")
    xplane = max(xplanes, key=os.path.getmtime)
    params = {"tqx": "out:csv;"}
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "framework_op_stats^", params
    )
    if isinstance(data, bytes):
        data = data.decode()
    lines = [l for l in data.splitlines() if l.strip()]
    print(f"# {xplane}")
    for line in lines[: top + 1]:
        print(line)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", default="/tmp/dtt_profile")
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--skip-capture", action="store_true")
    parser.add_argument("--top", type=int, default=25)
    args = parser.parse_args()
    if not args.skip_capture:
        capture(args.logdir, batch=args.batch)
    summarize(args.logdir, top=args.top)


if __name__ == "__main__":
    main()

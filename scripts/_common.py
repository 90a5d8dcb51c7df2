"""Shared CLI plumbing: repo path setup and checkpoint-discovery helpers."""

import os
import sys

project_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if project_root not in sys.path:
    sys.path.insert(0, project_root)


def load_teacher_from_arg(config, teacher_model_arg=None):
    """Load the teacher by checkpoint filename (reference CLIs take
    ``--teacher_model model_epoch_N.pt``) or latest when unspecified."""
    import re

    from distillation_trajectories_tpu.models import make_unet
    from distillation_trajectories_tpu.training import (
        load_checkpoint,
        variables_from_checkpoint,
    )

    epoch = None
    if teacher_model_arg:
        m = re.search(r"model_epoch_(\d+)", teacher_model_arg)
        if m:
            epoch = int(m.group(1))
    payload = load_checkpoint(config.teacher_models_dir, epoch)
    model = make_unet(config, size_factor=1.0)
    return model, variables_from_checkpoint(payload)


def load_student(config, size_factor, epoch=None):
    """Load the latest (or given-epoch) student for a size factor."""
    from distillation_trajectories_tpu.models import make_unet
    from distillation_trajectories_tpu.training import (
        load_checkpoint,
        variables_from_checkpoint,
    )

    payload = load_checkpoint(config.student_dir(size_factor), epoch)
    model = make_unet(config, size_factor=size_factor)
    return model, variables_from_checkpoint(payload)


def parse_float_list(s):
    return [float(x) for x in s.split(",") if x.strip()]


def add_mesh_flag(parser):
    """--mesh D,M: (data, model) device-mesh axis sizes for SPMD training."""
    parser.add_argument(
        "--mesh", type=str, default=None, metavar="DATA,MODEL",
        help="Device mesh axis sizes, e.g. '8,1' (data-parallel over 8 "
        "chips) or '4,2' (4-way DP x 2-way channel tensor parallelism). "
        "Default: single device.",
    )


def apply_mesh_arg(config, args):
    """Set Config.mesh_shape from a parsed --mesh flag."""
    if getattr(args, "mesh", None):
        parts = [int(x) for x in args.mesh.split(",")]
        if len(parts) == 1:
            parts.append(1)
        if len(parts) != 2 or parts[0] < 1 or parts[1] < 1:
            raise SystemExit(f"--mesh must be 'DATA,MODEL' positive ints, got {args.mesh!r}")
        config.mesh_shape = (parts[0], parts[1])


def preflight_probe(max_wait=900.0, interval=60.0):
    """Tunnel-health preflight for long measured on-chip scripts.

    CLAUDE.md rule: numbers taken on a degraded tunnel are garbage (the
    ~2.8 s/dispatch recovery mode inflates everything ~90x), so any script
    that trains or measures on the chip probes first.  Skipped when the CPU
    backend is forced (env var or an already-configured jax).  Proceeds —
    with the result on record — even when still down/degraded after
    ``max_wait``: callers embed the dict in their output JSON so a bad
    number is self-documenting.
    """
    def _primary(platforms):
        return str(platforms or "").split(",")[0].strip()

    # Chained-stage skip: when the workload runner launches this CLI right
    # after a stage that just SUCCEEDED on the chip (run_full_sweep.py sets
    # DTT_SKIP_PREFLIGHT=1), that success is fresher health evidence than a
    # probe — and each probe costs a full subprocess jax+tunnel init
    # (~50-90 s, measured r05i: the cfg stage's 80.7 s "imports" phase was
    # mostly the serial probe).  Retries are still covered: the runner
    # re-probes before every retry attempt.
    if os.environ.get("DTT_SKIP_PREFLIGHT", "") == "1":
        return {
            "status": "skipped",
            "detail": "chained after a healthy on-chip stage "
                      "(DTT_SKIP_PREFLIGHT=1)",
        }
    # Only the PRIMARY platform decides: the default here is 'axon,cpu'
    # (TPU plugin with cpu fallback), which must still probe.
    if _primary(os.environ.get("JAX_PLATFORMS", "")) == "cpu":
        return {"status": "skipped", "detail": "cpu backend forced via env"}
    if "jax" in sys.modules:
        import jax

        if _primary(getattr(jax.config, "jax_platforms", None)) == "cpu":
            return {"status": "skipped", "detail": "cpu backend configured"}

    from distillation_trajectories_tpu.utils.tunnel import wait_for_device

    probe = wait_for_device(max_wait=max_wait, interval=interval)
    print(f"[preflight] device {probe['status']} ({probe['detail']})")
    return probe

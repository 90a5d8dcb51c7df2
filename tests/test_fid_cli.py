"""analyze_fid CLI artifact contract (fid_summary.json provenance stamp).

The FID stage runs unattended inside the full-workload sweep; this pins the
machine-readable artifact it writes — feature provenance, the
imagenet_fid_comparable flag (VERDICT r3 #8), and the per-size score map —
using a duck-typed featurizer so the CPU suite never pays the Inception
compile.  Reference anchor: ``fid_score.py:19-34`` (the torchvision
extractor whose absence the provenance stamp documents).
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "analysis", "analyze_fid.py",
)


def _load_cli():
    sys.path.insert(0, os.path.dirname(os.path.dirname(_SCRIPT)))
    spec = importlib.util.spec_from_file_location("fid_cli", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _StubInception:
    pretrained = False

    def get_features(self, images):
        x = np.asarray(images, dtype=np.float64)
        return x.reshape(x.shape[0], -1)[:, :32]


@pytest.mark.slow
def test_fid_cli_writes_provenance_artifact(tmp_path, monkeypatch):
    import jax

    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu import metrics as metrics_pkg
    from distillation_trajectories_tpu.models import init_unet, make_unet
    from distillation_trajectories_tpu.training import save_checkpoint

    cfg = Config(
        dataset="MNIST", image_size=16, channels=1, batch_size=8,
        sample_steps=8, timesteps=8, compute_dtype="float32",
        base_dir=str(tmp_path),
    )
    cfg.create_directories()
    teacher = make_unet(cfg, size_factor=1.0)
    tvars = init_unet(teacher, cfg, jax.random.PRNGKey(0))
    save_checkpoint(cfg.teacher_models_dir, 1, tvars["params"],
                    batch_stats=tvars["batch_stats"])
    student = make_unet(cfg, size_factor=0.1)
    svars = init_unet(student, cfg, jax.random.PRNGKey(1))
    save_checkpoint(cfg.student_dir(0.1), 1, svars["params"],
                    batch_stats=svars["batch_stats"])

    monkeypatch.setattr(metrics_pkg, "InceptionModel", _StubInception)
    monkeypatch.setattr(sys, "argv", [
        "analyze_fid.py", "--size_factors", "0.1", "--num_samples", "4",
        "--timesteps", "8", "--dataset", "MNIST", "--num_channels", "1",
        "--image_size", "16", "--base_dir", str(tmp_path),
    ])
    _load_cli().main()

    with open(os.path.join(cfg.fid_dir, "fid_summary.json")) as f:
        rec = json.load(f)
    assert rec["features"] == "seeded-random"
    assert rec["imagenet_fid_comparable"] is False
    assert rec["num_samples"] == 4
    assert set(rec["fid_by_size"]) == {"0.1"}
    assert np.isfinite(rec["fid_by_size"]["0.1"])
    assert os.path.exists(os.path.join(cfg.fid_dir, "fid_vs_size.png"))
    # Provenance line INLINE in the human-read txt (VERDICT r4 #7): a human
    # reading the reference-contract artifact must see the feature lane.
    with open(os.path.join(cfg.fid_dir, "fid_summary.txt")) as f:
        txt = f.read()
    assert txt.startswith("features: seeded-random")
    assert "size_0.1:" in txt

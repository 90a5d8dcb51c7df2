"""Cross-framework output parity: reference torch DiffusionUNet -> Flax port.

The strongest parity evidence in the tree: a randomly-initialized ACTUAL
reference model (imported at runtime from the read-only mount, never copied)
is ported through ``models/torch_port.py`` and both frameworks must produce
the same forward outputs.  Passing proves the whole stack at once — conv
layout transposes, BatchNorm eval semantics, the sinusoidal pad/trim quirk
(odd time_emb_dim at sf=0.1), the matmul align_corners upsample, cond
masking vs the reference's ``cond=None`` branch, and the 16-channel floor.
Reference anchors: ``models.py:6-224``, ``train_teacher.py:86`` (save
format), ``train_students.py:187``.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from distillation_trajectories_tpu import Config  # noqa: E402
from distillation_trajectories_tpu.models import (  # noqa: E402
    init_unet,
    make_unet,
)
from distillation_trajectories_tpu.models.torch_port import (  # noqa: E402
    import_reference_unet_checkpoint,
    infer_size_factor,
    unet_variables_from_torch_state_dict,
)

_REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(_REF, "models.py")),
    reason="reference mount not available",
)


def _ref_unet(size_factor):
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    from models import DiffusionUNet as RefUNet  # reference, runtime import

    class _Cfg:
        channels = 3
        dropout = 0.3

    torch.manual_seed(0)
    return RefUNet(_Cfg(), size_factor=size_factor).eval()


def _config(tmp_path):
    return Config(base_dir=str(tmp_path), image_size=16,
                  compute_dtype="float32")


def _port(ref_model, config, size_factor):
    model = make_unet(config, size_factor=size_factor)
    variables = init_unet(model, config, jax.random.PRNGKey(0))
    ported = unet_variables_from_torch_state_dict(
        ref_model.state_dict(), variables
    )
    return model, ported


def _compare(ref_model, model, variables, with_cond):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([3.0, 41.0], dtype=np.float32)
    cond = np.array([[1.0], [2.5]], dtype=np.float32) if with_cond else None

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            torch.from_numpy(cond) if with_cond else None,
        ).numpy().transpose(0, 2, 3, 1)

    ours = np.asarray(model.apply(
        variables, x, t,
        cond=cond, cond_mask=np.ones((2, 1), np.float32) if with_cond else None,
        train=False,
    ))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("size_factor", [1.0, 0.1])
@pytest.mark.parametrize("with_cond", [True, False])
def test_forward_parity(tmp_path, size_factor, with_cond):
    # sf=0.1 exercises the 16-channel floor AND an odd time_emb_dim (25):
    # the sinusoidal embedding's pad path must match torch bit-for-formula.
    ref_model = _ref_unet(size_factor)
    config = _config(tmp_path)
    model, ported = _port(ref_model, config, size_factor)
    _compare(ref_model, model, ported, with_cond)


def test_infer_size_factor():
    assert infer_size_factor(_ref_unet(1.0).state_dict()) == 1.0
    assert infer_size_factor(_ref_unet(0.1).state_dict()) == 0.1


def test_infer_size_factor_ambiguous_floor_region_raises():
    # Every sf <= 0.06 floors BOTH base channels and time_emb_dim to 16, so
    # the shapes cannot identify the size factor; silently guessing would
    # save the checkpoint under the wrong size_{sf} directory.
    with pytest.raises(ValueError, match="ambiguous"):
        infer_size_factor(_ref_unet(0.05).state_dict())


def test_import_checkpoint_file_roundtrip(tmp_path):
    ref_model = _ref_unet(0.1)
    pt = tmp_path / "model_epoch_3.pt"
    torch.save(ref_model.state_dict(), pt)
    config = _config(tmp_path)
    model, variables = import_reference_unet_checkpoint(str(pt), config)
    assert model.size_factor == 0.1
    _compare(ref_model, model, variables, with_cond=True)


def test_export_cli_roundtrip(tmp_path, monkeypatch):
    """Migration lane OUT: a framework msgpack checkpoint exports through
    the CLI to a .pt the ACTUAL reference model strict-loads, with forward
    parity — so TPU-trained models hand back to the reference's torch
    tooling (its continue_training.py:54 load pattern)."""
    import importlib

    from distillation_trajectories_tpu.training.checkpoints import (
        save_checkpoint,
    )

    config = _config(tmp_path)
    config.create_directories()
    model = make_unet(config, size_factor=0.1)
    variables = init_unet(model, config, jax.random.PRNGKey(5))
    sdir = os.path.join(config.student_models_dir, "size_0.1")
    save_checkpoint(sdir, 2, variables["params"],
                    batch_stats=variables.get("batch_stats"))

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    cli = importlib.import_module("export_reference_checkpoint")
    out = tmp_path / "exported.pt"
    monkeypatch.setattr(sys, "argv", [
        "export_reference_checkpoint.py", str(out),
        "--role", "student", "--size_factor", "0.1",
        "--base_dir", str(tmp_path), "--image_size", "16",
    ])
    cli.main()

    ref_model = _ref_unet(0.1)
    missing_unexpected = ref_model.load_state_dict(
        torch.load(str(out), map_location="cpu", weights_only=True),
        strict=True,
    )
    assert not missing_unexpected.missing_keys
    assert not missing_unexpected.unexpected_keys
    ref_model.eval()
    _compare(ref_model, model, variables, with_cond=True)


def test_export_roundtrip_exact(tmp_path):
    """flax -> torch export inverts the import bit-exactly, and the exported
    dict loads straight into the reference model (strict key check)."""
    from distillation_trajectories_tpu.models.torch_port import (
        unet_torch_state_dict_from_variables,
    )

    ref_model = _ref_unet(0.1)
    config = _config(tmp_path)
    _, ported = _port(ref_model, config, 0.1)
    exported = unet_torch_state_dict_from_variables(ported)
    for k, v in ref_model.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(exported[k], v.numpy(), err_msg=k)
    ref_model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in exported.items()},
        strict=True,
    )


def test_wrong_architecture_raises(tmp_path):
    ref_model = _ref_unet(0.5)
    config = _config(tmp_path)
    with pytest.raises((KeyError, ValueError)):
        _port(ref_model, config, size_factor=1.0)

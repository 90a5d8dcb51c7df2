"""Inception pretrained-weight porting tests (VERDICT r1 item 6).

Builds a synthetic torchvision-inception_v3-shaped state dict (correct key
names, OIHW shapes, random values), round-trips it through
``load_torchvision_weights`` via both the ``.npz`` and torch ``.pth`` routes,
and runs one real forward of the trunk on CPU — so the day a real weights
file appears (weights/README.md), the port path is already proven.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distillation_trajectories_tpu.models.inception import (
    InceptionV3Features,
    load_torchvision_weights,
)

_MAPPING = {
    ("params", "kernel"): "weight",
    ("params", "scale"): "weight",
    ("params", "bias"): "bias",
    ("batch_stats", "mean"): "running_mean",
    ("batch_stats", "var"): "running_var",
}


def _flax_key_to_torch(key: str) -> str:
    parts = key.split("/")
    return ".".join(parts[1:-1]) + "." + _MAPPING[(parts[0], parts[-1])]


@pytest.fixture(scope="module")
def inception_variables():
    model = InceptionV3Features()
    # eval_shape: structure + shapes without materializing 24M params twice
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    )
    import flax

    rng = np.random.default_rng(0)
    flat = flax.traverse_util.flatten_dict(shapes, sep="/")
    out = {}
    for k, s in flat.items():
        w = rng.standard_normal(s.shape).astype(np.float32) * 0.01
        if k.endswith("/var"):  # BN running_var must be positive
            w = np.abs(w) + 0.5
        out[tuple(k.split("/"))] = jnp.asarray(w)
    return flax.traverse_util.unflatten_dict(out)


def _synthetic_torch_state(variables, seed=1):
    """torchvision-shaped state dict: names via the documented convention,
    conv tensors in OIHW, plus the extra keys real checkpoints carry."""
    import flax

    rng = np.random.default_rng(seed)
    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    state = {}
    for key, leaf in flat.items():
        w = rng.standard_normal(leaf.shape).astype(np.float32)
        if key.endswith("kernel") and w.ndim == 4:
            w = np.transpose(w, (3, 2, 0, 1))  # HWIO → OIHW
        state[_flax_key_to_torch(key)] = w
    # Extras present in the real torchvision state dict that the porter
    # must silently ignore (classifier head + aux head + BN counters).
    state["fc.weight"] = rng.standard_normal((1000, 2048)).astype(np.float32)
    state["fc.bias"] = np.zeros(1000, np.float32)
    state["AuxLogits.conv0.conv.weight"] = rng.standard_normal(
        (128, 768, 1, 1)
    ).astype(np.float32)
    state["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.asarray(1, np.int64)
    return state


def test_synthetic_state_matches_torchvision_contract(inception_variables):
    """Spot-check generated keys/shapes against the REAL torchvision
    inception_v3 state-dict contract (hard-coded facts, not derived from our
    own code — guards against a circular naming bug)."""
    state = _synthetic_torch_state(inception_variables)
    expected = {
        "Conv2d_1a_3x3.conv.weight": (32, 3, 3, 3),
        "Conv2d_2a_3x3.conv.weight": (32, 32, 3, 3),
        "Conv2d_2b_3x3.conv.weight": (64, 32, 3, 3),
        "Conv2d_3b_1x1.conv.weight": (80, 64, 1, 1),
        "Conv2d_4a_3x3.conv.weight": (192, 80, 3, 3),
        "Mixed_5b.branch1x1.conv.weight": (64, 192, 1, 1),
        "Mixed_5b.branch5x5_2.conv.weight": (64, 48, 5, 5),
        "Mixed_6a.branch3x3.conv.weight": (384, 288, 3, 3),
        "Mixed_6b.branch7x7_2.conv.weight": (128, 128, 1, 7),
        "Mixed_6b.branch7x7_3.conv.weight": (192, 128, 7, 1),
        "Mixed_7a.branch3x3_2.conv.weight": (320, 192, 3, 3),
        "Mixed_7b.branch3x3_2a.conv.weight": (384, 384, 1, 3),
        "Mixed_7c.branch_pool.conv.weight": (192, 2048, 1, 1),
        "Mixed_5b.branch1x1.bn.weight": (64,),
        "Mixed_5b.branch1x1.bn.running_mean": (64,),
    }
    for k, shape in expected.items():
        assert k in state, f"missing torchvision key {k}"
        assert state[k].shape == shape, (k, state[k].shape, shape)


def test_load_npz_roundtrip(inception_variables, tmp_path):
    state = _synthetic_torch_state(inception_variables)
    path = str(tmp_path / "inception_v3.npz")
    np.savez(path, **state)

    ported = load_torchvision_weights(path, inception_variables)

    # Orientation: HWIO kernel == OIHW source transposed back.
    src = state["Mixed_5b.branch5x5_2.conv.weight"]  # distinct dims (5,5,48,64)
    got = np.asarray(ported["params"]["Mixed_5b"]["branch5x5_2"]["conv"]["kernel"])
    np.testing.assert_array_equal(got, src.transpose(2, 3, 1, 0))

    # Every leaf replaced (ported values differ from the init values).
    import flax

    before = flax.traverse_util.flatten_dict(inception_variables, sep="/")
    after = flax.traverse_util.flatten_dict(ported, sep="/")
    assert set(before) == set(after)
    changed = sum(
        not np.array_equal(np.asarray(before[k]), np.asarray(after[k]))
        for k in before
    )
    assert changed == len(before)

    # BN stats landed in batch_stats, scale/bias in params.
    bn_mean = np.asarray(ported["batch_stats"]["Conv2d_1a_3x3"]["bn"]["mean"])
    np.testing.assert_array_equal(
        bn_mean, state["Conv2d_1a_3x3.bn.running_mean"]
    )
    bn_scale = np.asarray(ported["params"]["Conv2d_1a_3x3"]["bn"]["scale"])
    np.testing.assert_array_equal(bn_scale, state["Conv2d_1a_3x3.bn.weight"])


def test_load_pth_roundtrip(inception_variables, tmp_path):
    torch = pytest.importorskip("torch")
    state = _synthetic_torch_state(inception_variables, seed=2)
    path = str(tmp_path / "inception_v3.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}, path)

    ported = load_torchvision_weights(path, inception_variables)
    src = state["Conv2d_1a_3x3.conv.weight"]
    got = np.asarray(ported["params"]["Conv2d_1a_3x3"]["conv"]["kernel"])
    np.testing.assert_array_equal(got, src.transpose(2, 3, 1, 0))


def test_missing_key_raises(inception_variables, tmp_path):
    state = _synthetic_torch_state(inception_variables)
    del state["Mixed_7c.branch_pool.conv.weight"]
    path = str(tmp_path / "broken.npz")
    np.savez(path, **state)
    with pytest.raises(KeyError, match="Mixed_7c.branch_pool.conv.weight"):
        load_torchvision_weights(path, inception_variables)


def test_trunk_forward_cpu(inception_variables):
    """One real (non-interpreted) forward of the full trunk on CPU.

    95×95 is the smallest input that survives the three stride-2 stages +
    pools with torchvision-compatible spatial dims; the graph compiled is
    the same trunk the TPU FID path runs at 299×299.
    """
    model = InceptionV3Features()
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 95, 95, 3)), jnp.float32
    )
    feats = model.apply(inception_variables, x)
    assert feats.shape == (1, 2048)
    assert np.isfinite(np.asarray(feats)).all()

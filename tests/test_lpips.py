"""LPIPS backend tests (VERDICT r1 item 8: un-stub compute_lpips).

The lpips torch package is not installed in this image, so these tests cover
the Flax AlexNet-LPIPS path with synthetic ported weights plus the
reference-parity placeholder fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distillation_trajectories_tpu.metrics.lpips import (
    _ALEX_CONVS,
    AlexFeatures,
    create_lpips,
    load_lpips_weights,
)


def test_alexnet_torchvision_contract():
    """Conv shapes match the real torchvision alexnet state dict
    (hard-coded facts: features.{0,3,6,8,10}.weight OIHW shapes)."""
    expected = {
        "features.0": (64, 3, 11, 11),
        "features.3": (192, 64, 5, 5),
        "features.6": (384, 192, 3, 3),
        "features.8": (256, 384, 3, 3),
        "features.10": (256, 256, 3, 3),
    }
    model = AlexFeatures()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    for i, (ch, k, s, p, tname) in enumerate(_ALEX_CONVS):
        o, inp, kh, kw = expected[tname]
        kernel = variables["params"][f"conv{i}"]["kernel"]
        assert kernel.shape == (kh, kw, inp, o), (tname, kernel.shape)


def _synthetic_lpips_state(seed=0):
    rng = np.random.default_rng(seed)
    state = {}
    prev = 3
    for ch, k, s, p, tname in _ALEX_CONVS:
        state[f"{tname}.weight"] = (
            rng.standard_normal((ch, prev, k, k)).astype(np.float32) * 0.05
        )
        state[f"{tname}.bias"] = np.zeros(ch, np.float32)
        prev = ch
    for i, (ch, *_rest) in enumerate(_ALEX_CONVS):
        state[f"lin{i}.model.1.weight"] = np.abs(
            rng.standard_normal((1, ch, 1, 1)).astype(np.float32)
        )
    return state


def test_flax_lpips_with_ported_weights(tmp_path):
    state = _synthetic_lpips_state()
    path = str(tmp_path / "lpips_alex.npz")
    np.savez(path, **state)

    scorer, pretrained = create_lpips(path)
    assert pretrained

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    d_xy = scorer(x, y)
    assert d_xy.shape == (2,)
    assert (d_xy > 0).all() and np.isfinite(d_xy).all()
    # identity ⇒ exactly zero; symmetry
    np.testing.assert_allclose(scorer(x, x), 0.0, atol=1e-6)
    np.testing.assert_allclose(scorer(y, x), d_xy, rtol=1e-5)
    # grayscale input path
    g = rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32)
    assert scorer(g, g).shape == (2,)


def test_load_lpips_weights_transpose(tmp_path):
    state = _synthetic_lpips_state(seed=2)
    path = str(tmp_path / "w.npz")
    np.savez(path, **state)
    model = AlexFeatures()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    ported, lin = load_lpips_weights(path, variables)
    got = np.asarray(ported["params"]["conv0"]["kernel"])
    np.testing.assert_array_equal(
        got, state["features.0.weight"].transpose(2, 3, 1, 0)
    )
    assert all(w.ndim == 1 for w in lin)
    assert (lin[0] >= 0).all()  # lpips heads are clamped nonnegative


def test_compute_lpips_placeholder_without_backends(capsys):
    """Without the lpips package and without weights: the reference's own
    0.5-per-pair fallback (evaluation/metrics.py:35-37)."""
    from distillation_trajectories_tpu.metrics import evaluation

    try:
        import lpips  # noqa: F401

        pytest.skip("lpips installed; placeholder path not reachable")
    except ImportError:
        pass

    evaluation._LPIPS_CACHE.pop("flax", None)
    imgs = np.random.default_rng(0).uniform(0, 1, (3, 16, 16, 1))
    out = evaluation.compute_lpips(imgs, imgs, weights_path="/nonexistent")
    assert out == [0.5, 0.5, 0.5]
    evaluation._LPIPS_CACHE.pop("flax", None)


def test_compute_lpips_uses_flax_backend_when_weights_exist(tmp_path):
    from distillation_trajectories_tpu.metrics import evaluation

    try:
        import lpips  # noqa: F401

        pytest.skip("lpips installed; flax path not reachable")
    except ImportError:
        pass

    state = _synthetic_lpips_state(seed=3)
    path = str(tmp_path / "lpips_alex.npz")
    np.savez(path, **state)

    evaluation._LPIPS_CACHE.pop("flax", None)
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    out = evaluation.compute_lpips(a, b, weights_path=path)
    assert len(out) == 2
    assert all(np.isfinite(v) and v > 0 and v != 0.5 for v in out)
    same = evaluation.compute_lpips(a, a, weights_path=path)
    np.testing.assert_allclose(same, 0.0, atol=1e-6)
    evaluation._LPIPS_CACHE.pop("flax", None)

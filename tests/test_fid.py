"""FID math and preprocessing tests (extractor forward exercised on TPU in
the analysis CLIs; the full Inception compile is too slow for the CPU suite)."""

import jax.numpy as jnp
import numpy as np

from distillation_trajectories_tpu.metrics.fid import calculate_fid
from distillation_trajectories_tpu.models.inception import (
    preprocess_for_inception,
)


def test_fid_identical_distributions_near_zero():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((200, 16))
    assert abs(calculate_fid(f, f.copy())) < 1e-6


def test_fid_mean_shift():
    """For equal covariance, FID ≈ ||μ1−μ2||²."""
    rng = np.random.default_rng(1)
    f1 = rng.standard_normal((5000, 8))
    shift = np.full(8, 2.0)
    f2 = rng.standard_normal((5000, 8)) + shift
    fid = calculate_fid(f1, f2)
    np.testing.assert_allclose(fid, float(shift @ shift), rtol=0.1)


def test_fid_degenerate_placeholder():
    # reference fid_score.py:66-69 placeholder for <2 samples
    assert calculate_fid(np.zeros((1, 8)), np.zeros((10, 8))) == 999.0


def test_preprocess_shapes_and_range():
    x = jnp.zeros((2, 16, 16, 1))  # grayscale [−1,1]
    out = preprocess_for_inception(x)
    assert out.shape == (2, 299, 299, 3)
    # x=0 → [0,1] value 0.5 → (0.5−mean)/std per channel
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]),
        (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
        rtol=1e-4,
    )


def test_inception_param_structure():
    """Architecture instantiates with the expected torchvision module names
    (required for pretrained-weight porting)."""
    import jax

    from distillation_trajectories_tpu.models.inception import (
        InceptionV3Features,
    )

    model = InceptionV3Features()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    )
    params = variables["params"]
    for name in (
        "Conv2d_1a_3x3", "Mixed_5b", "Mixed_6a", "Mixed_6e", "Mixed_7c",
    ):
        assert name in params, name
    # 2048-d output: Mixed_7c concat = 320+768+768+192
    final = params["Mixed_7c"]["branch_pool"]["conv"]["kernel"]
    assert final.shape[-1] == 192

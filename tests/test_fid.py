"""FID math and preprocessing tests (extractor forward exercised on TPU in
the analysis CLIs; the full Inception compile is too slow for the CPU suite)."""

import os
import warnings

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


class _StubInception:
    """Duck-typed feature extractor: mean-pooled patches, no Inception
    compile (too slow for the CPU suite)."""

    def get_features(self, images):
        x = np.asarray(images, dtype=np.float64)
        n = x.shape[0]
        return x.reshape(n, -1)[:, :32]


def test_fid_across_sizes_matches_per_size_path(test_config, tmp_path):
    """The compile-pooled multi-size FID path must produce bit-identical
    scores and artifacts to per-size calculate_and_visualize_fid calls
    (same seed split, teacher samples fixed across sizes)."""
    import jax

    from distillation_trajectories_tpu.metrics.fid import (
        calculate_and_visualize_fid,
        fid_across_sizes,
    )
    from distillation_trajectories_tpu.models import make_unet

    cfg = test_config
    stub = _StubInception()

    x0 = np.zeros((1, cfg.image_size, cfg.image_size, cfg.channels), np.float32)
    t0 = np.zeros((1,), np.int32)
    teacher = make_unet(cfg, size_factor=0.25)
    tvars = teacher.init(jax.random.PRNGKey(0), x0, t0)
    students = {}
    for i, sf in enumerate([0.25, 0.5]):
        m = make_unet(cfg, size_factor=sf)
        students[sf] = (m, m.init(jax.random.PRNGKey(10 + i), x0, t0))

    pooled = fid_across_sizes(
        teacher, tvars, students, cfg, inception=stub, num_samples=4,
        precompile=True,
    )

    for sf, (m, v) in students.items():
        ref = calculate_and_visualize_fid(
            teacher, m, cfg, size_factor=sf, teacher_variables=tvars,
            student_variables=v, inception=stub, num_samples=4,
        )
        assert pooled[sf] == ref["fid_score"], sf
        txt = os.path.join(
            cfg.analysis_dir, "fid", f"size_{sf}", f"fid_score_size_{sf}.txt"
        )
        assert os.path.exists(txt)


def test_fid_across_sizes_empty_students_is_free(test_config):
    """No students (e.g. analyze_fid before any student is trained) returns
    {} WITHOUT paying the teacher sampler compile or any generation."""
    from distillation_trajectories_tpu.metrics.fid import fid_across_sizes

    class _Boom:
        def get_features(self, x):  # pragma: no cover - must not be called
            raise AssertionError("teacher featurization ran with no students")

    assert fid_across_sizes(
        object(), {}, {}, test_config, inception=_Boom(), num_samples=4
    ) == {}


def test_fid_across_sizes_dedups_shared_architectures(test_config):
    """Size factors that clamp to the same derived U-Net (the 16-channel
    floor, e.g. 0.01 and 0.05) share ONE jitted sampler; the teacher's
    architecture seeds the cache so an sf=1.0-alike student reuses it."""
    import jax

    from distillation_trajectories_tpu.metrics import fid as fid_mod
    from distillation_trajectories_tpu.models import make_unet

    cfg = test_config
    x0 = np.zeros((1, cfg.image_size, cfg.image_size, cfg.channels), np.float32)
    t0 = np.zeros((1,), np.int32)
    teacher = make_unet(cfg, size_factor=0.25)
    tvars = teacher.init(jax.random.PRNGKey(0), x0, t0)
    students = {}
    for i, sf in enumerate([0.01, 0.05, 0.25]):
        m = make_unet(cfg, size_factor=sf)
        students[sf] = (m, m.init(jax.random.PRNGKey(10 + i), x0, t0))
    # 0.01 and 0.05 clamp to the same floor architecture; 0.25 == teacher.
    assert tuple(students[0.01][0].dims) == tuple(students[0.05][0].dims)

    calls = []
    real_make_sample_fn = fid_mod.make_sample_fn

    def counting(model, config, num_samples):
        calls.append(model)
        return real_make_sample_fn(model, config, num_samples)

    stub = _StubInception()
    orig = fid_mod.make_sample_fn
    fid_mod.make_sample_fn = counting
    try:
        scores = fid_mod.fid_across_sizes(
            teacher, tvars, students, cfg, inception=stub, num_samples=2,
            precompile=False,
        )
    finally:
        fid_mod.make_sample_fn = orig
    assert set(scores) == {0.01, 0.05, 0.25}
    # One sampler for (teacher == 0.25 student) + one for the floor arch.
    assert len(calls) == 2, [tuple(m.dims) for m in calls]


def test_fid_lowrank_fast_path_matches_sqrtm():
    """The exact low-rank cross-term (SVD of A1 @ A2.T) must match the
    reference's dense-sqrtm Fréchet formula to float64 noise.  Re-derived
    independently here with scipy (test-suite convention: numpy/scipy
    re-derivation, not a call back into the library)."""
    from scipy import linalg

    from distillation_trajectories_tpu.metrics.fid import calculate_fid

    rng = np.random.default_rng(7)
    d, n1, n2 = 48, 12, 9  # max(n) < d -> fast path taken
    f1 = rng.normal(size=(n1, d))
    f2 = rng.normal(loc=0.3, scale=1.2, size=(n2, d))

    fast = calculate_fid(f1, f2)

    mu1, mu2 = f1.mean(axis=0), f2.mean(axis=0)
    s1 = np.cov(f1, rowvar=False)
    s2 = np.cov(f2, rowvar=False)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", linalg.LinAlgWarning)
        covmean = linalg.sqrtm(s1 @ s2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu1 - mu2
    dense = float(diff @ diff + np.trace(s1) + np.trace(s2)
                  - 2 * np.trace(covmean))

    # sqrtm on the rank-deficient product is itself accurate only to ~1e-6
    # here (scipy warns "Matrix is singular"); the SVD path is the exact one.
    assert abs(fast - dense) < 1e-4 * max(1.0, abs(dense)), (fast, dense)


def test_fid_dense_path_still_used_for_large_n():
    """n >= d falls back to the reference's dense sqrtm formula."""
    from distillation_trajectories_tpu.metrics.fid import calculate_fid

    rng = np.random.default_rng(3)
    d, n = 8, 64
    f1 = rng.normal(size=(n, d))
    f2 = rng.normal(size=(n, d))
    v = calculate_fid(f1, f2)
    assert np.isfinite(v) and v >= 0.0

"""Native C++ data pipeline tests (build + parity with numpy fallback)."""

import numpy as np

from distillation_trajectories_tpu.data import native


def test_native_lib_builds():
    lib = native.get_lib()
    # g++ is baked into the image; the library must build there.  If it
    # genuinely cannot, the numpy fallback still serves correctness (other
    # tests cover it), so only warn via assert message.
    assert lib is not None, "native data library failed to build"


def test_shuffle_deterministic_and_permutation():
    a = native.shuffle_indices(1000, seed=7)
    b = native.shuffle_indices(1000, seed=7)
    c = native.shuffle_indices(1000, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(1000))


def test_gather_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (50, 8, 8, 3), dtype=np.uint8)
    idx = rng.integers(0, 50, 16).astype(np.int64)
    got = native.gather_normalize(images, idx)
    want = images[idx].astype(np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.dtype == np.float32


def test_gather_f32_matches_numpy():
    rng = np.random.default_rng(1)
    images = rng.standard_normal((40, 8, 8, 1)).astype(np.float32)
    idx = rng.integers(0, 40, 12).astype(np.int64)
    got = native.gather_f32(images, idx)
    np.testing.assert_array_equal(got, images[idx])


def test_dataloader_prefetch_epochs(test_config):
    from distillation_trajectories_tpu.data import DataLoader

    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (40, 16, 16, 1)).astype(np.float32)
    labels = rng.integers(0, 10, 40).astype(np.int32)
    loader = DataLoader(images, labels, batch_size=8, seed=3)
    e1 = [b[0].copy() for b in loader]
    e2 = [b[0].copy() for b in loader]
    assert len(e1) == len(e2) == 5
    # different epoch => different shuffle order
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))
    # but same multiset of rows
    all1 = np.sort(np.concatenate(e1).reshape(40, -1), axis=0)
    all2 = np.sort(np.concatenate(e2).reshape(40, -1), axis=0)
    np.testing.assert_allclose(all1, all2)


def test_synthetic_dataset_fallback():
    """CIFAR blobs are absent in this environment: the synthetic stand-in
    must produce valid, deterministic data (regression: numpy 2.0 removed
    ndarray.ptp)."""
    from distillation_trajectories_tpu.data.datasets import _synthetic_dataset

    imgs, labels = _synthetic_dataset(20, 32, 3, seed=0)
    assert imgs.shape == (20, 32, 32, 3) and imgs.dtype == np.uint8
    assert labels.shape == (20,)
    imgs2, labels2 = _synthetic_dataset(20, 32, 3, seed=0)
    np.testing.assert_array_equal(imgs, imgs2)


def test_cifar_config_loads_synthetic(test_config):
    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.data import load_dataset

    cfg = Config(dataset="CIFAR10", image_size=32, channels=3,
                 base_dir=test_config.base_dir)
    images, labels = load_dataset(cfg, train=False)
    assert images.shape[1:] == (32, 32, 3)
    assert images.min() >= -1.0 and images.max() <= 1.0

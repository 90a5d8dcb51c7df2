"""Data layer: MNIST / CIFAR-10 loaders with no torch/torchvision dependency.

TPU-native counterpart of reference ``data/dataset.py:5-118``: numpy-native
parsing of the raw MNIST idx files and CIFAR-10 python batches, resize to
``config.image_size``, normalize to [−1, 1], NHWC float32 batches.

Zero-egress environment: if dataset blobs are absent a deterministic
procedurally generated stand-in dataset is used (clearly logged) so every
pipeline stage remains runnable end-to-end.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
from typing import Iterator, Optional, Tuple

import numpy as np

# Candidate roots for raw dataset files (repo data dir, then the read-only
# reference mount which ships MNIST test images/labels).
_EXTRA_DATA_ROOTS = ["/root/reference/data"]


def _read_idx_images(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        assert magic == 2051, f"bad idx magic {magic} in {path}"
        data = np.frombuffer(f.read(n * rows * cols), dtype=np.uint8)
    return data.reshape(n, rows, cols, 1)


def _read_idx_labels(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, n = struct.unpack(">II", f.read(8))
        assert magic == 2049, f"bad idx magic {magic} in {path}"
        return np.frombuffer(f.read(n), dtype=np.uint8).astype(np.int32)


def _find(*relpaths: str, roots) -> Optional[str]:
    for root in roots:
        for rel in relpaths:
            p = os.path.join(root, rel)
            if os.path.exists(p):
                return p
    return None


def _resize_batch(images: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize NHWC uint8/float batch to (size, size) on host."""
    if images.shape[1] == size and images.shape[2] == size:
        return images.astype(np.float32)
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        out = jax.image.resize(
            images.astype(np.float32),
            (images.shape[0], size, size, images.shape[3]),
            method="bilinear",
        )
        return np.asarray(out)


def _synthetic_dataset(
    n: int, size: int, channels: int, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic procedural stand-in when dataset blobs are unavailable.

    Structured images (gaussian blobs on gradients, 10 pseudo-classes) rather
    than white noise, so training losses and metrics behave sanely.
    """
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, size=n).astype(np.int32)
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, size), np.linspace(-1, 1, size), indexing="ij"
    )
    images = np.zeros((n, size, size, channels), dtype=np.float32)
    for i in range(n):
        k = labels[i]
        cx, cy = np.cos(2 * np.pi * k / 10) * 0.4, np.sin(2 * np.pi * k / 10) * 0.4
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (0.08 + 0.02 * (k % 3))))
        grad = 0.3 * (xx * np.cos(k) + yy * np.sin(k))
        base = blob + grad + 0.05 * rng.standard_normal((size, size))
        for c in range(channels):
            images[i, :, :, c] = base * (0.7 + 0.3 * np.cos(k + c))
    images = np.clip((images - images.min()) / (np.ptp(images) + 1e-8), 0, 1)
    return (images * 255).astype(np.uint8), labels


def load_mnist(data_dir: str, train: bool) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    roots = [os.path.join(data_dir, "MNIST", "raw")] + [
        os.path.join(r, "MNIST", "raw") for r in _EXTRA_DATA_ROOTS
    ]
    prefix = "train" if train else "t10k"
    img_path = _find(
        f"{prefix}-images-idx3-ubyte", f"{prefix}-images-idx3-ubyte.gz", roots=roots
    )
    lbl_path = _find(
        f"{prefix}-labels-idx1-ubyte", f"{prefix}-labels-idx1-ubyte.gz", roots=roots
    )
    if img_path is None and train:
        # Train images stripped from the mounted reference; fall back to the
        # test split so training remains runnable (logged).
        img_path = _find(
            "t10k-images-idx3-ubyte", "t10k-images-idx3-ubyte.gz", roots=roots
        )
        lbl_path = _find(
            "t10k-labels-idx1-ubyte", "t10k-labels-idx1-ubyte.gz", roots=roots
        )
        if img_path is not None:
            print(
                "[data] MNIST train images unavailable; using test split as "
                "training data (blobs stripped from reference mount)"
            )
    if img_path is None or lbl_path is None:
        return None
    return _read_idx_images(img_path), _read_idx_labels(lbl_path)


def load_cifar10(data_dir: str, train: bool) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    roots = [os.path.join(data_dir, "cifar-10-batches-py")] + [
        os.path.join(r, "cifar-10-batches-py") for r in _EXTRA_DATA_ROOTS
    ]
    names = (
        [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    )
    images, labels = [], []
    for name in names:
        path = _find(name, roots=roots)
        if path is None:
            return None
        with open(path, "rb") as f:
            batch = pickle.load(f, encoding="bytes")
        data = batch[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        images.append(data)
        labels.append(np.asarray(batch[b"labels"], dtype=np.int32))
    return np.concatenate(images), np.concatenate(labels)


def load_dataset(config, train: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Images in [−1, 1] float32 NHWC at ``config.image_size`` + labels.

    Mirrors reference ``data/dataset.py:15-64`` transforms: resize to
    image_size then normalize with mean 0.5 / std 0.5 per channel.
    """
    name = config.dataset.lower()
    raw = None
    if name == "mnist":
        raw = load_mnist(config.data_dir, train)
    elif name == "cifar10":
        raw = load_cifar10(config.data_dir, train)
    else:
        raise ValueError(f"Dataset {config.dataset} not supported")

    if raw is None:
        print(
            f"[data] {config.dataset} blobs not found; using deterministic "
            "synthetic stand-in dataset"
        )
        n = 10000 if train else 2000
        images, labels = _synthetic_dataset(
            n, config.image_size, config.channels, seed=0 if train else 1
        )
    else:
        images, labels = raw

    images = _resize_batch(images, config.image_size)
    # Channel count adaptation (MNIST 1ch → config.channels if needed).
    if images.shape[-1] != config.channels:
        if images.shape[-1] == 1:
            images = np.repeat(images, config.channels, axis=-1)
        else:
            images = images[..., : config.channels]
    images = images / 255.0 * 2.0 - 1.0
    return images.astype(np.float32), labels


class DataLoader:
    """Epoch-reshuffled batch iterator (reference data/dataset.py:15-64).

    Yields NHWC float32 numpy batches in [−1, 1]; ``drop_last`` semantics
    match the reference.  Shuffling and batch gathers run through the native
    C++ pipeline (native/dtt_data.cpp) when it builds, with a numpy
    fallback; a background thread prefetches the next batch so host-side
    data prep overlaps device steps (the TPU-native analog of the
    reference's DataLoader worker processes).
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray, batch_size: int,
                 shuffle: bool = True, seed: int = 0, prefetch: int = 2):
        self.images = np.ascontiguousarray(images, dtype=np.float32)
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.images) // self.batch_size

    def epoch_indices(self, n_batches: Optional[int] = None) -> np.ndarray:
        """Advance one epoch and return its batch indices [n_batches, B].

        The SAME shuffle stream the iterator uses (shuffle_indices keyed on
        seed/epoch), so a device-side gather of these indices reproduces the
        iterator's batches exactly — the epoch-scan training path
        (training/state.py::make_*_epoch_fn) consumes this with the full
        dataset resident on device instead of per-batch host uploads.
        """
        self._epoch += 1
        idx = self._epoch_perm()
        nb = len(self) if n_batches is None else min(n_batches, len(self))
        return (
            idx[: nb * self.batch_size]
            .reshape(nb, self.batch_size)
            .astype(np.int32)
        )

    def _epoch_perm(self) -> np.ndarray:
        """This epoch's shuffle permutation — the SINGLE definition of the
        shuffle stream.  epoch_indices (epoch-scan training) and
        _epoch_batches (per-batch iteration) must stay on the same stream
        or scan-mode batch composition silently desynchronizes from
        loop-mode (their bitwise parity is the epoch-scan path's
        correctness contract; see test_epoch_scan_matches_batch_loop)."""
        from .native import shuffle_indices

        n = len(self.images)
        if self.shuffle:
            return shuffle_indices(n, self.seed * 1_000_003 + self._epoch)
        return np.arange(n, dtype=np.int64)

    def _epoch_batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        from .native import gather_f32

        idx = self._epoch_perm()
        for i in range(len(self)):
            sel = idx[i * self.batch_size : (i + 1) * self.batch_size]
            yield gather_f32(self.images, sel), self.labels[sel]

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        self._epoch += 1
        if self.prefetch <= 0:
            yield from self._epoch_batches()
            return

        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            # Any producer exception must reach the consumer — otherwise the
            # main thread would block forever on q.get().
            try:
                for batch in self._epoch_batches():
                    q.put(batch)
                q.put(sentinel)
            except BaseException as e:  # noqa: BLE001
                q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                thread.join()
                raise item
            yield item
        thread.join()


def get_data_loader(config, train: bool = True, seed: int = 0) -> DataLoader:
    """Training data loader (reference data/dataset.py:5-64)."""
    images, labels = load_dataset(config, train=train)
    return DataLoader(images, labels, config.batch_size, shuffle=True, seed=seed)


def get_real_images(config, num_images: int = 100) -> np.ndarray:
    """A batch of real test images for evaluation (reference dataset.py:68-118)."""
    images, _ = load_dataset(config, train=False)
    return images[:num_images]

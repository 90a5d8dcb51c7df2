"""Flax InceptionV3 feature extractor for FID.

TPU-native counterpart of the reference's torchvision-based
``InceptionModel`` (analysis/metrics/fid_score.py:19-59): the full
InceptionV3 trunk (through the global average pool → 2048-d features) in
NHWC Flax, structured module-for-module like torchvision's ``inception_v3``
so pretrained weights can be ported directly.

Weights: this environment has no network egress and no torchvision, so
pretrained ImageNet weights are loaded from a local file when available
(``load_torchvision_weights`` accepts a torch ``.pth``/``.pt`` state dict or
an ``.npz``); otherwise the extractor falls back to a deterministic,
seeded random initialization — FID values then rank relative sample quality
under a fixed random projection rather than ImageNet semantics (clearly
logged).  The FID math itself (metrics/fid.py) is identical either way.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=1e-3) + relu (torchvision BasicConv2d)."""

    out_ch: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_ch,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, name="bn"
        )(x)
        return nn.relu(x)


def _pad(k: int) -> Tuple[int, int]:
    return (k // 2, k // 2)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(_pad(5), _pad(5)), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(_pad(3), _pad(3)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(_pad(3), _pad(3)), name="branch3x3dbl_3")(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(_pad(3), _pad(3)), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7dbl_5")(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=p17, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=p13, name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=p31, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(_pad(3), _pad(3)), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=p13, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=p31, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """InceptionV3 trunk → 2048-d pooled features (NHWC, 299×299 input)."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(_pad(3), _pad(3)), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        # Global average pool (torchvision avgpool hook tap, ref fid_score.py:28-33)
        return jnp.mean(x, axis=(1, 2))


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

_WEIGHTS_SEARCH_PATHS = [
    os.environ.get("INCEPTION_WEIGHTS", ""),
    "/root/repo/weights/inception_v3.npz",
    "/root/repo/weights/inception_v3.pth",
]


def load_torchvision_weights(path: str, variables):
    """Port a torchvision inception_v3 state dict into the Flax variables.

    Accepts a torch ``.pth`` state dict (OIHW conv kernels → HWIO) or an
    ``.npz`` with the same key names.
    """
    if path.endswith(".npz"):
        state = dict(np.load(path))
    else:
        import torch

        state = {
            k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()
        }

    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    out = dict(flat)
    for key in flat:
        # e.g. params/Mixed_5b/branch1x1/conv/kernel ←
        #      Mixed_5b.branch1x1.conv.weight
        parts = key.split("/")
        col = parts[0]  # params | batch_stats
        torch_name = ".".join(parts[1:-1])
        leaf = parts[-1]
        mapping = {
            ("params", "kernel"): "weight",
            ("params", "scale"): "weight",
            ("params", "bias"): "bias",
            ("batch_stats", "mean"): "running_mean",
            ("batch_stats", "var"): "running_var",
        }
        tkey = f"{torch_name}.{mapping[(col, leaf)]}"
        if tkey not in state:
            raise KeyError(f"missing torch weight {tkey} for {key}")
        w = np.asarray(state[tkey])
        if leaf == "kernel" and w.ndim == 4:
            w = w.transpose(2, 3, 1, 0)  # OIHW → HWIO
        assert w.shape == flat[key].shape, (key, w.shape, flat[key].shape)
        out[key] = jnp.asarray(w)
    return flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in out.items()}
    )


def create_inception(
    weights_path: Optional[str] = None, seed: int = 0
) -> Tuple[InceptionV3Features, dict, bool]:
    """Build the extractor; returns (model, variables, pretrained?)."""
    model = InceptionV3Features()
    # Jitted init: ONE compiled graph instead of hundreds of eagerly
    # dispatched ops (each paying a tunnel RTT on the axon backend — the
    # same fix that took the U-Net init 81s → 9s, PERFORMANCE.md).
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, 299, 299, 3))
    )
    for path in ([weights_path] if weights_path else _WEIGHTS_SEARCH_PATHS):
        if path and os.path.exists(path):
            try:
                variables = load_torchvision_weights(path, variables)
                print(f"[fid] loaded pretrained Inception weights from {path}")
                return model, variables, True
            except Exception as e:
                print(f"[fid] failed to load weights from {path}: {e}")
    print(
        "[fid] no pretrained Inception weights found — using deterministic "
        "random features (FID values are self-consistent, not ImageNet-FID)"
    )
    return model, variables, False


def preprocess_for_inception(images: jnp.ndarray) -> jnp.ndarray:
    """[−1,1] NHWC → [0,1] → ImageNet-normalized 299×299 RGB
    (reference fid_score.py:36-50)."""
    images = (images + 1.0) / 2.0
    if images.shape[-1] == 1:
        images = jnp.repeat(images, 3, axis=-1)
    images = jax.image.resize(
        images, (images.shape[0], 299, 299, 3), method="bilinear"
    )
    return (images - IMAGENET_MEAN) / IMAGENET_STD

"""LPIPS perceptual distance, TPU-native.

Counterpart of reference ``evaluation/metrics.py:22-49`` which uses the
``lpips`` package with the AlexNet backbone.  Three backends, best first:

1. **Flax AlexNet-LPIPS** (this module) when a ported weights file exists —
   the TPU path: one jitted NHWC forward for both images, bf16-friendly.
   Weights: set ``LPIPS_WEIGHTS`` or drop ``weights/lpips_alex.npz``
   containing the torchvision alexnet ``features.*`` tensors plus the lpips
   ``lin{0..4}.model.1.weight`` 1×1 heads (see weights/README.md).
2. **The ``lpips`` torch package** when importable (reference parity path).
3. **Placeholder 0.5 per pair** with a logged warning — byte-for-byte the
   reference's own fallback (evaluation/metrics.py:35-37).

LPIPS(x, y) = Σ_l  w_l · mean_hw ‖ φ̂_l(x) − φ̂_l(y) ‖²  over unit-normalized
channel features φ̂ of conv1..conv5, after the lpips "scaling layer"
(shift/scale constants below, from the lpips reference implementation).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# lpips ScalingLayer constants (lpips/lpips.py): inputs in [-1, 1].
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

def _weights_search_paths():
    """Candidate weight files, resolved at call time (so LPIPS_WEIGHTS set
    after import is honored) and relative to this checkout (so weights/
    works from any clone location, per weights/README.md)."""
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return [
        os.environ.get("LPIPS_WEIGHTS", ""),
        os.path.join(repo_root, "weights", "lpips_alex.npz"),
    ]

# torchvision alexnet `features` conv layers: (out_ch, kernel, stride, pad)
# at state-dict indices 0, 3, 6, 8, 10; relu taps feed the 5 LPIPS heads.
_ALEX_CONVS = [
    (64, 11, 4, 2, "features.0"),
    (192, 5, 1, 2, "features.3"),
    (384, 3, 1, 1, "features.6"),
    (256, 3, 1, 1, "features.8"),
    (256, 3, 1, 1, "features.10"),
]


class AlexFeatures(nn.Module):
    """torchvision-alexnet feature trunk returning the 5 relu taps (NHWC)."""

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        taps = []
        for i, (ch, k, s, p, _) in enumerate(_ALEX_CONVS):
            x = nn.Conv(
                ch, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            taps.append(x)
            if i in (0, 1):  # maxpool after relu1 and relu2
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return tuple(taps)


class LPIPSAlex:
    """Flax AlexNet-LPIPS scorer with torch-convention weight porting."""

    def __init__(self, variables: dict, lin_weights: List[np.ndarray]):
        self.model = AlexFeatures()
        self.variables = variables
        # lin weights: [C_l] nonnegative per-channel 1×1 head weights.
        self.lin = [jnp.asarray(w.reshape(-1)) for w in lin_weights]

        @jax.jit
        def _dist(x, y):
            # x, y: [B, H, W, 3] in [-1, 1] (lpips input convention).
            xs = (x - _SHIFT) / _SCALE
            ys = (y - _SHIFT) / _SCALE
            fx = self.model.apply(self.variables, xs)
            fy = self.model.apply(self.variables, ys)
            total = 0.0
            for tx, ty, w in zip(fx, fy, self.lin):
                nx = tx * jax.lax.rsqrt(
                    jnp.sum(tx * tx, axis=-1, keepdims=True) + 1e-10
                )
                ny = ty * jax.lax.rsqrt(
                    jnp.sum(ty * ty, axis=-1, keepdims=True) + 1e-10
                )
                d = (nx - ny) ** 2  # [B, H, W, C]
                total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
            return total

        self._dist = _dist

    def __call__(self, images1: jnp.ndarray, images2: jnp.ndarray) -> np.ndarray:
        """Per-pair LPIPS for [B,H,W,C] images in [-1, 1] (C=1 repeated)."""
        x = jnp.asarray(images1, jnp.float32)
        y = jnp.asarray(images2, jnp.float32)
        if x.ndim == 3:
            x, y = x[None], y[None]
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
            y = jnp.repeat(y, 3, axis=-1)
        return np.asarray(self._dist(x, y))


def load_lpips_weights(path: str, variables: dict):
    """Port alexnet ``features.*`` + lpips ``lin*`` tensors into Flax.

    Accepts ``.npz`` or a torch ``.pth`` combined state dict.  Conv kernels
    OIHW → HWIO; lin heads are the lpips NetLinLayer 1×1 convs
    ``lin{i}.model.1.weight`` with shape [1, C, 1, 1].
    """
    if path.endswith(".npz"):
        state = dict(np.load(path))
    else:
        import torch

        state = {
            k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()
        }

    params = {}
    for i, (_, _, _, _, tname) in enumerate(_ALEX_CONVS):
        w = np.asarray(state[f"{tname}.weight"]).transpose(2, 3, 1, 0)
        b = np.asarray(state[f"{tname}.bias"])
        expect = variables["params"][f"conv{i}"]["kernel"].shape
        assert w.shape == expect, (tname, w.shape, expect)
        params[f"conv{i}"] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    lin = [
        np.maximum(np.asarray(state[f"lin{i}.model.1.weight"]), 0.0).reshape(-1)
        for i in range(5)
    ]
    return {"params": params}, lin


def create_lpips(
    weights_path: Optional[str] = None, seed: int = 0
) -> Tuple[Optional[LPIPSAlex], bool]:
    """Build the Flax LPIPS scorer; (scorer, pretrained?).

    Without a weights file returns a scorer over seeded random features —
    self-consistent perceptual-ish ranking, not calibrated LPIPS (logged by
    the caller).
    """
    model = AlexFeatures()
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
    for path in [weights_path] if weights_path else _weights_search_paths():
        if path and os.path.exists(path):
            try:
                variables, lin = load_lpips_weights(path, variables)
                print(f"[lpips] loaded pretrained weights from {path}")
                return LPIPSAlex(variables, lin), True
            except Exception as e:  # noqa: BLE001
                print(f"[lpips] failed to load weights from {path}: {e}")
    # Random-feature fallback heads: uniform weight per channel.
    lin = [
        np.full((ch,), 1.0 / ch, np.float32) for ch, *_ in _ALEX_CONVS
    ]
    return LPIPSAlex(variables, lin), False

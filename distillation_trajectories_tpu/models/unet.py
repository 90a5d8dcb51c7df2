"""Flax U-Net for diffusion, unified teacher/student architecture.

TPU-native re-design of reference ``models.py:6-242``:

* NHWC layout throughout (TPU conv-friendly); the reference is NCHW torch.
* ``size_factor`` scales base channels ``max(int(128*sf), 16)`` and
  ``time_emb_dim = max(int(256*sf), 16)`` with fixed multipliers
  ``[1, 2, 2, 2]`` (reference models.py:101-110).
* Same topology as the reference, including its quirk: the enc1 skip is
  computed but never concatenated — the decoder uses only x4/x3/x2 skips and a
  final bare upsample (reference models.py:188-224).
* CFG conditioning: ``cond`` is a ``[B, 1]`` scalar embedding input (not class
  labels); its MLP embedding is added to the time embedding.  Instead of the
  reference's ``cond=None`` branch (models.py:182-185) we take an explicit
  ``cond_mask`` multiplier so conditional and unconditional passes share one
  compiled graph — ``cond_mask=0`` reproduces ``cond=None`` exactly, and the
  fused CFG batch ``cond=[0;1], mask=1`` reproduces the trajectory-engine
  formulation (trajectory_engine.py:68-80).
* BatchNorm with mutable ``batch_stats`` matches torch BN train/eval
  semantics (momentum 0.9 in flax == torch momentum 0.1); dropout 0.3 after
  every block (models.py:189-218).
* Bilinear ×2 upsampling with ``align_corners=True`` semantics, implemented
  as two MXU-friendly interpolation matmuls (torch ``nn.Upsample(scale=2,
  bilinear, align_corners=True)`` parity — jax.image.resize uses half-pixel
  centers, which would not match).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch-default kaiming_uniform(a=√5) kernel init: U(±1/√fan_in).

    fan_in = prod(shape[:-1]) covers both Dense (in, out) and NHWC Conv
    (kh, kw, in, out) kernels.  Matches torch nn.Linear/nn.Conv2d defaults so
    init distributions (notably nonzero biases, which make cond=0 ≠ cond=None
    at init) track the reference.
    """
    fan_in = max(int(np.prod(shape[:-1])), 1)
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    """torch-default bias init U(±1/√fan_in)."""
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dense(out_features: int, in_features: int, name: str, dtype) -> nn.Dense:
    return nn.Dense(
        out_features,
        name=name,
        dtype=dtype,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(in_features),
    )


def _conv(out_ch: int, in_ch: int, ksize: int, name: str, dtype, padding=0) -> nn.Conv:
    return nn.Conv(
        out_ch,
        (ksize, ksize),
        padding=padding,
        name=name,
        dtype=dtype,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(in_ch * ksize * ksize),
    )


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal timestep embedding (reference models.py:6-39).

    Keeps the reference's defensive pad/trim for odd ``dim``.
    """
    dim = max(dim, 2)
    half_dim = max(dim // 2, 1)
    scale = math.log(10000.0) / (half_dim - 1 + 1e-8)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
    if t.ndim > 1:
        t = t.reshape(t.shape[0])
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if emb.shape[-1] < dim:
        emb = jnp.pad(emb, ((0, 0), (0, dim - emb.shape[-1])))
    elif emb.shape[-1] > dim:
        emb = emb[:, :dim]
    return emb


def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Linear-interp matrix [out, in] with torch align_corners=True mapping."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for i in range(out_size):
        src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


@partial(jax.jit, static_argnums=(1,))
def upsample_bilinear_x2(x: jnp.ndarray, _factor: int = 2) -> jnp.ndarray:
    """Bilinear ×2 upsample, align_corners=True, NHWC, via interp matmuls."""
    b, h, w, c = x.shape
    dtype = x.dtype
    mh = jnp.asarray(_align_corners_matrix(h, 2 * h), dtype=dtype)
    mw = jnp.asarray(_align_corners_matrix(w, 2 * w), dtype=dtype)
    # [B,H,W,C] -> interpolate H then W via MXU matmuls
    x = jnp.einsum("oh,bhwc->bowc", mh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,bhwc->bhoc", mw, x, precision=jax.lax.Precision.HIGHEST)
    return x


def resize_bilinear_align_corners(x: jnp.ndarray, size) -> jnp.ndarray:
    """General bilinear resize (align_corners=True), NHWC → (size_h, size_w)."""
    b, h, w, c = x.shape
    th, tw = size
    mh = jnp.asarray(_align_corners_matrix(h, th), dtype=x.dtype)
    mw = jnp.asarray(_align_corners_matrix(w, tw), dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,bhwc->bhoc", mw, x, precision=jax.lax.Precision.HIGHEST)
    return x


class Block(nn.Module):
    """Double conv + BatchNorm + ReLU with time-bias and residual projection.

    Reference ``models.py:41-83``: conv3x3 → BN → ReLU → (+ time bias) →
    conv3x3 → BN → ReLU, plus identity/1×1-conv residual.
    """

    out_ch: int
    time_emb_dim: int
    dtype: jnp.dtype = jnp.float32
    norm: str = "batch"

    def _norm(self, name: str):
        if self.norm == "group":
            # Batch-independent normalization: no mutable batch_stats, no
            # train/eval divergence — the TPU-friendly alternative flagged in
            # SURVEY.md §7 (BatchNorm under jit/scan/vmap is the riskiest
            # parity point).  Off by default for reference parity.
            return nn.GroupNorm(
                num_groups=min(32, self.out_ch), name=name, dtype=self.dtype
            )
        return nn.BatchNorm(
            use_running_average=True,  # overridden below for batch mode
            momentum=0.9,
            epsilon=1e-5,
            name=name,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(self, x, time_emb, train: bool = False):
        in_ch = x.shape[-1]
        residual = x
        if in_ch != self.out_ch:
            residual = _conv(
                self.out_ch, in_ch, 1, "residual_conv", self.dtype
            )(x)

        h = _conv(self.out_ch, in_ch, 3, "conv1", self.dtype, padding=1)(x)
        if self.norm == "group":
            h = self._norm("norm1")(h)
        else:
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name="norm1",
                dtype=self.dtype,
            )(h)
        h = nn.relu(h)

        t_bias = nn.relu(
            _dense(self.out_ch, self.time_emb_dim, "time_mlp", self.dtype)(time_emb)
        )
        h = h + t_bias[:, None, None, :]

        h = _conv(self.out_ch, self.out_ch, 3, "conv2", self.dtype, padding=1)(h)
        if self.norm == "group":
            h = self._norm("norm2")(h)
        else:
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name="norm2",
                dtype=self.dtype,
            )(h)
        h = nn.relu(h)
        return h + residual


class DiffusionUNet(nn.Module):
    """Unified teacher/student U-Net (reference models.py:85-224).

    Resolution flow for 32×32 input:
    32 → 16 → 8 → 4 → 2 (bottleneck) → 4 → 8 → 16 → 32.

    Inputs: ``x`` [B,H,W,C] NHWC, ``t`` [B] float/int timesteps, ``cond``
    [B,1] CFG conditioning scalar, ``cond_mask`` [B,1] ∈ {0,1} gating the
    conditioning embedding (0 ≡ the reference's ``cond=None``).
    """

    channels: int = 3
    size_factor: float = 1.0
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32
    # Rematerialize each Block in the backward pass (jax.checkpoint) —
    # trades ~30% extra FLOPs for activation memory, enabling much larger
    # train batches per chip.
    remat: bool = False
    # "batch" (reference parity) or "group" (batch-independent, TPU-friendly).
    norm: str = "batch"
    # Use the enc1 skip with a full-resolution decoder block instead of the
    # reference's final bare upsample (models.py:188-221 computes x1 but
    # never concatenates it).  That bare upsample means the output lives in
    # the half-resolution subspace — iid ε has only ~1/4 of its energy
    # there, capping ε-MSE near 0.75 (measured; see PARITY.md).  Off by
    # default for architecture parity.
    full_res_head: bool = False

    @property
    def time_emb_dim(self) -> int:
        return max(int(256 * self.size_factor), 16)

    @property
    def base_channels(self) -> int:
        return max(int(128 * self.size_factor), 16)

    @property
    def dims(self) -> Sequence[int]:
        base = self.base_channels
        return [max(16, int(base * m)) for m in (1, 2, 2, 2)]

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        cond_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        ted = self.time_emb_dim
        dims = self.dims
        b = x.shape[0]
        x = x.astype(self.dtype)

        # Time embedding: sinusoidal → Linear → ReLU (models.py:120-124)
        if t.ndim > 1:
            t = t.reshape(b, -1)[:, 0]
        temb = sinusoidal_time_embedding(t, ted).astype(self.dtype)
        temb = nn.relu(_dense(ted, ted, "time_dense", self.dtype)(temb))

        # Condition embedding: Linear(1→d) → ReLU → Linear(d→d)
        # (models.py:127-131); always evaluated so params always exist, then
        # masked — cond_mask=0 reproduces the reference's cond=None branch.
        if cond is None:
            cond_in = jnp.zeros((b, 1), dtype=self.dtype)
            mask = jnp.zeros((b, 1), dtype=self.dtype)
        else:
            cond_in = cond.reshape(b, -1)[:, :1].astype(self.dtype)
            mask = (
                jnp.ones((b, 1), dtype=self.dtype)
                if cond_mask is None
                else cond_mask.reshape(b, 1).astype(self.dtype)
            )
        cemb = _dense(ted, 1, "cond_dense1", self.dtype)(cond_in)
        cemb = nn.relu(cemb)
        cemb = _dense(ted, ted, "cond_dense2", self.dtype)(cemb)
        temb = temb + mask * cemb

        drop = lambda h: nn.Dropout(self.dropout, deterministic=not train)(h)
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        BlockCls = nn.remat(Block, static_argnums=(3,)) if self.remat else Block

        # Encoder (models.py:188-198)
        x1 = BlockCls(dims[0], ted, name="enc1", dtype=self.dtype, norm=self.norm)(x, temb, train)
        x1 = drop(x1)
        x2 = BlockCls(dims[1], ted, name="enc2", dtype=self.dtype, norm=self.norm)(pool(x1), temb, train)
        x2 = drop(x2)
        x3 = BlockCls(dims[2], ted, name="enc3", dtype=self.dtype, norm=self.norm)(pool(x2), temb, train)
        x3 = drop(x3)
        x4 = BlockCls(dims[3], ted, name="enc4", dtype=self.dtype, norm=self.norm)(pool(x3), temb, train)
        x4 = drop(x4)

        # Bottleneck (models.py:201)
        h = BlockCls(dims[3], ted, name="bottleneck", dtype=self.dtype, norm=self.norm)(
            pool(x4), temb, train
        )
        h = drop(h)

        # Decoder with skip-concats; note the enc1 skip (x1) is intentionally
        # unused, matching the reference quirk (models.py:188-221).
        h = upsample_bilinear_x2(h)
        h = jnp.concatenate([h, x4], axis=-1)
        h = BlockCls(dims[2], ted, name="dec3", dtype=self.dtype, norm=self.norm)(h, temb, train)
        h = drop(h)

        h = upsample_bilinear_x2(h)
        h = jnp.concatenate([h, x3], axis=-1)
        h = BlockCls(dims[1], ted, name="dec2", dtype=self.dtype, norm=self.norm)(h, temb, train)
        h = drop(h)

        h = upsample_bilinear_x2(h)
        h = jnp.concatenate([h, x2], axis=-1)
        h = BlockCls(dims[0], ted, name="dec1", dtype=self.dtype, norm=self.norm)(h, temb, train)
        h = drop(h)

        h = upsample_bilinear_x2(h)
        if self.full_res_head:
            # dec0: full-resolution block consuming the otherwise-unused
            # enc1 skip, removing the reference's low-frequency output cap.
            h = jnp.concatenate([h, x1], axis=-1)
            h = BlockCls(dims[0], ted, name="dec0", dtype=self.dtype,
                         norm=self.norm)(h, temb, train)
            h = drop(h)
        out = _conv(self.channels, dims[0], 1, "final", self.dtype)(h)
        return out.astype(jnp.float32)


def make_unet(config, size_factor: float = 1.0) -> DiffusionUNet:
    """Build a U-Net from a Config (channels/dropout/compute dtype)."""
    dtype = jnp.bfloat16 if getattr(config, "compute_dtype", "") == "bfloat16" else jnp.float32
    return DiffusionUNet(
        channels=config.channels,
        size_factor=size_factor,
        dropout=config.dropout,
        dtype=dtype,
        remat=bool(getattr(config, "remat", False)),
        norm=getattr(config, "norm", "batch"),
        full_res_head=bool(getattr(config, "full_res_head", False)),
    )


def make_init_fn(model: DiffusionUNet, config, force_jit: Optional[bool] = None):
    """Build the init function ``key -> variables`` for a U-Net.

    On an accelerator backend the init is jitted: eager ``model.init``
    dispatches every initializer as its own device op — measured 81s for
    the sf=1.0 model over the tunneled TPU (hundreds of RTTs) vs 9s for
    one compiled graph.  On CPU eager is faster (no per-op RTT, and the
    test suite would pay a compile per architecture), so it stays eager.

    Exposed separately from :func:`init_unet` so a sweep can ``lower()``
    the init graphs of all its architectures and compile them CONCURRENTLY
    (utils/compile_pool.py) — 13 sequential ~15s init compiles were 25% of
    the r04 students stage.
    """
    x = jnp.zeros((1, config.image_size, config.image_size, config.channels))
    t = jnp.zeros((1,), dtype=jnp.float32)
    cond = jnp.zeros((1, 1))

    def init(k):
        return model.init(
            {"params": k}, x, t, cond=cond, cond_mask=jnp.zeros((1, 1)),
            train=False,
        )

    jit_it = (jax.default_backend() != "cpu") if force_jit is None else force_jit
    return jax.jit(init) if jit_it else init


def init_unet(model: DiffusionUNet, config, key: jax.Array):
    """Initialize params + batch_stats for a U-Net (see make_init_fn)."""
    return make_init_fn(model, config)(key)


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def param_size_mb(params) -> float:
    """Model size in MB assuming float32 storage (ref train_students.py:91-105)."""
    return param_count(params) * 4 / (1024 * 1024)


# Aliases for reference API parity (models.py:227-242)
def SimpleUNet(config) -> DiffusionUNet:
    """Teacher alias: size_factor=1.0 (reference models.py:227-232)."""
    return make_unet(config, size_factor=1.0)


def StudentUNet(config, size_factor: float = 1.0, architecture_type=None) -> DiffusionUNet:
    """Student alias; ``architecture_type`` ignored (reference models.py:234-242)."""
    return make_unet(config, size_factor=size_factor)

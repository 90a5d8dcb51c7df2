"""int8 quantized-inference lane for the diffusion U-Net sampler.

Motivation (PERFORMANCE.md round-2 ablation): the engine sampler is
compute-bound — the two CFG U-Net forwards are 96.9% of step time at ~61%
MFU in bfloat16, i.e. at the bf16 hardware roofline.  The v5e MXU executes
int8×int8→int32 at 2× its bf16 peak, so quantized forwards are the one
remaining *throughput* axis that does not change the number of forwards
(the progressive/w-conditioned students cover the fewer-forwards axis).

Scheme (inference-only, opt-in via ``Config.sampler_quant="int8"``):

* **BatchNorm folding** — at eval time BN is the affine
  ``y = (x−μ)·γ/√(σ²+ε) + β`` per channel, so conv→BN folds into a single
  conv with scaled kernel and adjusted bias (classic inference fusion; the
  reference has no analog — torch ``models.py:41-83`` keeps BN separate).
* **Weights**: per-output-channel symmetric int8 — ``s_w[o] =
  max|W[..,o]|/127``.  Per-channel scales cost one [O] multiply at dequant
  and keep the quantization error per channel instead of per layer.
* **Activations**: dynamic per-tensor symmetric int8 — ``s_x = max|x|/127``
  computed on the fly.  One reduction per conv, negligible next to the conv
  itself; avoids any calibration dataset.
* Conv arithmetic is ``int8 × int8 → int32`` (``preferred_element_type``),
  dequantized as ``int32 · (s_x · s_w[o]) + b_folded[o]``.  int32
  accumulation is exact (max |acc| ≤ 127²·9·C_in ≪ 2³¹).
* Only the Block convs (conv1/conv2 3×3 and the 1×1 residual projection)
  are quantized — they carry ~99% of the FLOPs.  The time/cond MLPs, the
  interpolation matmuls, and the final 1×1 conv stay in the model dtype.

The fold + quantize runs *inside* the sampler's jitted graph
(:func:`make_quantized_eval_fn`), so the checkpoint variables still ride as
plain jit arguments (the round-3 no-closure-constants rule) and the cost is
one params-sized elementwise pass per sampler call, amortized over the
T-step ``lax.scan``.

Known headroom, intentionally not taken: conv2's input is post-ReLU
(non-negative), so an asymmetric/uint8 scheme would recover one bit there;
symmetric keeps the MXU path uniform and the code auditable.

This is forward/inference quantization only — training and the reference
parity contract are untouched (the lane is off by default everywhere).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .unet import DiffusionUNet, sinusoidal_time_embedding, upsample_bilinear_x2

_BN_EPS = 1e-5  # must match Block's nn.BatchNorm(epsilon=...)


def _block_names(model: DiffusionUNet):
    names = ["enc1", "enc2", "enc3", "enc4", "bottleneck", "dec3", "dec2", "dec1"]
    if model.full_res_head:
        names.append("dec0")
    return names


def _quant_weight(w: jnp.ndarray, nbits: Optional[int]):
    """Per-output-channel symmetric quantization of an HWIO kernel."""
    if nbits is None:  # fold-only float twin (test harness)
        return {"w": w, "scale": jnp.ones((w.shape[-1],), jnp.float32)}
    qmax = float(2 ** (nbits - 1) - 1)
    s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / qmax
    s = jnp.maximum(s.astype(jnp.float32), 1e-12)
    wq = jnp.clip(jnp.round(w / s), -qmax, qmax).astype(jnp.int8)
    return {"w_int8": wq, "scale": s}


def quantize_unet_variables(
    model: DiffusionUNet, variables: Dict[str, Any], nbits: Optional[int] = 8
) -> Dict[str, Any]:
    """Fold eval-mode BatchNorm into the Block convs and quantize them.

    Pure/traceable — called inside the sampler jit so variables stay args.
    ``nbits=None`` returns the folded *float* tree (the exactness twin used
    by tests to pin this forward against ``model.apply``).
    """
    if model.norm != "batch":
        raise ValueError(
            "sampler_quant requires norm='batch': GroupNorm is input-"
            "dependent and cannot be folded into the conv at inference"
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    out: Dict[str, Any] = {
        "time_dense": params["time_dense"],
        "cond_dense1": params["cond_dense1"],
        "cond_dense2": params["cond_dense2"],
        "final": params["final"],
        "blocks": {},
    }
    for name in _block_names(model):
        p = params[name]
        bs = batch_stats[name]
        blk: Dict[str, Any] = {"time_mlp": p["time_mlp"]}
        for conv, norm in (("conv1", "norm1"), ("conv2", "norm2")):
            gamma = p[norm]["scale"].astype(jnp.float32)
            beta = p[norm]["bias"].astype(jnp.float32)
            mean = bs[norm]["mean"].astype(jnp.float32)
            var = bs[norm]["var"].astype(jnp.float32)
            f = gamma * jax.lax.rsqrt(var + _BN_EPS)  # [O]
            w = p[conv]["kernel"].astype(jnp.float32) * f  # fold into kernel
            b = (p[conv]["bias"].astype(jnp.float32) - mean) * f + beta
            q = _quant_weight(w, nbits)
            q["bias"] = b
            blk[conv] = q
        if "residual_conv" in p:  # 1×1 projection, no BN to fold
            q = _quant_weight(p["residual_conv"]["kernel"].astype(jnp.float32), nbits)
            q["bias"] = p["residual_conv"]["bias"].astype(jnp.float32)
            blk["residual"] = q
        out["blocks"][name] = blk
    return out


def _aquant(x: jnp.ndarray):
    """Dynamic per-tensor symmetric int8 activation quantization."""
    s = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127.0, 127.0)
    return xq.astype(jnp.int8), s


def _qconv(q: Dict[str, Any], xq, s_x, padding) -> jnp.ndarray:
    """int8×int8→int32 conv, dequantized to float32 (+ folded bias).

    In the fold-only float twin (``nbits=None``) ``xq`` is the raw float
    activation and ``s_x`` is None — a plain float conv over the folded
    kernel, used by tests to pin this forward against ``model.apply``.
    """
    if "w_int8" in q:
        acc = jax.lax.conv_general_dilated(
            xq,
            q["w_int8"],
            (1, 1),
            padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * (s_x * q["scale"])
    else:
        out = jax.lax.conv_general_dilated(
            xq.astype(q["w"].dtype),
            q["w"],
            (1, 1),
            padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
    return out + q["bias"]


def _dense(p: Dict[str, Any], x: jnp.ndarray, dtype) -> jnp.ndarray:
    """nn.Dense-equivalent (cast params+input to dtype, matmul, bias)."""
    return (
        jnp.dot(x.astype(dtype), p["kernel"].astype(dtype))
        + p["bias"].astype(dtype)
    )


def _qblock(blk: Dict[str, Any], x: jnp.ndarray, temb: jnp.ndarray, dtype):
    """Quantized Block forward (models/unet.py::Block eval semantics)."""
    pad1 = ((1, 1), (1, 1))
    quant = "w_int8" in blk["conv1"]
    xq, s_x = _aquant(x) if quant else (x, None)
    if "residual" in blk:
        residual = _qconv(blk["residual"], xq, s_x, ((0, 0), (0, 0)))
    else:
        residual = x.astype(jnp.float32)

    h = jax.nn.relu(_qconv(blk["conv1"], xq, s_x, pad1))
    t_bias = jax.nn.relu(_dense(blk["time_mlp"], temb, dtype)).astype(jnp.float32)
    h = h + t_bias[:, None, None, :]
    hq, s_h = _aquant(h) if quant else (h, None)
    h = jax.nn.relu(_qconv(blk["conv2"], hq, s_h, pad1))
    return (h + residual).astype(dtype)


def quantized_unet_apply(
    model: DiffusionUNet,
    qvars: Dict[str, Any],
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond: Optional[jnp.ndarray] = None,
    cond_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Eval-mode forward over a folded/quantized tree.

    Mirrors ``DiffusionUNet.__call__`` (models/unet.py) with train=False:
    dropout is identity, BN is folded away, topology (including the unused
    enc1 skip and the optional ``full_res_head`` dec0) is identical.  Kept
    in lockstep by tests/test_quantized.py::test_fold_only_matches_float.
    """
    dtype = model.dtype
    ted = model.time_emb_dim
    dims = model.dims
    b = x.shape[0]
    x = x.astype(dtype)
    blocks = qvars["blocks"]

    if t.ndim > 1:
        t = t.reshape(b, -1)[:, 0]
    temb = sinusoidal_time_embedding(t, ted).astype(dtype)
    temb = jax.nn.relu(_dense(qvars["time_dense"], temb, dtype))

    if cond is None:
        cond_in = jnp.zeros((b, 1), dtype=dtype)
        mask = jnp.zeros((b, 1), dtype=dtype)
    else:
        cond_in = cond.reshape(b, -1)[:, :1].astype(dtype)
        mask = (
            jnp.ones((b, 1), dtype=dtype)
            if cond_mask is None
            else cond_mask.reshape(b, 1).astype(dtype)
        )
    cemb = jax.nn.relu(_dense(qvars["cond_dense1"], cond_in, dtype))
    cemb = _dense(qvars["cond_dense2"], cemb, dtype)
    temb = temb + mask * cemb

    pool = lambda h: jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )

    x1 = _qblock(blocks["enc1"], x, temb, dtype)
    x2 = _qblock(blocks["enc2"], pool(x1), temb, dtype)
    x3 = _qblock(blocks["enc3"], pool(x2), temb, dtype)
    x4 = _qblock(blocks["enc4"], pool(x3), temb, dtype)
    h = _qblock(blocks["bottleneck"], pool(x4), temb, dtype)

    h = upsample_bilinear_x2(h)
    h = _qblock(blocks["dec3"], jnp.concatenate([h, x4], axis=-1), temb, dtype)
    h = upsample_bilinear_x2(h)
    h = _qblock(blocks["dec2"], jnp.concatenate([h, x3], axis=-1), temb, dtype)
    h = upsample_bilinear_x2(h)
    h = _qblock(blocks["dec1"], jnp.concatenate([h, x2], axis=-1), temb, dtype)
    h = upsample_bilinear_x2(h)
    if model.full_res_head:
        h = _qblock(blocks["dec0"], jnp.concatenate([h, x1], axis=-1), temb, dtype)

    fin = qvars["final"]
    out = jax.lax.conv_general_dilated(
        h.astype(dtype),
        fin["kernel"].astype(dtype),
        (1, 1),
        ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + fin["bias"].astype(dtype)
    return out.astype(jnp.float32)


def make_quantized_eval_fn(model: DiffusionUNet, variables, nbits: Optional[int] = 8):
    """Drop-in for ``make_eval_model_fn`` with int8 quantized Block convs.

    Must be called in a traced context (inside the sampler's jit): the fold
    + quantize become loop-invariant graph ops executed once per sampler
    call — variables remain jit arguments, never closure constants.
    """
    qvars = quantize_unet_variables(model, variables, nbits=nbits)

    def model_fn(x, t, cond=None, cond_mask=None):
        return quantized_unet_apply(model, qvars, x, t, cond, cond_mask)

    return model_fn

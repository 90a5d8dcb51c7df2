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
* **Activations**: per-tensor symmetric int8.  Two modes:

  - *dynamic* (default) — ``s_x = max|x|/127`` computed on the fly.  No
    calibration data needed, but the full-tensor max-reduction before EACH
    conv cannot fuse into it (an extra activation read + a serialization
    point per conv — round-4's measured 1.18× vs the 2× MXU premise made
    these reductions suspect #1).
  - *static* — scales calibrated once per checkpoint
    (:func:`calibrate_activation_scales` records max|x| at every quant site
    over calibration batches) ride as host-float constants, removing every
    per-conv reduction from the sampler graph.

* **Mixed precision** — ``quant_blocks`` restricts int8 to a subset of
  Blocks; the rest run the folded-float (model-dtype) path.  The deep 4×4 /
  2×2 levels are latency- not FLOP-bound, so quantizing them buys nothing
  and costs requant overhead.
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
    model: DiffusionUNet,
    variables: Dict[str, Any],
    nbits: Optional[int] = 8,
    quant_blocks: Optional[set] = None,
) -> Dict[str, Any]:
    """Fold eval-mode BatchNorm into the Block convs and quantize them.

    Pure/traceable — called inside the sampler jit so variables stay args.
    ``nbits=None`` returns the folded *float* tree (the exactness twin used
    by tests to pin this forward against ``model.apply``).
    ``quant_blocks`` (a set of Block names) restricts quantization to those
    Blocks, leaving the rest on the folded-float path (mixed precision).
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
        blk_nbits = (
            nbits if quant_blocks is None or name in quant_blocks else None
        )
        blk: Dict[str, Any] = {"time_mlp": p["time_mlp"]}
        for conv, norm in (("conv1", "norm1"), ("conv2", "norm2")):
            gamma = p[norm]["scale"].astype(jnp.float32)
            beta = p[norm]["bias"].astype(jnp.float32)
            mean = bs[norm]["mean"].astype(jnp.float32)
            var = bs[norm]["var"].astype(jnp.float32)
            f = gamma * jax.lax.rsqrt(var + _BN_EPS)  # [O]
            w = p[conv]["kernel"].astype(jnp.float32) * f  # fold into kernel
            b = (p[conv]["bias"].astype(jnp.float32) - mean) * f + beta
            q = _quant_weight(w, blk_nbits)
            q["bias"] = b
            blk[conv] = q
        if "residual_conv" in p:  # 1×1 projection, no BN to fold
            q = _quant_weight(
                p["residual_conv"]["kernel"].astype(jnp.float32), blk_nbits)
            q["bias"] = p["residual_conv"]["bias"].astype(jnp.float32)
            blk["residual"] = q
        out["blocks"][name] = blk
    return out


def _aquant(x: jnp.ndarray, static_scale: Optional[float] = None):
    """Per-tensor symmetric int8 activation quantization.

    ``static_scale`` (a host float from :func:`calibrate_activation_scales`)
    skips the dynamic max-reduction — the scale becomes an inline constant
    and the round/clip fuses into the preceding producer.
    """
    if static_scale is not None:
        s = max(float(static_scale), 1e-12)
    else:
        s = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127.0, 127.0)
    return xq.astype(jnp.int8), s


def _qconv(q: Dict[str, Any], xq, s_x, padding, dtype=jnp.float32) -> jnp.ndarray:
    """int8×int8→int32 conv, dequantized to float32 (+ folded bias).

    In the fold-only float path (``nbits=None`` globally, or a Block left
    out of ``quant_blocks``) ``xq`` is the raw float activation and ``s_x``
    is None — a plain ``dtype`` conv over the folded kernel; with a float32
    model this is the exactness twin tests pin against ``model.apply``.
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
            xq.astype(dtype),
            q["w"].astype(dtype),
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


def _qblock(
    blk: Dict[str, Any],
    x: jnp.ndarray,
    temb: jnp.ndarray,
    dtype,
    scales: Optional[Dict[str, float]] = None,
    collect: Optional[Dict[str, jnp.ndarray]] = None,
    name: str = "",
):
    """Quantized Block forward (models/unet.py::Block eval semantics).

    ``scales``: optional static activation scales {"in": s, "mid": s} (host
    floats).  ``collect``: when given, records max|activation| tracers at
    both quant sites instead of relying on dynamic scales — the calibration
    hook behind :func:`calibrate_activation_scales`.
    """
    pad1 = ((1, 1), (1, 1))
    quant = "w_int8" in blk["conv1"]
    if collect is not None:
        collect[f"{name}:in"] = jnp.max(jnp.abs(x)).astype(jnp.float32)
    s_in = scales.get("in") if scales else None
    xq, s_x = _aquant(x, s_in) if quant else (x, None)
    if "residual" in blk:
        residual = _qconv(blk["residual"], xq, s_x, ((0, 0), (0, 0)), dtype)
    else:
        residual = x.astype(jnp.float32)

    h = jax.nn.relu(_qconv(blk["conv1"], xq, s_x, pad1, dtype))
    t_bias = jax.nn.relu(_dense(blk["time_mlp"], temb, dtype)).astype(jnp.float32)
    h = h + t_bias[:, None, None, :]
    if collect is not None:
        collect[f"{name}:mid"] = jnp.max(jnp.abs(h)).astype(jnp.float32)
    s_mid = scales.get("mid") if scales else None
    hq, s_h = _aquant(h, s_mid) if quant else (h, None)
    h = jax.nn.relu(_qconv(blk["conv2"], hq, s_h, pad1, dtype))
    return (h + residual).astype(dtype)


def quantized_unet_apply(
    model: DiffusionUNet,
    qvars: Dict[str, Any],
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond: Optional[jnp.ndarray] = None,
    cond_mask: Optional[jnp.ndarray] = None,
    act_scales: Optional[Dict[str, Dict[str, float]]] = None,
    collect: Optional[Dict[str, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Eval-mode forward over a folded/quantized tree.

    Mirrors ``DiffusionUNet.__call__`` (models/unet.py) with train=False:
    dropout is identity, BN is folded away, topology (including the unused
    enc1 skip and the optional ``full_res_head`` dec0) is identical.  Kept
    in lockstep by tests/test_quantized.py::test_fold_only_matches_float.

    ``act_scales``: static per-site activation scales
    ``{block: {"in": s, "mid": s}}`` as HOST floats (inline constants — the
    round-3 rule forbids closed-over DEVICE arrays, not host scalars).
    ``collect``: calibration hook — a dict that receives max|activation|
    tracers at every quant site (:func:`calibrate_activation_scales`).
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

    def qb(name, h_in):
        return _qblock(
            blocks[name], h_in, temb, dtype,
            scales=(act_scales or {}).get(name), collect=collect, name=name,
        )

    x1 = qb("enc1", x)
    x2 = qb("enc2", pool(x1))
    x3 = qb("enc3", pool(x2))
    x4 = qb("enc4", pool(x3))
    h = qb("bottleneck", pool(x4))

    h = upsample_bilinear_x2(h)
    h = qb("dec3", jnp.concatenate([h, x4], axis=-1))
    h = upsample_bilinear_x2(h)
    h = qb("dec2", jnp.concatenate([h, x3], axis=-1))
    h = upsample_bilinear_x2(h)
    h = qb("dec1", jnp.concatenate([h, x2], axis=-1))
    h = upsample_bilinear_x2(h)
    if model.full_res_head:
        h = qb("dec0", jnp.concatenate([h, x1], axis=-1))

    fin = qvars["final"]
    out = jax.lax.conv_general_dilated(
        h.astype(dtype),
        fin["kernel"].astype(dtype),
        (1, 1),
        ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + fin["bias"].astype(dtype)
    return out.astype(jnp.float32)


def make_quantized_eval_fn(
    model: DiffusionUNet,
    variables,
    nbits: Optional[int] = 8,
    act_scales: Optional[Dict[str, Dict[str, float]]] = None,
    quant_blocks: Optional[set] = None,
):
    """Drop-in for ``make_eval_model_fn`` with int8 quantized Block convs.

    Must be called in a traced context (inside the sampler's jit): the fold
    + quantize become loop-invariant graph ops executed once per sampler
    call — variables remain jit arguments, never closure constants.

    ``act_scales`` switches the activations to static calibrated scales
    (host floats, see :func:`calibrate_activation_scales`); ``quant_blocks``
    restricts int8 to that subset of Blocks (mixed precision).
    """
    qvars = quantize_unet_variables(
        model, variables, nbits=nbits, quant_blocks=quant_blocks)

    def model_fn(x, t, cond=None, cond_mask=None):
        return quantized_unet_apply(
            model, qvars, x, t, cond, cond_mask, act_scales=act_scales)

    return model_fn


def calibrate_activation_scales(
    model: DiffusionUNet,
    variables,
    xs: jnp.ndarray,
    ts: jnp.ndarray,
    conds: Optional[jnp.ndarray] = None,
    cond_masks: Optional[jnp.ndarray] = None,
    margin: float = 1.0,
) -> Dict[str, Dict[str, float]]:
    """Calibrate static per-site activation scales on a batch set.

    ``xs``/``ts`` (and optional ``conds``/``cond_masks``) carry a leading
    calibration axis: for each entry the fold-only forward records
    max|activation| at every quant site; the scale is the max over the set,
    ``s = margin · max/127``, returned as HOST floats so they become inline
    scalar constants of the sampler graph (no per-conv reductions, no
    closed-over device arrays).  Calibrate on states that span the sampler's
    t-range — activations grow toward the noisy end of the chain; values
    above ``s·127`` at runtime clip.
    """
    import numpy as np

    q_float = quantize_unet_variables(model, variables, nbits=None)

    @jax.jit
    def one(v_q, x, t, cond, mask):
        rec: Dict[str, jnp.ndarray] = {}
        quantized_unet_apply(model, v_q, x, t, cond, mask, collect=rec)
        return rec

    agg: Dict[str, float] = {}
    n = xs.shape[0]
    for i in range(n):
        cond = None if conds is None else conds[i]
        mask = None if cond_masks is None else cond_masks[i]
        rec = jax.device_get(one(q_float, xs[i], ts[i], cond, mask))
        for k, v in rec.items():
            agg[k] = max(agg.get(k, 0.0), float(v))
    scales: Dict[str, Dict[str, float]] = {}
    for k, v in agg.items():
        name, site = k.split(":")
        scales.setdefault(name, {})[site] = float(
            np.maximum(margin * v / 127.0, 1e-12))
    return scales

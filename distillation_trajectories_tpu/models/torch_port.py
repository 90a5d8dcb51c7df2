"""Import reference torch ``DiffusionUNet`` checkpoints into the Flax U-Net.

The reference saves bare ``model.state_dict()`` files (reference
``scripts/train_teacher.py:86``, ``scripts/train_students.py:187``); anyone
migrating from it has directories of ``model_epoch_{e}.pt`` /
``model_size_{sf}.pt`` teachers and students.  This module maps those state
dicts onto our :class:`~distillation_trajectories_tpu.models.unet.DiffusionUNet`
variable tree so reference-trained models run unchanged on TPU — the same
migration lane as :mod:`..models.inception`'s torchvision port, proven by
``tests/test_unet_torch_port.py``'s output-parity check against the actual
reference model.

Key mapping (reference ``models.py:95-157`` → ``models/unet.py``):

=====================  ==========================================
reference state dict    Flax variable tree
=====================  ==========================================
``time_mlp.1``          ``params/time_dense``      (Linear: kernel = Wᵀ)
``cond_emb.0``          ``params/cond_dense1``
``cond_emb.2``          ``params/cond_dense2``
``{b}.time_mlp``        ``params/{b}/time_mlp``    for b ∈ enc1..enc4,
``{b}.conv1``           ``params/{b}/conv1``       bottleneck, dec3,
``{b}.norm1``           ``params/{b}/norm1``       dec2, dec1
                        + ``batch_stats/{b}/norm1``
``{b}.conv2/.norm2``    likewise
``{b}.residual_conv``   ``params/{b}/residual_conv``  (in_ch ≠ out_ch only)
``final``               ``params/final``
=====================  ==========================================

Conv kernels transpose OIHW → HWIO; Linear weights transpose (out, in) →
(in, out); BatchNorm ``weight``/``bias`` become ``scale``/``bias`` and the
running statistics land in ``batch_stats``.  ``num_batches_tracked`` is
torch bookkeeping with no Flax counterpart and is ignored.  Every other
state-dict entry must be consumed and every Flax leaf filled — a mismatch
raises instead of silently producing a half-ported model.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "unet_variables_from_torch_state_dict",
    "unet_torch_state_dict_from_variables",
    "infer_size_factor",
    "import_reference_unet_checkpoint",
]

# Our top-level Dense modules -> reference Sequential entries.
_DENSE_MAP = {
    "time_dense": "time_mlp.1",
    "cond_dense1": "cond_emb.0",
    "cond_dense2": "cond_emb.2",
}


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _take(state_dict: Dict[str, Any], used: set, key: str,
          expect_shape: Tuple[int, ...], transform=None) -> np.ndarray:
    if key not in state_dict:
        raise KeyError(
            f"torch state dict is missing '{key}' — is this a reference "
            "DiffusionUNet checkpoint of the right size_factor?"
        )
    arr = _to_np(state_dict[key])
    if transform is not None:
        arr = transform(arr)
    if tuple(arr.shape) != tuple(expect_shape):
        raise ValueError(
            f"shape mismatch porting '{key}': torch gives {arr.shape} after "
            f"layout transform, Flax expects {expect_shape} — wrong "
            "size_factor / channels / full_res_head for this checkpoint?"
        )
    used.add(key)
    return arr


def unet_variables_from_torch_state_dict(
    state_dict: Dict[str, Any], variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Fill a freshly-initialized U-Net variable tree from a reference
    torch state dict.

    ``variables`` supplies the target tree structure and shapes (from
    :func:`..models.unet.init_unet`); returns a new tree of float32 numpy
    leaves.  Raises on missing keys, shape mismatches, or unconsumed
    state-dict entries.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(variables))
    used: set = set()
    out = {}
    for key, val in flat.items():
        col, *path, leaf = key
        shape = tuple(val.shape)
        if col == "params" and len(path) == 0 and leaf in ("kernel", "bias"):
            # Top-level Dense (time/cond MLPs) or the final 1x1 Conv.
            raise ValueError(f"unexpected top-level param leaf: {key}")
        if col == "params" and len(path) == 1 and path[0] in _DENSE_MAP:
            tname = _DENSE_MAP[path[0]]
            if leaf == "kernel":
                out[key] = _take(state_dict, used, f"{tname}.weight", shape,
                                 lambda a: a.T)
            else:
                out[key] = _take(state_dict, used, f"{tname}.bias", shape)
        elif col == "params" and len(path) == 1 and path[0] == "final":
            if leaf == "kernel":
                out[key] = _take(state_dict, used, "final.weight", shape,
                                 lambda a: a.transpose(2, 3, 1, 0))
            else:
                out[key] = _take(state_dict, used, "final.bias", shape)
        elif len(path) == 2:
            blk, sub = path
            if sub in ("conv1", "conv2", "residual_conv"):
                tleaf = "weight" if leaf == "kernel" else "bias"
                out[key] = _take(
                    state_dict, used, f"{blk}.{sub}.{tleaf}", shape,
                    (lambda a: a.transpose(2, 3, 1, 0))
                    if leaf == "kernel" else None,
                )
            elif sub == "time_mlp":
                tleaf = "weight" if leaf == "kernel" else "bias"
                out[key] = _take(
                    state_dict, used, f"{blk}.{sub}.{tleaf}", shape,
                    (lambda a: a.T) if leaf == "kernel" else None,
                )
            elif sub in ("norm1", "norm2") and col == "params":
                tleaf = {"scale": "weight", "bias": "bias"}[leaf]
                out[key] = _take(state_dict, used, f"{blk}.{sub}.{tleaf}", shape)
            elif sub in ("norm1", "norm2") and col == "batch_stats":
                tleaf = {"mean": "running_mean", "var": "running_var"}[leaf]
                out[key] = _take(state_dict, used, f"{blk}.{sub}.{tleaf}", shape)
            else:
                raise ValueError(f"no torch mapping for variable {key}")
        else:
            raise ValueError(f"no torch mapping for variable {key}")

    leftovers = {
        k for k in state_dict
        if k not in used and not k.endswith("num_batches_tracked")
    }
    if leftovers:
        raise ValueError(
            "torch state dict entries with no Flax counterpart (wrong "
            f"architecture for this checkpoint?): {sorted(leftovers)[:8]}"
        )
    return flax.traverse_util.unflatten_dict(out)


def unet_torch_state_dict_from_variables(
    variables: Dict[str, Any]
) -> Dict[str, np.ndarray]:
    """Inverse port: our variable tree -> a reference-loadable state dict.

    Makes migration bidirectional — a TPU-trained teacher/student can be
    handed back to the reference's torch tooling via
    ``ref_model.load_state_dict({k: torch.from_numpy(v) ...})``.  Returns
    float32 numpy values (torch-convention layouts); ``num_batches_tracked``
    entries are emitted as zeros since Flax keeps no such counter.
    Round-trip identity is pinned by ``tests/test_unet_torch_port.py``.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(variables))
    state: Dict[str, np.ndarray] = {}
    for key, val in flat.items():
        col, *path, leaf = key
        arr = np.asarray(val, dtype=np.float32)
        if col == "params" and len(path) == 1 and path[0] in _DENSE_MAP:
            tname = _DENSE_MAP[path[0]]
            state[f"{tname}.{'weight' if leaf == 'kernel' else 'bias'}"] = (
                arr.T if leaf == "kernel" else arr
            )
        elif col == "params" and len(path) == 1 and path[0] == "final":
            state[f"final.{'weight' if leaf == 'kernel' else 'bias'}"] = (
                arr.transpose(3, 2, 0, 1) if leaf == "kernel" else arr
            )
        elif len(path) == 2:
            blk, sub = path
            if sub in ("conv1", "conv2", "residual_conv"):
                state[f"{blk}.{sub}.{'weight' if leaf == 'kernel' else 'bias'}"] = (
                    arr.transpose(3, 2, 0, 1) if leaf == "kernel" else arr
                )
            elif sub == "time_mlp":
                state[f"{blk}.{sub}.{'weight' if leaf == 'kernel' else 'bias'}"] = (
                    arr.T if leaf == "kernel" else arr
                )
            elif sub in ("norm1", "norm2") and col == "params":
                tleaf = {"scale": "weight", "bias": "bias"}[leaf]
                state[f"{blk}.{sub}.{tleaf}"] = arr
            elif sub in ("norm1", "norm2") and col == "batch_stats":
                tleaf = {"mean": "running_mean", "var": "running_var"}[leaf]
                state[f"{blk}.{sub}.{tleaf}"] = arr
                if tleaf == "running_var":
                    state[f"{blk}.{sub}.num_batches_tracked"] = np.zeros(
                        (), dtype=np.int64
                    )
            else:
                raise ValueError(f"no torch mapping for variable {key}")
        else:
            raise ValueError(f"no torch mapping for variable {key}")
    return state


def infer_size_factor(state_dict: Dict[str, Any]) -> Optional[float]:
    """Best-effort ``size_factor`` from a reference state dict's shapes.

    Scans sf ∈ {0.01, 0.02, …, 2.00} for values reproducing BOTH
    ``base_channels = max(int(128·sf), 16)`` (enc1.conv1 out-channels) and
    ``time_emb_dim = max(int(256·sf), 16)`` (time_mlp.1 out-features,
    reference models.py:101-104).  Both dims hit the 16 floor for every
    sf ≤ 0.06, so checkpoints in that region are indistinguishable by
    shape: raises ValueError listing the candidates instead of guessing
    (the produced weights would be identical, but the checkpoint would be
    saved under the wrong ``size_{sf}`` directory and silently shadow a
    different student).  Returns None when nothing matches (pass an
    explicit --size_factor either way).
    """
    base = int(_to_np(state_dict["enc1.conv1.weight"]).shape[0])
    ted = int(_to_np(state_dict["time_mlp.1.weight"]).shape[0])
    matches = [
        i / 100.0
        for i in range(1, 201)
        if max(int(128 * (i / 100.0)), 16) == base
        and max(int(256 * (i / 100.0)), 16) == ted
    ]
    if len(matches) > 1:
        raise ValueError(
            f"size_factor is ambiguous from shapes (base={base}, "
            f"time_emb={ted}): any of {matches} builds this architecture; "
            "pass --size_factor explicitly"
        )
    return matches[0] if matches else None


def import_reference_unet_checkpoint(
    path: str, config, size_factor: Optional[float] = None
) -> Tuple[Any, Dict[str, Any]]:
    """Load a reference ``.pt`` state dict as (model, variables).

    ``size_factor=None`` infers it from the tensor shapes.  Returned
    variables are float32 numpy trees; callers that feed jit directly
    should device-materialize (``variables_from_checkpoint`` rationale).
    """
    import jax
    import torch

    from .unet import init_unet, make_unet

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    if size_factor is None:
        size_factor = infer_size_factor(sd)
        if size_factor is None:
            raise ValueError(
                f"could not infer size_factor from {path}; pass it explicitly"
            )
        print(f"[torch-port] inferred size_factor={size_factor}")
    model = make_unet(config, size_factor=size_factor)
    variables = init_unet(model, config, jax.random.PRNGKey(0))
    return model, unet_variables_from_torch_state_dict(sd, variables)

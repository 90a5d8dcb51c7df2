"""Checkpoint save/load preserving the reference's naming contract.

Reference: ``torch.save(model.state_dict())`` to ``model_epoch_{e}.pt``
(train_teacher.py:85-86) and ``students/size_{sf}/model_epoch_{e}.pt``
(train_students.py:179-187), with latest-epoch discovery by filename parsing
(analyze_trajectory_metrics.py:483-489).

Here checkpoints are single msgpack files ``model_epoch_{e}.msgpack``
containing params + batch_stats + (fixing a reference gap) optimizer state
and epoch, serialized with flax.  The ``model_epoch_{e}`` stem and per-size
directory layout are preserved so filename-parsing discovery works
identically.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

CKPT_RE = re.compile(r"model_epoch_(\d+)\.(msgpack|pt)$")


def _to_numpy(tree):
    # to_state_dict converts NamedTuple optimizer states (optax) into plain
    # dicts so the whole payload is msgpack-serializable.
    tree = serialization.to_state_dict(tree)
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def checkpoint_path(directory: str, epoch: int) -> str:
    return os.path.join(directory, f"model_epoch_{epoch}.msgpack")


def save_checkpoint(
    directory: str,
    epoch: int,
    params: Any,
    batch_stats: Any = None,
    opt_state: Any = None,
    ema_params: Any = None,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Save a model checkpoint as ``{directory}/model_epoch_{epoch}.msgpack``."""
    os.makedirs(directory, exist_ok=True)
    payload = {"epoch": epoch, "params": _to_numpy(params)}
    if batch_stats is not None:
        payload["batch_stats"] = _to_numpy(batch_stats)
    if opt_state is not None:
        payload["opt_state"] = _to_numpy(opt_state)
    if ema_params is not None:
        payload["ema_params"] = _to_numpy(ema_params)
    if extra:
        payload["extra"] = extra
    path = checkpoint_path(directory, epoch)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    return path


def available_epochs(directory: str):
    """All epochs with checkpoints in ``directory``, ascending."""
    if not os.path.isdir(directory):
        return []
    epochs = []
    for name in os.listdir(directory):
        m = CKPT_RE.search(name)
        if m:
            epochs.append(int(m.group(1)))
    return sorted(set(epochs))


def latest_epoch(directory: str) -> Optional[int]:
    """Latest checkpoint epoch by filename parse (ref analyze_trajectory_metrics.py:483-489)."""
    epochs = available_epochs(directory)
    return epochs[-1] if epochs else None


def load_checkpoint(directory: str, epoch: Optional[int] = None) -> Dict[str, Any]:
    """Load ``model_epoch_{epoch}`` (or the latest when ``epoch`` is None)."""
    if epoch is None:
        epoch = latest_epoch(directory)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints found in {directory}")
    path = checkpoint_path(directory, epoch)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload


def variables_from_checkpoint(payload: Dict[str, Any]) -> Dict[str, Any]:
    """Flax variables dict ({'params', 'batch_stats'}) from a checkpoint payload."""
    variables = {"params": payload["params"]}
    if "batch_stats" in payload:
        variables["batch_stats"] = payload["batch_stats"]
    return variables

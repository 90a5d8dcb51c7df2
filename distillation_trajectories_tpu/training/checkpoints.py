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

import concurrent.futures
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

CKPT_RE = re.compile(r"model_epoch_(\d+)\.(msgpack|pt)$")
SHARDED_CKPT_RE = re.compile(r"model_epoch_(\d+)\.orbax$")


def _to_numpy(tree):
    # to_state_dict converts NamedTuple optimizer states (optax) into plain
    # dicts so the whole payload is msgpack-serializable.  One device_get
    # for the whole tree: per-leaf np.asarray pays a device->host round
    # trip per leaf (hundreds per checkpoint), which dominated save time on
    # the tunneled TPU backend.
    tree = serialization.to_state_dict(tree)
    return jax.device_get(tree)


def checkpoint_path(directory: str, epoch: int) -> str:
    return os.path.join(directory, f"model_epoch_{epoch}.msgpack")


def _raise_first(futures) -> None:
    """Retrieve EVERY completed future's result, then raise the first
    failure.  Raising inside the retrieval loop would leave later failed
    futures' exceptions unretrieved (lost tracebacks, 'exception was never
    retrieved' GC warnings); secondary failures are printed instead."""
    errors = []
    for fut in futures:
        try:
            fut.result()
        except Exception as exc:  # noqa: BLE001 — re-raised below
            errors.append(exc)
    if errors:
        for extra_exc in errors[1:]:
            print(f"[checkpoints] additional async save failure: {extra_exc!r}")
        raise errors[0]


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
    # tmp + atomic rename: latest-epoch discovery parses filenames, so a
    # half-written file must never be visible under its final name.
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    return path


class AsyncCheckpointWriter:
    """Overlap checkpoint host-fetch + serialization with training.

    A full train-state checkpoint is ~120 MB for the sf=1.0 model; fetching
    it over the tunneled TPU backend takes ~10 s (plus a one-time ~200 s
    transfer-path warmup), and the reference-parity save_interval=1 means
    one save per epoch — synchronous saves measured as a top-3 cost of the
    student sweep.  ``save()`` snapshots the arrays with ONE on-device copy
    (donation-safe: the caller's train step donates its state, so the
    original buffers die at the next step) and hands fetch+serialize+write
    to a background pool.  ``flush()`` joins and re-raises the first error.
    """

    def __init__(self, max_workers: int = 2):
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=max_workers, thread_name_prefix="ckpt"
        )
        self._futures = []

    @staticmethod
    @jax.jit
    def _device_copy(tree):
        import jax.numpy as jnp

        return jax.tree_util.tree_map(jnp.copy, tree)

    def save(
        self,
        directory: str,
        epoch: int,
        params: Any,
        batch_stats: Any = None,
        opt_state: Any = None,
        ema_params: Any = None,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        tree = {"params": params}
        if batch_stats is not None:
            tree["batch_stats"] = batch_stats
        if opt_state is not None:
            tree["opt_state"] = serialization.to_state_dict(opt_state)
        if ema_params is not None:
            tree["ema_params"] = ema_params
        snapshot = self._device_copy(tree)

        def write():
            host = jax.device_get(serialization.to_state_dict(snapshot))
            payload = {"epoch": epoch, **host}
            if extra:
                payload["extra"] = extra
            os.makedirs(directory, exist_ok=True)
            path = checkpoint_path(directory, epoch)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(serialization.msgpack_serialize(payload))
            os.replace(tmp, path)
            return path

        # Surface a previously failed async save on the NEXT save() call
        # instead of staying silent until flush/close — later epochs would
        # otherwise keep training against a checkpoint directory that
        # stopped persisting.
        # Partition with ONE f.done() call per future: a future completing
        # between two separate passes would otherwise vanish from both
        # lists and its failure would never be retrieved.
        done, pending = [], []
        for f in self._futures:
            (done if f.done() else pending).append(f)
        self._futures = pending
        self._futures.append(self._pool.submit(write))
        _raise_first(done)

    def submit(self, fn, *args) -> None:
        """Run an arbitrary host-side task (e.g. a sample-grid fetch+PNG
        save) on the writer's pool with the same error contract as saves:
        failures surface on the next save()/submit()/flush(), never
        silently.  The caller must pass device arrays (not prefetched
        numpy) so the fetch itself rides the background thread."""
        done, pending = [], []
        for f in self._futures:
            (done if f.done() else pending).append(f)
        self._futures = pending
        self._futures.append(self._pool.submit(fn, *args))
        _raise_first(done)

    def flush(self) -> None:
        """Wait for ALL pending saves to settle; raise the first failure
        only after every future has completed (an early raise would abandon
        in-flight writes un-joined and skip close()'s pool shutdown)."""
        futures, self._futures = self._futures, []
        concurrent.futures.wait(futures)
        _raise_first(futures)

    def close(self) -> None:
        try:
            self.flush()
        finally:
            self._pool.shutdown(wait=True)


def available_epochs(directory: str):
    """All epochs with checkpoints in ``directory``, ascending.

    Format-transparent: msgpack files AND sharded orbax directories both
    count (a model trained with ``Config.checkpoint_sharded`` is
    discoverable by every analysis CLI exactly like a msgpack one)."""
    if not os.path.isdir(directory):
        return []
    epochs = []
    for name in os.listdir(directory):
        m = CKPT_RE.search(name) or SHARDED_CKPT_RE.search(name)
        if m:
            epochs.append(int(m.group(1)))
    return sorted(set(epochs))


def latest_epoch(directory: str) -> Optional[int]:
    """Latest checkpoint epoch by filename parse (ref analyze_trajectory_metrics.py:483-489)."""
    epochs = available_epochs(directory)
    return epochs[-1] if epochs else None


def load_checkpoint(directory: str, epoch: Optional[int] = None) -> Dict[str, Any]:
    """Load ``model_epoch_{epoch}`` (or the latest when ``epoch`` is None).

    Format-transparent: reads the msgpack file when present, else the
    sharded orbax directory of the same epoch (host restore) — so every
    consumer (analysis CLIs, trainers' resume/skip paths) works on
    checkpoints written by either lane without knowing which."""
    if epoch is None:
        epoch = latest_epoch(directory)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints found in {directory}")
    path = checkpoint_path(directory, epoch)
    if not os.path.exists(path) and os.path.isdir(
        sharded_checkpoint_path(directory, epoch)
    ):
        return load_checkpoint_sharded(directory, epoch)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload


def sharded_checkpoint_path(directory: str, epoch: int) -> str:
    return os.path.join(directory, f"model_epoch_{epoch}.orbax")


def abstract_target(tree: Any) -> Any:
    """Shape/dtype/sharding skeleton of ``tree`` for
    :func:`load_checkpoint_sharded` — restoring against it places every
    shard directly on its device, no host gather/scatter."""
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
        tree,
    )


def save_checkpoint_sharded(
    directory: str,
    epoch: int,
    params: Any,
    batch_stats: Any = None,
    opt_state: Any = None,
    ema_params: Any = None,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Sharding-preserving checkpoint (opt-in, beyond the reference's
    contract): ``{directory}/model_epoch_{epoch}.orbax/``.

    The msgpack path (:func:`save_checkpoint`) gathers the WHOLE tree to
    one host via device_get — correct for the reference's single-device
    scale (torch.save of a state_dict, train_teacher.py:85-86) but wrong
    on a pod: O(model) host memory on one process and a full-tree
    transfer over ICI/DCN per save.  This lane writes each shard from its
    device via orbax (atomic: orbax commits a completion marker, partial
    writes are never visible as valid checkpoints) and restores with the
    target sharding, so SPMD training resumes without ever materializing
    the full tree anywhere.  Same payload keys as the msgpack path;
    ``extra`` lands in a ``meta.json`` sidecar inside the directory.
    """
    import json

    import orbax.checkpoint as ocp

    os.makedirs(directory, exist_ok=True)
    # to_state_dict: optax NamedTuple states -> plain dicts, mirroring the
    # msgpack payload structure (load returns the same shape of tree).
    payload = {"params": serialization.to_state_dict(params)}
    if batch_stats is not None:
        payload["batch_stats"] = serialization.to_state_dict(batch_stats)
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(opt_state)
    if ema_params is not None:
        payload["ema_params"] = serialization.to_state_dict(ema_params)
    path = os.path.abspath(sharded_checkpoint_path(directory, epoch))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    # Sidecar NEXT TO the orbax directory, not inside it — orbax discovers
    # items from the directory contents and a foreign file would be read
    # as a checkpoint item.
    with open(path + ".meta.json", "w") as f:
        json.dump({"epoch": epoch, "extra": extra or {}}, f)
    return path


def available_epochs_sharded(directory: str):
    if not os.path.isdir(directory):
        return []
    return sorted(
        int(m.group(1))
        for m in (SHARDED_CKPT_RE.search(n) for n in os.listdir(directory))
        if m
    )


def load_checkpoint_sharded(
    directory: str, epoch: Optional[int] = None, target: Any = None
) -> Dict[str, Any]:
    """Load a sharded checkpoint (latest when ``epoch`` is None).

    ``target`` is a payload-shaped tree of arrays or ShapeDtypeStructs
    (see :func:`abstract_target`) carrying the destination shardings;
    with ``target=None`` the whole tree restores onto the current default
    device (topology-FREE: the target is rebuilt from the checkpoint's own
    shape/dtype metadata with a SingleDeviceSharding, so a checkpoint
    written on an N-device mesh loads in a 1-device analysis process —
    orbax's bare restore would demand the saving topology).  Returns the
    payload dict with ``epoch``/``extra`` re-attached from the sidecar.
    """
    import json

    import orbax.checkpoint as ocp

    if epoch is None:
        epochs = available_epochs_sharded(directory)
        if not epochs:
            raise FileNotFoundError(f"no sharded checkpoints in {directory}")
        epoch = epochs[-1]
    path = os.path.abspath(sharded_checkpoint_path(directory, epoch))
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        meta = ckptr.metadata(path).item_metadata.tree
        sds = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        target = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sds),
            meta,
        )
    payload = ckptr.restore(path, target)
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        payload["epoch"] = meta.get("epoch", epoch)
        if meta.get("extra"):
            payload["extra"] = meta["extra"]
    else:
        payload["epoch"] = epoch
    return payload


def variables_from_checkpoint(payload: Dict[str, Any]) -> Dict[str, Any]:
    """Flax variables dict ({'params', 'batch_stats'}) from a checkpoint payload.

    Leaves are materialized as DEVICE arrays: msgpack deserialization yields
    numpy, and numpy trees passed as jit ARGUMENTS (the
    variables-as-args pattern, engine._VariablesAsArgFn /
    state._DistillStep) are re-uploaded host→device on every call — ~37 MB
    per train step / sweep dispatch for the sf=1.0 teacher, which over the
    tunneled backend turned 3 s epochs into 200 s ones when the transfer
    cache didn't hold.  One device_put here makes every downstream call
    pass buffer handles instead.
    """
    import jax.numpy as jnp

    def to_device(tree):
        return jax.tree_util.tree_map(jnp.asarray, tree)

    variables = {"params": to_device(payload["params"])}
    if "batch_stats" in payload:
        variables["batch_stats"] = to_device(payload["batch_stats"])
    return variables

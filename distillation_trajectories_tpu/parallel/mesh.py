"""Device mesh construction and named-sharding helpers.

The reference is strictly single-process single-device (SURVEY.md preamble);
scaling here is TPU-native: a ``jax.sharding.Mesh`` with ``data`` (batch /
trajectory-sample) and ``model`` (channel-tensor-parallel) axes, NamedSharding
annotations on params/batches, and XLA GSPMD inserting the collectives over
ICI.  No hand-rolled communication backend.

Applicability note: this model family is a small conv U-Net on ≤32×32 images
— pipeline and expert parallelism have no natural axis here (no layers to
stage at this scale, no experts).  The meaningful axes are data (batch ×
trajectory samples × the 11-student sweep) and tensor (conv channels), which
is what this module implements; the conv analog of sequence parallelism —
sharding the image-H axis with GSPMD halo exchange, for images too large for
one chip — lives in parallel/spatial.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, model) mesh.

    ``shape=None`` uses all available devices on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    n = shape[0] * shape[1]
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(config) -> Optional[Mesh]:
    """Build the (data, model) mesh declared by ``Config.mesh_shape``.

    Returns ``None`` for the single-device default ``(1, 1)`` so call sites
    can use ``if mesh:`` to keep the unsharded fast path.  Raises when the
    configured shape needs more devices than the backend exposes or when the
    batch size does not divide over the data axis (GSPMD would otherwise
    fail deep inside compilation with a far worse error).
    """
    shape = tuple(config.mesh_shape)
    if shape == (1, 1):
        return None
    n_needed = shape[0] * shape[1]
    # Honor an active jax.default_device scope: build the mesh from that
    # device's platform, not the process-default backend.  This is what lets
    # dryrun_multichip pin its 8-virtual-CPU mesh even after entry() has
    # already initialized the (1-chip) TPU backend in the same process.
    default_dev = jax.config.jax_default_device
    if default_dev is not None:
        devices = jax.devices(default_dev.platform)
    else:
        devices = jax.devices()
    if n_needed > len(devices):
        raise ValueError(
            f"mesh_shape {shape} needs {n_needed} devices, backend has "
            f"{len(devices)}"
        )
    if config.batch_size % shape[0] != 0:
        raise ValueError(
            f"batch_size {config.batch_size} not divisible by data axis "
            f"{shape[0]} of mesh_shape {shape}"
        )
    return make_mesh(shape, devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(leaf: jax.Array, model_size: int) -> P:
    """Partition spec for one param leaf: shard the trailing (output-channel)
    dim over the model axis when divisible, otherwise replicate.

    Covers NHWC conv kernels (kh, kw, in, out), dense kernels (in, out), and
    per-channel vectors (bias, BN scale/bias/stats).
    """
    if model_size <= 1 or leaf.ndim == 0:
        return P()
    if leaf.shape[-1] % model_size == 0 and leaf.shape[-1] >= model_size:
        return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
    return P()


def shard_params(tree, mesh: Mesh):
    """device_put a param/batch_stats pytree with channel-TP shardings."""
    model_size = mesh.shape[MODEL_AXIS]

    def put(leaf):
        leaf = jax.numpy.asarray(leaf)
        return jax.device_put(leaf, NamedSharding(mesh, param_spec(leaf, model_size)))

    return jax.tree_util.tree_map(put, tree)


def shard_train_state(state, mesh: Mesh):
    """Shard a TrainState: params/opt_state/batch_stats channel-TP,
    scalars replicated."""
    model_size = mesh.shape[MODEL_AXIS]

    def put(leaf):
        leaf = jax.numpy.asarray(leaf)
        return jax.device_put(leaf, NamedSharding(mesh, param_spec(leaf, model_size)))

    return jax.tree_util.tree_map(put, state)


def shard_batch(batch, mesh: Mesh):
    """Shard an NHWC batch over the data axis."""
    return jax.device_put(jax.numpy.asarray(batch), batch_sharding(mesh))

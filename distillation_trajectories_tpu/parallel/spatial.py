"""Spatial (image-height) partitioning — the GSPMD lane for images whose
activations exceed one chip's HBM.

The reference is strictly single-device (SURVEY.md preamble) and its conv
U-Net tops out at 32×32 (models.py), where data- and channel-parallelism
(parallel/mesh.py) are the natural axes.  Scaling the *image* instead —
high-resolution sampling, editing and inpainting — hits a different wall:
NHWC activations grow with H·W while the batch can't shrink below 1, so
past some resolution a single chip cannot hold even one image's U-Net
activations.  The TPU-native answer is spatial partitioning: shard the H
axis of every activation across devices and let XLA GSPMD insert the halo
exchanges (edge-row ``collective-permute``\s over ICI) that 3×3 convs need
at shard boundaries — the scaling-book recipe (mesh → annotations → XLA
collectives), zero hand-written communication.

This module provides the ``(data, spatial)`` mesh and the sharded eval
forward used by the samplers.  Sharding constraints are applied at the
model-call boundary *inside* the jitted graph, so inside a ``lax.scan``
sampler the carried chain keeps its spatial layout step to step instead of
being re-gathered.

Scope: eval-mode forwards (sampling/editing/analysis — the paths that want
big images).  Eval BatchNorm is an affine with running stats, so the
forward is purely local-plus-halos; train-mode BN would additionally need
cross-shard moment reductions (GSPMD inserts those too, but training at
≤32×32 has no use for spatial sharding, so the lane stays on the sampler
path).

Divisibility: H must divide by the spatial axis at the *input*; deeper
levels may go sub-row (e.g. a 2-row bottleneck on a 4-way spatial axis) —
GSPMD pads and stays correct, it just wastes the idle shards at that depth.
Parity with the unsharded forward is pinned by tests/test_spatial.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

SPATIAL_AXIS = "spatial"


def make_spatial_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ``(data, spatial)`` mesh.

    ``shape=None`` puts all available devices on the spatial axis (the
    big-image regime is the one where the batch is already minimal).
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (1, len(devices))
    n = shape[0] * shape[1]
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharding: batch over ``data``, image rows over
    ``spatial``."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))


def shard_batch_spatial(x, mesh: Mesh):
    """device_put an NHWC batch with (data, spatial) sharding.

    Raises on indivisible batch/height up front — GSPMD would otherwise
    fail (or silently pad) deep inside compilation.
    """
    x = jax.numpy.asarray(x)
    d, s = mesh.shape[DATA_AXIS], mesh.shape[SPATIAL_AXIS]
    if x.ndim != 4:
        raise ValueError(f"expected NHWC batch, got shape {x.shape}")
    if x.shape[0] % d != 0:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by data axis {d}")
    if x.shape[1] % s != 0:
        raise ValueError(
            f"image height {x.shape[1]} not divisible by spatial axis {s}")
    return jax.device_put(x, spatial_batch_sharding(mesh))


def make_spatial_eval_fn(model, variables, mesh: Mesh):
    """Eval-mode forward with spatially-sharded activations.

    Drop-in for ``training.make_eval_model_fn`` (state.py): same
    ``(x, t, cond, cond_mask) -> ε̂`` signature, usable as the ``model_fn``
    of ``generate_trajectory_scan``.  The input/output constraints pin the
    NHWC H axis to the ``spatial`` mesh axis every call, so a scan carry
    stays sharded across steps; everything between the constraints is
    GSPMD's to lay out (halo exchanges around the 3×3 convs, local
    pool/upsample elsewhere).
    """
    spec = spatial_batch_sharding(mesh)

    def model_fn(x, t, cond=None, cond_mask=None):
        x = jax.lax.with_sharding_constraint(x, spec)
        out = model.apply(
            variables, x, t, cond=cond, cond_mask=cond_mask, train=False)
        return jax.lax.with_sharding_constraint(out, spec)

    return model_fn

r"""Spatial (image-height) partitioning — the GSPMD lane for images whose
activations exceed one chip's HBM.

The reference is strictly single-device (SURVEY.md preamble) and its conv
U-Net tops out at 32×32 (models.py), where data- and channel-parallelism
(parallel/mesh.py) are the natural axes.  Scaling the *image* instead —
high-resolution sampling, editing and inpainting — hits a different wall:
NHWC activations grow with H·W while the batch can't shrink below 1, so
past some resolution a single chip cannot hold even one image's U-Net
activations.  The TPU-native answer is spatial partitioning: shard the H
axis of every activation across devices and let XLA GSPMD insert the halo
exchanges (edge-row ``collective-permute``\ s over ICI) that 3×3 convs need
at shard boundaries — the scaling-book recipe (mesh → annotations → XLA
collectives), zero hand-written communication.

This module provides the ``(data, spatial)`` mesh and the sharded eval
forward used by the samplers.

Per-level constraints (the round-5 parity fix): sharding constraints are
applied at every U-Net Block boundary via a flax method interceptor, and a
level keeps the H axis on ``spatial`` ONLY while its height divides the
spatial axis size.  Deeper levels (H < spatial axis, or indivisible) are
re-constrained to ``P(data, None, None, None)`` — batch-sharded, spatially
replicated.  Measured in round 4: leaving sub-row levels implicitly sharded
let GSPMD shard-padding (e.g. the max-pool's −inf init rows) leak through
padded 3×3 convs under mixed (data>1, spatial>1) meshes, diverging from the
unsharded forward.  Spatial partitioning only pays at the high-resolution
levels anyway — the deep levels are tiny — so replicating them costs
nothing and restores exactness.  Parity with the unsharded forward is
pinned by tests/test_spatial.py and the driver dryrun (__graft_entry__.py).

TPU-invariant compliance: the jitted boundary takes the variables pytree as
its FIRST ARGUMENT (never a closure constant — see CLAUDE.md round-3 rules /
utils/compile_pool.VariablesAsArgFn): :func:`make_spatial_forward` returns
the args-first pure function for engine-style wrappers and AOT pools;
:func:`make_spatial_eval_fn` pre-binds variables behind the standard
``(x, t, cond, cond_mask)`` sampler signature.

Scope: eval-mode forwards (sampling/editing/analysis — the paths that want
big images).  Eval BatchNorm is an affine with running stats, so the
forward is purely local-plus-halos; train-mode BN would additionally need
cross-shard moment reductions (GSPMD inserts those too, but training at
≤32×32 has no use for spatial sharding, so the lane stays on the sampler
path).

Divisibility: H must divide by the spatial axis at the *input*
(``shard_batch_spatial`` guards this up front); deeper levels fall off the
spatial axis automatically per the constraint rule above.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
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


def _level_sharding(h: int, mesh: Mesh) -> NamedSharding:
    """Sharding for an NHWC activation of height ``h``.

    H stays on the spatial axis only while it divides the axis size AND
    each shard holds at least one full 2×2 pool window (≥2 rows);
    otherwise the level is spatially replicated (see module docstring —
    sub-row and single-row shards under mixed meshes are the measured
    parity hazard, and the deep levels are too small to be worth sharding).
    """
    s = mesh.shape[SPATIAL_AXIS]
    if h % s == 0 and h // s >= 2:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))
    return NamedSharding(mesh, P(DATA_AXIS, None, None, None))


def _make_constrainer(mesh: Mesh):
    def constrain(y):
        if getattr(y, "ndim", 0) == 4:
            return jax.lax.with_sharding_constraint(
                y, _level_sharding(y.shape[1], mesh))
        return y

    return constrain


def make_spatial_forward(model, mesh: Mesh):
    """Args-first spatially-sharded eval forward:
    ``fwd(variables, x, t, cond, cond_mask) -> ε̂``.

    This is the jit/AOT boundary shape the TPU backend requires (variables
    as arguments, not closure constants).  Per-level sharding constraints
    are injected at every Block call boundary with a flax method
    interceptor — no model change, and the rule lives in ONE place
    (:func:`_level_sharding`).  Inside a ``lax.scan`` sampler the carried
    chain keeps its (data, spatial) layout step to step because the input
    and output constraints re-pin it every call.
    """
    from ..models.unet import Block

    constrain = _make_constrainer(mesh)

    def interceptor(next_fun, args, kwargs, context):
        if context.method_name != "__call__" or not isinstance(
                context.module, Block):
            return next_fun(*args, **kwargs)
        args = (constrain(args[0]),) + args[1:]
        return constrain(next_fun(*args, **kwargs))

    def fwd(variables, x, t, cond=None, cond_mask=None):
        x = constrain(x)
        with nn.intercept_methods(interceptor):
            out = model.apply(
                variables, x, t, cond=cond, cond_mask=cond_mask, train=False)
        return constrain(out)

    return fwd


def make_spatial_eval_fn(model, variables, mesh: Mesh):
    """Eval-mode forward with spatially-sharded activations.

    Drop-in for ``training.make_eval_model_fn`` (state.py): same
    ``(x, t, cond, cond_mask) -> ε̂`` signature, usable as the ``model_fn``
    of ``generate_trajectory_scan``.  ``variables`` ride as the first
    ARGUMENT of the underlying jitted function (pre-bound here, the
    VariablesAsArgFn pattern) so the lowered IR carries only their avals;
    engine-style wrappers that jit a whole sampler should instead take
    :func:`make_spatial_forward` and thread variables through their own
    argument list.
    """
    fwd = jax.jit(make_spatial_forward(model, mesh))

    def model_fn(x, t, cond=None, cond_mask=None):
        return fwd(variables, x, t, cond, cond_mask)

    return model_fn

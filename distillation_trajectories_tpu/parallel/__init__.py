"""Multi-chip scaling: mesh construction + NamedSharding annotations.

Usage: build a mesh, `shard_train_state`/`shard_batch` the inputs, and call
the ordinary jitted train step — XLA GSPMD partitions the computation and
inserts psum/all-gather collectives over ICI.
"""
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    mesh_from_config,
    batch_sharding,
    replicated,
    param_spec,
    shard_params,
    shard_train_state,
    shard_batch,
)
from .distributed import initialize_distributed, make_global_mesh
from .spatial import (
    SPATIAL_AXIS,
    make_spatial_mesh,
    spatial_batch_sharding,
    shard_batch_spatial,
    make_spatial_eval_fn,
    make_spatial_forward,
)
from .sweep import distill_students_parallel

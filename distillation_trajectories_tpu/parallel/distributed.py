"""Multi-host initialization and mesh construction.

The reference is single-process (SURVEY.md §5 'Distributed communication
backend: absent').  For multi-host TPU pods the TPU-native story is
``jax.distributed.initialize`` + a global mesh whose data axis spans hosts
(collectives ride ICI within a slice, DCN across slices); no hand-rolled
communication backend.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from .mesh import make_mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host env vars are present.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (or
    the explicit arguments); no-op (returns False) in single-process runs,
    so all entry points can call it unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    print(
        f"[distributed] initialized process {process_id}/{num_processes} "
        f"→ {jax.device_count()} global devices"
    )
    return True


def make_global_mesh(model_parallel: int = 1) -> "jax.sharding.Mesh":
    """(data, model) mesh over ALL global devices (multi-host aware).

    Data parallelism spans hosts; model (channel-TP) parallelism should stay
    within a host's ICI domain, which ``model_parallel`` ≤ devices-per-host
    guarantees for the standard device order.
    """
    n = jax.device_count()
    assert n % model_parallel == 0, (n, model_parallel)
    return make_mesh((n // model_parallel, model_parallel), jax.devices())

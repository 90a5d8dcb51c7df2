"""Sharding-preserving (orbax) checkpoint lane.

Beyond-reference, pod-scale counterpart of the msgpack contract: each shard
writes from / restores to its own device, no full-tree host gather (the
msgpack path's device_get is O(model) host memory on one process — fine at
the reference's single-device scale, wrong on a pod).  Runs on the
8-virtual-device CPU mesh from tests/conftest.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def mesh_state(test_config):
    """Tiny SPMD TrainState sharded over a (4, 2) mesh."""
    from distillation_trajectories_tpu.models import make_unet, init_unet
    from distillation_trajectories_tpu.parallel import (
        make_mesh,
        shard_train_state,
    )
    from distillation_trajectories_tpu.training import (
        create_train_state,
        make_optimizer,
    )

    cfg = test_config
    model = make_unet(cfg, size_factor=0.25)
    variables = init_unet(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, variables, make_optimizer(cfg))
    mesh = make_mesh(shape=(4, 2))
    return shard_train_state(state, mesh), mesh


def test_sharded_roundtrip_preserves_shardings(tmp_path, mesh_state):
    from distillation_trajectories_tpu.training import (
        abstract_target,
        available_epochs_sharded,
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    state, _ = mesh_state
    d = str(tmp_path / "teacher")
    path = save_checkpoint_sharded(
        d, 3, state.params,
        batch_stats=state.batch_stats,
        opt_state=state.opt_state,
        extra={"note": "spmd"},
    )
    assert path.endswith("model_epoch_3.orbax")
    assert available_epochs_sharded(d) == [3]

    from flax import serialization

    target = {
        "params": abstract_target(serialization.to_state_dict(state.params)),
        "batch_stats": abstract_target(
            serialization.to_state_dict(state.batch_stats)
        ),
        "opt_state": abstract_target(
            serialization.to_state_dict(state.opt_state)
        ),
    }
    payload = load_checkpoint_sharded(d, target=target)
    assert payload["epoch"] == 3
    assert payload["extra"] == {"note": "spmd"}

    # Values AND placement survive: every restored leaf carries the same
    # sharding as the live state and equal bytes.
    orig = serialization.to_state_dict(state.params)
    rest = payload["params"]
    orig_leaves = jax.tree_util.tree_leaves(orig)
    rest_leaves = jax.tree_util.tree_leaves(rest)
    assert len(orig_leaves) == len(rest_leaves) > 0
    for a, b in zip(orig_leaves, rest_leaves):
        assert b.sharding == a.sharding, (b.sharding, a.sharding)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Optimizer state (optax NamedTuple -> state dict) roundtrips too.
    o0 = jax.tree_util.tree_leaves(
        serialization.to_state_dict(state.opt_state)
    )
    o1 = jax.tree_util.tree_leaves(payload["opt_state"])
    assert len(o0) == len(o1) > 0
    for a, b in zip(o0, o1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_load_without_target(tmp_path, mesh_state):
    """No-target restore (inspection lane): saved shapes/values come back
    as plain default-device arrays, fetchable without the original mesh."""
    from flax import serialization
    from distillation_trajectories_tpu.training import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    state, _ = mesh_state
    d = str(tmp_path / "m")
    save_checkpoint_sharded(d, 1, state.params)
    payload = load_checkpoint_sharded(d)  # latest, no target
    orig = jax.tree_util.tree_leaves(serialization.to_state_dict(state.params))
    rest = jax.tree_util.tree_leaves(payload["params"])
    assert len(orig) == len(rest) > 0
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_writes_sharded_checkpoint_under_mesh(test_config):
    """Product wiring: Config.checkpoint_sharded routes the SPMD teacher
    trainer's saves through the orbax lane — checkpoints appear as
    model_epoch_{e}.orbax directories and restore with mesh shardings."""
    from distillation_trajectories_tpu.training import (
        available_epochs_sharded,
        load_checkpoint_sharded,
        train_teacher,
    )

    cfg = test_config
    cfg.mesh_shape = (4, 2)
    cfg.checkpoint_sharded = True
    cfg.limit_batches_per_epoch = 1
    cfg.num_samples_to_generate = 0
    import os

    os.environ.pop("DTT_EPOCH_SCAN", None)
    model, variables = train_teacher(cfg, seed=0)
    assert available_epochs_sharded(cfg.teacher_models_dir) == [1]
    payload = load_checkpoint_sharded(cfg.teacher_models_dir)
    assert payload["epoch"] == 1
    # All payload families present (params + BN stats + optimizer state).
    assert set(payload) >= {"params", "batch_stats", "opt_state", "epoch"}
    leaves = jax.tree_util.tree_leaves(payload["params"])
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_msgpack_api_reads_sharded_checkpoints(tmp_path, mesh_state):
    """Format transparency: the discovery/load functions every analysis CLI
    uses (available_epochs / latest_epoch / load_checkpoint) see and read
    orbax checkpoints — a --checkpoint_sharded training run is analyzable
    without conversion."""
    from distillation_trajectories_tpu.training import (
        available_epochs,
        latest_epoch,
        load_checkpoint,
        save_checkpoint,
        save_checkpoint_sharded,
        variables_from_checkpoint,
    )

    state, _ = mesh_state
    d = str(tmp_path / "mixed")
    save_checkpoint_sharded(d, 2, state.params,
                            batch_stats=state.batch_stats)
    assert available_epochs(d) == [2]
    assert latest_epoch(d) == 2
    payload = load_checkpoint(d)  # falls through to the orbax lane
    assert payload["epoch"] == 2
    variables = variables_from_checkpoint(payload)
    assert set(variables) == {"params", "batch_stats"}
    # A msgpack file of the SAME epoch wins (reference-parity contract
    # first), and mixed-format directories list each epoch once.
    save_checkpoint(d, 2, state.params)
    save_checkpoint(d, 5, state.params)
    assert available_epochs(d) == [2, 5]
    assert "batch_stats" not in load_checkpoint(d, 2)  # the msgpack one


def test_sharded_latest_and_missing(tmp_path):
    from distillation_trajectories_tpu.training import (
        available_epochs_sharded,
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    d = str(tmp_path / "s")
    assert available_epochs_sharded(d) == []
    with pytest.raises(FileNotFoundError):
        load_checkpoint_sharded(d)
    x = {"w": jnp.arange(8.0)}
    save_checkpoint_sharded(d, 1, x)
    save_checkpoint_sharded(d, 4, x)
    assert available_epochs_sharded(d) == [1, 4]
    assert load_checkpoint_sharded(d)["epoch"] == 4

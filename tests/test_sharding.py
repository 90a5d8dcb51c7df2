"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distillation_trajectories_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    param_spec,
    shard_batch,
    shard_params,
    shard_train_state,
)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_make_mesh_shapes():
    mesh = make_mesh((4, 2))
    assert mesh.shape[DATA_AXIS] == 4
    assert mesh.shape[MODEL_AXIS] == 2


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    conv = jnp.zeros((3, 3, 16, 64))
    assert param_spec(conv, 2) == P(None, None, None, MODEL_AXIS)
    odd = jnp.zeros((3, 3, 16, 7))  # 7 not divisible → replicate
    assert param_spec(odd, 2) == P()
    scalar = jnp.zeros(())
    assert param_spec(scalar, 2) == P()
    assert param_spec(conv, 1) == P()


# NOTE: the hand-built sharded teacher-train-step test was superseded by
# tests/test_sweep_parallel.py::test_train_teacher_on_mesh, which exercises
# the identical GSPMD step through the production trainer (and is the path
# the --mesh CLI flag drives); keeping both doubled the most expensive
# compile in the suite for no extra coverage.


def test_sharded_trajectory_generation(test_config):
    """CFG trajectory scan with the noise batch sharded over data axis."""
    from distillation_trajectories_tpu.diffusion import (
        get_diffusion_params,
        generate_trajectory_scan,
    )
    from distillation_trajectories_tpu.models import make_unet, init_unet
    from distillation_trajectories_tpu.training import make_eval_model_fn

    mesh = make_mesh((8, 1))
    model = make_unet(test_config, size_factor=0.1)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))
    model_fn = make_eval_model_fn(model, variables)
    dp = get_diffusion_params(test_config.timesteps, test_config)

    noise = shard_batch(
        np.random.default_rng(1).standard_normal((8, 16, 16, 1)).astype(np.float32),
        mesh,
    )
    traj = jax.jit(
        lambda n: generate_trajectory_scan(
            model_fn, n, test_config.timesteps, dp["alphas"], 0,
            guidance_scale=3.0,
        )
    )(noise)
    traj.block_until_ready()
    assert traj.shape == (test_config.timesteps + 1, 8, 16, 16, 1)
    # result equals the unsharded computation
    unsharded = generate_trajectory_scan(
        model_fn, jax.device_get(noise), test_config.timesteps, dp["alphas"], 0,
        guidance_scale=3.0,
    )
    np.testing.assert_allclose(
        np.asarray(traj), np.asarray(unsharded), rtol=2e-4, atol=1e-5
    )


def test_initialize_distributed_noop_without_env(monkeypatch):
    from distillation_trajectories_tpu.parallel import initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False


def test_make_global_mesh():
    from distillation_trajectories_tpu.parallel import make_global_mesh

    mesh = make_global_mesh(model_parallel=2)
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] * 2 == len(jax.devices())

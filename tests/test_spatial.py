"""Spatial (image-H) partitioning lane on the virtual 8-device CPU mesh.

Parity contract: the spatially-sharded eval forward and the sharded
trajectory scan must equal their unsharded counterparts — GSPMD halo
exchange is a layout decision, never a semantics change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from distillation_trajectories_tpu.models import make_unet, init_unet
from distillation_trajectories_tpu.parallel import (
    DATA_AXIS,
    SPATIAL_AXIS,
    make_spatial_mesh,
    make_spatial_eval_fn,
    shard_batch_spatial,
)
from distillation_trajectories_tpu.training import make_eval_model_fn


def _model_and_batch(test_config, rng_seed=0):
    model = make_unet(test_config, size_factor=0.1)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))
    x = np.random.default_rng(rng_seed).standard_normal(
        (4, 16, 16, 1)).astype(np.float32)
    return model, variables, x


def test_shard_batch_spatial_layout_and_guards(test_config):
    mesh = make_spatial_mesh((2, 4))
    _, _, x = _model_and_batch(test_config)
    xs = shard_batch_spatial(x, mesh)
    assert xs.sharding.spec == P(DATA_AXIS, SPATIAL_AXIS, None, None)
    np.testing.assert_array_equal(np.asarray(xs), x)
    with pytest.raises(ValueError, match="height"):
        shard_batch_spatial(x[:, :15], mesh)
    with pytest.raises(ValueError, match="batch"):
        shard_batch_spatial(x[:3], mesh)
    with pytest.raises(ValueError, match="NHWC"):
        shard_batch_spatial(x[0], mesh)


def test_spatial_forward_matches_unsharded(test_config):
    """4-way H-sharded eval forward == unsharded apply; output stays
    spatially sharded (no trailing all-gather)."""
    mesh = make_spatial_mesh((2, 4))
    model, variables, x = _model_and_batch(test_config)
    t = jnp.full((4,), 3.0)
    cond = jnp.ones((4, 1))
    mask = jnp.ones((4, 1))

    fwd = jax.jit(make_spatial_eval_fn(model, variables, mesh))
    out = fwd(shard_batch_spatial(x, mesh), t, cond, mask)
    out.block_until_ready()
    assert out.sharding.spec == P(DATA_AXIS, SPATIAL_AXIS, None, None)

    ref = make_eval_model_fn(model, variables)(jnp.asarray(x), t, cond, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_spatial_trajectory_scan_matches_unsharded(test_config):
    """The flagship sampler with the chain spatially sharded: the scan
    carry keeps the (data, spatial) layout step to step and the full
    [T+1,B,H,W,C] trajectory equals the unsharded run."""
    from distillation_trajectories_tpu.diffusion import (
        generate_trajectory_scan,
        get_diffusion_params,
    )

    mesh = make_spatial_mesh((2, 4))
    model, variables, x = _model_and_batch(test_config, rng_seed=1)
    dp = get_diffusion_params(test_config.timesteps, test_config)

    model_fn = make_spatial_eval_fn(model, variables, mesh)
    traj = jax.jit(
        lambda n: generate_trajectory_scan(
            model_fn, n, test_config.timesteps, dp["alphas"], 0,
            guidance_scale=3.0,
        )
    )(shard_batch_spatial(x, mesh))
    traj.block_until_ready()
    # Stacked trajectory: H is axis 3 of [T+1, B, H, W, C].
    assert traj.sharding.spec[1:3] == (DATA_AXIS, SPATIAL_AXIS)

    ref = generate_trajectory_scan(
        make_eval_model_fn(model, variables), jnp.asarray(x),
        test_config.timesteps, dp["alphas"], 0, guidance_scale=3.0,
    )
    np.testing.assert_allclose(np.asarray(traj), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_spatial_mixed_mesh_forward_matches_unsharded(test_config):
    """The round-4 failure case: mixed (data>1, spatial>1) meshes pooled
    to sub-row heights diverged (GSPMD −inf pool padding leaking through
    padded convs).  The per-level constraint rule must hold parity on
    every mesh shape, not just the pure ones."""
    model, variables, x = _model_and_batch(test_config, rng_seed=2)
    t = jnp.full((4,), 5.0)
    ref = make_eval_model_fn(model, variables)(jnp.asarray(x), t, None, None)
    for shape in [(2, 2), (4, 2), (2, 4), (1, 4), (4, 1)]:
        mesh = make_spatial_mesh(shape)
        fwd = jax.jit(make_spatial_eval_fn(model, variables, mesh))
        out = fwd(shard_batch_spatial(x, mesh), t, None, None)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5,
            err_msg=f"mesh {shape} diverged from unsharded",
        )


def test_spatial_forward_variables_as_args(test_config):
    """make_spatial_forward is the args-first jit boundary (the TPU
    invariant: variables ride as arguments, never closure constants)."""
    mesh = make_spatial_mesh((2, 4))
    model, variables, x = _model_and_batch(test_config)
    t = jnp.full((4,), 3.0)
    from distillation_trajectories_tpu.parallel import make_spatial_forward

    fwd = jax.jit(make_spatial_forward(model, mesh))
    out = fwd(variables, shard_batch_spatial(x, mesh), t, None, None)
    ref = make_eval_model_fn(model, variables)(jnp.asarray(x), t, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def _input_sized_all_gathers(hlo: str, h: int, w: int):
    """All-gather ops whose result carries the full input spatial extent —
    the 'whole-activation regather' a halo-exchange layout must not do."""
    import re

    bad = []
    for line in hlo.splitlines():
        if "all-gather" not in line:
            continue
        for shape in re.findall(r"\w+\[([\d,]+)\]", line):
            dims = [int(d) for d in shape.split(",")]
            if len(dims) == 4 and dims[1] >= h and dims[2] >= w:
                bad.append(line.strip())
                break
    return bad


def test_spatial_halo_exchange_in_hlo(test_config):
    """The compiled forward communicates shard edges instead of gathering
    whole activations: the HLO contains halo collectives, and no all-gather
    materializes a full-input-sized activation (deep sub-row levels ARE
    regathered by design — they're tiny — so only input-sized gathers
    fail)."""
    mesh = make_spatial_mesh((1, 4))
    model, variables, _ = _model_and_batch(test_config)
    t = jnp.full((4,), 3.0)

    fwd = jax.jit(make_spatial_eval_fn(model, variables, mesh))
    x = shard_batch_spatial(jnp.zeros((4, 16, 16, 1)), mesh)
    hlo = fwd.lower(x, t, None, None).compile().as_text()
    assert ("collective-permute" in hlo) or ("all-to-all" in hlo), (
        "expected halo-exchange collectives in the partitioned HLO"
    )
    bad = _input_sized_all_gathers(hlo, 16, 16)
    assert not bad, (
        "input-sized activations are all-gathered (halo layout regressed "
        "to full regathers):\n" + "\n".join(bad[:5])
    )


def test_generate_trajectory_spatial_config(test_config):
    """Config.spatial_shape routes the PRODUCT sampler (engine
    generate_trajectory) through the spatially partitioned forward: output
    equals the unsharded run and the trajectory stays row-sharded."""
    import dataclasses

    from distillation_trajectories_tpu.trajectories.engine import (
        generate_trajectory,
    )

    model, variables, x = _model_and_batch(test_config, rng_seed=4)
    ref = generate_trajectory(model, variables, x, test_config.timesteps,
                              seed=3, guidance_scale=2.0,
                              config=test_config)
    sp_cfg = dataclasses.replace(test_config, spatial_shape=(2, 4))
    traj = generate_trajectory(model, variables, x, test_config.timesteps,
                               seed=3, guidance_scale=2.0, config=sp_cfg)
    assert traj.sharding.spec[1:3] == (DATA_AXIS, SPATIAL_AXIS)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # int8 + spatial cannot combine (the quantized forward bypasses the
    # Block modules the constraints intercept).
    bad = dataclasses.replace(sp_cfg, sampler_quant="int8")
    with pytest.raises(ValueError, match="spatial"):
        generate_trajectory(model, variables, x, test_config.timesteps,
                            seed=3, config=bad)


def test_editing_inpainting_spatial_config(test_config):
    """Config.spatial_shape reaches the editing flows (the lane's motivating
    use: beyond-HBM images for inpainting/editing): inpainting under a
    (1, 4) spatial mesh equals the unsharded run."""
    import dataclasses

    from distillation_trajectories_tpu.editing.masked_inpainting import (
        apply_masked_inpainting,
    )

    model, variables, _ = _model_and_batch(test_config)
    img = np.random.default_rng(5).uniform(
        size=(16, 16, 1)).astype(np.float32)
    ref = apply_masked_inpainting(
        model, test_config, img, variables=variables, seed=2,
        record_trajectory=False)
    sp_cfg = dataclasses.replace(test_config, spatial_shape=(1, 4))
    got = apply_masked_inpainting(
        model, sp_cfg, img, variables=variables, seed=2,
        record_trajectory=False)
    np.testing.assert_allclose(
        np.asarray(got["inpainted_image"]), np.asarray(ref["inpainted_image"]),
        rtol=2e-4, atol=2e-4)

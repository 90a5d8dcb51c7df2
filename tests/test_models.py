"""U-Net model tests: shapes, size-factor scaling, CFG mask semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distillation_trajectories_tpu.models import (
    DiffusionUNet,
    make_unet,
    init_unet,
    param_count,
    sinusoidal_time_embedding,
    upsample_bilinear_x2,
)


def test_sinusoidal_embedding_matches_reference_formula():
    dim = 32
    t = jnp.array([0.0, 1.0, 50.0])
    emb = sinusoidal_time_embedding(t, dim)
    assert emb.shape == (3, dim)
    # t=0: sin part zero, cos part one
    np.testing.assert_allclose(emb[0, : dim // 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, dim // 2 :], 1.0, atol=1e-6)
    # matches the reference's exact frequency formula (models.py:20-21)
    half = dim // 2
    scale = np.log(10000.0) / (half - 1 + 1e-8)
    freqs = np.exp(np.arange(half) * -scale)
    np.testing.assert_allclose(emb[2, :half], np.sin(50.0 * freqs), atol=1e-4)


def test_odd_embedding_dim_pads():
    emb = sinusoidal_time_embedding(jnp.array([3.0]), 17)
    assert emb.shape == (1, 17)


def test_upsample_align_corners_matches_torch_semantics():
    # align_corners=True: corners map exactly; a linear ramp upsamples to a
    # linear ramp over the same endpoints.
    x = jnp.arange(4.0).reshape(1, 4, 1, 1) * jnp.ones((1, 4, 4, 1))
    y = upsample_bilinear_x2(x)
    assert y.shape == (1, 8, 8, 1)
    expected = np.linspace(0.0, 3.0, 8)
    np.testing.assert_allclose(np.asarray(y[0, :, 0, 0]), expected, rtol=1e-6)


@pytest.mark.parametrize("size_factor", [0.05, 0.1, 0.5, 1.0])
def test_size_factor_channel_scaling(size_factor):
    m = DiffusionUNet(channels=3, size_factor=size_factor)
    base = max(int(128 * size_factor), 16)
    assert m.base_channels == base
    assert m.dims == [max(16, int(base * k)) for k in (1, 2, 2, 2)]
    assert m.time_emb_dim == max(int(256 * size_factor), 16)


def test_forward_shape_and_cond_mask(test_config):
    model = make_unet(test_config, size_factor=0.2)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    t = jnp.array([3.0, 7.0])

    out_none = model.apply(variables, x, t, cond=None)
    assert out_none.shape == x.shape

    # cond with mask=0 must equal cond=None exactly
    cond = jnp.ones((2, 1))
    out_masked = model.apply(
        variables, x, t, cond=cond, cond_mask=jnp.zeros((2, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out_none), np.asarray(out_masked), atol=1e-6
    )

    # cond with mask=1 must differ (cond MLP has biases, so even cond=0
    # contributes — matching the reference engine's cond=0 half)
    out_cond = model.apply(variables, x, t, cond=cond)
    assert not np.allclose(np.asarray(out_none), np.asarray(out_cond))

    out_cond0 = model.apply(variables, x, t, cond=jnp.zeros((2, 1)))
    assert not np.allclose(np.asarray(out_none), np.asarray(out_cond0))


def test_param_count_scales_with_size_factor(test_config):
    # eval_shape: structure without materializing params (no compile cost)
    counts = {}
    for sf in (0.1, 1.0):
        model = make_unet(test_config, size_factor=sf)
        shapes = jax.eval_shape(
            lambda m=model: m.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 16, 16, 1)),
                jnp.zeros((1,)),
            )
        )
        counts[sf] = sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(shapes["params"])
        )
    assert counts[1.0] > 20 * counts[0.1]


def test_train_mode_updates_batch_stats(test_config):
    model = make_unet(test_config, size_factor=0.1)
    variables = init_unet(model, test_config, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    t = jnp.zeros((4,))
    out, mutated = model.apply(
        variables,
        x,
        t,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out.shape == x.shape
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


@pytest.mark.slow
def test_remat_model_matches_and_trains(test_config):
    """remat=True must be numerically identical in forward and usable in a
    train step (activation-memory trade only)."""
    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu.diffusion import get_diffusion_params
    from distillation_trajectories_tpu.models.unet import DiffusionUNet
    from distillation_trajectories_tpu.training import (
        create_train_state,
        make_optimizer,
        make_teacher_train_step,
    )

    base = DiffusionUNet(channels=1, size_factor=0.1, dropout=0.3)
    remat = DiffusionUNet(channels=1, size_factor=0.1, dropout=0.3, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    t = jnp.array([1.0, 3.0])
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, t)
    out_a = base.apply(variables, x, t)
    out_b = remat.apply(variables, x, t)  # same params work in both
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    tx = make_optimizer(test_config)
    state = create_train_state(remat, variables, tx)
    dp = get_diffusion_params(test_config.timesteps, test_config)
    step = make_teacher_train_step(remat, tx, dp, test_config.timesteps)
    state, loss = step(state, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_groupnorm_variant(test_config):
    """norm='group' model: no batch_stats collection, stable forward, and a
    working train step."""
    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu.diffusion import get_diffusion_params
    from distillation_trajectories_tpu.models.unet import DiffusionUNet
    from distillation_trajectories_tpu.training import (
        create_train_state,
        make_optimizer,
        make_teacher_train_step,
    )

    model = DiffusionUNet(channels=1, size_factor=0.1, norm="group")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    t = jnp.array([1.0, 3.0])
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, t)
    assert "batch_stats" not in variables
    out = model.apply(variables, x, t)
    assert out.shape == x.shape

    tx = make_optimizer(test_config)
    state = create_train_state(model, variables, tx)
    dp = get_diffusion_params(test_config.timesteps, test_config)
    step = make_teacher_train_step(model, tx, dp, test_config.timesteps)
    state, loss = step(state, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_full_res_head_variant(test_config):
    """full_res_head=True consumes the enc1 skip at full resolution and
    changes the output; params include the dec0 block."""
    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu.models.unet import DiffusionUNet

    base = DiffusionUNet(channels=1, size_factor=0.1)
    fixed = DiffusionUNet(channels=1, size_factor=0.1, full_res_head=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    t = jnp.array([1.0, 3.0])
    v_fixed = fixed.init({"params": jax.random.PRNGKey(0)}, x, t)
    assert "dec0" in v_fixed["params"]
    out = fixed.apply(v_fixed, x, t)
    assert out.shape == x.shape

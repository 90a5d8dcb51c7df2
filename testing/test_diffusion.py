"""Manual smoke suite, runnable as ``python testing/test_diffusion.py``.

Parity counterpart of reference ``testing/test_diffusion.py:1-269`` (the
reference's only test artifact): sequential ✓/✗ checks with early abort on
critical failures.  The real test suite is ``tests/`` (pytest, CPU-mesh) —
this script is the quick end-to-end sanity pass on whatever backend is
active, covering the same seven stages as the reference (device setup,
model init/forward, diffusion params, forward diffusion viz, data loader,
one train step, sampling — the reference's stage 7 was stale/broken,
test_diffusion.py:216-221; ours runs).
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_test_config():
    """Shrunk config writing under testing/ dirs (reference TestConfig,
    test_diffusion.py:19-34)."""
    from distillation_trajectories_tpu import Config

    cfg = Config(
        dataset="MNIST",
        image_size=16,
        channels=1,
        batch_size=16,
        sample_steps=20,
        timesteps=20,
        epochs=2,
        compute_dtype="float32",
        base_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), "out"),
    )
    cfg.create_directories()
    return cfg


def test_device_setup():
    import jax

    devices = jax.devices()
    print(f"  devices: {devices}")
    assert len(devices) >= 1
    return True


def test_model_forward(cfg, state):
    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu.models import make_unet, init_unet

    model = make_unet(cfg, size_factor=0.25)
    variables = init_unet(model, cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    out = model.apply(variables, x, jnp.array([1.0, 5.0]))
    assert out.shape == x.shape, f"shape mismatch: {out.shape} vs {x.shape}"
    state["model"], state["variables"] = model, variables
    return True


def test_diffusion_params(cfg, state):
    from distillation_trajectories_tpu.diffusion import get_diffusion_params

    dp = get_diffusion_params(cfg.timesteps, cfg)
    for k in (
        "betas", "alphas_cumprod", "sqrt_recip_alphas", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "posterior_variance",
    ):
        assert k in dp, f"missing schedule key {k}"
        assert dp[k].shape[0] == cfg.timesteps or dp[k].ndim == 0
    state["dp"] = dp
    return True


def test_forward_diffusion(cfg, state):
    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu.diffusion import q_sample
    from distillation_trajectories_tpu.utils.viz import save_image_grid

    # Synthetic white square (reference test_diffusion.py:111-142)
    x = -jnp.ones((1, 16, 16, 1))
    x = x.at[:, 4:12, 4:12, :].set(1.0)
    frames = []
    for t in (0, 5, 10, 15, 19):
        noisy, _ = q_sample(
            x, jnp.array([t]), state["dp"], jax.random.PRNGKey(t)
        )
        frames.append(np.asarray(noisy[0]))
    save_image_grid(
        np.stack(frames),
        os.path.join(cfg.results_dir, "forward_diffusion_test.png"),
        nrow=5,
    )
    return True


def test_data_loader(cfg, state):
    from distillation_trajectories_tpu.data import get_data_loader
    from distillation_trajectories_tpu.utils.viz import save_image_grid

    loader = get_data_loader(cfg)
    images, labels = next(iter(loader))
    assert images.shape == (cfg.batch_size, 16, 16, 1)
    assert images.min() >= -1.0 and images.max() <= 1.0
    save_image_grid(
        images[:16], os.path.join(cfg.results_dir, "data_loader_test.png")
    )
    state["batch"] = images
    return True


def test_training_step(cfg, state):
    import jax
    import jax.numpy as jnp

    from distillation_trajectories_tpu.training import (
        create_train_state,
        make_optimizer,
        make_teacher_train_step,
    )

    tx = make_optimizer(cfg)
    train_state = create_train_state(state["model"], state["variables"], tx)
    step = make_teacher_train_step(state["model"], tx, state["dp"], cfg.timesteps)
    train_state, loss = step(
        train_state, jnp.asarray(state["batch"]), jax.random.PRNGKey(2)
    )
    loss = float(loss)
    print(f"  one-step loss: {loss:.5f}")
    assert np.isfinite(loss)
    # the donating train step consumed the original variables' buffers —
    # re-capture the updated ones for the sampling stage
    state["variables"] = {
        "params": train_state.params,
        "batch_stats": train_state.batch_stats,
    }
    return True


def test_sampling(cfg, state):
    import jax

    from distillation_trajectories_tpu.diffusion import p_sample_loop
    from distillation_trajectories_tpu.training import make_eval_model_fn

    model_fn = make_eval_model_fn(state["model"], state["variables"])
    img, traj = p_sample_loop(
        model_fn, (2, 16, 16, 1), cfg.sample_steps, state["dp"],
        jax.random.PRNGKey(3), num_timesteps=5, track_trajectory=True,
    )
    assert img.shape == (2, 16, 16, 1)
    assert traj.shape[0] == 6
    return True


def run_tests():
    """Sequence tests with early abort on critical failures
    (reference test_diffusion.py:243-266)."""
    cfg = make_test_config()
    state = {}
    stages = [
        ("device setup", lambda: test_device_setup(), True),
        ("model init + forward", lambda: test_model_forward(cfg, state), True),
        ("diffusion params", lambda: test_diffusion_params(cfg, state), True),
        ("forward diffusion", lambda: test_forward_diffusion(cfg, state), False),
        ("data loader", lambda: test_data_loader(cfg, state), True),
        ("training step", lambda: test_training_step(cfg, state), False),
        ("sampling", lambda: test_sampling(cfg, state), False),
    ]
    passed = 0
    for name, fn, critical in stages:
        print(f"\n[{name}]")
        try:
            fn()
            print(f"  ✓ {name}")
            passed += 1
        except Exception as e:
            print(f"  ✗ {name}: {e}")
            traceback.print_exc()
            if critical:
                print("critical failure — aborting")
                break
    print(f"\n{passed}/{len(stages)} smoke tests passed")
    return passed == len(stages)


if __name__ == "__main__":
    sys.exit(0 if run_tests() else 1)

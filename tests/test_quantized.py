"""int8 quantized-inference lane (models/quantized.py).

Exactness strategy: the quantized forward re-implements the U-Net eval
topology, so the risk is the two implementations drifting apart.  The
fold-only float twin (``nbits=None``) pins the re-implementation + BN
folding against ``model.apply`` to float tolerance; the int8 path is then
only the quantization error on top.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distillation_trajectories_tpu.config import Config
from distillation_trajectories_tpu.models.quantized import (
    make_quantized_eval_fn,
    quantize_unet_variables,
    quantized_unet_apply,
)
from distillation_trajectories_tpu.models.unet import init_unet, make_unet


def _tiny_config(**kw):
    return Config(
        dataset="MNIST",
        image_size=16,
        channels=1,
        timesteps=6,
        compute_dtype="float32",
        dropout=0.3,  # must be inert at eval regardless of value
        **kw,
    )


def _model_and_vars(config, size_factor=0.1, seed=0, **model_kw):
    model = make_unet(config, size_factor=size_factor)
    if model_kw:
        model = model.clone(**model_kw)
    variables = jax.device_get(init_unet(model, config, jax.random.PRNGKey(seed)))
    # Non-trivial BN running stats: init gives mean=0/var=1, which would let
    # a broken fold pass the parity test trivially.
    rng = np.random.RandomState(seed + 1)
    bs = variables["batch_stats"]
    for blk in bs.values():
        for nrm in blk.values():
            nrm["mean"] = rng.normal(0.0, 0.3, nrm["mean"].shape).astype(np.float32)
            nrm["var"] = (0.5 + rng.rand(*nrm["var"].shape)).astype(np.float32)
    return model, variables


def _inputs(config, b=2, seed=3):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(k1, (b, config.image_size, config.image_size, config.channels))
    t = jnp.array([1.0, 4.0][:b])
    cond = jax.random.uniform(k2, (b, 1))
    mask = jnp.ones((b, 1))
    return x, t, cond, mask


@pytest.mark.parametrize("full_res_head", [False, True])
def test_fold_only_matches_float(full_res_head):
    """BN folding + the re-implemented forward == model.apply exactly-ish."""
    config = _tiny_config()
    model, variables = _model_and_vars(config, full_res_head=full_res_head)
    x, t, cond, mask = _inputs(config)
    qvars = quantize_unet_variables(model, variables, nbits=None)

    ref = model.apply(variables, x, t, cond=cond, cond_mask=mask, train=False)
    got = quantized_unet_apply(model, qvars, x, t, cond, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    # cond=None branch (mask-0 semantics)
    ref0 = model.apply(variables, x, t, cond=None, train=False)
    got0 = quantized_unet_apply(model, qvars, x, t, None, None)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0), rtol=1e-4, atol=1e-4)


def test_int8_forward_close_to_float():
    config = _tiny_config()
    model, variables = _model_and_vars(config)
    x, t, cond, mask = _inputs(config)
    ref = np.asarray(model.apply(variables, x, t, cond=cond, cond_mask=mask, train=False))
    got = np.asarray(make_quantized_eval_fn(model, variables)(x, t, cond, mask))
    assert got.dtype == np.float32 and got.shape == ref.shape
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    assert np.isfinite(got).all()
    assert rel < 0.15, f"int8 relative error {rel:.3f}"


def test_int8_trajectory_close_to_float():
    from distillation_trajectories_tpu.trajectories.engine import generate_trajectory

    config = _tiny_config()
    model, variables = _model_and_vars(config)
    noise = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 1))
    f = generate_trajectory(model, variables, noise, config.timesteps,
                            seed=5, guidance_scale=3.0, config=config)
    q = generate_trajectory(
        model, variables, noise, config.timesteps, seed=5, guidance_scale=3.0,
        config=dataclasses.replace(config, sampler_quant="int8"),
    )
    assert q.shape == f.shape
    qe, fe = np.asarray(q[-1]), np.asarray(f[-1])
    assert np.isfinite(qe).all()
    rel = np.linalg.norm(qe - fe) / (np.linalg.norm(fe) + 1e-12)
    assert rel < 0.5, f"endpoint drift {rel:.3f}"
    # identical per-step noise: the first stored entry is the shared init
    np.testing.assert_array_equal(np.asarray(q[0]), np.asarray(f[0]))


def test_sweep_fn_int8_runs():
    from distillation_trajectories_tpu.diffusion.sampling import CFG_COND_PAIRS
    from distillation_trajectories_tpu.trajectories.engine import (
        make_sweep_trajectory_fn,
    )

    config = _tiny_config(sampler_quant="int8")
    model, variables = _model_and_vars(config)
    fn = make_sweep_trajectory_fn(model, variables, config.timesteps, config)
    noises = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16, 1))
    seeds = jnp.array([0, 1], dtype=jnp.int32)
    trajs = fn(noises, seeds, jnp.asarray(CFG_COND_PAIRS), jnp.float32(3.0))
    assert trajs.shape == (2, config.timesteps + 1, 16, 16, 1)
    assert np.isfinite(np.asarray(trajs)).all()


def test_group_norm_rejected():
    config = _tiny_config()
    model, variables = _model_and_vars(config)
    with pytest.raises(ValueError, match="norm='batch'"):
        quantize_unet_variables(model.clone(norm="group"), variables)


def test_int8_tree_dtypes():
    config = _tiny_config()
    model, variables = _model_and_vars(config)
    q = jax.device_get(quantize_unet_variables(model, variables))
    blk = q["blocks"]["enc2"]  # has a residual projection (16 -> 32)
    assert blk["conv1"]["w_int8"].dtype == np.int8
    assert blk["conv2"]["w_int8"].dtype == np.int8
    assert "residual" in blk
    assert blk["residual"]["w_int8"].dtype == np.int8
    assert blk["conv1"]["scale"].dtype == np.float32
    # enc3 -> enc4 keep the same channel count at this size: no projection
    assert "residual" not in q["blocks"]["enc4"]


def test_guided_eval_fn_composes_with_int8():
    """The w-conditioned single-forward student path accepts quant='int8'."""
    from distillation_trajectories_tpu.training.progressive import (
        make_guided_eval_fn,
    )

    config = _tiny_config()
    model, variables = _model_and_vars(config)
    x, t, _, _ = _inputs(config)
    ref = np.asarray(make_guided_eval_fn(model, variables, 3.0)(x, t, None, None))
    got = np.asarray(
        make_guided_eval_fn(model, variables, 3.0, quant="int8")(x, t, None, None)
    )
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    assert np.isfinite(got).all() and rel < 0.15


def test_sweep_fn_int8_on_mesh():
    """int8 sampler under an SPMD batch sharding: the dynamic activation-max
    reductions become cross-device collectives — GSPMD must handle them."""
    from distillation_trajectories_tpu.diffusion.sampling import CFG_COND_PAIRS
    from distillation_trajectories_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
    )
    from distillation_trajectories_tpu.trajectories.engine import (
        make_sweep_trajectory_fn,
    )

    config = _tiny_config(sampler_quant="int8")
    model, variables = _model_and_vars(config)
    fn = make_sweep_trajectory_fn(model, variables, config.timesteps, config)
    noises = jax.random.normal(jax.random.PRNGKey(9), (8, 16, 16, 1))
    seeds = jnp.arange(8, dtype=jnp.int32)
    ref = np.asarray(fn(noises, seeds, jnp.asarray(CFG_COND_PAIRS), jnp.float32(3.0)))

    mesh = make_mesh((4, 2))
    sharded = jax.device_put(noises, batch_sharding(mesh))
    got = np.asarray(fn(sharded, seeds, jnp.asarray(CFG_COND_PAIRS), jnp.float32(3.0)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_bench_quant_cli_contract(tmp_path, monkeypatch):
    """scripts/bench_quant.py end-to-end on CPU: JSON record contract."""
    import json
    import runpy
    import sys

    out = tmp_path / "bench_quant.json"
    monkeypatch.setattr(sys, "argv", [
        "bench_quant.py", "--batch", "2", "--timesteps", "4", "--iters", "1",
        "--size_factor", "0.05", "--out", str(out),
    ])
    monkeypatch.syspath_prepend("scripts")
    runpy.run_path("scripts/bench_quant.py", run_name="__main__")
    rec = json.loads(out.read_text())
    for key in ("float_traj_per_s", "int8_traj_per_s", "speedup",
                "endpoint_rel_l2", "weights", "preflight"):
        assert key in rec, key
    assert rec["weights"] == "random-init"
    assert rec["endpoint_rel_l2"] < 0.05


def test_int8_forward_bf16_model():
    """Default compute_dtype is bfloat16 — the quant lane must hold there."""
    config = _tiny_config()
    config = dataclasses.replace(config, compute_dtype="bfloat16")
    model, variables = _model_and_vars(config)
    x, t, cond, mask = _inputs(config)
    ref = np.asarray(model.apply(variables, x, t, cond=cond, cond_mask=mask,
                                 train=False))
    got = np.asarray(make_quantized_eval_fn(model, variables)(x, t, cond, mask))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    assert np.isfinite(got).all() and rel < 0.15


def _calibrated_scales(model, variables, config, n=3):
    from distillation_trajectories_tpu.models.quantized import (
        calibrate_activation_scales,
    )

    k = jax.random.PRNGKey(11)
    xs = jax.random.normal(k, (n, 2, config.image_size, config.image_size,
                               config.channels))
    ts = jnp.stack([jnp.array([1.0, 4.0]) + i for i in range(n)])
    conds = jnp.ones((n, 2, 1))
    masks = jnp.ones((n, 2, 1))
    return calibrate_activation_scales(model, variables, xs, ts, conds, masks)


def test_static_scales_close_to_float_and_host_side():
    """Calibrated static activation scales: host floats (never device
    arrays — they'd become closed-over constants), fidelity comparable to
    the dynamic path on in-calibration-range inputs."""
    config = _tiny_config()
    model, variables = _model_and_vars(config)
    scales = _calibrated_scales(model, variables, config)
    for blk in scales.values():
        for s in blk.values():
            assert isinstance(s, float) and s > 0
    assert set(scales) == {"enc1", "enc2", "enc3", "enc4", "bottleneck",
                           "dec3", "dec2", "dec1"}

    x, t, cond, mask = _inputs(config)
    ref = np.asarray(model.apply(variables, x, t, cond=cond, cond_mask=mask,
                                 train=False))
    got = np.asarray(
        make_quantized_eval_fn(model, variables, act_scales=scales)(
            x, t, cond, mask))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    assert np.isfinite(got).all() and rel < 0.2, f"static-scale rel {rel:.3f}"


def test_static_scales_remove_dynamic_reductions():
    """The static-scale graph must not contain the per-conv max-abs
    reductions (the dynamic mode's serialization point)."""
    config = _tiny_config()
    model, variables = _model_and_vars(config)
    scales = _calibrated_scales(model, variables, config)
    x, t, cond, mask = _inputs(config)

    def hlo(fn):
        return jax.jit(lambda v, *a: fn(v)(*a)).lower(
            variables, x, t, cond, mask).as_text()

    dyn = hlo(lambda v: make_quantized_eval_fn(model, v))
    sta = hlo(lambda v: make_quantized_eval_fn(model, v, act_scales=scales))
    # The dynamic graph reduces each activation to a scalar max; the static
    # one must not (weight-scale constants are fine — look for the reduce).
    assert dyn.count("reduce") > sta.count("reduce")


def test_mixed_precision_quant_blocks():
    """quant_blocks leaves excluded Blocks on the folded-float path."""
    config = _tiny_config()
    model, variables = _model_and_vars(config)
    keep = {"enc1", "enc2", "dec2", "dec1"}
    qvars = quantize_unet_variables(model, variables, quant_blocks=keep)
    for name, blk in qvars["blocks"].items():
        key = "w_int8" if name in keep else "w"
        assert key in blk["conv1"], (name, list(blk["conv1"]))
        assert key in blk["conv2"]

    x, t, cond, mask = _inputs(config)
    ref = np.asarray(model.apply(variables, x, t, cond=cond, cond_mask=mask,
                                 train=False))
    got = np.asarray(
        make_quantized_eval_fn(model, variables, quant_blocks=keep)(
            x, t, cond, mask))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    # Fewer quantized blocks => error no worse than the all-int8 bound.
    assert np.isfinite(got).all() and rel < 0.15, f"mixed rel {rel:.3f}"

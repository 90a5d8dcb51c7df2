"""Metric suite parity tests against a direct numpy/scipy re-derivation of
the reference math (analysis/metrics/trajectory_metrics.py:12-325)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import wasserstein_distance as scipy_wasserstein

from distillation_trajectories_tpu.metrics import (
    compute_trajectory_metrics,
    compute_trajectory_metrics_batch,
    transform_metrics,
    wasserstein_1d,
    resample_trajectory,
)


def _reference_metrics(teacher, student):
    """Direct numpy transcription of the reference metric definitions."""
    n = teacher.shape[0]
    h, w = teacher.shape[1], teacher.shape[2]
    total_pixels = h * w
    x = teacher.reshape(n, -1).astype(np.float64)
    y = student.reshape(n, -1).astype(np.float64)
    m = {}
    m["endpoint_distance"] = np.linalg.norm(x[-1] - y[-1])
    mse = np.mean((x[-1] - y[-1]) ** 2)
    m["mse"] = mse
    traj_mse = np.mean([np.mean((x[i] - y[i]) ** 2) for i in range(n)])
    with np.errstate(invalid="ignore"):  # NaN for mse > ~1e-3 is the
        m["trajectory_mse"] = np.log1p(1.0 - traj_mse * 1000)  # ref's quirk
    pd = [np.linalg.norm(x[i] - y[i]) for i in range(n)]
    m["point_by_point_similarity"] = np.exp(-5.0 * np.mean(pd))
    m["log_mse_similarity"] = max(0, 1.0 - np.log1p(mse * 5000) / np.log1p(5000))
    t_steps = [np.linalg.norm(x[i] - x[i - 1]) for i in range(1, n)]
    s_steps = [np.linalg.norm(y[i] - y[i - 1]) for i in range(1, n)]
    tpl = sum(s / total_pixels for s in t_steps) / (n - 1)
    spl = sum(s / total_pixels for s in s_steps) / (n - 1)
    m["teacher_path_length"] = tpl
    m["student_path_length"] = spl
    m["path_length_similarity"] = np.log1p(min(tpl, spl) / max(tpl, spl))
    te = np.linalg.norm(x[-1] - x[0]) / tpl
    se = np.linalg.norm(y[-1] - y[0]) / spl
    m["teacher_efficiency"] = te
    m["student_efficiency"] = se
    m["efficiency_similarity"] = np.log1p(min(te, se) / max(te, se))
    vs = [min(a, b) / max(a, b) if max(a, b) > 0 else 1.0 for a, b in zip(t_steps, s_steps)]
    m["mean_velocity_similarity"] = np.mean(vs)
    m["mean_position_difference"] = np.mean(pd)
    m["max_position_difference"] = np.max(pd)
    dc, wdc = [], []
    for i in range(n - 1):
        td, sd = x[i + 1] - x[i], y[i + 1] - y[i]
        tn, sn = np.linalg.norm(td), np.linalg.norm(sd)
        if tn > 0 and sn > 0:
            cos = np.dot(td, sd) / (tn * sn)
            dc.append(cos)
            wdc.append(cos * (tn + sn) / 2)
    m["mean_directional_consistency"] = np.mean(dc) if dc else 0.0
    total_weight = sum((t_steps[i] + s_steps[i]) / 2 for i in range(n - 1))
    wm = sum(wdc) / total_weight if total_weight > 0 else 0.0
    m["weighted_directional_consistency"] = wm**2
    m["path_alignment"] = np.exp(-10.0 * np.sum(pd) / len(pd))
    return m


@pytest.fixture
def traj_pair():
    rng = np.random.default_rng(0)
    n, h, w, c = 12, 8, 8, 1
    teacher = rng.standard_normal((n, h, w, c)).astype(np.float32)
    student = teacher + 0.1 * rng.standard_normal((n, h, w, c)).astype(np.float32)
    # reproduce the engine's duplicated final state (zero-norm last step)
    teacher[-1] = teacher[-2]
    student[-1] = student[-2]
    return teacher, student


def test_metrics_match_reference_math(traj_pair):
    teacher, student = traj_pair
    got = compute_trajectory_metrics(teacher, student)
    want = _reference_metrics(teacher, student)
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=2e-4, atol=1e-6, err_msg=k)


def test_wasserstein_matches_scipy():
    rng = np.random.default_rng(1)
    u = rng.standard_normal(500)
    v = rng.standard_normal(500) * 1.3 + 0.2
    got = float(wasserstein_1d(jnp.asarray(u), jnp.asarray(v)))
    want = scipy_wasserstein(u, v)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_full_pixel_wasserstein_exact(traj_pair):
    """When D ≤ sample_size the metric uses all pixels: must equal scipy."""
    teacher, student = traj_pair  # D = 64 < 1000
    got = compute_trajectory_metrics(teacher, student)
    n = teacher.shape[0]
    x = teacher.reshape(n, -1)
    y = student.reshape(n, -1)
    want = [scipy_wasserstein(x[i], y[i]) for i in range(n)]
    np.testing.assert_allclose(got["wasserstein_distances"], want, rtol=1e-4)
    np.testing.assert_allclose(got["mean_wasserstein"], np.mean(want), rtol=1e-4)
    np.testing.assert_allclose(
        got["distribution_similarity"], np.log1p(np.exp(-np.mean(want))), rtol=1e-4
    )


def test_directional_consistency_skips_zero_norm_steps(traj_pair):
    teacher, student = traj_pair
    got = compute_trajectory_metrics(teacher, student)
    # last step is zero-norm (duplicated state) → one fewer entry
    assert len(got["directional_consistency"]) == teacher.shape[0] - 2


def test_identical_trajectories_perfect_scores(traj_pair):
    teacher, _ = traj_pair
    got = compute_trajectory_metrics(teacher, teacher.copy())
    assert got["endpoint_distance"] == 0.0
    assert got["mse"] == 0.0
    np.testing.assert_allclose(got["mean_directional_consistency"], 1.0, rtol=1e-5)
    np.testing.assert_allclose(got["path_alignment"], 1.0)
    np.testing.assert_allclose(got["mean_velocity_similarity"], 1.0)
    np.testing.assert_allclose(got["mean_wasserstein"], 0.0, atol=1e-7)


def test_resample_trajectory_linear():
    traj = jnp.arange(5.0).reshape(5, 1, 1, 1)
    out = resample_trajectory(traj, 9)
    np.testing.assert_allclose(
        np.asarray(out).ravel(), np.linspace(0, 4, 9), rtol=1e-6
    )


def test_unequal_length_resampling(traj_pair):
    teacher, student = traj_pair
    # Longer student trajectory resampled to teacher length (ref :239-279)
    longer = np.concatenate([student, student[-1:]], axis=0)
    got = compute_trajectory_metrics(teacher, longer)
    assert np.isfinite(got["path_alignment"])


def test_batch_metrics_aggregates(traj_pair):
    teacher, student = traj_pair
    tb = np.stack([teacher, teacher])
    sb = np.stack([student, teacher])
    out = compute_trajectory_metrics_batch(tb, sb)
    assert out["endpoint_distance"].shape == (2,)
    assert "endpoint_distance_avg" in out
    assert out["endpoint_distance"][1] == 0.0


def test_transform_metrics_ranges():
    out = transform_metrics(0.65, 0.4, -0.8, 0.6)
    assert out["path_length_similarity"] == 0.65
    np.testing.assert_allclose(
        out["trajectory_mse"],
        np.clip(1 - np.log1p(0.4) / np.log1p(1.0), 0, 1),
    )
    assert out["mean_directional_consistency"] == 0.8
    np.testing.assert_allclose(
        out["distribution_similarity"],
        np.clip(np.log1p(0.6) / np.log1p(1.0), 0, 1),
    )

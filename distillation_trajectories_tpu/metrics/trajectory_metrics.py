"""Trajectory-similarity metric suite, computed as fused on-device tensor ops.

TPU-native re-design of reference ``analysis/metrics/trajectory_metrics.py:
12-325``: instead of Python loops over lists of CPU tensors, trajectories are
stacked arrays ``[N, ...]`` and the entire 15-metric suite is one jitted
function (vmappable over samples).  Every metric reproduces the reference's
exact definitions, including its idiosyncratic transforms:

* trajectory MSE ×1000 → 1−x → log1p (ref :78-86)
* point-by-point similarity exp(−5·d̄) (ref :88-101)
* log-MSE similarity with ×5000 scale (ref :103-108)
* per-pixel-normalized path lengths (ref :110-131)
* log1p(min/max) path-length & efficiency similarities (ref :133-153)
* directional consistency = mean cosine of step vectors, skipping zero-norm
  steps exactly like the reference's guard (ref :189-218)
* weighted directional consistency squared (ref :220-231)
* path alignment exp(−10·area/n) (ref :233-293)
* per-step 1-D Wasserstein on 1000 sampled pixels — sort-based, which is
  exact for equal-size unweighted samples and matches
  ``scipy.stats.wasserstein_distance`` (ref :295-315)
* distribution similarity log1p(exp(−W̄)) (ref :317-323)
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

WASSERSTEIN_SAMPLE_SIZE = 1000  # ref trajectory_metrics.py:301


def wasserstein_1d(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """1-D Wasserstein distance for equal-size unweighted samples.

    Equals ``scipy.stats.wasserstein_distance(u, v)`` when ``len(u)==len(v)``
    with uniform weights: mean |sort(u) − sort(v)|.
    """
    return jnp.mean(jnp.abs(jnp.sort(u) - jnp.sort(v)))


@partial(jax.jit, static_argnames=("sample_size",))
def _metrics_core(
    teacher: jnp.ndarray,
    student: jnp.ndarray,
    key: jax.Array,
    sample_size: int = WASSERSTEIN_SAMPLE_SIZE,
) -> Dict[str, jnp.ndarray]:
    """All metrics over flattened trajectories.

    Args:
        teacher/student: ``[N, H, W, C]`` (or any ``[N, ...]``) stacked
            trajectory arrays of equal length N.
        key: PRNG key for the Wasserstein pixel subsampling.
    """
    n = teacher.shape[0]
    spatial = teacher.shape[1:]
    # H*W (ref :116-117 uses shape[2:] of NCHW = H,W)
    total_pixels = int(np.prod(spatial[:-1])) if len(spatial) >= 2 else int(
        np.prod(spatial)
    )
    x = teacher.reshape(n, -1).astype(jnp.float32)
    y = student.reshape(n, -1).astype(jnp.float32)
    d = x.shape[1]

    m: Dict[str, jnp.ndarray] = {}

    # Endpoint distance & final MSE (ref :54-60)
    m["endpoint_distance"] = jnp.linalg.norm(x[-1] - y[-1])
    mse = jnp.mean((x[-1] - y[-1]) ** 2)
    m["mse"] = mse

    # Trajectory MSE with ×1000, 1−x, log1p transform (ref :62-86)
    traj_mse = jnp.mean((x - y) ** 2)
    m["trajectory_mse"] = jnp.log1p(1.0 - traj_mse * 1000.0)

    # Point-by-point similarity (ref :88-101)
    point_distances = jnp.linalg.norm(x - y, axis=1)  # [N]
    m["position_differences"] = point_distances
    avg_point_distance = jnp.mean(point_distances)
    m["point_by_point_similarity"] = jnp.exp(-5.0 * avg_point_distance)

    # Log MSE similarity (ref :103-108)
    log_mse_sim = 1.0 - jnp.log1p(mse * 5000.0) / jnp.log1p(5000.0)
    m["log_mse_similarity"] = jnp.maximum(0.0, log_mse_sim)

    # Path lengths, per-pixel normalized and step-averaged (ref :110-131)
    t_steps = jnp.linalg.norm(x[1:] - x[:-1], axis=1)  # [N-1] velocities
    s_steps = jnp.linalg.norm(y[1:] - y[:-1], axis=1)
    teacher_path_length = jnp.sum(t_steps / total_pixels) / (n - 1)
    student_path_length = jnp.sum(s_steps / total_pixels) / (n - 1)
    m["teacher_path_length"] = teacher_path_length
    m["student_path_length"] = student_path_length

    # Path length similarity log1p(min/max) (ref :133-137)
    pl_max = jnp.maximum(teacher_path_length, student_path_length)
    pl_min = jnp.minimum(teacher_path_length, student_path_length)
    m["path_length_similarity"] = jnp.log1p(
        jnp.where(pl_max > 0, pl_min / pl_max, 1.0)
    )
    m["path_length_ratio"] = jnp.where(
        teacher_path_length > 0, student_path_length / teacher_path_length, jnp.inf
    )

    # Path efficiency: endpoint-to-start / path length (ref :139-153)
    t_e2s = jnp.linalg.norm(x[-1] - x[0])
    s_e2s = jnp.linalg.norm(y[-1] - y[0])
    teacher_eff = jnp.where(teacher_path_length > 0, t_e2s / teacher_path_length, 0.0)
    student_eff = jnp.where(student_path_length > 0, s_e2s / student_path_length, 0.0)
    m["teacher_efficiency"] = teacher_eff
    m["student_efficiency"] = student_eff
    eff_max = jnp.maximum(teacher_eff, student_eff)
    eff_min = jnp.minimum(teacher_eff, student_eff)
    m["efficiency_similarity"] = jnp.log1p(
        jnp.where(eff_max > 0, eff_min / eff_max, 1.0)
    )

    # Velocity profiles & per-step similarity (ref :155-177)
    m["teacher_velocities"] = t_steps
    m["student_velocities"] = s_steps
    v_max = jnp.maximum(t_steps, s_steps)
    v_min = jnp.minimum(t_steps, s_steps)
    velocity_similarities = jnp.where(v_max > 0, v_min / v_max, 1.0)
    m["velocity_similarities"] = velocity_similarities
    m["mean_velocity_similarity"] = jnp.mean(velocity_similarities)

    # Position differences summary (ref :179-187)
    m["mean_position_difference"] = jnp.mean(point_distances)
    m["max_position_difference"] = jnp.max(point_distances)

    # Directional consistency: cosine of step vectors; the reference skips
    # steps where either norm is zero (ref :195-218), so we mask them out of
    # the mean (the engine's duplicated final state makes the last step
    # zero-norm by construction).
    t_dir = x[1:] - x[:-1]
    s_dir = y[1:] - y[:-1]
    valid = (t_steps > 0) & (s_steps > 0)
    dots = jnp.sum(t_dir * s_dir, axis=1)
    denom = jnp.where(valid, t_steps * s_steps, 1.0)
    cos_sims = jnp.where(valid, dots / denom, 0.0)
    n_valid = jnp.sum(valid)
    m["directional_consistency"] = cos_sims
    m["directional_consistency_valid"] = valid
    m["mean_directional_consistency"] = jnp.where(
        n_valid > 0, jnp.sum(cos_sims) / n_valid, 0.0
    )

    # Weighted directional consistency squared (ref :212-231): weights are
    # the mean of teacher/student step magnitudes; the normalizer sums over
    # *all* steps (not just valid ones), matching the reference.
    weights = (t_steps + s_steps) / 2.0
    weighted_sum = jnp.sum(jnp.where(valid, cos_sims * weights, 0.0))
    total_weight = jnp.sum(weights)
    weighted_mean = jnp.where(total_weight > 0, weighted_sum / total_weight, 0.0)
    m["weighted_directional_consistency"] = weighted_mean**2

    # Path alignment exp(−10·area/n) (ref :233-293).  Trajectories here
    # always have equal length so no interp1d resampling branch is needed
    # (see ``resample_trajectory`` for the unequal-length path).
    path_area = jnp.sum(point_distances)
    m["path_alignment"] = jnp.exp(-10.0 * path_area / n)

    # Per-step 1-D Wasserstein on sampled pixels (ref :295-315): the
    # reference draws a fresh uniform without-replacement pixel subset per
    # step.  Selecting the pixels whose i.i.d. uniform keys rank in the
    # smallest k is exactly such a draw, and one multi-payload key-value
    # sort realizes it for every step at once — no per-step
    # ``random.choice`` (each of which hides a D-wide argsort) and no
    # gather, the two ops that dominated the profile on v5e (measured:
    # choice 3.9 s + gather 0.32 s vs 0.08 s for the sorts themselves at
    # S=256, T=50, D=3072).  Deterministic in ``key``.
    k = min(sample_size, d)
    if k == d:
        xs, ys = x, y
    else:
        u = jax.random.uniform(key, (n, d))
        _, xs, ys = jax.lax.sort((u, x, y), num_keys=1)
        xs = xs[:, :k]
        ys = ys[:, :k]
    wdists = jnp.mean(
        jnp.abs(jnp.sort(xs, axis=1) - jnp.sort(ys, axis=1)), axis=1
    )
    m["wasserstein_distances"] = wdists
    mean_w = jnp.mean(wdists)
    m["mean_wasserstein"] = mean_w

    # Distribution similarity log1p(exp(−W̄)) (ref :317-323)
    m["distribution_similarity"] = jnp.log1p(jnp.exp(-mean_w))
    return m


def _squeeze_traj(traj) -> jnp.ndarray:
    """Accept [N,H,W,C], [N,1,H,W,C] or a list of per-step arrays."""
    if isinstance(traj, (list, tuple)):
        traj = jnp.stack([jnp.asarray(t) for t in traj])
    traj = jnp.asarray(traj)
    if traj.ndim == 5 and traj.shape[1] == 1:
        traj = traj[:, 0]
    return traj


def compute_trajectory_metrics(
    teacher_trajectory,
    student_trajectory,
    config=None,
    key: Optional[jax.Array] = None,
    as_python: bool = True,
) -> Dict[str, object]:
    """Full metric dict for a teacher/student trajectory pair.

    Drop-in analog of reference ``compute_trajectory_metrics``
    (trajectory_metrics.py:12-325); returns Python floats / numpy arrays by
    default for host-side viz compatibility.  Also emits the
    ``teacher_accelerations`` / ``student_accelerations`` entries that the
    reference's ``visualize_metrics`` reads but its compute function never
    produced (latent KeyError noted in SURVEY.md §2 item 11).
    """
    teacher = _squeeze_traj(teacher_trajectory)
    student = _squeeze_traj(student_trajectory)
    n = min(teacher.shape[0], student.shape[0])
    if teacher.shape[0] != student.shape[0]:
        teacher = resample_trajectory(teacher, n)
        student = resample_trajectory(student, n)
    # Spatial resize if needed (ref :40-52)
    if teacher.shape[1:] != student.shape[1:]:
        from ..models.unet import resize_bilinear_align_corners

        student = resize_bilinear_align_corners(
            student, (teacher.shape[1], teacher.shape[2])
        )
    if key is None:
        key = jax.random.PRNGKey(0)
    m = _metrics_core(teacher, student, key)

    # Accelerations: second differences of the velocity profile (fixes the
    # reference's missing-key bug for visualize_metrics).
    m["teacher_accelerations"] = jnp.abs(jnp.diff(m["teacher_velocities"]))
    m["student_accelerations"] = jnp.abs(jnp.diff(m["student_velocities"]))

    if not as_python:
        return m
    out: Dict[str, object] = {}
    for k, v in m.items():
        arr = np.asarray(v)
        if arr.ndim == 0:
            out[k] = float(arr)
        else:
            out[k] = arr.tolist() if k != "directional_consistency_valid" else arr
    # Match the reference contract: directional_consistency only contains the
    # valid entries (zero-norm steps are skipped, not zero-filled).
    valid = np.asarray(m["directional_consistency_valid"])
    cos = np.asarray(m["directional_consistency"])
    out["directional_consistency"] = cos[valid].tolist()
    del out["directional_consistency_valid"]
    return out


def resample_trajectory(traj: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Linear-in-time resampling of a trajectory to ``target_len`` points.

    On-device analog of the reference's scipy ``interp1d`` resampling for
    unequal trajectory lengths (trajectory_metrics.py:239-279).
    """
    n = traj.shape[0]
    if n == target_len:
        return traj
    src_t = jnp.linspace(0.0, 1.0, n)
    dst_t = jnp.linspace(0.0, 1.0, target_len)
    # positions in source index space
    pos = dst_t * (n - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    w = (pos - lo).reshape((target_len,) + (1,) * (traj.ndim - 1))
    return traj[lo] * (1.0 - w) + traj[hi] * w


# Batched (vmapped) variant over a leading samples axis ------------------------

def compute_trajectory_metrics_batch(
    teacher_trajs: jnp.ndarray,
    student_trajs: jnp.ndarray,
    key: Optional[jax.Array] = None,
) -> Dict[str, np.ndarray]:
    """Metrics for ``[S, N, H, W, C]`` paired trajectory batches.

    One vmapped+jitted evaluation across all samples — the TPU-native
    replacement for the reference's per-pair Python loop
    (trajectory_manager.py:434-548).  Returns per-sample arrays plus
    ``*_avg`` aggregate keys matching the reference batch contract.
    """
    teacher_trajs = jnp.asarray(teacher_trajs)
    student_trajs = jnp.asarray(student_trajs)
    s = teacher_trajs.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, s)
    batched = jax.vmap(lambda t, y, k: _metrics_core(t, y, k))(
        teacher_trajs, student_trajs, keys
    )
    out: Dict[str, np.ndarray] = {k: np.asarray(v) for k, v in batched.items()}
    for k in list(out.keys()):
        v = out[k]
        if v.ndim == 1 and v.shape[0] == s:
            out[f"{k}_avg"] = float(np.mean(v))
    return out

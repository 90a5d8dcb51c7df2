"""Per-timestep consecutive-step distance analysis.

TPU-native counterpart of reference
``analysis/metrics/time_dependent.py:10-152``: consecutive-step distances are
one vectorized diff/norm over stacked trajectory arrays instead of per-step
Python loops; plotting contract (filenames, labels) unchanged.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


def _stack(trajectories) -> Optional[np.ndarray]:
    """Normalize input to [n_traj, n_steps, ...]; accepts lists of arrays or
    lists of (image, t) tuples like the reference."""
    if trajectories is None or len(trajectories) == 0:
        return None
    out = []
    for traj in trajectories:
        if isinstance(traj[0], tuple):
            traj = [item[0] for item in traj]
        arr = np.stack([np.asarray(x) for x in traj]) if isinstance(
            traj, (list, tuple)
        ) else np.asarray(traj)
        out.append(arr)
    min_len = min(a.shape[0] for a in out)
    return np.stack([a[:min_len] for a in out])


def consecutive_distances(trajs: np.ndarray) -> np.ndarray:
    """[n_traj, n_steps-1] Euclidean distances between consecutive states."""
    x = jnp.asarray(trajs).reshape(trajs.shape[0], trajs.shape[1], -1)
    return np.asarray(jnp.linalg.norm(x[:, 1:] - x[:, :-1], axis=-1))


def analyze_time_dependent_distances(
    teacher_trajectories,
    student_trajectories,
    config,
    size_factor: Optional[float] = None,
    save_dir: Optional[str] = None,
) -> Dict:
    """Average per-timestep step distances for teacher vs student.

    Result keys match reference ``time_dependent.py:26-120``:
    ``teacher_distances``, ``student_distances``, ``*_avg_per_timestep``,
    ``*_avg_distance``, ``*_std_distance``, ``size_factor``.
    """
    print("Analyzing time-dependent distances...")
    results: Dict = {
        "teacher_distances": [],
        "student_distances": [],
        "teacher_avg_distance": 0,
        "student_avg_distance": 0,
        "teacher_std_distance": 0,
        "student_std_distance": 0,
        "size_factor": size_factor,
    }
    t_stack = _stack(teacher_trajectories)
    s_stack = _stack(student_trajectories)
    if t_stack is None or s_stack is None:
        print("  Warning: Empty trajectories provided. Returning empty results.")
        return results

    t_dists = consecutive_distances(t_stack)
    s_dists = consecutive_distances(s_stack)
    t_avg = t_dists.mean(axis=0)
    s_avg = s_dists.mean(axis=0)

    results["teacher_distances"] = [list(map(float, row)) for row in t_dists]
    results["student_distances"] = [list(map(float, row)) for row in s_dists]
    results["teacher_avg_per_timestep"] = t_avg.tolist()
    results["student_avg_per_timestep"] = s_avg.tolist()
    results["teacher_avg_distance"] = float(t_avg.mean())
    results["student_avg_distance"] = float(s_avg.mean())
    # Reference uses population std over the per-timestep averages (:113-120)
    results["teacher_std_distance"] = float(t_avg.std())
    results["student_std_distance"] = float(s_avg.std())

    if save_dir and len(t_avg) and len(s_avg):
        os.makedirs(save_dir, exist_ok=True)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(12, 6))
        plt.plot(t_avg, label="Teacher", color="blue")
        plt.plot(s_avg, label="Student", color="orange")
        title = "Average Distance Between Consecutive Timesteps"
        if size_factor is not None:
            title += f" (Size Factor: {size_factor})"
        plt.title(title)
        plt.xlabel("Timestep")
        plt.ylabel("Average Distance")
        plt.legend()
        plt.grid(True, linestyle="--", alpha=0.7)
        filename = "time_dependent_distances.png"
        if size_factor is not None:
            filename = f"time_dependent_distances_size_{size_factor}.png"
        plt.savefig(os.path.join(save_dir, filename), dpi=300, bbox_inches="tight")
        plt.close()

    return results

"""Disk-backed trajectory store.

TPU-native counterpart of reference ``utils/trajectory_manager.py:9-581``:

* Trajectory pairs are generated as one scan-compiled, vmapped batch on
  device (instead of per-step Python loops), then stored as compressed
  ``.npz`` files — same filename contract
  ``trajectory_size_{sf}_sample_{i}`` as the reference's pickles
  (trajectory_manager.py:233-241).
* The reference's ``_update_x`` used a hardcoded placeholder α=0.9
  (trajectory_manager.py:180-205, SURVEY.md §2.3); we use the real
  trajectory-engine update (the framework's single unified sampler) instead —
  a deliberate, documented correctness improvement.
* ``compute_trajectory_metrics_batch`` aggregates the same 13 metric-list
  keys + ``_avg`` fields (trajectory_manager.py:434-548) but evaluates all
  pairs in one vmapped metric call.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import get_diffusion_params
from ..diffusion.sampling import generate_trajectory_scan
from ..metrics.trajectory_metrics import compute_trajectory_metrics
from ..training.state import make_eval_model_fn

_TRAJ_RE = re.compile(r"trajectory_size_(.+)_sample_(\d+)\.(npz|pkl)$")


class TrajectoryManager:
    """Generates, stores, and scores paired teacher/student trajectories."""

    def __init__(
        self,
        teacher_model,
        student_model,
        config,
        size_factor: float = 1.0,
        fixed_samples=None,
        teacher_variables=None,
        student_variables=None,
    ):
        self.teacher_model = teacher_model
        self.student_model = student_model
        self.teacher_variables = teacher_variables
        self.student_variables = student_variables
        self.config = config
        self.size_factor = size_factor
        self.fixed_samples = fixed_samples
        os.makedirs(config.trajectory_dir, exist_ok=True)

    # -- generation -----------------------------------------------------

    def _pair_fn(self):
        t_fn = make_eval_model_fn(self.teacher_model, self.teacher_variables)
        s_fn = make_eval_model_fn(self.student_model, self.student_variables)
        dp = get_diffusion_params(self.config.teacher_steps, self.config)
        T = self.config.teacher_steps
        alphas = dp["alphas"]

        from .engine import _store_dtype

        sd = _store_dtype(self.config)

        def one(noise_hwc, seed):
            noise = noise_hwc[None]
            t_traj = generate_trajectory_scan(
                t_fn, noise, T, alphas, seed, store_dtype=sd
            )
            s_traj = generate_trajectory_scan(
                s_fn, noise, T, alphas, seed, store_dtype=sd
            )
            return t_traj[:, 0], s_traj[:, 0]

        return jax.jit(jax.vmap(one))

    def generate_trajectory(self, seed: Optional[int] = None):
        """One paired trajectory (reference trajectory_manager.py:65-165).

        Returns ``(teacher_traj, student_traj)`` as ``[T+1, H, W, C]`` arrays.
        """
        seed = 0 if seed is None else seed
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, self.config.image_size, self.config.image_size, self.config.channels),
        )
        pair = self._pair_fn()(noise, jnp.asarray([seed]))
        return np.asarray(pair[0][0]), np.asarray(pair[1][0])

    def generate_trajectory_from_sample(self, sample, seed: Optional[int] = None):
        """Paired trajectory starting from a fixed sample
        (reference trajectory_manager.py:265-387)."""
        seed = 0 if seed is None else seed
        sample = jnp.asarray(sample, dtype=jnp.float32)
        if sample.ndim == 3:
            sample = sample[None]
        pair = self._pair_fn()(sample, jnp.asarray([seed]))
        return np.asarray(pair[0][0]), np.asarray(pair[1][0])

    def _file_path(self, index: int) -> str:
        return os.path.join(
            self.config.trajectory_dir,
            f"trajectory_size_{self.size_factor}_sample_{index}.npz",
        )

    def generate_and_save_trajectories(
        self, num_samples: int = 10, chunk_size: Optional[int] = None
    ) -> List[str]:
        """Generate + persist ``num_samples`` pairs
        (reference trajectory_manager.py:207-263).

        Pairs are generated in vmapped device calls of ``chunk_size`` samples
        (default: all at once) and streamed to host npz files with the
        reference filename stems — the chunking bounds device memory for
        large T×samples sweeps (SURVEY.md §7 'trajectory memory').
        """
        if chunk_size is not None and chunk_size < num_samples:
            paths: List[str] = []
            for start in range(0, num_samples, chunk_size):
                n = min(chunk_size, num_samples - start)
                paths.extend(self._generate_chunk(start, n))
            return paths
        return self._generate_chunk(0, num_samples)

    def _generate_chunk(self, start: int, num_samples: int) -> List[str]:
        cfg = self.config
        end = start + num_samples
        if self.fixed_samples is not None and end <= len(self.fixed_samples):
            print(f"Using {num_samples} fixed samples for consistent comparison")
            noises = jnp.asarray(
                np.stack(
                    [np.asarray(s).reshape(
                        cfg.image_size, cfg.image_size, cfg.channels
                    ) for s in self.fixed_samples[start:end]]
                ),
                dtype=jnp.float32,
            )
        else:
            noises = jnp.stack(
                [
                    jax.random.normal(
                        jax.random.PRNGKey(i),
                        (cfg.image_size, cfg.image_size, cfg.channels),
                    )
                    for i in range(start, end)
                ]
            )
        seeds = jnp.arange(start, end, dtype=jnp.int32)
        t_trajs, s_trajs = self._pair_fn()(noises, seeds)
        # The npz disk contract is always float32 (parity with the reference
        # files and numpy-loadable without ml_dtypes); bf16 trajectory
        # storage only reduces on-device HBM traffic during generation.
        t_trajs = np.asarray(t_trajs, dtype=np.float32)
        s_trajs = np.asarray(s_trajs, dtype=np.float32)
        # Timestep labels: descending T-1..0 plus the initial state's T
        T = cfg.teacher_steps
        tsteps = np.concatenate([[T], np.arange(T - 1, -1, -1)])

        file_paths = []
        for i in range(num_samples):
            # Skip-and-continue on per-sample numerical failure, matching the
            # reference's per-trajectory try/except semantics
            # (trajectory_manager.py:226-230; SURVEY.md §5 failure detection).
            if not (np.isfinite(t_trajs[i]).all() and np.isfinite(s_trajs[i]).all()):
                print(
                    f"Warning: non-finite trajectory for sample {start + i}; "
                    "skipping"
                )
                continue
            path = self._file_path(start + i)
            np.savez_compressed(
                path,
                teacher=t_trajs[i],
                student=s_trajs[i],
                timesteps=tsteps,
                size_factor=self.size_factor,
            )
            file_paths.append(path)
        return file_paths

    # -- loading --------------------------------------------------------

    def load_trajectories(
        self,
        size_factor: Optional[float] = None,
        indices: Optional[Sequence[int]] = None,
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Load stored pairs by filename parse
        (reference trajectory_manager.py:389-432)."""
        sf = self.size_factor if size_factor is None else size_factor
        out = []
        for name in sorted(os.listdir(self.config.trajectory_dir)):
            m = _TRAJ_RE.match(name)
            if not m or m.group(1) != str(sf):
                continue
            idx = int(m.group(2))
            if indices is not None and idx not in indices:
                continue
            with np.load(os.path.join(self.config.trajectory_dir, name)) as z:
                out.append((z["teacher"], z["student"]))
        return out

    # -- metrics --------------------------------------------------------

    def compute_trajectory_metrics_batch(
        self,
        size_factor: Optional[float] = None,
        batch_size: int = 10,
    ) -> Dict[str, object]:
        """Aggregate the metric suite over all stored pairs.

        Reference ``trajectory_manager.py:434-548`` contract: 13 per-pair
        metric lists plus ``{key}_avg`` aggregates.
        """
        pairs = self.load_trajectories(size_factor=size_factor)
        if not pairs:
            return {}

        keys = [
            "wasserstein_distances",
            "wasserstein_distances_per_timestep",
            "endpoint_distances",
            "teacher_path_lengths",
            "student_path_lengths",
            "teacher_efficiency",
            "student_efficiency",
            "path_length_similarity",
            "efficiency_similarity",
            "mean_velocity_similarity",
            "mean_directional_consistency",
            "mean_position_difference",
            "distribution_similarity",
        ]
        all_metrics: Dict[str, list] = {k: [] for k in keys}

        for i, (t_traj, s_traj) in enumerate(pairs):
            metrics = compute_trajectory_metrics(
                t_traj, s_traj, self.config, key=jax.random.PRNGKey(i)
            )
            all_metrics["wasserstein_distances"].append(metrics["mean_wasserstein"])
            all_metrics["wasserstein_distances_per_timestep"].append(
                metrics["wasserstein_distances"]
            )
            all_metrics["endpoint_distances"].append(metrics["endpoint_distance"])
            all_metrics["teacher_path_lengths"].append(metrics["teacher_path_length"])
            all_metrics["student_path_lengths"].append(metrics["student_path_length"])
            all_metrics["teacher_efficiency"].append(metrics["teacher_efficiency"])
            all_metrics["student_efficiency"].append(metrics["student_efficiency"])
            for k in keys[7:]:
                all_metrics[k].append(metrics[k])

        for k in keys:
            vals = all_metrics.get(k)
            if vals and not isinstance(vals[0], (list, np.ndarray)):
                all_metrics[k + "_avg"] = float(np.mean(vals))
        # Scalar aliases for the similarity metrics (ref :540-546)
        for k in (
            "path_length_similarity",
            "efficiency_similarity",
            "mean_velocity_similarity",
            "mean_directional_consistency",
            "mean_position_difference",
            "distribution_similarity",
        ):
            if k + "_avg" in all_metrics:
                all_metrics[k] = all_metrics[k + "_avg"]
        return all_metrics


def generate_trajectories_with_disk_storage(
    teacher_model,
    student_model,
    config,
    size_factor: float = 1.0,
    num_samples: int = 10,
    fixed_samples=None,
    teacher_variables=None,
    student_variables=None,
) -> TrajectoryManager:
    """Cache-aware front door (reference trajectory_manager.py:550-581):
    reuses stored trajectories when they already exist for this size."""
    manager = TrajectoryManager(
        teacher_model,
        student_model,
        config,
        size_factor=size_factor,
        fixed_samples=fixed_samples,
        teacher_variables=teacher_variables,
        student_variables=student_variables,
    )
    existing = manager.load_trajectories()
    if len(existing) >= num_samples:
        print(
            f"Found {len(existing)} existing trajectories for size "
            f"{size_factor}; skipping generation"
        )
        return manager
    manager.generate_and_save_trajectories(num_samples)
    return manager

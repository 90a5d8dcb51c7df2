"""Trajectory generation, comparison, and disk-backed storage."""
from .engine import (
    generate_trajectory,
    compare_trajectories,
    make_paired_trajectory_fn,
)
from .manager import TrajectoryManager, generate_trajectories_with_disk_storage

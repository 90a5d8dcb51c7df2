"""Trajectory-similarity metric suite, transforms, and visualization."""
from .trajectory_metrics import (
    compute_trajectory_metrics,
    compute_trajectory_metrics_batch,
    wasserstein_1d,
    resample_trajectory,
)
from .transformations import transform_metrics
from .visualize import visualize_metrics, visualize_batch_metrics

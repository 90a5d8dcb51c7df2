"""Analysis: dimensionality reduction, latent space, noise prediction,
cross-size visualization.

Also re-exports the canonical public API like the reference's
``analysis/__init__.py:5-35``.
"""
from .dimensionality import dimensionality_reduction_analysis, pca_fit_transform
from .latent_space import generate_latent_space_visualization
from .noise_prediction import (
    analyze_noise_prediction,
    calculate_noise_metrics,
)
from .visualization import (
    plot_time_dependent_grid,
    plot_time_dependent_combined,
    plot_trajectory_divergence_vs_timestep,
    generate_3d_model_size_visualization,
    create_denoising_comparison_plot,
)

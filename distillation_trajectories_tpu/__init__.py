"""distillation_trajectories_tpu — TPU-native diffusion trajectory-distillation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
henriChevreux/distillation_trajectories: DDPM teacher training, multi-size
student distillation, scan-compiled trajectory generation with fused CFG, a
vmapped trajectory-metric suite, and the full analysis/visualization/editing
stack.

The re-exports below mirror the reference's canonical public API
(``analysis/__init__.py:5-35``).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache (opt-in via DTT_COMPILE_CACHE=<dir>):
# the full U-Net train-step compile takes minutes on the TPU, and caching
# makes subsequent CLI invocations start in seconds — but serializing the
# large scan executables HANGS the axon TPU plugin in this image (measured:
# identical program compiles in ~40 s with the cache off and never finishes
# with it on), so the cache is NOT enabled by default.
_cache_dir = _os.environ.get("DTT_COMPILE_CACHE", "")
if _cache_dir and _cache_dir != "0":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the flags
        pass

from .config import Config
from .models import DiffusionUNet, SimpleUNet, StudentUNet, make_unet
from .diffusion import (
    get_diffusion_params,
    q_sample,
    p_losses,
    p_sample,
    p_sample_loop,
    generate_trajectory_scan,
)

# Canonical analysis API (reference analysis/__init__.py:5-35)
from .trajectories import compare_trajectories, generate_trajectory
from .metrics import (
    compute_trajectory_metrics,
    transform_metrics,
    visualize_metrics,
    visualize_batch_metrics,
    calculate_fid,
    calculate_and_visualize_fid,
    analyze_time_dependent_distances,
    plot_mse_vs_size,
    plot_metrics_vs_size,
)
from .analysis import (
    dimensionality_reduction_analysis,
    analyze_noise_prediction,
    generate_latent_space_visualization,
)

"""distillation_trajectories_tpu — TPU-native diffusion trajectory-distillation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
henriChevreux/distillation_trajectories: DDPM teacher training, multi-size
student distillation, scan-compiled trajectory generation with fused CFG, a
vmapped trajectory-metric suite, and the full analysis/visualization stack.
"""

__version__ = "0.1.0"

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

"""Diffusion process math: schedules, forward process, scan-compiled samplers."""
from .schedules import (
    linear_beta_schedule,
    cosine_beta_schedule,
    get_diffusion_params,
    extract,
)
from .process import q_sample, p_losses
from .sampling import (
    p_sample,
    p_sample_ancestral,
    p_sample_loop,
    engine_update,
    generate_trajectory_scan,
    generate_trajectory_batch_scan,
    CFG_COND_PAIRS,
    NOCFG_COND_PAIRS,
    subsampled_timestep_indices,
)
from .parallel_sampling import parallel_generate_trajectory

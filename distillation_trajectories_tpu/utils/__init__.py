"""Utilities: visualization, profiling/observability, tunnel health."""
from .viz import make_grid, save_image_grid
from .tunnel import probe_device, wait_for_device
from .profiling import (
    phase_timer,
    phase_times,
    dump_phase_times,
    reset_phase_times,
    profile_trace,
    enable_nan_checks,
    MetricsLogger,
)

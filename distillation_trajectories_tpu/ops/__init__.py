"""Pallas TPU kernels for hot elementwise chains."""
from .cfg_update import cfg_engine_update, cfg_engine_update_reference

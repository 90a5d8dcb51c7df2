"""Configuration for diffusion model training and analysis (TPU-native rebuild).

Field names, defaults, and the output/ directory contract mirror the reference
``config/config.py:5-167`` so command lines and downstream tooling from the
reference work unchanged.  The implementation is a plain dataclass (no torch /
torchvision dependency); ``get_test_dataset`` returns numpy arrays via the
framework's own data layer.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple


def _default_student_size_factors() -> List[float]:
    # Reference config/config.py:73
    return [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]


def _default_hidden_dims() -> List[int]:
    # Reference config/config.py:16
    return [128, 256, 256, 256]


def _default_student_architectures() -> Dict[str, List[int]]:
    # Reference config/config.py:76-81 (legacy, unused by the unified model)
    return {
        "tiny": [32, 64],
        "small": [32, 64, 128],
        "medium": [48, 96, 192],
        "full": [128, 256, 256, 256],
    }


@dataclasses.dataclass
class Config:
    """All hyperparameters plus the output directory contract.

    Mirrors reference ``config/config.py`` exactly in names and defaults;
    adds a handful of TPU-specific knobs (``compute_dtype``, ``mesh_shape``,
    ``sampler``) that default to parity-preserving values.
    """

    # Dataset (reference config.py:9-12)
    dataset: str = "CIFAR10"
    image_size: int = 32
    channels: int = 3
    batch_size: int = 128

    # Model (reference config.py:15-19)
    latent_dim: int = 128
    hidden_dims: List[int] = dataclasses.field(default_factory=_default_hidden_dims)
    dropout: float = 0.3
    num_res_blocks: int = 3  # declared-but-unused in reference; kept for parity
    learn_sigma: bool = True  # declared-but-unused in reference; kept for parity

    # Diffusion process (reference config.py:22-26)
    sample_steps: int = 100
    timesteps: int = 100
    beta_start: float = 1e-4
    beta_end: float = 0.02
    # The reference declares "cosine" but only implements linear
    # (utils/diffusion.py:21-23); we implement both and default to linear for
    # numerical parity with what the reference actually runs.
    noise_schedule: str = "linear"

    # Training (reference config.py:29-34)
    epochs: int = 10
    lr: float = 1e-4
    save_interval: int = 1
    adam_beta1: float = 0.8
    adam_beta2: float = 0.999
    ema_rate: float = 0.9999

    # Distillation (reference config.py:67-73)
    distill: bool = True
    teacher_steps: int = 100
    student_steps: int = 100
    student_size_factors: List[float] = dataclasses.field(
        default_factory=_default_student_size_factors
    )
    student_architectures: Dict[str, List[int]] = dataclasses.field(
        default_factory=_default_student_architectures
    )

    # Progress bar configuration (reference config.py:83-86)
    progress_bar_leave: bool = False
    progress_bar_position: int = 0
    progress_bar_ncols: int = 100

    # Sampling configuration (reference config.py:88-91)
    num_samples_to_generate: int = 16
    samples_grid_size: int = 4
    samples_figure_size: Tuple[int, int] = (10, 10)

    # Training parameters (reference config.py:93-95)
    noise_diversity_weight: float = 0.1
    mps_enabled: bool = False  # meaningless on TPU; kept for CLI parity
    force_cpu: bool = False

    # --- TPU-native additions (no reference counterpart) ---
    # Compute dtype for model forward passes; params stay float32.
    compute_dtype: str = "bfloat16"
    # Sampler family: "engine" (trajectory_engine.py:96-110 DDIM-like update,
    # the BASELINE.json north star), "ddpm" (utils/diffusion.py:149-158
    # formulation), or "ddim" (deterministic, sigma=0).
    sampler: str = "engine"
    # p_sample_loop step mode: "reference" (the reference's non-standard
    # update, parity default) or "ancestral" (correct DDPM; see
    # diffusion/sampling.py::p_sample_ancestral).
    sample_mode: str = "reference"
    # Device mesh (data, model) axis sizes; (1, 1) = single chip.  When not
    # (1, 1) the trainers shard the train state channel-TP over "model" and
    # every batch over "data" (parallel/mesh.py), so one jitted step runs
    # SPMD over the mesh with XLA-inserted collectives.  CLI: --mesh D,M.
    mesh_shape: Tuple[int, int] = (1, 1)
    # Cap batches per training epoch (None = full epoch).  Smoke runs and the
    # driver's multichip dryrun use this to exercise the real trainer code
    # path in seconds.
    limit_batches_per_epoch: Optional[int] = None
    # Train one epoch as a single jitted lax.scan against a device-resident
    # dataset (one dispatch + zero per-batch uploads per epoch) instead of a
    # per-batch python loop.  Bitwise-identical math and key sequence
    # (tests/test_training.py epoch-scan parity); single-device only — mesh
    # runs keep the per-batch loop (per-batch shard_batch placement).
    # DTT_EPOCH_SCAN=0 overrides at runtime.
    epoch_scan: bool = True
    # Train identical-architecture students of a sweep as ONE batched graph
    # (lax.scan(vmap(step)) over the member axis — the 16-channel floor maps
    # e.g. sf 0.01 and 0.05 onto the same U-Net): one dispatch per epoch for
    # the whole group, and the member axis keeps the MXU fed where one tiny
    # student's convs underutilize it.  Per-member math/keys/batches are
    # exactly the sequential trainer's (tests/test_training.py parity).
    # Applies only on the epoch-scan path (single device, no sweep_parallel).
    vmap_students: bool = True
    # Save checkpoints through the sharding-preserving orbax lane
    # (training/checkpoints.py::save_checkpoint_sharded): each shard writes
    # from its own device, no full-tree host gather — the pod-scale path.
    # Off by default: msgpack (model_epoch_{e}.msgpack) is the
    # reference-parity contract every analysis CLI reads.
    checkpoint_sharded: bool = False
    # Storage dtype for stacked trajectories ("float32" or "bfloat16").
    # bf16 halves trajectory HBM traffic; sampling math itself stays in
    # float32 (only the stored per-step states are cast).  Metric scalars
    # then differ from float32 storage by <1e-2 relative — keep float32
    # for reference-parity runs (see diffusion/sampling.py docstring).
    trajectory_store_dtype: str = "float32"
    # Route the sampler's CFG-combine + engine-update tail through the fused
    # Pallas kernel (ops/cfg_update.py) instead of jnp ops.  Off by default;
    # measured on-chip numbers in PERFORMANCE.md decide whether it stays.
    pallas_cfg_update: bool = False
    # Spatial (image-H) partitioning for the sampler forwards: a
    # (data, spatial) mesh shape, e.g. (1, 8) shards every activation's H
    # axis 8-way with GSPMD halo exchange around the 3×3 convs — the lane
    # for images whose activations exceed one chip's HBM
    # (parallel/spatial.py; per-level constraints re-replicate sub-window
    # levels).  None (default) = unsharded reference-parity sampling.
    # Mutually exclusive with sampler_quant="int8".
    spatial_shape: Optional[Tuple[int, int]] = None
    # Quantized-inference lane for the trajectory samplers: "none" (default,
    # reference-parity numerics) or "int8" — fold eval BatchNorm into the
    # Block convs and run them int8×int8→int32 on the MXU (2× bf16 peak on
    # v5e).  Inference-only; training is untouched.  models/quantized.py.
    sampler_quant: str = "none"
    # Parallel-in-time trajectory generation (diffusion/parallel_sampling.py):
    # "off" = sequential scan (default, reference-exact), "window" =
    # sliding-window ParaDiGMS (latency-oriented, B=1;
    # paradigms_window/paradigms_tol below; tol=0 is exact).
    parallel_sampling: str = "off"
    paradigms_window: int = 8
    paradigms_tol: float = 1e-3
    # Use EMA params for sampling/eval when available (ref declares ema_rate
    # but never uses it; off by default for parity).
    use_ema: bool = False
    # Rematerialize U-Net blocks in the backward pass (activation-memory ↔
    # FLOPs trade for larger per-chip batches).
    remat: bool = False
    # Normalization layer: "batch" (reference parity) or "group"
    # (batch-independent — safe under vmap/scan, no mutable state).
    norm: str = "batch"
    # Full-resolution decoder head using the enc1 skip (removes the
    # reference architecture's low-frequency output cap; see PARITY.md).
    full_res_head: bool = False
    # Root directory override (tests point this at a tmpdir).
    base_dir: Optional[str] = None

    def __post_init__(self):
        if self.base_dir is None:
            # Repo root = parent of the package directory.
            self.base_dir = os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            )
        self.teacher_steps = self.timesteps
        self.student_steps = self.timesteps
        self._setup_directories()

    # Directory contract: reference config.py:37-65
    def _setup_directories(self) -> None:
        self.output_dir = os.path.join(self.base_dir, "output")
        self.results_dir = os.path.join(self.output_dir, "results")

        self.models_dir = os.path.join(self.output_dir, "models")
        self.teacher_models_dir = os.path.join(self.models_dir, "teacher")
        self.student_models_dir = os.path.join(self.models_dir, "students")

        self.data_dir = os.path.join(self.base_dir, "data")
        self.trajectory_dir = os.path.join(self.data_dir, "trajectories")

        self.analysis_dir = os.path.join(self.output_dir, "analysis")
        self.metrics_dir = os.path.join(self.analysis_dir, "metrics")
        self.model_comparisons_dir = os.path.join(
            self.analysis_dir, "model_comparisons"
        )
        self.time_dependent_dir = os.path.join(self.analysis_dir, "time_dependent")
        self.size_dependent_dir = os.path.join(self.analysis_dir, "size_dependent")
        self.dimensionality_dir = os.path.join(self.analysis_dir, "dimensionality")
        self.latent_space_dir = os.path.join(self.analysis_dir, "latent_space")
        self.attention_dir = os.path.join(self.analysis_dir, "attention")
        self.noise_prediction_dir = os.path.join(
            self.analysis_dir, "noise_prediction"
        )
        self.denoising_dir = os.path.join(self.analysis_dir, "denoising")
        self.fid_dir = os.path.join(self.analysis_dir, "fid")

    def create_directories(self) -> "Config":
        """Create the full output directory tree (reference config.py:97-140)."""
        directories = [
            self.output_dir,
            self.results_dir,
            self.models_dir,
            self.teacher_models_dir,
            self.student_models_dir,
            self.data_dir,
            self.trajectory_dir,
            self.analysis_dir,
            self.metrics_dir,
            self.model_comparisons_dir,
            self.time_dependent_dir,
            self.size_dependent_dir,
            self.dimensionality_dir,
            self.latent_space_dir,
            self.attention_dir,
            self.noise_prediction_dir,
            self.denoising_dir,
            self.fid_dir,
        ]
        for size_factor in self.student_size_factors:
            directories.append(
                os.path.join(self.student_models_dir, f"size_{size_factor}")
            )
        for dir_path in directories:
            os.makedirs(dir_path, exist_ok=True)
        return self

    def student_dir(self, size_factor: float) -> str:
        """Per-size student checkpoint directory (reference naming contract)."""
        return os.path.join(self.student_models_dir, f"size_{size_factor}")

    def get_test_dataset(self):
        """Test-split images as a numpy array in [-1, 1], NHWC.

        Reference config.py:142-167 returns a torchvision Dataset; here we
        return ``(images, labels)`` numpy arrays from the framework data layer.
        """
        from .data import load_dataset

        return load_dataset(self, train=False)

"""FID computation: on-device Inception features + host-side Fréchet math.

Counterpart of reference ``analysis/metrics/fid_score.py:19-318``:

* ``InceptionModel`` — batched on-device feature extraction via the Flax
  InceptionV3 trunk (models/inception.py), replacing the torchvision
  avgpool-hook tap (ref :19-59).
* ``calculate_fid`` — Fréchet distance with scipy ``sqrtm`` on host (the
  2048² covariance is tiny; matches ref :61-93 including the complex-part
  guard and the 999.0 placeholder for <2 samples).
* ``calculate_and_visualize_fid`` — samples both models and emits the
  reference's side-by-side grid + ``fid_score_size_{sf}.txt``.  Sample
  generation uses the framework's single scan-compiled ``p_sample_loop``
  rather than the reference's third, O(T²) local reverse process
  (fid_score.py:261-318; SURVEY.md §2.3).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.inception import (
    create_inception,
    preprocess_for_inception,
)


class InceptionModel:
    """Feature extractor facade (reference fid_score.py:19-59)."""

    def __init__(self, weights_path: Optional[str] = None, batch_size: int = 32):
        self.model, self.variables, self.pretrained = create_inception(weights_path)
        self.batch_size = batch_size

        @jax.jit
        def _features(x):
            return self.model.apply(self.variables, preprocess_for_inception(x))

        self._features = _features

    def get_features(self, images) -> np.ndarray:
        """[N, H, W, C] in [−1,1] → [N, 2048] features, batched (ref batch 32)."""
        images = jnp.asarray(images)
        outs = []
        for i in range(0, images.shape[0], self.batch_size):
            outs.append(np.asarray(self._features(images[i : i + self.batch_size])))
        return np.concatenate(outs) if outs else np.zeros((0, 2048))


def calculate_fid(features1: np.ndarray, features2: np.ndarray) -> float:
    """Fréchet distance between feature distributions
    (reference fid_score.py:61-93)."""
    from scipy import linalg

    features1 = np.asarray(features1, dtype=np.float64)
    features2 = np.asarray(features2, dtype=np.float64)
    if len(features1) < 2 or len(features2) < 2:
        # Reference placeholder for degenerate sample counts (ref :66-69)
        return 999.0

    mu1, mu2 = features1.mean(axis=0), features2.mean(axis=0)
    sigma1 = np.cov(features1, rowvar=False)
    sigma2 = np.cov(features2, rowvar=False)

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real  # complex-part guard (ref :82-85)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def generate_samples(
    model,
    variables,
    config,
    num_samples: int,
    key: Optional[jax.Array] = None,
    fixed_samples=None,
):
    """Generate samples via the unified scan-compiled reverse process.

    Replaces the reference's local O(T²) sampler (fid_score.py:261-318).
    """
    from ..diffusion import get_diffusion_params, p_sample_loop
    from ..training.state import make_eval_model_fn

    if fixed_samples is not None:
        return jnp.asarray(fixed_samples)[:num_samples]
    if key is None:
        key = jax.random.PRNGKey(0)
    dp = get_diffusion_params(config.sample_steps, config)
    model_fn = make_eval_model_fn(model, variables)
    return p_sample_loop(
        model_fn,
        (num_samples, config.image_size, config.image_size, config.channels),
        config.sample_steps,
        dp,
        key,
        num_timesteps=config.timesteps,
    )


def calculate_and_visualize_fid(
    teacher_model,
    student_model,
    config,
    output_dir: Optional[str] = None,
    size_factor: Optional[float] = None,
    fixed_samples=None,
    teacher_variables=None,
    student_variables=None,
    inception: Optional[InceptionModel] = None,
    num_samples: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, float]:
    """FID between teacher and student samples + side-by-side grid + txt
    (reference fid_score.py:95-197; same filenames)."""
    if output_dir is None:
        output_dir = os.path.join(config.analysis_dir, "fid", f"size_{size_factor}")
    os.makedirs(output_dir, exist_ok=True)
    print(f"Calculating FID scores for size factor {size_factor}...")

    if num_samples is None:
        num_samples = getattr(config, "num_samples", 50)

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    print("  Generating samples from teacher model...")
    teacher_samples = generate_samples(
        teacher_model, teacher_variables, config, num_samples, k1, fixed_samples
    )
    print("  Generating samples from student model...")
    student_samples = generate_samples(
        student_model, student_variables, config, num_samples, k2, fixed_samples
    )
    return _fid_report(
        teacher_samples, student_samples, size_factor, output_dir, inception
    )


def _fid_report(
    teacher_samples,
    student_samples,
    size_factor,
    output_dir,
    inception: Optional["InceptionModel"] = None,
    teacher_features: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Features → FID → side-by-side grid + txt for one size factor.

    ``teacher_features`` short-circuits re-extraction when the caller holds
    one teacher sample set fixed across many students
    (:func:`fid_across_sizes`)."""
    print("  Extracting features using InceptionV3...")
    if inception is None:
        inception = InceptionModel()
    if teacher_features is None:
        teacher_features = inception.get_features(teacher_samples)
    student_features = inception.get_features(student_samples)

    print("  Calculating FID score...")
    fid_score = calculate_fid(teacher_features, student_features)
    print(f"  FID score for size factor {size_factor}: {fid_score:.4f}")

    n_show = min(5, len(teacher_samples), len(student_samples))
    if n_show > 0:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, n_show, figsize=(3 * n_show, 6))
        fig.suptitle(f"Sample Comparison (Size Factor: {size_factor})", fontsize=16)
        axes = np.atleast_2d(axes)
        if axes.shape[0] == 1:
            axes = axes.T
        for row, samples, label in (
            (0, teacher_samples, "Teacher"),
            (1, student_samples, "Student"),
        ):
            for i in range(n_show):
                img = np.asarray(samples[i])
                img = np.clip((img + 1) / 2.0, 0, 1)
                if img.shape[-1] == 1:
                    img = img[..., 0]
                ax = axes[row, i] if axes.ndim == 2 else axes[row]
                ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
                ax.set_title(label)
                ax.axis("off")
        plt.tight_layout()
        plt.savefig(
            os.path.join(output_dir, f"fid_samples_size_{size_factor}.png"), dpi=300
        )
        plt.close()

    with open(
        os.path.join(output_dir, f"fid_score_size_{size_factor}.txt"), "w"
    ) as f:
        f.write(f"FID Score: {fid_score:.4f}\n")

    return {"fid_score": fid_score}


def make_sample_fn(model, config, num_samples: int):
    """Jitted ``fn(variables, key) -> samples [N,H,W,C]`` with variables as
    jit ARGUMENTS (see utils.compile_pool.VariablesAsArgFn for why), exposing
    ``lower()`` so a batch of per-architecture samplers can be AOT-compiled
    concurrently."""
    from ..diffusion import get_diffusion_params, p_sample_loop
    from ..training.state import make_eval_model_fn

    dp = get_diffusion_params(config.sample_steps, config)
    shape = (num_samples, config.image_size, config.image_size, config.channels)

    def sample(vars_, key):
        model_fn = make_eval_model_fn(model, vars_)
        return p_sample_loop(
            model_fn, shape, config.sample_steps, dp, key,
            num_timesteps=config.timesteps,
        )

    return jax.jit(sample)


def fid_across_sizes(
    teacher_model,
    teacher_variables,
    students,
    config,
    inception: Optional[InceptionModel] = None,
    num_samples: int = 50,
    seed: int = 0,
    precompile: bool = True,
) -> Dict[float, float]:
    """FID for many student sizes against one teacher, compile-pooled.

    ``students`` maps ``size_factor -> (model, variables)``.  Semantics are
    identical to calling :func:`calculate_and_visualize_fid` per size with
    the same ``seed`` (which re-generates the SAME teacher samples every
    time — here they are generated and featurized once), but the 13+1
    distinct sampling graphs are traced once each and compiled concurrently
    (utils.compile_pool), instead of serial trace+compile per size — the
    round-3 workload's FID stage was ~36% of total wall, dominated by those
    serial compiles.  Per-size artifacts (grid PNG + txt) are unchanged.
    """
    from ..utils.compile_pool import VariablesAsArgFn, compile_concurrently

    if not students:
        return {}

    if inception is None:
        inception = InceptionModel()

    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)

    # The 16-channel floor maps several small size factors (and sf=1.0 vs
    # the teacher) onto the SAME derived architecture; one jitted sampler
    # per distinct (dims, time_emb_dim) serves them all — variables ride as
    # jit arguments, so duplicates land in the dispatch cache instead of
    # paying their own trace+compile (same dedup as the student sweep's).
    def _arch(m):
        return (tuple(m.dims), m.time_emb_dim)

    arch_fns: Dict[tuple, object] = {
        _arch(teacher_model): make_sample_fn(teacher_model, config, num_samples)
    }
    teacher_fn = VariablesAsArgFn(
        arch_fns[_arch(teacher_model)], teacher_variables
    )
    student_fns = {}
    for sf, (model, variables) in students.items():
        if _arch(model) not in arch_fns:
            arch_fns[_arch(model)] = make_sample_fn(model, config, num_samples)
        student_fns[sf] = VariablesAsArgFn(arch_fns[_arch(model)], variables)

    if precompile:
        # One lower() per distinct architecture (not per size factor).
        first_per_arch = {_arch(teacher_model): (teacher_fn, k1)}
        for sf, (model, _) in students.items():
            first_per_arch.setdefault(_arch(model), (student_fns[sf], k2))
        compile_concurrently(
            [lambda fn=fn, k=k: fn.lower(k)
             for fn, k in first_per_arch.values()],
            label="fid samplers",
        )

    teacher_samples = teacher_fn(k1)
    teacher_features = inception.get_features(teacher_samples)

    fid_by_size: Dict[float, float] = {}
    for sf, fn in student_fns.items():
        output_dir = os.path.join(config.analysis_dir, "fid", f"size_{sf}")
        os.makedirs(output_dir, exist_ok=True)
        print(f"Calculating FID scores for size factor {sf}...")
        student_samples = fn(k2)
        result = _fid_report(
            teacher_samples, student_samples, sf, output_dir,
            inception=inception, teacher_features=teacher_features,
        )
        fid_by_size[sf] = result["fid_score"]
    return fid_by_size

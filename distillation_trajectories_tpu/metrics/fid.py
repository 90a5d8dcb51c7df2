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
import warnings
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

        # Variables ride as a jit ARGUMENT, not a closure constant: the
        # axon backend hashes the full lowered module per compile, and the
        # trunk's ~24M params as inline IR constants made that hash (and
        # the first compile) pathologically slow (see
        # utils.compile_pool.VariablesAsArgFn).
        @jax.jit
        def _features(variables, x):
            return self.model.apply(variables, preprocess_for_inception(x))

        self._features = _features

    def features_device(self, images) -> jnp.ndarray:
        """[N, H, W, C] in [−1,1] → [N, 2048] features as a DEVICE array —
        dispatches asynchronously, no host sync (batched, ref batch 32)."""
        images = jnp.asarray(images)
        outs = []
        for i in range(0, images.shape[0], self.batch_size):
            outs.append(self._features(self.variables, images[i : i + self.batch_size]))
        return jnp.concatenate(outs) if outs else jnp.zeros((0, 2048))

    def get_features(self, images) -> np.ndarray:
        """[N, H, W, C] in [−1,1] → [N, 2048] features on host."""
        return np.asarray(self.features_device(images))

    def lower_batches(self, num_samples: int, image_shape) -> list:
        """``Lowered`` objects for every distinct batch shape a
        ``num_samples``-sized feature extraction will dispatch — for AOT
        compile pools (utils.compile_pool.compile_concurrently)."""
        sizes = []
        if num_samples >= self.batch_size:
            sizes.append(self.batch_size)
        if num_samples % self.batch_size:
            sizes.append(num_samples % self.batch_size)
        return [
            self._features.lower(
                jax.eval_shape(lambda: self.variables),
                jax.ShapeDtypeStruct((n, *image_shape), jnp.float32),
            )
            for n in sizes
        ]


def calculate_fid(features1: np.ndarray, features2: np.ndarray) -> float:
    """Fréchet distance between feature distributions
    (reference fid_score.py:61-93).

    When both sample counts are below the feature dimension (always, at the
    workload's 50 samples × 2048-d features), the covariances have rank
    < d and the ``tr((Σ₁Σ₂)^{1/2})`` cross-term is computed EXACTLY from
    the singular values of the n₁×n₂ matrix ``A₁A₂ᵀ`` (Aᵢ = centered
    features as rows, Σᵢ = AᵢᵀAᵢ/(nᵢ−1)): the nonzero eigenvalues of Σ₁Σ₂
    are σₖ(A₁A₂ᵀ)²/((n₁−1)(n₂−1)),
    so the trace is Σₖ σₖ/√((n₁−1)(n₂−1)).  This replaces scipy's dense
    2048² ``sqrtm`` (~25 s/call on this 1-core host; 13 calls dominated the
    FID stage) with a sub-millisecond SVD — same value to float64 noise
    (pinned by tests/test_fid.py against the sqrtm path)."""
    from scipy import linalg

    features1 = np.asarray(features1, dtype=np.float64)
    features2 = np.asarray(features2, dtype=np.float64)
    if len(features1) < 2 or len(features2) < 2:
        # Reference placeholder for degenerate sample counts (ref :66-69)
        return 999.0

    n1, n2 = len(features1), len(features2)
    d = features1.shape[1]
    mu1, mu2 = features1.mean(axis=0), features2.mean(axis=0)
    diff = mu1 - mu2

    if max(n1, n2) < d:
        a1 = features1 - mu1
        a2 = features2 - mu2
        tr1 = float(np.sum(a1 * a1)) / (n1 - 1)  # tr(Σ₁) without forming Σ₁
        tr2 = float(np.sum(a2 * a2)) / (n2 - 1)
        sv = linalg.svdvals(a1 @ a2.T)
        tr_cross = float(np.sum(sv)) / np.sqrt((n1 - 1) * (n2 - 1))
        return float(diff @ diff + tr1 + tr2 - 2.0 * tr_cross)

    sigma1 = np.cov(features1, rowvar=False)
    sigma2 = np.cov(features2, rowvar=False)
    with warnings.catch_warnings():
        # Match the old ``disp=False`` silence (the ``disp`` argument is
        # deprecated since scipy 1.16): singular products warn but still
        # return the best-effort root, exactly like the reference path.
        warnings.simplefilter("ignore", linalg.LinAlgWarning)
        covmean = linalg.sqrtm(sigma1 @ sigma2)
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
    student_features: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Features → FID → side-by-side grid + txt for one size factor.

    ``teacher_features``/``student_features`` short-circuit re-extraction
    when the caller already extracted them (e.g. :func:`fid_across_sizes`
    holds one teacher set fixed across many students and batches every
    device fetch into one transfer)."""
    if teacher_features is None or student_features is None:
        print("  Extracting features using InceptionV3...")
        if inception is None:
            inception = InceptionModel()
    if teacher_features is None:
        teacher_features = inception.get_features(teacher_samples)
    if student_features is None:
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
        # One lower() per distinct architecture (not per size factor),
        # plus the Inception featurizer's batch graphs — all in one pool.
        first_per_arch = {_arch(teacher_model): (teacher_fn, k1)}
        for sf, (model, _) in students.items():
            first_per_arch.setdefault(_arch(model), (student_fns[sf], k2))
        image_shape = (config.image_size, config.image_size, config.channels)
        lower_batches = getattr(inception, "lower_batches", None)
        compile_concurrently(
            [lambda fn=fn, k=k: fn.lower(k)
             for fn, k in first_per_arch.values()]
            + ([lambda lw=lw: lw
                for lw in lower_batches(num_samples, image_shape)]
               if lower_batches else []),
            label="fid samplers",
        )

    # Phase 1 — dispatch everything (samplers + feature extraction stay on
    # device; jax dispatch is async, so all 14 sample sets and their
    # features are in flight before any host read).
    import time as _time

    from ..utils.compile_pool import arm_watchdog, cancel_watchdog

    # try/finally matches the trainers: an exception between arm and
    # cancel (e.g. a transient tunnel error a caller catches) must not
    # leave the exit=True faulthandler timer armed to kill the process.
    try:
        t0 = _time.perf_counter()
        # Dispatch is async (~RTT per call); the deadline only guards a
        # hung tunnel RPC, not compute.
        arm_watchdog(120.0 + 3.0 * len(student_fns))
        # Duck-typed extractors (tests, external featurizers) may only
        # provide the host-side get_features; device_get passes numpy
        # through unchanged.
        featurize = getattr(
            inception, "features_device", inception.get_features)
        teacher_samples = teacher_fn(k1)
        teacher_features_dev = featurize(teacher_samples)
        n_show = min(5, num_samples)
        per_sf_dev = {}
        for sf, fn in student_fns.items():
            student_samples = fn(k2)
            per_sf_dev[sf] = (
                student_samples[:n_show], featurize(student_samples))
        t_dispatch = _time.perf_counter() - t0

        # Phase 2 — ONE host fetch for every array the report needs
        # (per-size np.asarray reads each paid a tunnel RTT; see
        # PERFORMANCE.md).  The fetch blocks until the whole dispatched
        # pipeline completes, so its deadline budgets real compute for
        # all sample sets, not just the RPC.
        t0 = _time.perf_counter()
        arm_watchdog(600.0 + 20.0 * len(student_fns))
        teacher_show, teacher_features, per_sf = jax.device_get(
            (teacher_samples[:n_show], teacher_features_dev, per_sf_dev)
        )
    finally:
        cancel_watchdog()
    t_fetch = _time.perf_counter() - t0

    # Phase 3 — host-only Fréchet math + grid/txt artifacts.
    t0 = _time.perf_counter()
    fid_by_size: Dict[float, float] = {}
    for sf, (student_show, student_features) in per_sf.items():
        output_dir = os.path.join(config.analysis_dir, "fid", f"size_{sf}")
        os.makedirs(output_dir, exist_ok=True)
        print(f"Calculating FID scores for size factor {sf}...")
        result = _fid_report(
            teacher_show, student_show, sf, output_dir,
            teacher_features=teacher_features,
            student_features=student_features,
        )
        fid_by_size[sf] = result["fid_score"]
    print(f"[fid] dispatch {t_dispatch:.1f}s, fetch {t_fetch:.1f}s, "
          f"host fid+plots {_time.perf_counter() - t0:.1f}s "
          f"({len(student_fns)} sizes, {num_samples} samples)")
    return fid_by_size

"""Analyze the latest generated sample grid: basic statistics, local
patch-correlation structure score, and training-progress heuristics
(reference scripts/analyze_latest_sample.py:18-106)."""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import project_root  # noqa: E402,F401

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402


def structure_score(sample_img: np.ndarray, patch_size: int = 16) -> float:
    """Mean |corr| between vertically adjacent patches (ref :50-71)."""
    rows = sample_img.shape[0] // patch_size
    cols = sample_img.shape[1] // patch_size
    score, count = 0.0, 0
    for i in range(rows - 1):
        for j in range(cols - 1):
            p1 = sample_img[i * patch_size:(i + 1) * patch_size,
                            j * patch_size:(j + 1) * patch_size]
            p2 = sample_img[(i + 1) * patch_size:(i + 2) * patch_size,
                            j * patch_size:(j + 1) * patch_size]
            if p1.size and p2.size:
                c = np.corrcoef(p1.flatten(), p2.flatten())[0, 1]
                if not np.isnan(c):
                    score += abs(c)
            count += 1
    return score / count if count else 0.0


def main():
    from distillation_trajectories_tpu import Config

    config = Config()
    sample_files = glob.glob(
        os.path.join(config.results_dir, "samples_epoch_*.png")
    )
    if not sample_files:
        print(f"No sample images found in {config.results_dir}")
        return
    latest = max(sample_files,
                 key=lambda x: int(x.split("_")[-1].split(".")[0]))
    epoch_num = int(latest.split("_")[-1].split(".")[0])
    print(f"Analyzing latest sample image: {os.path.basename(latest)} "
          f"(Epoch {epoch_num})")

    img = np.array(Image.open(latest))
    print("\nImage Statistics:")
    print(f"  Shape: {img.shape}")
    print(f"  Min value: {img.min()}")
    print(f"  Max value: {img.max()}")
    print(f"  Mean value: {img.mean():.2f}")
    print(f"  Std deviation: {img.std():.2f}")

    print("\nStructure Analysis:")
    if img.ndim > 2 and img.shape[2] >= 3:
        for i, channel in enumerate(["Red", "Green", "Blue"]):
            print(f"  {channel} channel variance: {np.var(img[:, :, i]):.2f}")

    s = structure_score(img)
    print(f"  Local structure score: {s:.4f} "
          "(higher values indicate more structure)")

    if s < 0.1:
        print("\nProgress Assessment: EARLY STAGE")
        print("Your samples still appear mostly random. This is normal for "
              "early training.")
    elif s < 0.3:
        print("\nProgress Assessment: DEVELOPING STRUCTURE")
        print("Your samples are beginning to show basic patterns and color "
              "grouping.")
    elif s < 0.5:
        print("\nProgress Assessment: INTERMEDIATE PROGRESS")
        print("Your samples now show recognizable patterns and shapes.")
    else:
        print("\nProgress Assessment: ADVANCED STAGE")
        print("Your samples contain clear structure and possibly "
              "recognizable objects.")

    print("\nRecommendation:")
    if epoch_num < 50:
        print(f"  Continue training for at least {50 - epoch_num} more epochs")
    else:
        print("  You've trained for a good number of epochs")


if __name__ == "__main__":
    main()

"""Show real dataset sample grids (reference scripts/show_real_samples.py:18-59)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import project_root  # noqa: E402,F401

import numpy as np  # noqa: E402


def main():
    from distillation_trajectories_tpu import Config
    from distillation_trajectories_tpu.data import get_real_images
    from distillation_trajectories_tpu.utils.viz import save_image_grid

    config = Config()
    config.create_directories()
    print(f"Loading real images from {config.dataset} dataset...")
    real_images = get_real_images(config, num_images=16)

    save_image_grid(
        real_images,
        os.path.join(config.results_dir, "real_images.png"),
        nrow=4,
        figsize=(10, 10),
    )
    print(
        f"Saved real images to "
        f"{os.path.join(config.results_dir, 'real_images.png')}"
    )

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(5, len(real_images))
    for i in range(n):
        img = np.clip((real_images[i] + 1) / 2, 0, 1)
        if img.shape[-1] == 1:
            img = img[..., 0]
        plt.figure(figsize=(5, 5))
        plt.imshow(img, cmap="gray" if img.ndim == 2 else None)
        plt.axis("off")
        plt.title(f"Real Image {i + 1}")
        plt.savefig(os.path.join(config.results_dir, f"real_image_{i + 1}.png"))
        plt.close()
    print(f"Saved {n} individual real images for closer inspection")


if __name__ == "__main__":
    main()

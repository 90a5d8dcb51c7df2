"""Host-side visualization helpers: image grids and sample plots.

Replaces the reference's torchvision.utils.make_grid + matplotlib pattern
(train_teacher.py:100-108) with a numpy implementation.
"""

from __future__ import annotations

import numpy as np


def make_grid(images: np.ndarray, nrow: int = 4, padding: int = 2) -> np.ndarray:
    """Tile NHWC images into one grid image (torchvision make_grid analog)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c),
        dtype=images.dtype,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[i]
    return grid


def save_image_grid(
    images: np.ndarray,
    path: str,
    nrow: int = 4,
    figsize=(10, 10),
    denormalize: bool = True,
) -> None:
    """Save a grid of NHWC images in [−1,1] (or [0,1]) to ``path``.

    Mirrors the sample-grid PNGs of reference train_teacher.py:100-108.

    Uses the object-oriented Agg API (Figure, not pyplot) so it is
    thread-safe: the student sweep fetches+saves grids on the async
    checkpoint writer's pool while the next student trains, and pyplot's
    global figure registry is not safe across threads.
    """
    from matplotlib.figure import Figure

    images = np.asarray(images, dtype=np.float32)
    if denormalize:
        images = (images + 1.0) / 2.0
    images = np.clip(images, 0.0, 1.0)
    grid = make_grid(images, nrow=nrow)
    if grid.shape[-1] == 1:
        grid = np.repeat(grid, 3, axis=-1)
    fig = Figure(figsize=figsize)
    ax = fig.add_subplot(111)
    ax.imshow(grid)
    ax.axis("off")
    fig.savefig(path, bbox_inches="tight")

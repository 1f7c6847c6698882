"""Visualization: patch grids and attention heatmaps.

Reference surface (utils/visualization.py:5-29): ``plot_patches`` and
``plot_attention_maps``. The reference's attention plotting could never run —
its models use need_weights=False and return no weights (SURVEY.md §5.5);
here every attention module supports ``return_weights=True`` so the maps are
real. Accepts NHWC or NCHW images and numpy/jax arrays. Figures are returned
(and optionally saved) so headless TPU hosts work without a display.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def _to_numpy_img(img) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = img.transpose(1, 2, 0)
    if img.dtype != np.uint8:
        lo, hi = img.min(), img.max()
        img = (img - lo) / (hi - lo + 1e-9)
    return img


def plot_patches(images, patch_size: int, max_images: int = 4,
                 save_path: Optional[str] = None):
    """Grid of image patches next to the original (visualization.py:5-19)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    images = np.asarray(images)[:max_images]
    n = len(images)
    fig, axes = plt.subplots(n, 2, figsize=(6, 3 * n), squeeze=False)
    for i, raw in enumerate(images):
        img = _to_numpy_img(raw)
        h, w = img.shape[:2]
        p = patch_size
        gh, gw = h // p, w // p
        patches = (
            img[: gh * p, : gw * p]
            .reshape(gh, p, gw, p, -1)
            .transpose(0, 2, 1, 3, 4)
        )
        grid = np.ones((gh * (p + 1), gw * (p + 1), patches.shape[-1]))
        for y in range(gh):
            for x in range(gw):
                grid[y * (p + 1):y * (p + 1) + p,
                     x * (p + 1):x * (p + 1) + p] = patches[y, x]
        axes[i][0].imshow(img)
        axes[i][0].set_title("original")
        axes[i][1].imshow(grid.squeeze())
        axes[i][1].set_title(f"patches {p}x{p}")
        for ax in axes[i]:
            ax.axis("off")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path)
    return fig


def plot_attention_maps(attention_weights: Sequence, layer: int = -1,
                        max_heads: int = 4, save_path: Optional[str] = None):
    """Per-head heatmaps for one layer (visualization.py:22-29).

    ``attention_weights``: list (per layer) of (B, H, S, S) arrays, as
    returned by ``model.apply(..., return_weights=True)``.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    w = np.asarray(attention_weights[layer])[0]  # first batch element
    heads = min(w.shape[0], max_heads)
    fig, axes = plt.subplots(1, heads, figsize=(4 * heads, 4), squeeze=False)
    for h in range(heads):
        sns.heatmap(w[h], ax=axes[0][h], cbar=h == heads - 1, square=True)
        axes[0][h].set_title(f"head {h}")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path)
    return fig

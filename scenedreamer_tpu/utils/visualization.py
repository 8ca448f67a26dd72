"""Visualization helpers: colorized segmentation maps, image grids,
depth colormaps.

Capability parity with `imaginaire/utils/visualization/common.py`
(`tensor2label`, `tensor2im`, grid assembly used by the trainer's
periodic snapshots, `trainers/gancraft.py:253-286`) and the
`mc_utils.colormap` depth shading (`mc_utils.py:296-300`).
Host-side numpy; arrays are NHWC.
"""
import colorsys

import numpy as np


def _label_palette(n):
    """Deterministic, visually-spread palette (reference uses the
    Cityscapes/COCO palettes when available; synthesized here)."""
    cols = []
    for i in range(n):
        h = (i * 0.618033988749895) % 1.0
        s = 0.55 + 0.45 * ((i * 7) % 3) / 2.0
        v = 0.75 + 0.25 * ((i * 5) % 2)
        cols.append([int(c * 255) for c in colorsys.hsv_to_rgb(h, s, v)])
    return np.array(cols, np.uint8)


def tensor2label(label, n_labels=None, palette=None):
    """One-hot or index label map -> uint8 RGB.

    label: [H, W, C] one-hot / [H, W] indices (numpy or device array).
    """
    label = np.asarray(label)
    if label.ndim == 3:
        n_labels = n_labels or label.shape[-1]
        idx = np.argmax(label, axis=-1)
    else:
        idx = label.astype(np.int64)
        n_labels = n_labels or int(idx.max()) + 1
    pal = palette if palette is not None else _label_palette(n_labels)
    return pal[np.clip(idx, 0, len(pal) - 1)]


def tensor2im(img):
    """[-1, 1] float image -> uint8 (reference tensor2im)."""
    return np.clip((np.asarray(img) * 0.5 + 0.5) * 255.0, 0,
                   255).astype(np.uint8)


def colormap(x, cmap='viridis'):
    """NaN-safe normalized colormap (reference `mc_utils.py:296-300`);
    used for depth visualization. Returns float RGB in [0, 1]."""
    x = np.asarray(x, np.float64)
    x = x - np.nanmin(x)
    denom = np.nanmax(x)
    x = x / denom if denom > 0 else x
    x = np.nan_to_num(x)
    try:
        import matplotlib.pyplot as plt
        return plt.get_cmap(cmap)(x)[..., :3]
    except ImportError:
        # perceptual-ish fallback ramp
        return np.stack([x, x ** 2, 1.0 - x], axis=-1)


def image_grid(images, cols=None):
    """List of same-shape uint8 HWC images -> one grid image
    (the trainer's snapshot strip, `trainers/gancraft.py:271`)."""
    n = len(images)
    cols = cols or n
    rows = -(-n // cols)
    h, w, c = images[0].shape
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i, im in enumerate(images):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = im
    return grid

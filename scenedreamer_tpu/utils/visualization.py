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


def tensor2pilimage(image, width=None, height=None,
                    minus1to1_normalized=False):
    """[H, W, 3] float image -> PIL image, optionally bicubic-resized
    (reference `visualization/common.py:43-71`, NHWC here)."""
    from PIL import Image
    image = np.asarray(image)
    if image.ndim != 3:
        raise ValueError('Image tensor dimension does not equal 3.')
    if image.shape[-1] != 3:
        raise ValueError('Image has more than 3 channels.')
    if minus1to1_normalized:
        image = (image + 1.0) * 0.5
    out = Image.fromarray(
        np.clip(image * 255.0, 0, 255).astype(np.uint8))
    if width is not None and height is not None:
        out = out.resize((width, height), Image.BICUBIC)
    return out


def save_tensor_image(filename, image, minus1to1_normalized=False):
    """Write an [H, W, 3] float image to disk, creating parent dirs
    (reference `visualization/common.py:14-40`)."""
    import os
    dirname = os.path.dirname(filename)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    tensor2pilimage(image, minus1to1_normalized=minus1to1_normalized
                    ).save(filename)


def tensor2flow(flow, imtype=np.uint8):
    """Optical flow [..., H, W, 2] -> RGB color-wheel image(s): hue =
    flow angle, value = min-max-normalized magnitude (reference
    `visualization/common.py:158-190`; NHWC here). Batched inputs and
    lists recurse to lists like the reference."""
    import cv2
    if flow is None:
        return None
    if isinstance(flow, (list, tuple)):
        outs = [tensor2flow(f, imtype) for f in flow if f is not None]
        return outs or None
    flow = np.asarray(flow, np.float32)
    if flow.ndim >= 4:
        return [tensor2flow(flow[b], imtype) for b in range(flow.shape[0])]
    hsv = np.zeros((flow.shape[0], flow.shape[1], 3), dtype=imtype)
    hsv[:, :, 1] = 255
    mag, ang = cv2.cartToPolar(flow[..., 0], flow[..., 1])
    hsv[..., 0] = ang * 180 / np.pi / 2
    hsv[..., 2] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def plot_keypoints(image, keypoints, color=(0, 255, 0), radius=5):
    """Draw filled circles at [N, 2] (x, y) keypoints on an HWC uint8
    image (reference `visualization/common.py:192-217`)."""
    import cv2
    # always draw on a copy (the reference's RGB->BGR slice copies too)
    image = np.array(image, copy=True)
    assert image.ndim == 3 and image.shape[-1] in (1, 3)
    keypoints = np.asarray(keypoints)
    assert keypoints.ndim == 2 and keypoints.shape[1] == 2
    for kp in np.round(keypoints).astype(np.int32):
        image = cv2.circle(image, (int(kp[0]), int(kp[1])), radius,
                           color, -1)
    return image

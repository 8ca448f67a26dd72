"""Segmentation-mask utilities.

Capability parity with `imaginaire/model_utils/gancraft/mc_utils.py`:
  * `segmask_smooth` — average-pool a one-hot mask then re-binarize by
    argmax (`mc_utils.py:287-292`)
  * `rand_crop` — principal-point jitter emulating a random crop of a
    larger virtual sensor (`mc_utils.py:277-284`, host-side numpy)

NHWC layout; smoothing is one fused reduce_window + argmax under jit.
"""
import numpy as np
import jax
import jax.numpy as jnp


def segmask_smooth(seg_mask, kernel_size=11):
    """seg_mask: [B, H, W, C] one-hot -> smoothed one-hot."""
    window = (1, kernel_size, kernel_size, 1)
    summed = jax.lax.reduce_window(seg_mask, 0.0, jax.lax.add, window,
                                   (1, 1, 1, 1), 'SAME')
    count = jax.lax.reduce_window(jnp.ones_like(seg_mask[..., :1]), 0.0,
                                  jax.lax.add, window, (1, 1, 1, 1),
                                  'SAME')
    labels = summed / count
    idx = jnp.argmax(labels, axis=-1)
    return jax.nn.one_hot(idx, seg_mask.shape[-1], dtype=seg_mask.dtype)


def rand_crop(rng, cam_c, cam_res, target_res):
    """New principal point equivalent to rendering at cam_res then
    cropping target_res (host-side, numpy rng)."""
    d0 = rng.integers(0, cam_res[0] - target_res[0] + 1)
    d1 = rng.integers(0, cam_res[1] - target_res[1] + 1)
    return (cam_c[0] - d0, cam_c[1] - d1)

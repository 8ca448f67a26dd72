"""Differentiable GAN augmentation (DiffAugment).

Capability parity with `imaginaire/utils/diff_aug.py:14-142`
(color / translation / cutout policies applied to both real and fake
images before D). TPU-native: pure jnp with explicit PRNG keys, NHWC,
fully jit/grad-safe (gather-based translation instead of pad+index).
"""
import jax
import jax.numpy as jnp


def apply_diff_aug(x, key, policy=''):
    """x: [B, H, W, C] in [-1, 1]; policy: comma-joined subset of
    {'color', 'translation', 'cutout'} ('' = off, the shipped default,
    `config.py:123`)."""
    if not policy:
        return x
    for i, p in enumerate(policy.split(',')):
        key, sub = jax.random.split(key)
        x = _AUGS[p.strip()](x, sub)
    return x


def _rand_brightness(x, key):
    return x + jax.random.uniform(key, (x.shape[0], 1, 1, 1)) - 0.5


def _rand_saturation(x, key):
    mean = x.mean(axis=-1, keepdims=True)
    mag = jax.random.uniform(key, (x.shape[0], 1, 1, 1)) * 2.0
    return (x - mean) * mag + mean


def _rand_contrast(x, key):
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    mag = jax.random.uniform(key, (x.shape[0], 1, 1, 1)) + 0.5
    return (x - mean) * mag + mean


def _color(x, key):
    k1, k2, k3 = jax.random.split(key, 3)
    return _rand_contrast(_rand_saturation(_rand_brightness(x, k1), k2),
                          k3)


def _translation(x, key, ratio=0.125):
    b, h, w, c = x.shape
    sh, sw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    k1, k2 = jax.random.split(key)
    ty = jax.random.randint(k1, (b,), -sh, sh + 1)
    tx = jax.random.randint(k2, (b,), -sw, sw + 1)
    ys = jnp.arange(h)[None, :] - ty[:, None]          # [B, H]
    xs = jnp.arange(w)[None, :] - tx[:, None]          # [B, W]
    in_y = (ys >= 0) & (ys < h)
    in_x = (xs >= 0) & (xs < w)
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    g = jnp.take_along_axis(x, ys[:, :, None, None], axis=1)
    g = jnp.take_along_axis(g, xs[:, None, :, None], axis=2)
    mask = (in_y[:, :, None] & in_x[:, None, :])[..., None]
    return jnp.where(mask, g, 0.0)


def _cutout(x, key, ratio=0.5):
    b, h, w, c = x.shape
    ch, cw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    k1, k2 = jax.random.split(key)
    cy = jax.random.randint(k1, (b, 1, 1), 0, h + (1 - ch % 2))
    cx = jax.random.randint(k2, (b, 1, 1), 0, w + (1 - cw % 2))
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    inside = (jnp.abs(ys - cy) < ch // 2) & (jnp.abs(xs - cx) < cw // 2)
    return x * (~inside)[..., None]


_AUGS = {'color': _color, 'translation': _translation, 'cutout': _cutout}

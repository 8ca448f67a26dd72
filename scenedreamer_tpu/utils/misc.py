"""Misc tensor/config helpers.

Capability parity with `imaginaire/utils/misc.py` and
`imaginaire/utils/path.py`. The reference's device-movement helpers
(`to_cuda`/`to_cpu`/`to_device`/`to_half`/`to_float`,
`misc.py:53-126`) have no TPU analog by design: jax arrays are
device-placed by `jax.device_put`/sharding and dtype-cast per-op, so
only the structural helpers carry over. `requires_grad`
(`misc.py:39-50`) is likewise n/a — differentiation is selected by
`jax.grad` argnums, not parameter flags. `gradient_norm`
(`misc.py:201-213`) lives in the trainer as a jitted
global-norm (`train/trainer.py`).
"""
import os
import sys

import jax
import jax.numpy as jnp


def split_labels(labels, label_lengths):
    """Split a channel-concatenated label tensor back into named parts
    (`misc.py:14-37`). Channel-LAST here: dim 3/4/5 tensors split on
    the trailing axis (the reference splits its NCHW channel axis)."""
    start = 0
    outputs = {}
    for data_type, length in label_lengths.items():
        outputs[data_type] = labels[..., start:start + length]
        start += length
    return outputs


def slice_tensor(data, start, end):
    """Recursively slice [start:end) through dict/list pytrees
    (`misc.py:146-162`; the reference train loop's per-accum batch
    slicing `train.py:135-142`)."""
    if isinstance(data, (jnp.ndarray, jax.Array)):
        return data[start:end]
    if isinstance(data, dict):
        return {k: slice_tensor(v, start, end) for k, v in data.items()}
    if isinstance(data, (list, tuple)) and not isinstance(data, str):
        return type(data)(slice_tensor(d, start, end) for d in data)
    try:
        import numpy as np
        if isinstance(data, np.ndarray):
            return data[start:end]
    except ImportError:
        pass
    return data


def get_and_setattr(cfg, name, default):
    """Get attribute, setting the default if absent
    (`misc.py:163-177`)."""
    if not hasattr(cfg, name):
        setattr(cfg, name, default)
    return getattr(cfg, name)


def get_nested_attr(cfg, attr_name, default):
    """Dotted-path attribute lookup with default
    (`misc.py:180-198`)."""
    atr = cfg
    for name in attr_name.split('.'):
        if not hasattr(atr, name):
            return default
        atr = getattr(atr, name)
    return atr


def random_shift(x, key, offset=0.05):
    """Randomly translate each image by up to offset*size with
    bilinear resampling and reflection padding (`misc.py:216-239`).
    NHWC. The reference's `affine_grid`+`grid_sample` pair becomes a
    gather on a shifted coordinate grid — one fused XLA gather."""
    b, h, w, c = x.shape
    # per-sample (dy, dx) in [-offset, offset] of the half-extent,
    # matching affine_grid's normalized [-1, 1] coordinates.
    shift = (2.0 * offset * jax.random.uniform(key, (b, 2)) - offset)
    ys = (jnp.arange(h) + 0.5) / h * 2.0 - 1.0
    xs = (jnp.arange(w) + 0.5) / w * 2.0 - 1.0

    def one(img, dyx):
        yy = ys + dyx[0]
        xx = xs + dyx[1]
        # reflection padding on the normalized coords: identity on
        # [-1,1], mirrored outside
        yy = 1.0 - jnp.abs(jnp.mod(yy + 1.0, 4.0) - 2.0)
        xx = 1.0 - jnp.abs(jnp.mod(xx + 1.0, 4.0) - 2.0)
        fy = (yy + 1.0) * 0.5 * h - 0.5
        fx = (xx + 1.0) * 0.5 * w - 0.5
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        wy = jnp.clip(fy - y0, 0.0, 1.0)[:, None, None]
        wx = jnp.clip(fx - x0, 0.0, 1.0)[None, :, None]
        g = (img[y0][:, x0] * (1 - wy) * (1 - wx)
             + img[y0][:, x1] * (1 - wy) * wx
             + img[y1][:, x0] * wy * (1 - wx)
             + img[y1][:, x1] * wy * wx)
        return g

    return jax.vmap(one)(x, shift)


def get_immediate_subdirectories(input_dir):
    """Sorted immediate subdirectory names (`path.py:11-20`)."""
    return sorted([d for d in os.listdir(input_dir)
                   if os.path.isdir(os.path.join(input_dir, d))])


def get_recursive_subdirectories(input_dir, ext):
    """Sorted directories under input_dir containing files with the
    extension (`path.py:23-35`)."""
    import glob
    dirs = {os.path.dirname(p) for p in glob.glob(
        os.path.join(input_dir, '**', f'*.{ext}'), recursive=True)}
    return sorted(dirs)


def enable_compilation_cache(default_dir=None, min_compile_secs=10):
    """Persistent XLA compilation cache (opt out with
    SCENEDREAMER_NO_CACHE=1; dir override JAX_COMPILATION_CACHE_DIR).

    The flagship grad step takes minutes of remote AOT compile over the
    axon tunnel; a warm cache turns reruns of the same program into a
    disk load. Returns the cache dir, or None when disabled/unavailable.
    """
    if os.environ.get('SCENEDREAMER_NO_CACHE', '').strip().lower() in (
            '1', 'true', 'yes', 'on'):
        return None
    repo_default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), '.jax_cache')
    if default_dir is None:
        default_dir = repo_default
        if not os.access(os.path.dirname(repo_default), os.W_OK):
            # installed (site-packages) layout: fall back to the user cache
            default_dir = os.path.join(
                os.environ.get('XDG_CACHE_HOME',
                               os.path.expanduser('~/.cache')),
                'scenedreamer_tpu', 'jax_cache')
    cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR', default_dir)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          min_compile_secs)
    except Exception as e:   # older jax without the knobs
        print(f'compilation cache unavailable: {e}', file=sys.stderr)
        return None
    return cache_dir

"""Volume rendering weight computation.

Math parity with the reference `volum_rendering_relu` / `cumsum_exclusive`
(`imaginaire/model_utils/gancraft/mc_utils.py:75-79,154-161`):

    free_energy = relu(sigma) * dists
    w_i = (1 - exp(-fe_i)) * exp(-sum_{j<i} fe_j)

Exclusive cumsum along the sample axis; XLA lowers cumsum to an efficient
log-depth scan on TPU and fuses the pointwise tail.
"""
import jax
import jax.numpy as jnp


def cumsum_exclusive(x, axis):
    cs = jnp.cumsum(x, axis=axis)
    # shift right by one along `axis`, filling position 0 with 0
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sliced = [slice(None)] * x.ndim
    sliced[axis] = slice(0, x.shape[axis])
    return jnp.pad(cs, pad)[tuple(sliced)]


def volume_rendering_relu(sigma, dists, axis=-2):
    """Per-sample compositing weights. sigma/dists broadcast-compatible."""
    free_energy = jax.nn.relu(sigma) * dists
    a = 1.0 - jnp.exp(-free_energy.astype(jnp.float32))
    b = jnp.exp(-cumsum_exclusive(free_energy.astype(jnp.float32), axis=axis))
    return a * b

"""Sinusoidal positional encoding.

Contract matches the reference CUDA kernel
(`voxlib/positional_encoding_kernel.cu`, python spec
`voxlib/positional_encoding.py:45-54`): concat along the last dim of
[sin(x*pi*2^0), cos(x*pi*2^0), ..., sin(x*pi*2^(deg-1)), cos(...), (x)].

On TPU this is pure VPU work that XLA fuses into neighbours; no custom
kernel needed (the reference needed one only to avoid torch temporaries).
"""
import jax.numpy as jnp


def positional_encoding(x, degrees, incl_orig=False):
    """x: [..., C] -> [..., degrees*2*C (+C if incl_orig)]."""
    if degrees == 0:
        return x if incl_orig else None
    feats = []
    for i in range(degrees):
        scaled = x * (jnp.pi * (2.0 ** i))
        feats.append(jnp.sin(scaled))
        feats.append(jnp.cos(scaled))
    if incl_orig:
        feats.append(x)
    return jnp.concatenate(feats, axis=-1)


def pe_out_dim(in_dim, degrees, incl_orig):
    return in_dim * degrees * 2 + (in_dim if incl_orig else 0)

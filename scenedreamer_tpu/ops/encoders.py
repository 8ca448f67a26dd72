"""Encoder factory + misc activation ops.

Capability parity with the reference's `encoding.py:5-66` (`FreqEncoder`
NeRF sin/cos encoder and the `get_encoder` factory dispatching
'hashgrid' / 'tiledgrid' / 'frequency' / 'None') and `activation.py:5-17`
(`trunc_exp`: exp with a clamped-input backward).
"""
import functools

import jax
import jax.numpy as jnp

from scenedreamer_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode
from scenedreamer_tpu.ops.pe import positional_encoding, pe_out_dim


@jax.custom_vjp
def trunc_exp(x):
    """exp(x) whose gradient clamps the input to +-15 before the
    backward exp (reference `activation.py:5-17`) — keeps sigma grads
    finite when the MLP spikes."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def freq_encode(x, degree=4):
    """NeRF frequency encoding incl. the raw input
    (reference `encoding.py:5-43`; output dim D + D*2*degree)."""
    return positional_encoding(x, degree, incl_orig=True)


def get_encoder(encoding='hashgrid', input_dim=3, degree=4, num_levels=16,
                level_dim=2, base_resolution=16, log2_hashmap_size=19,
                desired_resolution=2048, align_corners=False):
    """Encoder factory (reference `encoding.py:46-66`).

    Returns (encode_fn, output_dim, spec_or_None). Grid encoders take
    (table, x); 'frequency'/'None' take (x) only.
    """
    if encoding in (None, 'None'):
        return (lambda x: x), input_dim, None
    if encoding == 'frequency':
        fn = functools.partial(freq_encode, degree=degree)
        return fn, pe_out_dim(input_dim, degree, True), None
    if encoding in ('hashgrid', 'tiledgrid'):
        spec = HashGridSpec.create(
            input_dim=input_dim, num_levels=num_levels,
            level_dim=level_dim, base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype='hash' if encoding == 'hashgrid' else 'tiled',
            align_corners=align_corners)
        fn = functools.partial(hashgrid_encode, spec)
        return fn, spec.output_dim, spec
    if encoding == 'varhashgrid':
        # reference `grid.py:158-224` VarGridEncoder: the first
        # `hash_entries` table rows are externally-owned embeddings,
        # concatenated ahead of the encoder's own rows at call time
        # (`grid.py:211` input_embeddings = cat([external, own])).
        # Signature: fn(own_table, external, x).
        spec = HashGridSpec.create(
            input_dim=input_dim, num_levels=num_levels,
            level_dim=level_dim, base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype='hash', align_corners=align_corners)

        def var_encode(table, external, x):
            return hashgrid_encode(
                spec, jnp.concatenate([external, table], axis=0), x)

        return var_encode, spec.output_dim, spec
    raise NotImplementedError(f'encoder {encoding}')

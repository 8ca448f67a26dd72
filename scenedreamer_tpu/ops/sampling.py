"""Stratified depth sampling inside ray-voxel intersection intervals.

Math parity with the reference `sample_depth_batched`
(`imaginaire/model_utils/gancraft/mc_utils.py:82-151`) with one deliberate
change: the reference threads NaN sentinels through `depth2` and scrubs them
afterwards (`scenedreamer.py:350-352`); here invalid intervals are explicit
`mask=False` entries, which keeps everything finite and jit/vmap friendly on
TPU. Shapes are flat-ray `[R, M]` (R rays, M max intersections) rather than
`[B, 2, H, W, M, 1]`; callers reshape.

Returns `num_out = nsamples - 1 (+ M + 1 if use_box_boundaries)` sample
midpoints per ray, exactly like the reference (callers pass
`nsamples = num_samples + 1` without boundaries or
`nsamples = num_samples - M` with boundaries so `num_out == num_samples`).
"""
import jax
import jax.numpy as jnp

from scenedreamer_tpu.ops.compositing import cumsum_exclusive


def sample_depth(key, depth, mask, nsamples, deterministic=False,
                 use_box_boundaries=True, sample_depth_clip=4.0):
    """Sample point depths along rays.

    Args:
        key: PRNG key (unused when deterministic and not use_box_boundaries).
        depth: [R, M, 2] float entry/exit ray-t of each intersected voxel.
        mask: [R, M] bool validity of each intersection.
        nsamples: number of raw stratified samples.
        deterministic: equal-spacing instead of stratified randomization.
        use_box_boundaries: include interval boundaries as samples.
        sample_depth_clip: stop sampling after this much in-solid distance.

    Returns:
        rand_depth: [R, S] ray-t of each sample midpoint.
        new_dists: [R, S] distance between consecutive sample points.
        new_idx:   [R, S] int32 index of the intersection interval
                   containing each midpoint (for label gathering).
    """
    maskf = mask.astype(depth.dtype)
    entry = depth[..., 0] * maskf          # [R, M]
    exitd = depth[..., 1] * maskf
    dists = jnp.maximum(exitd - entry, 0.0) * maskf

    accu_depth = jnp.cumsum(dists, axis=-1)            # [R, M]
    total_depth = jnp.minimum(accu_depth[..., -1:], sample_depth_clip)

    k_bound, k_samp = jax.random.split(key)
    pieces = []
    if use_box_boundaries:
        bad = (accu_depth > sample_depth_clip) | (dists == 0)
        filler = jax.random.uniform(k_bound, accu_depth.shape,
                                    depth.dtype) * total_depth
        pieces.append(jnp.where(bad, filler, accu_depth))

    R = depth.shape[0]
    if deterministic:
        rand = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, nsamples + 2, dtype=depth.dtype)[1:-1],
            (R, nsamples))
    else:
        rand = jax.random.uniform(key=k_samp, shape=(R, nsamples),
                                  dtype=depth.dtype) / nsamples
        rand = rand + jnp.linspace(0.0, 1.0, nsamples + 1,
                                   dtype=depth.dtype)[:-1]
    pieces.insert(0, rand * total_depth)
    if use_box_boundaries:
        pieces.append(jnp.zeros((R, 1), depth.dtype))

    samples = jnp.sort(jnp.concatenate(pieces, axis=-1), axis=-1)

    midpoints = 0.5 * (samples[..., 1:] + samples[..., :-1])   # [R, S]
    new_dists = samples[..., 1:] - samples[..., :-1]

    # Which interval does each midpoint fall into (in accumulated
    # in-solid distance space)?
    idx = jnp.sum(midpoints[..., None, :] > accu_depth[..., :, None],
                  axis=-2).astype(jnp.int32)                    # [R, S]
    idx = jnp.minimum(idx, depth.shape[1] - 1)

    # Convert in-solid distance to ray t: t = entry[i] + (m - accu_excl[i]).
    heads = entry - cumsum_exclusive(dists, axis=-1)            # [R, M]
    rand_depth = jnp.take_along_axis(heads, idx, axis=-1) + midpoints

    return rand_depth, new_dists, idx

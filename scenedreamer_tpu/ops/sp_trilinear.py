"""Sparse trilinear interpolation of per-corner features at world coords.

Capability parity with `voxlib.sp_trilinear_worldcoord`
(`imaginaire/model_utils/gancraft/voxlib/sp_trilinear_worldcoord_kernel.cu:80-180`,
python wrapper `sp_trilinear.py:14-35`) — the legacy GANcraft voxel-
feature path used by `Base3DGenerator._forward_perpix_sub`
(`gancraft_base.py:442`):

  * a corner-index LUT `[Y+1, X+1, Z+1]` int32 maps each voxel corner to
    a row of the feature table; trilinear weights from the fractional
    world coordinate
  * invalid coords (the reference uses NaN sentinels; we also accept an
    explicit mask) contribute zeros
  * `ign_zero=True` shifts ids by -1 so LUT entry 0 means "hole" and is
    skipped (its weight is dropped from the blend)
  * gradients flow to the feature table only (the CUDA backward
    scatters to features; `needs_input_grad[2] is False` is asserted in
    the reference wrapper) — we stop_gradient the coords for parity

TPU-native: gather + lerp expressed in jnp; the table-gradient
scatter-add comes out of XLA autodiff as a deterministic segment-sum.
"""
import numpy as np
import jax
import jax.numpy as jnp


def _corner_offsets():
    idx = np.arange(8)
    return np.stack([(idx >> 2) & 1, (idx >> 1) & 1, idx & 1],
                    axis=-1).astype(np.int32)          # [8, 3] y,x,z bits


def sp_trilinear_worldcoord(feats, corner_lut, worldcoord, ign_zero=False,
                            valid_mask=None):
    """Interpolate features at world coordinates.

    Args:
        feats: [R, C] per-corner feature rows.
        corner_lut: [Y+1, X+1, Z+1] int32 corner-id LUT.
        worldcoord: [..., 3] float coords (voxel units). NaNs -> zeros.
        ign_zero: id 0 = hole; indices are shifted by -1 and holes are
            dropped from the blend (cu:163-169).
        valid_mask: optional [...] bool; False -> zeros (explicit-mask
            alternative to NaN sentinels).

    Returns:
        [..., C] interpolated features.
    """
    prefix = worldcoord.shape[:-1]
    wc = worldcoord.reshape(-1, 3)
    nan_mask = jnp.any(jnp.isnan(wc), axis=-1)
    wc = jnp.nan_to_num(wc)
    base = jnp.floor(wc)
    frac = wc - base
    base = base.astype(jnp.int32)

    offs = jnp.asarray(_corner_offsets())                    # [8, 3]
    corner = base[:, None, :] + offs[None]                   # [N, 8, 3]
    dims = jnp.asarray(corner_lut.shape, jnp.int32)
    corner = jnp.clip(corner, 0, dims[None, None] - 1)

    w = jnp.where(offs[None].astype(bool), frac[:, None, :],
                  1.0 - frac[:, None, :])
    w = jnp.prod(w, axis=-1)                                 # [N, 8]

    flat_lut = corner_lut.reshape(-1)
    flat_idx = (corner[..., 0] * (corner_lut.shape[1]
                                  * corner_lut.shape[2])
                + corner[..., 1] * corner_lut.shape[2]
                + corner[..., 2])
    ids = jnp.take(flat_lut, flat_idx, axis=0)               # [N, 8]
    if ign_zero:
        hole = ids == 0
        ids = ids - 1
        w = jnp.where(hole, 0.0, w)
    ids = jnp.clip(ids, 0, feats.shape[0] - 1)

    vals = jnp.take(feats, ids, axis=0)                      # [N, 8, C]
    # parity: no gradient to coordinates (the reference backward only
    # scatters to features; `sp_trilinear.py:28`)
    w = jax.lax.stop_gradient(w)
    out = jnp.einsum('nk,nkc->nc',
                     w.astype(vals.dtype),
                     vals)
    invalid = nan_mask
    if valid_mask is not None:
        invalid = invalid | ~valid_mask.reshape(-1)
    out = jnp.where(invalid[:, None], 0.0, out)
    return out.reshape(*prefix, feats.shape[-1])


def build_corner_lut(voxel):
    """Corner-id LUT for a dense voxel grid: corners adjacent to at
    least one solid voxel get consecutive ids starting at 1 (0 = hole),
    matching the `mc_utils.gen_corner_voxel` contract the reference
    feeds to sp_trilinear (`mc_utils.py:13-30`).

    Host-side numpy; returns ([Y+1, X+1, Z+1] int32 LUT, num_corners).
    """
    occ = np.asarray(voxel) != 0
    cor = np.zeros(tuple(s + 1 for s in occ.shape), bool)
    for dy in (0, 1):
        for dx in (0, 1):
            for dz in (0, 1):
                cor[dy:dy + occ.shape[0], dx:dx + occ.shape[1],
                    dz:dz + occ.shape[2]] |= occ
    lut = np.zeros(cor.shape, np.int32)
    n = int(cor.sum())
    lut[cor] = np.arange(1, n + 1, dtype=np.int32)
    return lut, n

"""Legacy GANcraft generator: sparse per-corner voxel features instead
of the hash grid.

Capability parity with the reference `Base3DGenerator`'s own field path
(`imaginaire/generators/gancraft_base.py:296-586`): a learnable
`blk_feats [K, C1]` table indexed through the scene's corner LUT with
sparse trilinear interpolation (`gancraft_base.py:442-444`), optional
positional encoding of the first `C1 - pe_no_pe_feat_dim` feature
channels (pe_lvl_feat=4, pe_no_pe_feat_dim=40 in
`configs/scenedreamer_train.yaml:83-85`), then the same style-modulated
RenderMLP / sky / compositing / RenderCNN stack. SceneDreamer overrides
this path with the hash grid; it is kept for the GANcraft-style
single-scene mode.

TPU-native: inherits all rendering machinery from
`SceneDreamerGenerator`; only the field lookup differs. The corner LUT
is per-scene data (built by `ops.sp_trilinear.build_corner_lut`) passed
through `field_extra={'corner_lut': ...}`.
"""
import jax
import jax.numpy as jnp

from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                               SceneDreamerGenerator)
from scenedreamer_tpu.ops.pe import positional_encoding, pe_out_dim
from scenedreamer_tpu.ops.sp_trilinear import sp_trilinear_worldcoord


class GANcraftGenerator(SceneDreamerGenerator):
    """Voxel-corner-feature variant (`gancraft_base.py:429-472`)."""
    num_corners: int = 1          # rows of blk_feats (scene-dependent)
    blk_feat_dim: int = 64        # scenedreamer_train.yaml:81
    pe_lvl_feat: int = 4          # scenedreamer_train.yaml:83
    pe_incl_orig_feat: bool = False
    pe_no_pe_feat_dim: int = 40   # scenedreamer_train.yaml:85

    def setup(self):
        super().setup()
        self.blk_feats = self.param(
            'blk_feats',
            lambda k, s: jax.random.normal(k, s, jnp.float32) * 0.01,
            (self.num_corners + 1, self.blk_feat_dim))

    def field_features(self, worldcoord, voxel_dims, global_enc,
                       raydirs_in, z, mc_masks_onehot, corner_lut=None,
                       valid_mask=None):
        """sp_trilinear + PE + RenderMLP (`gancraft_base.py:429-472`).
        voxel_dims / global_enc are unused in this mode (world
        conditioning comes from the per-scene feature table)."""
        assert corner_lut is not None, \
            "GANcraft mode needs field_extra={'corner_lut': ...}"
        proj = sp_trilinear_worldcoord(self.blk_feats, corner_lut,
                                       worldcoord, ign_zero=True,
                                       valid_mask=valid_mask)
        if self.pe_lvl_feat == 0 and self.pe_incl_orig_feat:
            feature_in = proj
        elif self.pe_no_pe_feat_dim > 0:
            pe_part = positional_encoding(
                proj[..., :-self.pe_no_pe_feat_dim], self.pe_lvl_feat,
                self.pe_incl_orig_feat)
            feature_in = jnp.concatenate(
                [pe_part, proj[..., -self.pe_no_pe_feat_dim:]], axis=-1)
        else:
            feature_in = positional_encoding(proj, self.pe_lvl_feat,
                                             self.pe_incl_orig_feat)
        return self.render_net(feature_in, raydirs_in, z,
                               mc_masks_onehot)

    @property
    def field_in_dim(self):
        pe_dims = self.blk_feat_dim - self.pe_no_pe_feat_dim
        return pe_out_dim(pe_dims, self.pe_lvl_feat,
                          self.pe_incl_orig_feat) + self.pe_no_pe_feat_dim

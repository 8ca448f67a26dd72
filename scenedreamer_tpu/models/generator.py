"""SceneDreamer generator: hash-grid neural field + sky + style + render CNN.

Capability parity with the reference top model
(`imaginaire/generators/scenedreamer.py` on top of
`generators/gancraft_base.py:296-603`):

  forward:  world_encoder(BEV fields) -> 2-d scene code; style z (random or
            VAE style encoder) -> StyleMLP; per-pixel pass = stratified depth
            sampling inside ray-voxel intervals -> 5-d hash encoding
            (xyz + scene code) -> style-modulated RenderMLP -> volume
            compositing blended with a SKYMLP sky dome (+ sky-leak
            suppression via global average pooling) -> RenderCNN -> tanh.

TPU-native design:
  * One flax module; the whole forward is jit/grad-safe (explicit hit
    masks instead of the reference's NaN sentinels, PRNG keys instead of
    global RNG state).
  * Per-sample tensors are kept as [B, H, W, S, C] but every dense layer
    runs as a single [B, N, C] batched matmul on the MXU.
  * The non-differentiable prep (depth sampling, label gathering) is
    wrapped in stop_gradient exactly where the reference used no_grad
    (`scenedreamer.py:325-363`).
"""
import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from scenedreamer_tpu.ops.hashgrid import (HashGridSpec, foldable,
                                           hashgrid_encode,
                                           hashgrid_encode_folded)
from scenedreamer_tpu.ops.pe import positional_encoding, pe_out_dim
from scenedreamer_tpu.ops.sampling import sample_depth
from scenedreamer_tpu.ops.compositing import volume_rendering_relu
from scenedreamer_tpu.models.layers import (ConditionalHashGrid, RenderCNN,
                                            RenderMLP, SKYMLP, StyleEncoder,
                                            StyleMLP)
from scenedreamer_tpu.scene.labels import get_label_translator


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """Generator hyperparameters (values = configs/scenedreamer_train.yaml)."""
    style_dims: int = 128
    interm_style_dims: int = 256
    final_feat_dim: int = 64
    pad: int = 6
    # ray casting
    num_blocks_early_stop: int = 6
    num_samples: int = 24
    sample_depth: float = 3.0
    coarse_deterministic_sampling: bool = False
    sample_use_box_boundaries: bool = False
    # blender
    raw_noise_std: float = 0.0
    dists_scale: float = 0.25
    clip_feat_map: Any = True
    keep_sky_out: bool = True
    keep_sky_out_avgpool: bool = True
    sky_global_avgpool: bool = True
    # ray-direction PE (train config disables the raydir input entirely)
    pe_lvl_raydir: int = 0
    pe_incl_orig_raydir: bool = False
    pe_lvl_raydir_sky: int = 5
    pe_incl_orig_raydir_sky: bool = True
    # hash grid (encoder=hashgrid, input 5, level_dim 8, res 2048;
    # reference scenedreamer.py:51)
    hash_num_levels: int = 16
    hash_level_dim: int = 8
    hash_base_resolution: int = 16
    hash_log2_size: int = 19
    hash_desired_resolution: int = 2048
    # 'xor' = reference-compatible fast_hash (required for converted
    # torch checkpoints); 'paired' = ADD-combine adjacency hash (slice-2
    # gathers + shift fold; train-from-scratch perf option — see
    # HashGridSpec.hash_variant)
    hash_variant: str = 'xor'
    # mlp
    mlp_hidden: int = 256
    use_seg: bool = True
    # style encoder
    style_enc_num_filters: int = 64
    style_enc_kernel_size: int = 3
    num_reduced_labels: int = 12
    dtype: Any = jnp.float32

    @property
    def hash_spec(self):
        return HashGridSpec.create(
            input_dim=5, num_levels=self.hash_num_levels,
            level_dim=self.hash_level_dim,
            base_resolution=self.hash_base_resolution,
            log2_hashmap_size=self.hash_log2_size,
            desired_resolution=self.hash_desired_resolution,
            hash_variant=self.hash_variant)

    @property
    def viewdir_dim(self):
        return pe_out_dim(3, self.pe_lvl_raydir, self.pe_incl_orig_raydir) \
            if (self.pe_lvl_raydir or self.pe_incl_orig_raydir) else 0

    @property
    def sky_in_dim(self):
        return pe_out_dim(3, self.pe_lvl_raydir_sky,
                          self.pe_incl_orig_raydir_sky)


class SceneDreamerGenerator(nn.Module):
    """Flagship generator. See module docstring."""
    cfg: GeneratorConfig = GeneratorConfig()

    def setup(self):
        c = self.cfg
        spec = c.hash_spec
        self.hash_table = self.param(
            'hash_table',
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -1e-4, 1e-4),
            (spec.table_size, spec.level_dim))
        self.render_net = RenderMLP(
            style_dim=c.interm_style_dims, viewdir_dim=c.viewdir_dim,
            mask_dim=c.num_reduced_labels, out_channels_s=1,
            out_channels_c=c.final_feat_dim, hidden_channels=c.mlp_hidden,
            use_seg=c.use_seg, dtype=c.dtype)
        self.world_encoder = ConditionalHashGrid(dtype=c.dtype)
        self.sky_net = SKYMLP(style_dim=c.interm_style_dims,
                              out_channels_c=c.final_feat_dim, dtype=c.dtype)
        self.style_net = StyleMLP(out_dim=c.interm_style_dims,
                                  num_layers=5, normalize_input=True,
                                  dtype=c.dtype)
        self.style_encoder = StyleEncoder(
            style_dims=c.style_dims, num_filters=c.style_enc_num_filters,
            kernel_size=c.style_enc_kernel_size, dtype=c.dtype)
        self.denoiser = RenderCNN(hidden_channels=256, out_channels=3,
                                  dtype=c.dtype)

    # ------------------------------------------------------------------
    # pieces
    # ------------------------------------------------------------------

    def world_code(self, height_field, semantic_field):
        """BEV fields (NHWC) -> [B, 2] scene code."""
        return self.world_encoder(height_field, semantic_field)

    def encode_style(self, image, rng=None):
        return self.style_encoder(image, rng)

    def style_forward(self, z):
        return self.style_net(z)

    def sky_color(self, raydirs, z):
        """raydirs [B, H, W, 3], z [B, S] -> [B, H, W, 1, C]."""
        pe = positional_encoding(raydirs[..., None, :],
                                 self.cfg.pe_lvl_raydir_sky,
                                 self.cfg.pe_incl_orig_raydir_sky)
        return self.sky_net(pe, z)

    def field_features(self, worldcoord, voxel_dims, global_enc, raydirs_in,
                       z, mc_masks_onehot):
        """Hash-encode world points conditioned on the scene code and run
        the RenderMLP (`scenedreamer.py:285-311`).

        Every point of a batch item shares the same 2-d scene code, so
        the flagship 5-d hash uses the scene-folded fast path
        (`ops/hashgrid.py:hashgrid_encode_folded`): scene-corner xor
        permutations are pre-baked per level and each point costs 2^3
        gathers instead of 2^5."""
        spec = self.cfg.hash_spec
        delim = jnp.asarray(voxel_dims, jnp.float32)
        normalized = worldcoord / delim * 2.0 - 1.0
        b = normalized.shape[0]
        if foldable(spec, global_enc.shape[-1]):
            flat = normalized.reshape(b, -1, 3)
            # NOT vmap: batching the scan-of-custom-vjp level loop was
            # measured 5x slower to compile AND +1.5 s/tile at runtime
            # even at b=1 (PERF.md r2). b==1 calls directly; b>1 runs a
            # lax.map (one compiled body, sequential over batch — the
            # per-device batch is 1 in the shipped configs).
            if b == 1:
                feat = hashgrid_encode_folded(
                    spec, self.hash_table, flat[0], global_enc[0])[None]
            else:
                feat = jax.lax.map(
                    lambda xs: hashgrid_encode_folded(
                        spec, self.hash_table, xs[0], xs[1]),
                    (flat, global_enc))
        else:
            genc = jnp.broadcast_to(
                global_enc[:, None, None, None, :],
                normalized.shape[:-1] + (global_enc.shape[-1],))
            pts = jnp.concatenate([normalized, genc], axis=-1)
            feat = hashgrid_encode(spec, self.hash_table, pts)
            feat = feat.reshape(b, -1, spec.output_dim)
        # run the MLP on flat [B, N, C] (2-D matmul layouts; 5-D tensors
        # cost extra relayouts on TPU), then restore the spatial shape
        rd_flat = None
        if raydirs_in is not None:
            rd_flat = jnp.broadcast_to(
                raydirs_in,
                normalized.shape[:-1] + (raydirs_in.shape[-1],)
            ).reshape(b, -1, raydirs_in.shape[-1])
        m_flat = mc_masks_onehot.reshape(b, -1,
                                         mc_masks_onehot.shape[-1])
        sigma, feat_c = self.render_net(feat, rd_flat, z, m_flat)
        out_shape = normalized.shape[:-1]
        return (sigma.reshape(out_shape + (sigma.shape[-1],)),
                feat_c.reshape(out_shape + (feat_c.shape[-1],)))

    def render_pixels(self, key, voxel_id, depth, hit_mask, raydirs,
                      cam_ori, z, global_enc, voxel_dims,
                      num_samples=None, sample_depth_clip=None,
                      deterministic=None, sky_avg=None, field_extra=None,
                      sky_only=False, compact_k=None):
        """Full per-pixel rendering pass (`scenedreamer.py:313-430`).

        `sky_only=True` (static) skips the hash-field + RenderMLP and
        substitutes sigma = feat = 0. For tiles whose hit_mask is all
        False this is BIT-exact: `sky_only_mask` already forces the
        volume weights to zero there, and sigma = 0 yields exactly-zero
        weights before masking, so every field term it skips is
        multiplied by 0.0 in the full path too (tested). The tiled
        renderer uses it to fast-path pure-sky tiles.

        `compact_k` (static int, r5): evaluate the hash-field + MLP on
        only the first `compact_k` rays after a stable hits-first sort
        — exact sky-ray compaction (reference sky masks:
        `scenedreamer.py:313-430`). Pure-sky rays have zero sample
        dists, hence exactly-zero volume weights AND exactly-zero
        field gradients, so dropping them is exact per ray (forward
        bit-exact; param grads equal up to matmul reduction order —
        tested) PROVIDED compact_k >= the number of rays with any hit.
        Callers fetch the per-tile hit count and bucket it (the
        split-refine renderer and bench.py do); compact_k >= h*w or
        None disables.

        Args:
            key: PRNG key for stratified sampling (+ sigma noise).
            voxel_id: [B, H, W, M] int32 intersection ids.
            depth: [B, H, W, M, 2] entry/exit t.
            hit_mask: [B, H, W, M] bool.
            raydirs: [B, H, W, 3].
            cam_ori: [B, 3].
            z: [B, interm_style] intermediate style.
            global_enc: [B, 2] scene code.
            voxel_dims: static (Y, X, Z) of the voxel grid.
            sky_avg: optional [B, 1, 1, 1, C] precomputed sky average
                (tiled inference shares one across tiles).

        Returns dict with net_out [B, H, W, C], weights, rand_depth, masks.
        """
        c = self.cfg
        num_samples = num_samples or c.num_samples
        sample_depth_clip = sample_depth_clip if sample_depth_clip \
            is not None else c.sample_depth
        deterministic = c.coarse_deterministic_sampling \
            if deterministic is None else deterministic
        b, h, w, m = voxel_id.shape
        trans = get_label_translator()

        # ---- non-differentiable prep (reference no_grad blocks) --------
        nsamples = (num_samples - c.num_blocks_early_stop
                    if c.sample_use_box_boundaries else num_samples + 1)
        k_samp, k_noise = jax.random.split(key)
        rand_depth, new_dists, new_idx = sample_depth(
            k_samp, depth.reshape(b * h * w, m, 2),
            hit_mask.reshape(b * h * w, m), nsamples,
            deterministic=deterministic,
            use_box_boundaries=c.sample_use_box_boundaries,
            sample_depth_clip=sample_depth_clip)
        s = rand_depth.shape[-1]
        rand_depth = jax.lax.stop_gradient(
            rand_depth.reshape(b, h, w, s, 1))
        new_dists = jax.lax.stop_gradient(new_dists.reshape(b, h, w, s, 1))
        new_idx = new_idx.reshape(b, h, w, s)

        worldcoord = raydirs[:, :, :, None, :] * rand_depth \
            + cam_ori[:, None, None, None, :]

        # per-sample reduced segmentation labels
        vid_reduced = trans.mc2reduced(voxel_id, ign2dirt=True)  # [B,H,W,M]
        mc_masks = jnp.take_along_axis(vid_reduced, new_idx, axis=-1)
        mc_onehot = jax.nn.one_hot(mc_masks, c.num_reduced_labels,
                                   dtype=jnp.float32)

        # ray-direction input (train config: disabled)
        raydirs_in = None
        if c.pe_lvl_raydir > 0:
            raydirs_in = positional_encoding(
                raydirs[:, :, :, None, :], c.pe_lvl_raydir,
                c.pe_incl_orig_raydir)
        elif c.pe_incl_orig_raydir:
            raydirs_in = raydirs[:, :, :, None, :]

        # ---- differentiable field + sky --------------------------------
        # sky masks: last-slot empty = ray ends in sky; first-slot empty =
        # pure sky ray (reference scenedreamer.py:334-337)
        sky_mask = ~hit_mask[..., -1:]                        # [B,H,W,1]
        sky_only_mask = ~hit_mask[..., :1]
        r_all = h * w
        compact = (not sky_only and compact_k is not None
                   and compact_k < r_all)

        def _clip_feat(x):
            """Per-sample feature term of the compositing sum (clip
            mode semantics, reference scenedreamer.py:373-427)."""
            if c.clip_feat_map is True:
                return jnp.clip(x, -1, 1) + 1
            if c.clip_feat_map == 'tanh':
                return jnp.tanh(x)
            return x

        if compact:
            ray_hit = hit_mask[..., 0].reshape(b, r_all)
            # stable sort: hitting rays first, original order preserved
            order = jnp.argsort(jnp.logical_not(ray_hit), axis=1,
                                stable=True)
            sel = order[:, :compact_k]
            inv = jnp.argsort(order, axis=1)

            def take_rays(x):                     # [b, r_all, ...]
                idx = sel.reshape((b, compact_k) + (1,) * (x.ndim - 2))
                return jnp.take_along_axis(
                    x, jnp.broadcast_to(idx,
                                        (b, compact_k) + x.shape[2:]),
                    axis=1)

            def scatter_rays(x):       # [b, K, m, C] -> [b, r_all, m, C]
                pad = jnp.zeros((b, r_all - compact_k) + x.shape[2:],
                                x.dtype)
                full = jnp.concatenate([x, pad], axis=1)
                idx = inv.reshape(b, r_all, 1, 1)
                return jnp.take_along_axis(
                    full, jnp.broadcast_to(idx,
                                           (b, r_all) + x.shape[2:]),
                    axis=1)

            wc_c = take_rays(worldcoord.reshape(b, r_all, s, 3))
            mc_c = jax.nn.one_hot(
                take_rays(mc_masks.reshape(b, r_all, s)),
                c.num_reduced_labels, dtype=jnp.float32)
            rd_c = None
            if raydirs_in is not None:
                rd_c = take_rays(raydirs_in.reshape(
                    b, r_all, 1, raydirs_in.shape[-1]))
            sigma_c, feat_cc = self.field_features(
                wc_c, voxel_dims, global_enc, rd_c, z, mc_c,
                **(field_extra or {}))
            if c.raw_noise_std > 0:
                # note: the draw covers only the compacted rays, so it
                # differs from the full path's (shape-keyed) draw;
                # exactness claims assume raw_noise_std=0 (the shipped
                # configs' value)
                sigma_c = sigma_c + jax.random.normal(
                    k_noise, sigma_c.shape,
                    sigma_c.dtype) * c.raw_noise_std
            dists_c = take_rays(new_dists.reshape(b, r_all, s, 1))
            w_c = volume_rendering_relu(sigma_c,
                                        dists_c * c.dists_scale, axis=-2)
            keep_c = take_rays((~sky_only_mask).reshape(b, r_all, 1, 1))
            w_c = w_c * keep_c.astype(w_c.dtype)
            total_w_c = jnp.sum(w_c, axis=-2, keepdims=True)  # [b,K,1,1]
            terr_c = jnp.sum(w_c * _clip_feat(feat_cc), axis=-2,
                             keepdims=True)                   # [b,K,1,C]
            # scatter back ONLY per-ray results (the [R,S,C] feature
            # scatter measured -18% on the headline; terrain is
            # composited in the compacted domain instead). Dropped
            # rays are pure sky: their full-path weights/terrain are
            # exactly zero, so zero-fill is exact.
            weights = scatter_rays(w_c).reshape(b, h, w, s, 1)
            sigma = scatter_rays(sigma_c).reshape(b, h, w, s, 1)
            total_w = scatter_rays(total_w_c).reshape(b, h, w, 1, 1)
            terrain_sum = scatter_rays(terr_c).reshape(
                b, h, w, 1, terr_c.shape[-1])
        else:
            if sky_only:
                # zeros in the model compute dtype so downstream
                # promotion matches the full path bit-for-bit (AMP incl)
                sigma = jnp.zeros((b, h, w, s, 1), c.dtype)
                feat_c = jnp.zeros((b, h, w, s, c.final_feat_dim),
                                   c.dtype)
            else:
                sigma, feat_c = self.field_features(
                    worldcoord, voxel_dims, global_enc, raydirs_in,
                    z, mc_onehot, **(field_extra or {}))
            if c.raw_noise_std > 0:
                sigma = sigma + jax.random.normal(
                    k_noise, sigma.shape, sigma.dtype) * c.raw_noise_std
            weights = volume_rendering_relu(
                sigma, new_dists * c.dists_scale, axis=-2)
            weights = weights * (~sky_only_mask[..., None]).astype(
                weights.dtype).reshape(b, h, w, 1, 1)
            total_w = jnp.sum(weights, axis=-2,
                              keepdims=True)                  # [B,H,W,1,1]
            terrain_sum = jnp.sum(weights * _clip_feat(feat_c),
                                  axis=-2, keepdims=True)     # [B,H,W,1,C]

        sky_c = self.sky_color(raydirs, z)                   # [B,H,W,1,C]

        is_gnd = jnp.any(worldcoord[..., 0] <= 1.0, axis=-1,
                         keepdims=True)                       # [B,H,W,1]
        nosky = (~sky_mask | is_gnd).astype(jnp.float32)[..., None]

        sky_weight = 1.0 - total_w
        if c.keep_sky_out:
            if c.keep_sky_out_avgpool:
                if sky_avg is None:
                    if c.sky_global_avgpool:
                        sky_avg = jnp.mean(sky_c, axis=(1, 2), keepdims=True)
                    else:
                        # 31x31 local average pool, edge-corrected
                        ones = jnp.ones(sky_c.shape[:3] + (1, 1),
                                        sky_c.dtype)
                        window = (1, 31, 31, 1, 1)
                        summed = jax.lax.reduce_window(
                            sky_c, 0.0, jax.lax.add, window,
                            (1, 1, 1, 1, 1), 'SAME')
                        count = jax.lax.reduce_window(
                            ones, 0.0, jax.lax.add, window,
                            (1, 1, 1, 1, 1), 'SAME')
                        sky_avg = summed / count
                sky_c = sky_c * (1.0 - nosky) + sky_avg * nosky
            else:
                sky_weight = sky_weight * (1.0 - nosky)

        if c.clip_feat_map is True:
            rgbs_sky = jnp.clip(sky_c, -1, 1) + 1
            net_out = (terrain_sum
                       + sky_weight * rgbs_sky).squeeze(-2) - 1.0
        elif c.clip_feat_map == 'tanh':
            net_out = (terrain_sum
                       + sky_weight * jnp.tanh(sky_c)).squeeze(-2)
        else:
            net_out = (terrain_sum + sky_weight * sky_c).squeeze(-2)

        return {
            'net_out': net_out,            # [B, H, W, C]
            'weights': weights,
            'rand_depth': rand_depth,
            'total_weights': total_w,
            'sigma': sigma,
            'sky_c': sky_c,
            'nosky_mask': nosky,
            'sky_mask': sky_mask,
            'sky_only_mask': sky_only_mask,
        }

    def refine(self, net_out, z):
        """RenderCNN + tanh (`gancraft_base.py:588-603`).
        net_out: [B, H, W, C] -> image [B, H, W, 3] in [-1, 1].
        Output is always f32 — under bf16 mixed precision (the
        reference's `amp_config`, `configs/scenedreamer_train.yaml:11`)
        the loss assembly stays full precision."""
        raw = self.denoiser(net_out, z).astype(jnp.float32)
        return jnp.tanh(raw), raw

    # ------------------------------------------------------------------
    # full training forward (reference scenedreamer.py:432-476)
    # ------------------------------------------------------------------

    def __call__(self, data, voxel_dims, key, random_style=False,
                 pad=None, field_extra=None, compact_k=None):
        """data dict (all NHWC):
            voxel_id [B,H,W,M] int32; depth [B,H,W,M,2]; hit_mask [B,H,W,M];
            raydirs [B,H,W,3]; cam_ori [B,3];
            height_field [B,S,S,1]; semantic_field [B,S,S,11];
            pseudo_real_img [B,256,256,3] (when style-encoding).
        Returns dict with fake_images [B,h,w,3], mu, logvar.
        """
        c = self.cfg
        pad = c.pad if pad is None else pad
        b = data['voxel_id'].shape[0]
        k_style, k_render = jax.random.split(key)

        global_enc = self.world_code(data['height_field'],
                                     data['semantic_field'])

        mu = logvar = None
        if random_style or 'pseudo_real_img' not in data:
            z = jax.random.normal(k_style, (b, c.style_dims))
        else:
            mu, logvar, z = self.encode_style(data['pseudo_real_img'],
                                              rng=k_style)
            mu = mu.astype(jnp.float32)
            logvar = logvar.astype(jnp.float32)
        z = self.style_forward(z)

        out = self.render_pixels(
            k_render, data['voxel_id'], data['depth'], data['hit_mask'],
            data['raydirs'], data['cam_ori'], z, global_enc, voxel_dims,
            field_extra=field_extra, compact_k=compact_k)
        fake, fake_raw = self.refine(out['net_out'], z)
        if pad:
            fake = fake[:, pad // 2:-(pad // 2), pad // 2:-(pad // 2), :]
        return {'fake_images': fake, 'fake_images_raw': fake_raw,
                'mu': mu, 'logvar': logvar, 'render': out}

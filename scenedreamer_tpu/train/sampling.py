"""Training-batch assembly: rejection-sampled cameras + pseudo ground
truth + mask translation.

Capability parity with the reference's per-iteration sampling
(`imaginaire/generators/scenedreamer.py:80-283` _get_batch /
get_pseudo_gt / sample_camera, invoked outside autograd from
`trainers/gancraft.py:139-156`):

  * 'traditional' camera sampler: 50% tour poses / 50% third-person
    poses with randomized focal length, principal-point jitter
    emulating a random crop of a 360x640 virtual sensor
  * rejection on mean hit depth < 2.0 and first-hit label entropy
    < 0.75
  * pseudo-GT: first-hit mc labels -> coco(183+1), stochastic
    sky->clouds/fog and water->sea/river relabeling, one-hot 185ch,
    SPADE oracle at 512x512, NaN/Inf scrub, area-resize back, clamp
  * reduced(12)-label one-hot masks for D, label smoothing (11x11
    avgpool+argmax) on both fake and real masks

TPU-native split: camera proposals and the accept/reject loop run on
host numpy exactly like the reference's no_grad block (data-dependent
trip counts don't belong in jit); the heavy parts — ray-voxel
intersection, SPADE, label translation, smoothing — are jitted device
code with static shapes.
"""
import dataclasses
from typing import Any, Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from scenedreamer_tpu.ops.masks import rand_crop, segmask_smooth
from scenedreamer_tpu.ops.ray_voxel import (camera_rays,
                                            ray_voxel_intersection)
from scenedreamer_tpu.scene import camera as camctl
from scenedreamer_tpu.scene.labels import get_label_translator


@dataclasses.dataclass
class CameraSamplerConfig:
    """configs/scenedreamer_train.yaml:118-149."""
    cam_res: tuple = (360, 640)
    crop_size: tuple = (256, 256)
    pad: int = 6
    num_blocks_early_stop: int = 6
    camera_sampler_type: str = 'traditional'
    camera_rej_avg_depth: float = 2.0
    camera_min_entropy: float = 0.75
    max_rejections: int = 100
    # proposals intersected per device dispatch: over a remote device
    # link each dispatch costs a full RTT, so rejected proposals are
    # K-for-the-price-of-one (accept semantics unchanged: the first
    # passing proposal in proposal order wins)
    proposals_per_dispatch: int = 4
    num_reduced_labels: int = 12
    use_label_smooth: bool = True
    use_label_smooth_real: bool = True
    use_label_smooth_pgt: bool = True
    label_smooth_dia: int = 11


class CameraBatchSampler:
    """Host-side rejection sampler producing ray batches for one world."""

    def __init__(self, cfg: CameraSamplerConfig = CameraSamplerConfig()):
        self.cfg = cfg
        self.trans = get_label_translator()
        c = cfg
        self.crop_res = (c.crop_size[0] + c.pad, c.crop_size[1] + c.pad)
        # accept/fallback accounting: the reference retries forever
        # (`scenedreamer.py:95-145` while True); we bound retries, so
        # cameras admitted past max_rejections must be OBSERVABLE —
        # cli/train mirrors fallback_rate through MetricsWriter
        self.stats = {'proposals': 0, 'accepted': 0, 'fallbacks': 0}

        def _one(voxel, ori, cdir, up, cam_f, cam_c):
            rd = camera_rays(cdir, up, cam_f, cam_c, self.crop_res)
            vid, dep, hit = ray_voxel_intersection(
                voxel, ori, rd.reshape(-1, 3), c.num_blocks_early_stop)
            # accept metrics computed on device: the host only fetches
            # 2K scalars per dispatch instead of the full interval
            # tensors (matters over remote-device links)
            d0 = dep[..., 0, 0]
            valid = hit[..., 0]
            nvalid = jnp.sum(valid)
            avg_depth = jnp.where(
                nvalid > 0,
                jnp.sum(jnp.where(valid, d0, 0.0)) /
                jnp.maximum(nvalid, 1), 0.0)
            first = vid[..., 0]
            cnt = jnp.bincount(first.reshape(-1), length=680) \
                / first.size
            entropy = -jnp.sum(cnt * jnp.log(cnt + 1e-10))
            return vid, dep, hit, rd, avg_depth, entropy

        def _intersect_k(voxel, oris, cdirs, ups, cam_fs, cam_cs):
            """K proposals in ONE dispatch (vmapped DDA + metrics)."""
            vid, dep, hit, rd, ad, en = jax.vmap(
                _one, in_axes=(None, 0, 0, 0, 0, 0))(
                    voxel, oris, cdirs, ups, cam_fs, cam_cs)
            return vid, dep, hit, rd, jnp.stack([ad, en])
        self._intersect_k = jax.jit(_intersect_k)

    @property
    def fallback_rate(self):
        """Fraction of admitted cameras that exhausted max_rejections."""
        n = self.stats['accepted'] + self.stats['fallbacks']
        return self.stats['fallbacks'] / n if n else 0.0

    def _propose(self, world, rng):
        """One camera proposal (`scenedreamer.py:95-120`)."""
        c = self.cfg
        h, w = c.cam_res
        cam_c = ((h - 1) / 2.0, (w - 1) / 2.0)
        if c.camera_sampler_type == 'traditional' and rng.random() > 0.5:
            ori, cdir, up, f = camctl.rand_camera_pose_tour(world, rng)
            cam_f = f * (w - 1)
        else:
            ori, cdir, up = camctl.rand_camera_pose_thirdperson2(
                world, rng)[:3]
            cam_f = 0.5 / np.tan(np.deg2rad(73 / 2)
                                 * (rng.random() * 0.5 + 0.5)) * (w - 1)
        cam_c = rand_crop(rng, cam_c, c.cam_res, self.crop_res)
        return ori, cdir, up, cam_f, cam_c

    def sample(self, world, batch_size, rng, voxel_dev=None):
        """Rejection-sample batch_size cameras against one world.

        Returns dict: voxel_id [B,h,w,M], depth [B,h,w,M,2], hit_mask,
        raydirs [B,h,w,3], cam_ori [B,3] (NHWC, device arrays).
        """
        c = self.cfg
        h, w = self.crop_res
        k = max(1, c.proposals_per_dispatch)
        voxel = jnp.asarray(world.voxel) if voxel_dev is None else voxel_dev
        out = {kk: [] for kk in ('voxel_id', 'depth', 'hit_mask',
                                 'raydirs', 'cam_ori')}
        for _ in range(batch_size):
            accepted = None
            best = None              # (score, tensors) across all rounds
            rounds = max(1, -(-c.max_rejections // k))
            for _round in range(rounds):
                props = [self._propose(world, rng) for _ in range(k)]
                oris = np.stack([np.asarray(p[0], np.float32)
                                 for p in props])
                cdirs = np.stack([np.asarray(p[1], np.float32)
                                  for p in props])
                ups = np.stack([np.asarray(p[2], np.float32)
                                for p in props])
                fs = np.asarray([p[3] for p in props], np.float32)
                cs = np.asarray([p[4] for p in props], np.float32)
                vid, dep, hit, rd, metrics = self._intersect_k(
                    voxel, oris, cdirs, ups, fs, cs)
                self.stats['proposals'] += k
                # reject: too close (`scenedreamer.py:129-133`) or low
                # entropy (`:136-143`); ONE [2, K] device->host fetch
                ad, en = np.asarray(metrics)
                ok = np.ones(k, bool)
                if c.camera_rej_avg_depth > 0:
                    ok &= ad >= c.camera_rej_avg_depth
                if c.camera_min_entropy > 0:
                    ok &= en >= c.camera_min_entropy
                if ok.any():
                    i = int(np.argmax(ok))
                    accepted = (vid[i], dep[i], hit[i], rd[i], oris[i])
                    self.stats['accepted'] += 1
                    break
                # remember the best rejected proposal: passing depth
                # outranks entropy (too-close views are the worse
                # failure mode), then higher entropy wins
                depth_ok = (ad >= c.camera_rej_avg_depth
                            if c.camera_rej_avg_depth > 0
                            else np.ones(k, bool))
                for i in range(k):
                    score = (bool(depth_ok[i]), float(en[i]))
                    if best is None or score > best[0]:
                        best = (score,
                                (vid[i], dep[i], hit[i], rd[i], oris[i]))
            if accepted is None:
                # max_rejections exhausted: admit the BEST proposal seen
                # (not an arbitrary one) and count it — the reference
                # would spin forever here; we trade boundedness for an
                # observable sampler/fallback_rate metric
                accepted = best[1]
                self.stats['fallbacks'] += 1
            vid_i, dep_i, hit_i, rd_i, ori_i = accepted
            out['voxel_id'].append(vid_i.reshape(h, w, -1))
            out['depth'].append(dep_i.reshape(h, w, -1, 2))
            out['hit_mask'].append(hit_i.reshape(h, w, -1))
            out['raydirs'].append(rd_i)
            out['cam_ori'].append(jnp.asarray(ori_i, jnp.float32))
        return {kk: jnp.stack(v) for kk, v in out.items()}


class PseudoGTGenerator:
    """Wraps the SPADE oracle into the reference pseudo-GT contract
    (`scenedreamer.py:158-213`)."""

    def __init__(self, spade_apply: Callable, pad=6, resize_512=True,
                 use_label_smooth_pgt=True, label_smooth_dia=11,
                 num_coco_labels=185, spade_res=512):
        """spade_apply: (label_onehot [B,R,R,C], key) -> image
        [B,R,R,3] in [-1,1], R = spade_res (512 in the reference)."""
        self.spade_apply = spade_apply
        self.pad = pad
        self.resize_512 = resize_512
        self.spade_res = spade_res
        self.use_label_smooth_pgt = use_label_smooth_pgt
        self.label_smooth_dia = label_smooth_dia
        self.num_coco = num_coco_labels
        self.trans = get_label_translator()
        self._jit = jax.jit(self._device_part)

    def _device_part(self, voxel_id_first, sky_sub, water_sub, key):
        """mc first-hit labels -> fake_masks + pseudo-real image."""
        trans = self.trans
        coco = trans.mc2coco(voxel_id_first) - 1
        coco = jnp.where(coco < 0, 183, coco)
        # stochastic relabeling, chosen on host, applied on device
        sky_id = trans.gglbl2ggid('sky')
        water_id = trans.gglbl2ggid('water')
        coco = jnp.where((coco == sky_id) & (sky_sub >= 0), sky_sub, coco)
        coco = jnp.where((coco == water_id) & (water_sub >= 0), water_sub,
                         coco)
        fake_masks = jax.nn.one_hot(coco, self.num_coco,
                                    dtype=jnp.float32)
        if self.use_label_smooth_pgt:
            fake_masks = segmask_smooth(fake_masks, self.label_smooth_dia)
        if self.pad > 0:
            p0 = self.pad // 2
            fake_masks = fake_masks[:, p0:-p0, p0:-p0]
        masks_in = fake_masks
        if self.resize_512:
            r = self.spade_res
            masks_in = jax.image.resize(
                fake_masks, (fake_masks.shape[0], r, r,
                             fake_masks.shape[-1]), 'nearest')
        # f32 regardless of oracle precision (the reference's fp16
        # oracle output is consumed in f32 too, `scenedreamer.py:204`)
        img = self.spade_apply(masks_in, key).astype(jnp.float32)
        img = jnp.nan_to_num(img, nan=0.0, posinf=0.0, neginf=0.0)
        if self.resize_512:
            b, hh, ww, _ = fake_masks.shape
            r = self.spade_res
            # area-downsample back to the crop resolution
            fh, fw = r // hh, r // ww
            if fh * hh == r and fw * ww == r:
                img = img.reshape(b, hh, fh, ww, fw, 3).mean(axis=(2, 4))
            else:
                img = jax.image.resize(img, (b, hh, ww, 3), 'linear')
        return jnp.clip(img, -1.0, 1.0), fake_masks

    def __call__(self, voxel_id, rng, key, deterministic=False):
        """voxel_id: [B, h, w, M] first-hit ids in slot 0."""
        sky_sub = water_sub = -1
        if not deterministic:
            dice = rng.random()
            if 0.5 < dice < 0.9:
                sky_sub = self.trans.gglbl2ggid('clouds')
            elif dice >= 0.9:
                sky_sub = self.trans.gglbl2ggid('fog')
            dice = rng.random()
            if 0.33 < dice < 0.66:
                water_sub = self.trans.gglbl2ggid('sea')
            elif dice >= 0.66:
                water_sub = self.trans.gglbl2ggid('river')
        return self._jit(voxel_id[..., 0], jnp.int32(sky_sub),
                         jnp.int32(water_sub), key)


def translate_masks(trans, voxel_id, real_label_onehot, pad=6,
                    num_reduced=12, use_label_smooth=True,
                    use_label_smooth_real=True, label_smooth_dia=11):
    """Reduced-label fake/real masks (`scenedreamer.py:246-281`).

    voxel_id: [B,h,w,M]; real_label_onehot: [B,H,W,184] or None.
    """
    reduced_fake = trans.mc2reduced(voxel_id[..., 0], ign2dirt=True)
    fake = jax.nn.one_hot(reduced_fake, num_reduced, dtype=jnp.float32)
    if pad:
        p0 = pad // 2
        fake = fake[:, p0:-p0, p0:-p0]
    if use_label_smooth:
        fake = segmask_smooth(fake, label_smooth_dia)

    real = None
    if real_label_onehot is not None:
        idx = jnp.argmax(real_label_onehot, axis=-1)
        idx = jnp.minimum(idx, 182)
        reduced_real = trans.coco2reduced(idx)
        real = jax.nn.one_hot(reduced_real, num_reduced,
                              dtype=jnp.float32)
        if use_label_smooth_real:
            real = segmask_smooth(real, label_smooth_dia)
    return fake, real


class TrainingBatchBuilder:
    """Full `sample_camera` equivalent: cameras + pseudo-GT + masks
    (`scenedreamer.py:216-283`, `trainers/gancraft.py:139-156`)."""

    def __init__(self, sampler: CameraBatchSampler,
                 pseudo_gt: Optional[PseudoGTGenerator] = None,
                 world_cache: Any = None):
        self.sampler = sampler
        self.pseudo_gt = pseudo_gt
        self.world_cache = world_cache
        self.trans = sampler.trans
        c = sampler.cfg
        self._translate = jax.jit(
            lambda vid, real: translate_masks(
                self.trans, vid, real, pad=c.pad,
                num_reduced=c.num_reduced_labels,
                use_label_smooth=c.use_label_smooth,
                use_label_smooth_real=c.use_label_smooth_real,
                label_smooth_dia=c.label_smooth_dia))

    def __call__(self, data, world, rng, key):
        """data: {'images': [B,H,W,3], 'label': [B,H,W,184]} (may be
        empty dict for pseudo-GT-only training). `world` is a single
        world or a list of per-sample worlds (multi-scene batch — the
        analog of the reference's one-world-per-DDP-rank layout,
        `scenedreamer.py:88`; all worlds must share voxel dims so the
        jitted step stays static). Returns the merged training batch."""
        worlds = (list(world) if isinstance(world, (list, tuple))
                  else [world])
        batch_size = (data['images'].shape[0] if 'images' in data
                      else max(1, len(worlds)))
        ret = dict(data)
        if len(worlds) == 1:
            w0 = worlds[0]
            rays = self.sampler.sample(w0, batch_size, rng)
            hf = np.repeat(w0.height_field.transpose(0, 2, 3, 1),
                           batch_size, 0)
            sf = np.repeat(w0.semantic_field.transpose(0, 2, 3, 1),
                           batch_size, 0)
        else:
            if len(worlds) != batch_size:
                raise ValueError(
                    f'got {len(worlds)} worlds for batch {batch_size}')
            dims = {tuple(w.voxel.shape) for w in worlds}
            if len(dims) != 1:
                raise ValueError(f'worlds differ in voxel dims: {dims}')
            parts = [self.sampler.sample(w, 1, rng) for w in worlds]
            rays = {k: jnp.concatenate([p[k] for p in parts])
                    for k in parts[0]}
            hf = np.concatenate(
                [w.height_field.transpose(0, 2, 3, 1) for w in worlds])
            sf = np.concatenate(
                [w.semantic_field.transpose(0, 2, 3, 1) for w in worlds])
        ret.update(rays)
        ret['height_field'] = jnp.asarray(hf)
        ret['semantic_field'] = jnp.asarray(sf)
        if self.pseudo_gt is not None:
            pseudo, _ = self.pseudo_gt(rays['voxel_id'], rng, key)
            ret['pseudo_real_img'] = pseudo
        fake, real = self._translate(rays['voxel_id'],
                                     data.get('label'))
        ret['fake_masks'] = fake
        if real is not None:
            ret['real_masks'] = real
        return ret

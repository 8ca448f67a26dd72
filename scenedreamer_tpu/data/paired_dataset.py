"""Paired image + segmentation dataset with augmentations.

The reference's data layer is split across `imaginaire/utils/data.py`
(Augmentor: resize_smallest_side 256, random_scale_limit 0.2, hflip,
random_crop 256x256 — `configs/scenedreamer_train.yaml:198-207`),
`imaginaire/model_utils/label.py:8-41` (make_one_hot 183+dont-care ->
184ch, concat_labels -> data['label']) and an `imaginaire.datasets.
paired_images` class that upstream imaginaire provides (absent from the
SceneDreamer snapshot — SURVEY.md §1 note). This module supplies the
whole stack:

  * folder backend: `root/images/*.jpg` + `root/seg_maps/*` by stem
  * LMDB backend: raw-bytes LMDBs built by `data/lmdb_utils.py`
    (reference `utils/lmdb.py:43-74` contract)
  * joint augmentations applied identically to image and mask (nearest
    for masks), seeded per item for reproducibility
  * `make_one_hot` / `concat_labels` parity ops
  * a host-side loader: shuffled epochs, per-process sharding for
    multi-host DP (replaces DistributedSampler, `utils/dataset.py:53`),
    NHWC numpy batches ready for `jax.device_put`.

Host-side by design: decode/augment is CPU work feeding the jitted
train step; on TPU pods each process loads only its own shard.
"""
import dataclasses
import os
import random as _random

import numpy as np


@dataclasses.dataclass
class AugmentConfig:
    """`configs/scenedreamer_train.yaml:198-207`."""
    resize_smallest_side: int = 256
    random_scale_limit: float = 0.2
    horizontal_flip: bool = True
    random_crop_h_w: tuple = (256, 256)

    def to_ops(self):
        """Ordered op dict equivalent (the yaml order the reference
        feeds `_build_augmentation_ops`, `utils/data.py:93-175`)."""
        ops = {}
        if self.resize_smallest_side:
            ops['resize_smallest_side'] = self.resize_smallest_side
        if self.random_scale_limit:
            ops['random_scale_limit'] = self.random_scale_limit
        if self.horizontal_flip:
            ops['horizontal_flip'] = True
        if self.random_crop_h_w:
            ops['random_crop_h_w'] = tuple(self.random_crop_h_w)
        return ops


def make_one_hot(seg, num_classes=183, use_dont_care=True):
    """[H, W] int mask -> [H, W, num_classes(+1)] one-hot; values outside
    [0, num_classes) go to the trailing dont-care channel
    (`model_utils/label.py:8-24`)."""
    total = num_classes + (1 if use_dont_care else 0)
    seg = np.asarray(seg, np.int64)
    if use_dont_care:
        seg = np.where((seg < 0) | (seg >= num_classes), num_classes, seg)
    else:
        seg = np.clip(seg, 0, num_classes - 1)
    out = np.zeros(seg.shape + (total,), np.float32)
    np.put_along_axis(out, seg[..., None], 1.0, axis=-1)
    return out


def concat_labels(data, label_keys=('seg_maps',)):
    """Concatenate one-hot label tensors into data['label']
    (`model_utils/label.py:27-41`)."""
    data['label'] = np.concatenate([data[k] for k in label_keys], axis=-1)
    return data


class Augmentor:
    """Joint image+mask augmentation pipeline.

    General op-for-op equivalent of the reference albumentations
    pipeline (`utils/data.py:93-175` `_build_augmentation_ops`),
    implemented with cv2/numpy (albumentations is not in this image):
    resize_smallest_side, resize_h_w, random_resize_h_w_aspect, rotate,
    random_rotate_90, random_scale_limit (scalar: factor in [1, 1+limit],
    `utils/data.py:127`; dict {scale_limit_lb, scale_limit_ub, p}:
    the ± video-frame variant, `utils/data.py:76-84`), random_crop_h_w,
    center_crop_h_w, horizontal_flip, plus the photometric extras
    (contrast, blur, motion_blur, compression, gamma) on the image
    only; max_time_step is accepted and ignored (video datasets only).
    Ops apply in dict order like the yaml. Geometry ops apply jointly
    to image (linear) and seg (nearest)."""

    def __init__(self, cfg=None):
        cfg = AugmentConfig() if cfg is None else cfg
        self.cfg = cfg
        self.ops = cfg if isinstance(cfg, dict) else cfg.to_ops()
        # guarantee a deterministic final shape when a crop is present
        self.crop = None
        for k in ('random_crop_h_w', 'center_crop_h_w'):
            if k in self.ops:
                self.crop = tuple(self.ops[k])

    def _resize(self, image, seg, nh, nw):
        import cv2
        if self.crop:
            nh = max(nh, self.crop[0])
            nw = max(nw, self.crop[1])
        image = cv2.resize(image, (nw, nh),
                           interpolation=cv2.INTER_LINEAR)
        seg = cv2.resize(seg, (nw, nh), interpolation=cv2.INTER_NEAREST)
        return image, seg

    def __call__(self, image, seg, rng):
        import cv2
        for key, value in self.ops.items():
            h, w = image.shape[:2]
            if key == 'resize_smallest_side':
                s = value / min(h, w)
                image, seg = self._resize(image, seg,
                                          int(round(h * s)),
                                          int(round(w * s)))
            elif key == 'resize_h_w':
                image, seg = self._resize(image, seg, value[0], value[1])
            elif key == 'rotate' and value:
                ang = rng.uniform(-value, value)
                mat = cv2.getRotationMatrix2D((w / 2, h / 2), ang, 1.0)
                image = cv2.warpAffine(image, mat, (w, h),
                                       flags=cv2.INTER_LINEAR,
                                       borderMode=cv2.BORDER_REFLECT_101)
                seg = cv2.warpAffine(seg, mat, (w, h),
                                     flags=cv2.INTER_NEAREST,
                                     borderMode=cv2.BORDER_REFLECT_101)
            elif key == 'random_rotate_90':
                if rng.random() < 0.5:
                    k = int(rng.integers(0, 4))
                    image = np.rot90(image, k)
                    seg = np.rot90(seg, k)
            elif key == 'random_scale_limit' and value:
                # scalar form: factor in [1, 1+limit] (`utils/data.py:128`);
                # dict form (the per-video-frame variant,
                # `utils/data.py:76-84`): [1-lb, 1+ub] with prob p
                if isinstance(value, dict):
                    lb = value['scale_limit_lb']
                    ub = value['scale_limit_ub']
                    p = value.get('p', 1.0)
                else:
                    lb, ub, p = 0.0, value, 1.0
                if rng.random() < p:
                    s = 1.0 + rng.uniform(-lb, ub)
                    image, seg = self._resize(image, seg,
                                              int(round(h * s)),
                                              int(round(w * s)))
            elif key == 'random_crop_h_w':
                ch, cw = value
                y0 = rng.integers(0, h - ch + 1)
                x0 = rng.integers(0, w - cw + 1)
                image = image[y0:y0 + ch, x0:x0 + cw]
                seg = seg[y0:y0 + ch, x0:x0 + cw]
            elif key == 'center_crop_h_w':
                ch, cw = value
                y0, x0 = (h - ch) // 2, (w - cw) // 2
                image = image[y0:y0 + ch, x0:x0 + cw]
                seg = seg[y0:y0 + ch, x0:x0 + cw]
            elif key == 'horizontal_flip':
                if value and rng.random() < 0.5:
                    image = image[:, ::-1]
                    seg = seg[:, ::-1]
            elif key == 'contrast':
                if rng.random() < value.get('p', 1.0):
                    b = rng.uniform(-value['brightness_limit'],
                                    value['brightness_limit'])
                    ct = rng.uniform(-value['contrast_limit'],
                                     value['contrast_limit'])
                    img_f = image.astype(np.float32)
                    mean = img_f.mean()
                    img_f = (img_f - mean) * (1 + ct) + mean + 255 * b
                    image = np.clip(img_f, 0, 255).astype(image.dtype)
            elif key == 'blur':
                if rng.random() < value.get('p', 1.0):
                    k = int(rng.integers(3, max(value['blur_limit'],
                                                3) + 1)) | 1
                    image = cv2.blur(image, (k, k))
            elif key == 'gamma':
                if rng.random() < value.get('p', 1.0):
                    g = rng.uniform(value['gamma_limit_lb'],
                                    value['gamma_limit_ub']) / 100.0
                    img_f = image.astype(np.float32) / 255.0
                    image = np.clip(img_f ** g * 255, 0,
                                    255).astype(image.dtype)
            elif key == 'random_resize_h_w_aspect':
                # alb.RandomResizedCrop(scale=(1,1), ratio=(lo,hi))
                # (`utils/data.py:111-121`): crop the largest window of
                # a random aspect ratio, resize to (h, w)
                th, tw = value['h'], value['w']
                lo, hi = value['aspect_min'], value['aspect_max']
                ratio = np.exp(rng.uniform(np.log(lo), np.log(hi)))
                cw = np.sqrt(h * w * ratio)
                ch = np.sqrt(h * w / ratio)
                # scale BOTH dims into the image so the sampled aspect
                # ratio is preserved (alb.RandomResizedCrop semantics)
                s = min(1.0, w / cw, h / ch)
                cw = max(1, int(round(cw * s)))
                ch = max(1, int(round(ch * s)))
                y0 = int(rng.integers(0, h - ch + 1))
                x0 = int(rng.integers(0, w - cw + 1))
                image = image[y0:y0 + ch, x0:x0 + cw]
                seg = seg[y0:y0 + ch, x0:x0 + cw]
                image, seg = self._resize(image, seg, th, tw)
            elif key == 'motion_blur':
                # alb.MotionBlur: random-direction line kernel (odd
                # sizes in [3, blur_limit], never exceeding the limit)
                if rng.random() < value.get('p', 1.0):
                    kmax = max(int(value['blur_limit']), 3)
                    k = int(rng.choice(np.arange(3, kmax + 1, 2)))
                    kern = np.zeros((k, k), np.float32)
                    if rng.random() < 0.5:    # random orientation
                        kern[k // 2, :] = 1.0
                    else:
                        kern[:, k // 2] = 1.0
                    ang = float(rng.uniform(0, 360))
                    mat = cv2.getRotationMatrix2D((k / 2 - 0.5,
                                                   k / 2 - 0.5), ang, 1.0)
                    kern = cv2.warpAffine(kern, mat, (k, k))
                    kern /= max(kern.sum(), 1e-6)
                    image = cv2.filter2D(image, -1, kern)
            elif key == 'compression':
                # alb.ImageCompression: JPEG encode/decode round trip
                if rng.random() < value.get('p', 1.0):
                    q = int(rng.integers(value['quality_lower'],
                                         value.get('quality_upper',
                                                   100) + 1))
                    ok, buf = cv2.imencode(
                        '.jpg', image,
                        [int(cv2.IMWRITE_JPEG_QUALITY), q])
                    if ok:
                        image = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED)
                        if image.ndim == 2:
                            image = image[..., None]
            elif key == 'max_time_step':
                pass    # video datasets only (`utils/data.py:169`); n/a
            else:
                if key not in ('resize_smallest_side', 'rotate',
                               'random_scale_limit'):
                    raise ValueError(f'Unknown augmentation {key}')
        return np.ascontiguousarray(image), np.ascontiguousarray(seg)


def _decode_image(buf, flags):
    import cv2
    img = cv2.imdecode(np.frombuffer(buf, np.uint8), flags)
    if img is None:
        raise ValueError('failed to decode image buffer')
    return img


class _FolderBackend:
    def __init__(self, root, image_dir='images', seg_dir='seg_maps'):
        self.image_root = os.path.join(root, image_dir)
        self.seg_root = os.path.join(root, seg_dir)
        imgs = {os.path.splitext(f)[0]: f
                for f in sorted(os.listdir(self.image_root))}
        segs = {os.path.splitext(f)[0]: f
                for f in sorted(os.listdir(self.seg_root))}
        self.stems = sorted(set(imgs) & set(segs))
        if not self.stems:
            raise FileNotFoundError(f'no paired files under {root}')
        self._imgs, self._segs = imgs, segs

    def __len__(self):
        return len(self.stems)

    def read(self, i):
        stem = self.stems[i]
        with open(os.path.join(self.image_root, self._imgs[stem]),
                  'rb') as f:
            img_buf = f.read()
        with open(os.path.join(self.seg_root, self._segs[stem]),
                  'rb') as f:
            seg_buf = f.read()
        return img_buf, seg_buf


class _LMDBBackend:
    """Two raw-bytes LMDBs (images, seg_maps) sharing a key list
    (reference `utils/lmdb.py:43-74`)."""

    def __init__(self, root, image_dir='images', seg_dir='seg_maps'):
        from scenedreamer_tpu.data.lmdb_utils import LMDBReader
        self.images = LMDBReader(os.path.join(root, image_dir))
        self.segs = LMDBReader(os.path.join(root, seg_dir))
        img_stems = {os.path.splitext(k)[0]: k for k in self.images.keys}
        seg_stems = {os.path.splitext(k)[0]: k for k in self.segs.keys}
        self.stems = sorted(set(img_stems) & set(seg_stems))
        self._imap, self._smap = img_stems, seg_stems

    def __len__(self):
        return len(self.stems)

    def read(self, i):
        stem = self.stems[i]
        return (self.images.get(self._imap[stem]),
                self.segs.get(self._smap[stem]))


class PairedImageDataset:
    """images + seg_maps -> {'images': [-1,1] float32 HWC,
    'label': one-hot 184ch HWC}."""

    def __init__(self, root, dataset_type='folder',
                 augment: AugmentConfig = AugmentConfig(),
                 num_seg_classes=183, use_dont_care=True, seed=0):
        if dataset_type == 'folder':
            self.backend = _FolderBackend(root)
        elif dataset_type == 'lmdb':
            self.backend = _LMDBBackend(root)
        else:
            raise ValueError(f'unknown dataset_type {dataset_type}')
        self.augmentor = Augmentor(augment) if augment else None
        self.num_seg_classes = num_seg_classes
        self.use_dont_care = use_dont_care
        self.seed = seed

    def __len__(self):
        return len(self.backend)

    def __getitem__(self, i, epoch=0):
        import cv2
        img_buf, seg_buf = self.backend.read(i)
        img = _decode_image(img_buf, cv2.IMREAD_COLOR)[..., ::-1]  # BGR->RGB
        seg = _decode_image(seg_buf, cv2.IMREAD_GRAYSCALE)
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + epoch) * 1_000_003 + i)
        if self.augmentor is not None:
            img, seg = self.augmentor(img, seg, rng)
        data = {
            'images': img.astype(np.float32) / 127.5 - 1.0,
            'seg_maps': make_one_hot(seg, self.num_seg_classes,
                                     self.use_dont_care),
        }
        return concat_labels(data)


class DataLoader:
    """Shuffling, host-sharding batch iterator (replaces torch
    DataLoader + DistributedSampler, `utils/dataset.py:13-87`).

    `num_workers > 0` decodes/augments items on a thread pool and keeps
    `prefetch_batches` batches in flight ahead of the consumer — the
    torch `num_workers` analog (`configs/scenedreamer_train.yaml:165`).
    Threads, not processes: cv2 decode/resize releases the GIL, and the
    per-item rng is seeded by (seed, epoch, index) so batches are
    bit-identical to the synchronous path in the same order."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 process_index=0, process_count=1, drop_last=True,
                 num_workers=0, prefetch_batches=2):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.pidx = process_index
        self.pcount = process_count
        self.drop_last = drop_last
        self.num_workers = int(num_workers)
        self.prefetch_batches = max(1, int(prefetch_batches))
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        per = len(self.ds) // self.pcount
        return per // self.batch_size if self.drop_last \
            else -(-per // self.batch_size)

    def _batch_indices(self):
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        idx = idx[self.pidx::self.pcount]
        n = len(idx) // self.batch_size * self.batch_size \
            if self.drop_last else len(idx)
        return [idx[s:s + self.batch_size]
                for s in range(0, n, self.batch_size)]

    @staticmethod
    def _stack(items):
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def __iter__(self):
        batches = self._batch_indices()
        epoch = self.epoch
        if self.num_workers <= 0:
            for b in batches:
                yield self._stack([self.ds.__getitem__(int(i),
                                                       epoch=epoch)
                                   for i in b])
            return
        import collections
        import concurrent.futures as cf
        pool = cf.ThreadPoolExecutor(self.num_workers)
        try:
            pending = collections.deque()

            def submit(b):
                pending.append([pool.submit(self.ds.__getitem__,
                                            int(i), epoch=epoch)
                                for i in b])
            depth = min(self.prefetch_batches, len(batches))
            for b in batches[:depth]:
                submit(b)
            nxt = depth
            while pending:
                futs = pending.popleft()
                if nxt < len(batches):    # refill BEFORE blocking so the
                    submit(batches[nxt])  # pool stays `depth` ahead
                    nxt += 1
                items = [f.result() for f in futs]
                yield self._stack(items)
        finally:
            # abandoning the iterator mid-epoch (--max-iter break,
            # SIGTERM checkpoint) must not wait out the prefetched
            # decodes: drop queued work, don't join running threads
            pool.shutdown(wait=False, cancel_futures=True)

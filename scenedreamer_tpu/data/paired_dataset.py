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
    """Joint image+mask augmentation (`utils/data.py:28-120` subset used
    by the shipped config)."""

    def __init__(self, cfg: AugmentConfig = AugmentConfig()):
        self.cfg = cfg

    def __call__(self, image, seg, rng):
        import cv2
        c = self.cfg
        h, w = image.shape[:2]
        # resize smallest side (+ random scale)
        scale = c.resize_smallest_side / min(h, w)
        if c.random_scale_limit > 0:
            scale *= 1.0 + rng.random() * c.random_scale_limit
        nh, nw = max(int(round(h * scale)), c.random_crop_h_w[0]), \
            max(int(round(w * scale)), c.random_crop_h_w[1])
        image = cv2.resize(image, (nw, nh),
                           interpolation=cv2.INTER_LINEAR)
        seg = cv2.resize(seg, (nw, nh), interpolation=cv2.INTER_NEAREST)
        # random crop
        ch, cw = c.random_crop_h_w
        y0 = rng.integers(0, nh - ch + 1)
        x0 = rng.integers(0, nw - cw + 1)
        image = image[y0:y0 + ch, x0:x0 + cw]
        seg = seg[y0:y0 + ch, x0:x0 + cw]
        # hflip
        if c.horizontal_flip and rng.random() < 0.5:
            image = image[:, ::-1]
            seg = seg[:, ::-1]
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
    DataLoader + DistributedSampler, `utils/dataset.py:13-87`)."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 process_index=0, process_count=1, drop_last=True):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.pidx = process_index
        self.pcount = process_count
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        per = len(self.ds) // self.pcount
        return per // self.batch_size if self.drop_last \
            else -(-per // self.batch_size)

    def __iter__(self):
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        idx = idx[self.pidx::self.pcount]
        n = len(idx) // self.batch_size * self.batch_size \
            if self.drop_last else len(idx)
        for s in range(0, n, self.batch_size):
            items = [self.ds.__getitem__(int(i), epoch=self.epoch)
                     for i in idx[s:s + self.batch_size]]
            yield {k: np.stack([it[k] for it in items])
                   for k in items[0]}

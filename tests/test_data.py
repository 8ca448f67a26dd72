"""Paired dataset / augmentor / label-ops / loader tests."""
import os

import numpy as np
import pytest

from scenedreamer_tpu.data.paired_dataset import (AugmentConfig, Augmentor,
                                                  DataLoader,
                                                  PairedImageDataset,
                                                  concat_labels,
                                                  make_one_hot)


@pytest.fixture(scope='module')
def folder_root(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('paired')
    (root / 'images').mkdir()
    (root / 'seg_maps').mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.integers(0, 255, (300, 400, 3), np.uint8)
        seg = rng.integers(0, 183, (300, 400), np.uint8)
        cv2.imwrite(str(root / 'images' / f'{i:03d}.jpg'), img)
        cv2.imwrite(str(root / 'seg_maps' / f'{i:03d}.png'), seg)
    return str(root)


def test_make_one_hot_dont_care():
    seg = np.array([[0, 5], [182, 200]])
    oh = make_one_hot(seg, 183, use_dont_care=True)
    assert oh.shape == (2, 2, 184)
    assert oh[1, 1, 183] == 1.0       # out-of-range -> dont care
    assert oh[0, 0, 0] == 1.0
    np.testing.assert_allclose(oh.sum(-1), 1.0)


def test_concat_labels():
    d = {'seg_maps': np.zeros((4, 4, 184), np.float32)}
    d = concat_labels(d)
    assert d['label'].shape == (4, 4, 184)


def test_augmentor_joint_geometry():
    aug = Augmentor(AugmentConfig(resize_smallest_side=64,
                                  random_crop_h_w=(64, 64)))
    rng = np.random.default_rng(0)
    img = np.zeros((100, 200, 3), np.uint8)
    img[:, 100:] = 255
    seg = np.zeros((100, 200), np.uint8)
    seg[:, 100:] = 7
    a_img, a_seg = aug(img, seg, rng)
    assert a_img.shape == (64, 64, 3)
    assert a_seg.shape == (64, 64)
    # boundary must stay aligned: white pixels <=> label 7
    white = a_img[..., 0] > 127
    np.testing.assert_array_equal(white, a_seg == 7)


def test_dataset_and_loader(folder_root):
    ds = PairedImageDataset(
        folder_root, augment=AugmentConfig(resize_smallest_side=64,
                                           random_crop_h_w=(64, 64)))
    assert len(ds) == 6
    item = ds[0]
    assert item['images'].shape == (64, 64, 3)
    assert item['images'].min() >= -1.0 and item['images'].max() <= 1.0
    assert item['label'].shape == (64, 64, 184)

    loader = DataLoader(ds, batch_size=2, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]['images'].shape == (2, 64, 64, 3)
    assert batches[0]['label'].shape == (2, 64, 64, 184)

    # host sharding partitions the data
    l0 = DataLoader(ds, batch_size=1, shuffle=False, process_index=0,
                    process_count=2)
    l1 = DataLoader(ds, batch_size=1, shuffle=False, process_index=1,
                    process_count=2)
    assert len(l0) == 3 and len(l1) == 3

    # epoch changes the shuffle order but keeps determinism
    loader.set_epoch(1)
    b1 = next(iter(loader))
    loader.set_epoch(1)
    b2 = next(iter(loader))
    np.testing.assert_array_equal(b1['images'], b2['images'])


def test_loader_workers_bitwise_equal(folder_root):
    """num_workers>0 must reproduce the synchronous path exactly:
    same batches, same order (per-item rng is index-seeded)."""
    ds = PairedImageDataset(
        folder_root, augment=AugmentConfig(resize_smallest_side=64,
                                           random_crop_h_w=(64, 64)))
    sync = DataLoader(ds, batch_size=2, seed=3)
    thr = DataLoader(ds, batch_size=2, seed=3, num_workers=3,
                     prefetch_batches=2)
    for epoch in range(2):
        sync.set_epoch(epoch)
        thr.set_epoch(epoch)
        bs, bt = list(sync), list(thr)
        assert len(bs) == len(bt) == 3
        for a, b in zip(bs, bt):
            np.testing.assert_array_equal(a['images'], b['images'])
            np.testing.assert_array_equal(a['label'], b['label'])


def test_lmdb_roundtrip(folder_root, tmp_path):
    from scenedreamer_tpu.data.lmdb_utils import build_paired_lmdbs
    n = build_paired_lmdbs(folder_root, str(tmp_path / 'db'))
    assert n == 6
    ds = PairedImageDataset(str(tmp_path / 'db'), dataset_type='lmdb',
                            augment=AugmentConfig(
                                resize_smallest_side=64,
                                random_crop_h_w=(64, 64)))
    assert len(ds) == 6
    assert ds[0]['images'].shape == (64, 64, 3)


def test_augmentor_general_ops():
    """The general op pipeline (`utils/data.py:93-175` equivalents):
    ordered dict of ops, joint geometry, image-only photometric."""
    import numpy as np
    from scenedreamer_tpu.data.paired_dataset import Augmentor
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 120, 3)).astype(np.uint8)
    seg = rng.integers(0, 10, (80, 120)).astype(np.uint8)

    aug = Augmentor({'resize_h_w': (64, 64), 'rotate': 15,
                     'random_rotate_90': True,
                     'center_crop_h_w': (32, 32),
                     'contrast': {'brightness_limit': 0.2,
                                  'contrast_limit': 0.2, 'p': 1.0},
                     'blur': {'blur_limit': 5, 'p': 1.0},
                     'gamma': {'gamma_limit_lb': 80,
                               'gamma_limit_ub': 120, 'p': 1.0}})
    oi, osg = aug(img, seg, np.random.default_rng(1))
    assert oi.shape == (32, 32, 3) and osg.shape == (32, 32)
    # seg stays label-valued (nearest everywhere, no photometric)
    assert set(np.unique(osg)) <= set(range(10))

    # upward-only scale (factor in [1, 1+limit], utils/data.py:127)
    aug2 = Augmentor({'resize_smallest_side': 40,
                      'random_scale_limit': 0.2,
                      'random_crop_h_w': (40, 40)})
    for seed in range(5):
        oi2, _ = aug2(img, seg, np.random.default_rng(seed))
        assert oi2.shape == (40, 40, 3)

    import pytest
    with pytest.raises(ValueError):
        Augmentor({'unknown_op': 1})(img, seg, rng)


def test_augmentor_scale_dict_form():
    """Dict random_scale_limit = the per-video-frame +- variant
    (`utils/data.py:76-84`): factor in [1-lb, 1+ub] with prob p."""
    import numpy as np
    from scenedreamer_tpu.data.paired_dataset import Augmentor
    img = np.zeros((64, 64, 3), np.uint8)
    seg = np.zeros((64, 64), np.uint8)
    aug = Augmentor({'random_scale_limit': {
        'scale_limit_lb': 0.5, 'scale_limit_ub': 0.0, 'p': 1.0}})
    sizes = set()
    for s in range(20):
        out, _ = aug(img, seg, np.random.default_rng(s))
        sizes.add(out.shape[0])
    # downscale-only: never above input size, sometimes strictly below
    assert max(sizes) <= 64 and min(sizes) < 64

    # p=0 -> never applied
    aug0 = Augmentor({'random_scale_limit': {
        'scale_limit_lb': 0.5, 'scale_limit_ub': 0.5, 'p': 0.0}})
    out, _ = aug0(img, seg, np.random.default_rng(0))
    assert out.shape[0] == 64


def test_augmentor_aspect_motionblur_compression():
    """The face-vid2vid-era ops (`utils/data.py:111-121,157-164`):
    random_resize_h_w_aspect crops a random-aspect window then resizes;
    motion_blur and compression perturb the image only."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 120, 3)).astype(np.uint8)
    seg = rng.integers(0, 12, (80, 120)).astype(np.uint8)
    aug = Augmentor({
        'random_resize_h_w_aspect': {'h': 64, 'w': 48,
                                     'aspect_min': 0.75,
                                     'aspect_max': 1.33},
        'motion_blur': {'blur_limit': 7, 'p': 1.0},
        'compression': {'quality_lower': 40, 'p': 1.0},
        'max_time_step': 4,          # video-only: accepted, ignored
    })
    for seed in range(4):
        i2, s2 = aug(img, seg, np.random.default_rng(seed))
        assert i2.shape == (64, 48, 3) and s2.shape == (64, 48)
        assert i2.dtype == np.uint8
        # seg stays a valid label map (nearest resize, no photometric)
        assert set(np.unique(s2)) <= set(np.unique(seg))
    # motion blur + jpeg actually changed pixel content
    clean, _ = Augmentor({'random_resize_h_w_aspect': {
        'h': 64, 'w': 48, 'aspect_min': 1.0, 'aspect_max': 1.0}})(
        img, seg, np.random.default_rng(1))
    dirty, _ = aug(img, seg, np.random.default_rng(1))
    assert np.abs(clean.astype(int) - dirty.astype(int)).mean() > 1.0

"""Build self-contained training assets: a synthetic paired dataset
(images/ + seg_maps/ folder contract, `data/paired_dataset.py:256`) and
a PCG terrain cache (`cli/terrain_gen.py` + `cli/pcg_cache.py`).

The environment ships no LHQ data (zero egress), so training campaigns
run on this synthetic stand-in: smooth random-field "landscape" images
paired with blob segmentation maps over the coco label range the
reference's LHQ seg_maps use (`imaginaire/utils/dataset.py:53`,
`train.py:135-142` expect the same folder/LMDB pairing).

Usage:
  python scripts/make_training_assets.py --outdir /tmp/assets \
      --num-images 64 --image-size 320 --terrain-size 512 --crop 256
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def smooth_field(rng, h, w, octaves=4):
    """Multi-octave smooth random field in [0, 1] (cheap fBm)."""
    import cv2
    acc = np.zeros((h, w), np.float32)
    amp = 1.0
    for o in range(octaves):
        side = max(2, 2 ** (o + 2))
        g = rng.standard_normal((side, side)).astype(np.float32)
        acc += amp * cv2.resize(g, (w, h), interpolation=cv2.INTER_CUBIC)
        amp *= 0.5
    acc -= acc.min()
    m = acc.max()
    return acc / m if m > 0 else acc


def make_dataset(root, num_images, size, seed):
    import cv2
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, 'images'), exist_ok=True)
    os.makedirs(os.path.join(root, 'seg_maps'), exist_ok=True)
    # a handful of landscape-ish coco classes (sky 156, sea 154, tree
    # 168, grass 123, mountain 134, dirt 110, river 147, snow 158)
    classes = np.array([156, 154, 168, 123, 134, 110, 147, 158])
    for i in range(num_images):
        elev = smooth_field(rng, size, size)
        hue = smooth_field(rng, size, size)
        # horizon: top rows are sky; below, elevation picks the class
        horizon = 0.3 + 0.2 * smooth_field(rng, 1, size)[0]
        yy = np.linspace(0, 1, size)[:, None] * np.ones((1, size))
        sky = yy < horizon
        band = np.clip((elev * 6).astype(np.int32), 0,
                       len(classes) - 2) + 1
        seg = np.where(sky, 0, band)
        seg_ids = classes[seg].astype(np.uint8)
        # paint an image loosely correlated with the seg classes
        base = np.stack([
            0.3 + 0.5 * hue, 0.4 + 0.4 * elev,
            0.5 + 0.3 * smooth_field(rng, size, size)], -1)
        sky_col = np.array([0.55, 0.7, 0.95], np.float32)
        img = np.where(sky[..., None], sky_col[None, None], base)
        img = np.clip(img + 0.05 * rng.standard_normal(img.shape), 0, 1)
        cv2.imwrite(os.path.join(root, 'images', f'{i:05d}.jpg'),
                    (img[..., ::-1] * 255).astype(np.uint8))
        cv2.imwrite(os.path.join(root, 'seg_maps', f'{i:05d}.png'),
                    seg_ids)
    print(f'[assets] dataset: {num_images} pairs at {root}')


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--outdir', required=True)
    p.add_argument('--num-images', type=int, default=64)
    p.add_argument('--image-size', type=int, default=320)
    p.add_argument('--terrain-size', type=int, default=512)
    p.add_argument('--num-scenes', type=int, default=4)
    p.add_argument('--crop', type=int, default=256)
    p.add_argument('--seed', type=int, default=0)
    a = p.parse_args(argv)

    data_root = os.path.join(a.outdir, 'dataset')
    make_dataset(data_root, a.num_images, a.image_size, a.seed)

    terrain_dir = os.path.join(a.outdir, 'terrain')
    cache_dir = os.path.join(a.outdir, 'terrain_cache')
    from scenedreamer_tpu.cli import pcg_cache, terrain_gen
    terrain_gen.main(['--size', str(a.terrain_size),
                      '--num-scenes', str(a.num_scenes),
                      '--seed', str(a.seed), '--outdir', terrain_dir])
    pcg_cache.main(['--terrain-dir', terrain_dir, '--outdir', cache_dir,
                    '--crop', str(a.crop)])
    print(f'[assets] done: data-root={data_root} '
          f'terrain-cache={cache_dir}')


if __name__ == '__main__':
    main()

"""Evaluation CLI: FID + KID between a real image set and rendered
frames.

Exceeds reference parity: the reference wires FID hooks but its trainer
returns None (`imaginaire/trainers/base.py:553-563`, `:668-670`), and
the paper's headline FID/KID tables have no in-repo implementation.
Here the full loop is runnable: real images + (pre-rendered frames OR
a checkpoint to render from) -> jitted VGG19 features -> FID/KID as one
JSON line.

Usage:
    # against pre-rendered frames
    python -m scenedreamer_tpu.cli.evaluate --real-dir data/lhq/images \
        --fake-dir out/rgb_render
    # render from a checkpoint (one scene per seed, cam_maxstep frames)
    python -m scenedreamer_tpu.cli.evaluate --real-dir data/lhq/images \
        --checkpoint logs/run/checkpoints --seeds 1 2 3 --cam_maxstep 8

The canonical FID uses InceptionV3 (not shipped in this image); the
extractor here is the repo's VGG19 (`models/vgg.py`) with optional
converted torchvision weights via --vgg-checkpoint. Scores are
comparable within a fixed extractor, which is what training-progress
evaluation needs; absolute numbers are not Inception-FID.
"""
import argparse
import glob
import json
import os

IMG_EXTS = ('*.png', '*.jpg', '*.jpeg', '*.webp')


def list_images(root, limit=0):
    """Image files in root, sorted. If root has an `images/` subdir
    (the paired-dataset layout), ONLY that subdir is used — globbing
    every subdir would silently mix `seg_maps/` into the feature set."""
    img_sub = os.path.join(root, 'images')
    scan = img_sub if os.path.isdir(img_sub) else root
    paths = []
    for ext in IMG_EXTS:
        paths += glob.glob(os.path.join(scan, ext))
    paths = sorted(set(paths))
    return paths[:limit] if limit else paths


def load_images(paths, size):
    """-> float32 [N, size, size, 3] in [-1, 1]."""
    import cv2
    import numpy as np
    out = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is None:
            continue
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
        out.append(img[..., ::-1].astype(np.float32) / 127.5 - 1.0)
    if not out:
        raise SystemExit('no readable images found')
    return np.stack(out)


def make_pixel_feature_fn(grid=16):
    """VGG-independent extractor: images are area-resized to a
    grid x grid RGB patch and flattened — FID/KID over these features
    measures color/low-frequency-structure distribution match
    directly, with no dependence on (random-init) VGG weights. Scores
    are interpretable whenever the generator's objective includes an
    L2/perceptual pull toward the target distribution (it does:
    `trainers/gancraft.py:166-204`)."""
    import cv2
    import numpy as np

    def run(images):
        out = [cv2.resize(im, (grid, grid),
                          interpolation=cv2.INTER_AREA).reshape(-1)
               for im in images]
        return np.stack(out).astype(np.float64)

    return run


def make_feature_fn(image_size, vgg_checkpoint='', tap='relu_5_1',
                    batch=16):
    """-> callable [N,H,W,3] in [-1,1] -> [N, D] float features."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenedreamer_tpu.models.vgg import (VGG19Features,
                                             convert_torch_vgg19,
                                             imagenet_normalize)
    model = VGG19Features(layers=(tap,))
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, image_size, image_size, 3))
    params = model.init(key, dummy)
    if vgg_checkpoint:
        import numpy as _np
        if vgg_checkpoint.endswith('.npz'):
            sd = dict(_np.load(vgg_checkpoint))
        else:
            import torch
            sd = torch.load(vgg_checkpoint, map_location='cpu')
        params = {'params': convert_torch_vgg19(sd)}
    else:
        print('[evaluate] no --vgg-checkpoint: random-init VGG features '
              '(relative scores only)')

    @jax.jit
    def _feats(x):
        taps = model.apply(params, imagenet_normalize(x))
        return jnp.mean(taps[tap], axis=(1, 2))   # global average pool

    def run(images):
        n = len(images)
        outs = []
        for s in range(0, n, batch):
            chunk = images[s:s + batch]
            pad = batch - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     chunk.dtype)])
            outs.append(np.asarray(_feats(jnp.asarray(chunk))))
        return np.concatenate(outs)[:n]

    return run


def render_frames(a):
    """Render cam_maxstep frames per seed from a checkpoint ->
    float32 [N, h, w, 3] in [-1, 1] (in memory, nothing written)."""
    import jax
    import numpy as np
    from scenedreamer_tpu.cli.inference import load_generator_params
    from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                                   SceneDreamerGenerator)
    from scenedreamer_tpu.render.pipeline import TiledRenderer
    from scenedreamer_tpu.scene import camera as camctl
    from scenedreamer_tpu.scene.terrain import generate_terrain
    from scenedreamer_tpu.scene.voxel_world import build_voxel_world

    cfg = GeneratorConfig(num_samples=a.num_samples)
    model = SceneDreamerGenerator(cfg=cfg)
    frames = []
    params = None
    for seed in a.seeds:
        maps = generate_terrain(size=a.scene_size, seed=seed)
        world = build_voxel_world(maps.height_map, maps.semantic_map,
                                  maps.tree_map, fill_depth=16,
                                  seed=seed)
        key = jax.random.PRNGKey(seed)
        if params is None:    # params are seed-independent: load once
            ckpt = '' if a.checkpoint == 'random' else a.checkpoint
            params = load_generator_params(ckpt, model, world, cfg, key)
        style = jax.random.normal(key, (1, cfg.style_dims))
        r = TiledRenderer(model, params, world,
                          num_samples=a.num_samples, pad=a.pad,
                          tile_size=a.tile_size,
                          resolution_hw=tuple(a.resolution))
        z = r.style_z(style)
        ctl = camctl.EvalCameraController(
            world, pattern=a.camera_mode, maxstep=a.cam_maxstep,
            cam_ang=a.cam_ang)
        for pose in ctl:
            frames.append(np.clip(r.frame(pose, z), -1.0, 1.0))
    return np.stack(frames)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--real-dir', required=True,
                   help='folder of real images (flat or images/ subdir)')
    p.add_argument('--fake-dir', default='',
                   help='folder of rendered frames to score')
    p.add_argument('--checkpoint', default='',
                   help="render frames from this checkpoint instead "
                        "('random' = fresh init, for smoke runs)")
    p.add_argument('--seeds', type=int, nargs='+', default=[8888])
    p.add_argument('--scene_size', type=int, default=1024)
    p.add_argument('--camera_mode', type=int, default=4)
    p.add_argument('--cam_maxstep', type=int, default=8)
    p.add_argument('--cam_ang', type=int, default=72)
    p.add_argument('--resolution', type=int, nargs=2, default=[270, 480])
    p.add_argument('--num_samples', type=int, default=24)
    p.add_argument('--pad', type=int, default=30)
    p.add_argument('--tile_size', type=int, default=128)
    p.add_argument('--image-size', type=int, default=256,
                   help='resize everything to this before features')
    p.add_argument('--max-images', type=int, default=0,
                   help='cap on real/fake set sizes (0 = all)')
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--vgg-checkpoint', default='',
                   help='torchvision vgg19 .pt/.npz for real features')
    p.add_argument('--extractor', default='vgg19',
                   choices=['vgg19', 'pixel'],
                   help="'pixel' = 16x16 RGB patch statistics — "
                        'VGG-independent, interpretable color/'
                        'structure FID when no pretrained VGG exists')
    p.add_argument('--kid-subset-size', type=int, default=1000)
    p.add_argument('--output', default='',
                   help='also write the JSON result here')
    p.add_argument('--platform', default=None)
    a = p.parse_args(argv)
    if bool(a.fake_dir) == bool(a.checkpoint):
        raise SystemExit('give exactly one of --fake-dir / --checkpoint')
    if a.platform:
        from scenedreamer_tpu.cli.train import _force_platform
        _force_platform(a.platform)
    from scenedreamer_tpu.utils.misc import enable_compilation_cache
    enable_compilation_cache()

    import cv2
    import numpy as np
    from scenedreamer_tpu.utils.fid import compute_fid, compute_kid

    real_paths = list_images(a.real_dir, a.max_images)
    real = load_images(real_paths, a.image_size)
    if a.fake_dir:
        fake = load_images(list_images(a.fake_dir, a.max_images),
                           a.image_size)
    else:
        rendered = render_frames(a)
        fake = np.stack([
            cv2.resize(f, (a.image_size, a.image_size),
                       interpolation=cv2.INTER_AREA) for f in rendered])
        if a.max_images:
            fake = fake[:a.max_images]
    print(f'[evaluate] real={len(real)} fake={len(fake)} '
          f'@ {a.image_size}px')

    if a.extractor == 'pixel':
        feats = make_pixel_feature_fn()
        ex_name = 'pixel16'
    else:
        feats = make_feature_fn(a.image_size, a.vgg_checkpoint,
                                batch=a.batch)
        ex_name = 'vgg19' if a.vgg_checkpoint else 'vgg19-random-init'
    fr, ff = feats(real), feats(fake)
    fid = compute_fid(fr, ff)
    kid_mean, kid_std = compute_kid(fr, ff,
                                    subset_size=a.kid_subset_size)
    result = {'fid': round(fid, 4), 'kid': round(kid_mean, 6),
              'kid_std': round(kid_std, 6), 'num_real': len(real),
              'num_fake': len(ff), 'extractor': ex_name}
    line = json.dumps(result)
    print(line)
    if a.output:
        with open(a.output, 'w') as f:
            f.write(line + '\n')


if __name__ == '__main__':
    main()

"""PCG voxel-cache builder CLI.

Capability parity with `scripts/pcg_cache.py:15-127`: for every terrain
scene, take a random `--crop` crop of the BEV maps (`pcg_cache.py:58-62`),
build the sparse voxel world (8-deep column fill + tree stamping,
`pcg_cache.py:66-98`), and save the training cache in the reference
format: `voxel_sparse.npy` (4xN int16 COO), `height_map.npy`,
`semantic_map.npy`, `hmap_mc.npy` (`pcg_cache.py:120-127`) — loadable by
both this framework (`scene/voxel_world.py:load_world_cache`) and the
reference's PCGCache.

Usage:
    python -m scenedreamer_tpu.cli.pcg_cache --terrain-dir data/terrain_dataset \
        --outdir data/terrain_cache --crop 1024
"""
import argparse
import os


def cache_one(terrain_dir, outdir, crop, seed, fill_depth=8):
    import cv2
    import numpy as np
    from scenedreamer_tpu.scene.voxel_world import (build_voxel_world,
                                                    save_world_cache)
    def first(*names):
        for n in names:
            path = os.path.join(terrain_dir, n)
            if os.path.exists(path):
                return path
        raise FileNotFoundError(f'{names} in {terrain_dir}')

    # accept both our inference naming and the reference's training
    # naming (`scripts/single_terrain_gen.py:455-467` writes
    # biome_rivers_*; `scripts/pcg_cache.py:52-56` reads them)
    height = np.load(first('heightmap.npy', 'biome_rivers_height.npy'))
    semantic = cv2.imread(first('semanticmap.png',
                                'biome_rivers_labels.png'),
                          cv2.IMREAD_GRAYSCALE)
    tree = cv2.imread(first('treemap.png', 'biome_trees_dist.png'),
                      cv2.IMREAD_GRAYSCALE)
    size = height.shape[0]
    rng = np.random.default_rng(seed)
    if crop and crop < size:
        y0 = rng.integers(0, size - crop)
        x0 = rng.integers(0, size - crop)
        height = height[y0:y0 + crop, x0:x0 + crop]
        semantic = semantic[y0:y0 + crop, x0:x0 + crop]
        tree = tree[y0:y0 + crop, x0:x0 + crop]
    world = build_voxel_world(height, semantic, tree,
                              fill_depth=fill_depth, seed=seed,
                              crop=False)
    save_world_cache(world, outdir)
    return outdir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--terrain-dir', required=True,
                   help='one scene dir, or a dir of scene dirs')
    p.add_argument('--outdir', required=True)
    p.add_argument('--crop', type=int, default=1024)
    p.add_argument('--fill-depth', type=int, default=8)
    p.add_argument('--seed', type=int, default=0)
    a = p.parse_args(argv)

    def has_height(d):
        return any(os.path.exists(os.path.join(d, n))
                   for n in ('heightmap.npy', 'biome_rivers_height.npy'))

    if has_height(a.terrain_dir):
        scenes = [a.terrain_dir]
    else:
        scenes = sorted(
            os.path.join(a.terrain_dir, d)
            for d in os.listdir(a.terrain_dir)
            if has_height(os.path.join(a.terrain_dir, d)))
    for i, scene in enumerate(scenes):
        out = os.path.join(a.outdir, os.path.basename(
            os.path.normpath(scene)))
        cache_one(scene, out, a.crop, a.seed + i, a.fill_depth)
        print(f'[{i + 1}/{len(scenes)}] {out}')


if __name__ == '__main__':
    main()

"""Terrain generation CLI.

Capability parity with `terrain_generator.py` + `scripts/
single_terrain_gen.py` + `scripts/batch_terrain_gen.py` in the
reference: one seed -> BEV maps written in the reference's file contract
(`heightmap.npy`, `semanticmap.png`, `treemap.png`, `colormap.png`,
consumed by `pcg_gen.py:84-90`); `--num-scenes`/`--start-seed` fans out
over a process pool like `batch_terrain_gen.py:27-48`.

Usage:
    python -m scenedreamer_tpu.cli.terrain_gen --size 2048 --seed 3407 \
        --outdir data/terrain
    python -m scenedreamer_tpu.cli.terrain_gen --num-scenes 1024 \
        --outdir data/terrain_dataset
"""
import argparse
import os


def generate_one(seed, size, outdir):
    import cv2
    import numpy as np
    from scenedreamer_tpu.scene.terrain import generate_terrain
    maps = generate_terrain(size=size, seed=seed)
    os.makedirs(outdir, exist_ok=True)
    np.save(os.path.join(outdir, 'heightmap.npy'), maps.height_map)
    cv2.imwrite(os.path.join(outdir, 'semanticmap.png'),
                maps.semantic_map.astype('uint8'))
    cv2.imwrite(os.path.join(outdir, 'treemap.png'),
                maps.tree_map.astype('uint8'))
    cv2.imwrite(os.path.join(outdir, 'colormap.png'),
                maps.color_map[..., ::-1])
    # training-cache naming (`scripts/single_terrain_gen.py:455-467`,
    # `save_height_map` `:17-21`): the reference `scripts/pcg_cache.py`
    # reads exactly these files, so terrain datasets interop both ways
    np.save(os.path.join(outdir, 'biome_rivers_height.npy'),
            maps.height_map.astype(np.float64))
    h = maps.height_map
    norm = ((h - h.min()) / max(h.max() - h.min(), 1e-9) * 255)
    cv2.imwrite(os.path.join(outdir, 'biome_rivers_height.png'),
                norm.astype('uint8'))
    cv2.imwrite(os.path.join(outdir, 'biome_rivers_labels.png'),
                maps.semantic_map.astype('uint8'))
    cv2.imwrite(os.path.join(outdir, 'biome_trees_dist.png'),
                maps.tree_map.astype('uint8'))
    return outdir


def _worker(args):
    seed, size, outdir = args
    return generate_one(seed, size, outdir)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--size', type=int, default=2048)
    p.add_argument('--seed', type=int, default=3407)
    p.add_argument('--outdir', required=True)
    p.add_argument('--num-scenes', type=int, default=1,
                   help='>1: generate a dataset of scenes (batch mode)')
    p.add_argument('--start-seed', type=int, default=None)
    p.add_argument('--workers', type=int, default=16)
    a = p.parse_args(argv)

    if a.num_scenes <= 1:
        out = generate_one(a.seed, a.size, a.outdir)
        print(f'wrote {out}')
        return

    start = a.seed if a.start_seed is None else a.start_seed
    jobs = [(start + i, a.size,
             os.path.join(a.outdir, f'{start + i:06d}'))
            for i in range(a.num_scenes)]
    from multiprocessing import Pool
    with Pool(min(a.workers, a.num_scenes)) as pool:
        for i, out in enumerate(pool.imap_unordered(_worker, jobs)):
            print(f'[{i + 1}/{a.num_scenes}] {out}')


if __name__ == '__main__':
    main()

"""CLI surfaces: terrain_gen -> pcg_cache chain and the cache/file
contracts (reference `scripts/{single_terrain_gen,batch_terrain_gen,
pcg_cache}.py` entry points; the heavier train/inference CLIs are
driven by scripts/smoke_render.py and the trainer tests)."""
import os

import numpy as np

from scenedreamer_tpu.cli import pcg_cache, terrain_gen


def test_terrain_gen_to_pcg_cache_chain(tmp_path):
    tdir = tmp_path / 'terrain' / '000007'
    terrain_gen.main(['--size', '128', '--seed', '7',
                      '--outdir', str(tdir)])
    # inference-naming contract (`pcg_gen.py:84-90`)
    for f in ('heightmap.npy', 'semanticmap.png', 'treemap.png',
              'colormap.png'):
        assert (tdir / f).exists(), f
    # training-naming contract (`single_terrain_gen.py:455-467`)
    for f in ('biome_rivers_height.npy', 'biome_rivers_labels.png',
              'biome_trees_dist.png'):
        assert (tdir / f).exists(), f
    hm = np.load(tdir / 'heightmap.npy')
    assert hm.shape == (128, 128) and np.isfinite(hm).all()

    cdir = tmp_path / 'cache'
    pcg_cache.main(['--terrain-dir', str(tmp_path / 'terrain'),
                    '--outdir', str(cdir), '--crop', '64'])
    sub = os.listdir(cdir)
    assert len(sub) == 1
    out = cdir / sub[0]
    # the reference 4-file cache contract (`scripts/pcg_cache.py:120-127`)
    coo = np.load(out / 'voxel_sparse.npy')
    assert coo.dtype == np.int16 and coo.shape[0] == 4
    # [1,1,S,S] / [1,11,S,S] match the reference's tensor layouts
    # (`pcg_gen.py:167-171`, saved at `scripts/pcg_cache.py:125-126`)
    assert np.load(out / 'height_map.npy').shape == (1, 1, 64, 64)
    assert np.load(out / 'semantic_map.npy').shape == (1, 11, 64, 64)
    assert np.load(out / 'hmap_mc.npy').shape == (64, 64)

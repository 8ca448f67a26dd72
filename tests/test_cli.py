"""CLI surfaces: terrain_gen -> pcg_cache chain and the cache/file
contracts (reference `scripts/{single_terrain_gen,batch_terrain_gen,
pcg_cache}.py` entry points; the heavier train/inference CLIs are
driven by scripts/smoke_render.py and the trainer tests)."""
import os

import numpy as np
import pytest

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


def test_demo_get_bev_headless():
    """`cli/demo.py:get_bev` (reference `app_gradio.py:69-77`): a seed
    produces aligned BEV height/semantic visualizations + the world."""
    from scenedreamer_tpu.cli import demo
    hvis, svis, world = demo.get_bev(seed=11, scene_size=64)
    assert hvis.shape == svis.shape == (64, 64, 3)
    assert hvis.dtype == svis.dtype == np.uint8
    assert world.voxel.shape[1:] == (64, 64)


def test_build_db_cli_roundtrip(tmp_path):
    """`cli/build_db.py` end-to-end: folder tree -> paired DBs
    readable by the lmdb dataset backend (real LMDB when the package
    exists, the sqlite substitute otherwise — either way the data
    pipeline leg executes)."""
    import cv2
    from scenedreamer_tpu.cli import build_db
    from scenedreamer_tpu.data.paired_dataset import PairedImageDataset
    root = tmp_path / 'raw'
    (root / 'images').mkdir(parents=True)
    (root / 'seg_maps').mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        cv2.imwrite(str(root / 'images' / f'{i}.jpg'),
                    rng.integers(0, 255, (80, 80, 3), np.uint8))
        cv2.imwrite(str(root / 'seg_maps' / f'{i}.png'),
                    rng.integers(0, 12, (80, 80), np.uint8))
    out = tmp_path / 'db'
    build_db.main(['--data_root', str(root),
                   '--output_root', str(out)])
    ds = PairedImageDataset(str(out), dataset_type='lmdb', augment=None)
    assert len(ds) == 3
    item = ds[0]
    assert item['images'].shape == (80, 80, 3)
    assert item['label'].shape[-1] == 184


def test_evaluate_cli_fake_dir(tmp_path, capsys):
    """`cli/evaluate.py` scores a rendered-frame folder against a real
    set (FID + KID via the jitted VGG extractor); identical sets score
    ~0 and a shifted set scores strictly worse."""
    import cv2
    from scenedreamer_tpu.cli import evaluate
    rng = np.random.default_rng(0)
    for d in ('real', 'same', 'shifted'):
        (tmp_path / d).mkdir()
    for i in range(5):
        img = rng.integers(0, 200, (48, 48, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / 'real' / f'{i}.png'), img)
        cv2.imwrite(str(tmp_path / 'same' / f'{i}.png'), img)
        cv2.imwrite(str(tmp_path / 'shifted' / f'{i}.png'), img + 55)

    def run(fake):
        out = tmp_path / f'{fake}.json'
        evaluate.main(['--real-dir', str(tmp_path / 'real'),
                       '--fake-dir', str(tmp_path / fake),
                       '--image-size', '48', '--batch', '4',
                       '--output', str(out)])
        import json
        return json.loads(out.read_text())

    same, shifted = run('same'), run('shifted')
    assert same['num_real'] == same['num_fake'] == 5
    # identical sets: FID is exactly 0; unbiased KID excludes the
    # within-set diagonal so it is ~0 but can be slightly negative
    assert same['fid'] < 1e-6 and same['kid'] < 1e-3
    assert shifted['fid'] > same['fid'] + 1e-4
    assert shifted['kid'] > same['kid']


def test_evaluate_list_images_prefers_images_subdir(tmp_path):
    """A dataset root with images/ + seg_maps/ must contribute only
    images/ to the feature sets (seg maps would corrupt FID/KID)."""
    import cv2
    from scenedreamer_tpu.cli.evaluate import list_images
    (tmp_path / 'images').mkdir()
    (tmp_path / 'seg_maps').mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(tmp_path / 'images' / f'{i}.png'),
                    rng.integers(0, 255, (8, 8, 3), np.uint8))
        cv2.imwrite(str(tmp_path / 'seg_maps' / f'{i}.png'),
                    rng.integers(0, 12, (8, 8), np.uint8))
    paths = list_images(str(tmp_path))
    assert len(paths) == 3
    assert all('seg_maps' not in p for p in paths)
    # flat layout still works
    flat = list_images(str(tmp_path / 'seg_maps'))
    assert len(flat) == 3


def test_evaluate_cli_pixel_extractor(tmp_path):
    """--extractor pixel (VGG-independent patch statistics): identical
    sets score 0, a color-shifted set scores strictly worse — with far
    stronger discrimination than random-init VGG features."""
    import json

    import cv2
    from scenedreamer_tpu.cli import evaluate
    rng = np.random.default_rng(1)
    for d in ('real', 'same', 'shifted'):
        (tmp_path / d).mkdir()
    for i in range(5):
        img = rng.integers(0, 200, (48, 48, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / 'real' / f'{i}.png'), img)
        cv2.imwrite(str(tmp_path / 'same' / f'{i}.png'), img)
        cv2.imwrite(str(tmp_path / 'shifted' / f'{i}.png'), img + 55)

    def run(fake):
        out = tmp_path / f'{fake}_px.json'
        evaluate.main(['--real-dir', str(tmp_path / 'real'),
                       '--fake-dir', str(tmp_path / fake),
                       '--image-size', '48', '--extractor', 'pixel',
                       '--output', str(out)])
        return json.loads(out.read_text())

    same, shifted = run('same'), run('shifted')
    assert same['extractor'] == 'pixel16'
    assert abs(same['fid']) < 1e-6
    assert shifted['fid'] > 1.0        # strong separation

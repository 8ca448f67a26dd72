"""Scene pipeline tests: terrain -> voxel world -> cameras -> DDA."""
import numpy as np
import jax.numpy as jnp
import pytest

from scenedreamer_tpu.scene import camera as cam
from scenedreamer_tpu.scene import terrain, voxel_world
from scenedreamer_tpu.ops.ray_voxel import (camera_rays,
                                            ray_voxel_intersection)


@pytest.fixture(scope='module')
def small_world():
    maps = terrain.generate_terrain(size=128, seed=7, n_voronoi=40,
                                    relax_iters=3)
    world = voxel_world.build_voxel_world(
        maps.height_map, maps.semantic_map, maps.tree_map,
        fill_depth=8, seed=1, boundary_detect=8)
    return maps, world


def test_terrain_maps_contract(small_world):
    maps, _ = small_world
    assert maps.height_map.shape == (128, 128)
    assert maps.semantic_map.max() <= 9
    assert (maps.semantic_map == 9).any() or (maps.height_map >= 0).all()
    # water iff negative height
    np.testing.assert_array_equal(maps.semantic_map == 9,
                                  maps.height_map < 0)
    assert maps.tree_map.shape == (128, 128)
    assert set(np.unique(maps.tree_map)) <= set(range(10)) | {255}


def test_voxel_world_structure(small_world):
    _, world = small_world
    yc, sx, sz = world.voxel.shape
    assert (sx, sz) == (128, 128)
    assert 0 < yc <= 256
    # every column has some occupancy at its heightmap level
    hm_local = world.heightmap - world.y_offset
    sample = np.random.default_rng(0).integers(0, 128, (50, 2))
    for x, z in sample:
        y = int(np.clip(hm_local[x, z], 0, yc - 1))
        assert world.voxel[y, x, z] != 0
    assert world.height_field.shape == (1, 1, 128, 128)
    assert world.semantic_field.shape == (1, 11, 128, 128)
    s = world.semantic_field.sum(1)
    np.testing.assert_allclose(s, 1.0)


def test_cache_roundtrip(tmp_path, small_world):
    maps, _ = small_world
    w = voxel_world.build_voxel_world(
        maps.height_map, maps.semantic_map, maps.tree_map,
        fill_depth=8, seed=1, boundary_detect=8, crop=False)
    voxel_world.save_world_cache(w, str(tmp_path / 'w0'))
    loaded = voxel_world.load_world_cache(str(tmp_path / 'w0'))
    gnd = int(w.heightmap.min())
    sky = int(w.heightmap.max()) + 1
    np.testing.assert_array_equal(loaded.voxel, w.voxel[gnd:sky])
    np.testing.assert_array_equal(loaded.heightmap, w.heightmap)
    assert loaded.y_offset == gnd

    # uniform height slab: a taller fixed crop zero-pads above and a
    # WorldCache always returns the cache-wide slab (static jit dims)
    taller = voxel_world.load_world_cache(
        str(tmp_path / 'w0'), crop_height=(sky - gnd) + 3)
    assert taller.voxel.shape[0] == (sky - gnd) + 3
    np.testing.assert_array_equal(taller.voxel[:sky - gnd],
                                  loaded.voxel)
    cache = voxel_world.WorldCache(str(tmp_path))
    assert cache.slab_height == sky - gnd
    assert cache.sample_world().voxel.shape == loaded.voxel.shape
    with pytest.raises(ValueError, match='crop_height'):
        voxel_world.load_world_cache(str(tmp_path / 'w0'),
                                     crop_height=(sky - gnd) - 1)


def test_camera_samplers_and_dda(small_world):
    _, world = small_world
    rng = np.random.default_rng(0)
    yc = world.voxel.shape[0]
    for sampler in (cam.rand_camera_pose_thirdperson2,
                    cam.rand_camera_pose_thirdperson3,
                    cam.rand_camera_pose_birdseye,
                    cam.rand_camera_pose_firstperson):
        ori, d, up = sampler(world, rng, border=16)
        assert np.isfinite(ori).all() and np.isfinite(d).all()
    ori, d, up, f = cam.rand_camera_pose_tour(world, rng)
    assert 0.1 < f < 5.0

    # render rays from a tour pose; some must hit terrain
    h, w = 24, 32
    raydirs = camera_rays(jnp.asarray(d), jnp.asarray(up),
                          f * (w - 1), ((h - 1) / 2, (w - 1) / 2), (h, w))
    vid, dep, hit = ray_voxel_intersection(
        jnp.asarray(world.voxel), jnp.asarray(ori),
        raydirs.reshape(-1, 3), max_samples=4)
    hit = np.asarray(hit)
    assert hit[:, 0].mean() > 0.2, 'camera should see terrain'
    # entry < exit for all hits
    dep = np.asarray(dep)
    assert np.all(dep[hit][:, 0] <= dep[hit][:, 1] + 1e-5)


def test_eval_camera_controller_patterns(small_world):
    _, world = small_world
    for pattern in range(10):
        ctl = cam.EvalCameraController(world, maxstep=8, pattern=pattern)
        assert len(ctl) == 8
        for ori, d, up, f in ctl:
            assert np.isfinite(ori).all()
            assert np.linalg.norm(d) > 0
    tour = cam.TourCameraController(world, maxstep=16)
    assert len(tour) == 16

"""Generator forward smoke tests on a tiny world (end-to-end slice)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                               SceneDreamerGenerator)
from scenedreamer_tpu.ops.ray_voxel import camera_rays, ray_voxel_intersection
from scenedreamer_tpu.scene import camera as cam
from scenedreamer_tpu.scene import terrain, voxel_world

TINY = GeneratorConfig(
    style_dims=16, interm_style_dims=32, final_feat_dim=8,
    pad=2, num_blocks_early_stop=4, num_samples=6, sample_depth=3.0,
    hash_num_levels=4, hash_level_dim=4, hash_log2_size=10,
    hash_desired_resolution=128, mlp_hidden=32, style_enc_num_filters=8)


@pytest.fixture(scope='module')
def tiny_batch():
    maps = terrain.generate_terrain(size=64, seed=11, n_voronoi=20,
                                    relax_iters=2)
    world = voxel_world.build_voxel_world(
        maps.height_map, maps.semantic_map, maps.tree_map,
        fill_depth=8, seed=1, boundary_detect=4)
    rng = np.random.default_rng(3)
    h = w = 20
    batch = {k: [] for k in ('voxel_id', 'depth', 'hit_mask', 'raydirs',
                             'cam_ori')}
    for _ in range(2):
        ori, d, up, f = cam.rand_camera_pose_tour(world, rng)
        rd = camera_rays(jnp.asarray(d), jnp.asarray(up), f * (w - 1),
                         ((h - 1) / 2, (w - 1) / 2), (h, w))
        vid, dep, hit = ray_voxel_intersection(
            jnp.asarray(world.voxel), jnp.asarray(ori), rd.reshape(-1, 3),
            max_samples=4)
        batch['voxel_id'].append(vid.reshape(h, w, 4))
        batch['depth'].append(dep.reshape(h, w, 4, 2))
        batch['hit_mask'].append(hit.reshape(h, w, 4))
        batch['raydirs'].append(rd)
        batch['cam_ori'].append(jnp.asarray(ori))
    data = {k: jnp.stack(v) for k, v in batch.items()}
    data['height_field'] = jnp.asarray(
        np.repeat(world.height_field.transpose(0, 2, 3, 1), 2, axis=0))
    data['semantic_field'] = jnp.asarray(
        np.repeat(world.semantic_field.transpose(0, 2, 3, 1), 2, axis=0))
    data['pseudo_real_img'] = jnp.asarray(
        np.random.default_rng(5).uniform(-1, 1, (2, 64, 64, 3))
        .astype(np.float32))
    return world, data


def test_generator_forward_shapes(tiny_batch):
    world, data = tiny_batch
    model = SceneDreamerGenerator(cfg=TINY)
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key}, data, world.dims, key,
                        random_style=True)
    out = model.apply(params, data, world.dims, key, random_style=True)
    assert out['fake_images'].shape == (2, 18, 18, 3)
    assert np.isfinite(np.asarray(out['fake_images'])).all()
    assert np.abs(np.asarray(out['fake_images'])).max() <= 1.0
    r = out['render']
    assert r['net_out'].shape == (2, 20, 20, TINY.final_feat_dim)
    assert r['weights'].shape[3] == TINY.num_samples


def test_generator_style_encoder_path(tiny_batch):
    world, data = tiny_batch
    model = SceneDreamerGenerator(cfg=TINY)
    key = jax.random.PRNGKey(1)
    params = model.init({'params': key}, data, world.dims, key,
                        random_style=False)
    out = model.apply(params, data, world.dims, key, random_style=False)
    assert out['mu'].shape == (2, TINY.style_dims)
    assert out['logvar'].shape == (2, TINY.style_dims)


def test_generator_gradients_flow(tiny_batch):
    world, data = tiny_batch
    model = SceneDreamerGenerator(cfg=TINY)
    key = jax.random.PRNGKey(2)
    params = model.init({'params': key}, data, world.dims, key,
                        random_style=True)

    def loss(p):
        out = model.apply(p, data, world.dims, key, random_style=True)
        return jnp.mean(out['fake_images'] ** 2)

    g = jax.grad(loss)(params)
    leaves = {p: float(jnp.abs(v).sum())
              for p, v in jax.tree_util.tree_leaves_with_path(g['params'])}
    # gradients must reach every major submodule
    for sub in ('hash_table', 'render_net', 'sky_net', 'style_net',
                'world_encoder', 'denoiser'):
        total = sum(v for p, v in leaves.items() if sub in str(p))
        assert total > 0, f'no gradient reached {sub}'


def test_generator_forward_paired_hash(tiny_batch):
    """End-to-end generator forward + grads with hash_variant='paired'
    (the slice-2-gather ADD-combine hash, ops/hashgrid.py)."""
    import dataclasses
    world, data = tiny_batch
    cfg = dataclasses.replace(TINY, hash_variant='paired')
    model = SceneDreamerGenerator(cfg=cfg)
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key}, data, world.dims, key,
                        random_style=True)
    out = model.apply(params, data, world.dims, key, random_style=True)
    assert out['fake_images'].shape == (2, 18, 18, 3)
    assert np.isfinite(np.asarray(out['fake_images'])).all()

    g = jax.grad(lambda p: jnp.sum(model.apply(
        p, data, world.dims, key, random_style=True)['fake_images'] ** 2)
    )(params)
    gt = g['params']['hash_table']
    assert float(jnp.abs(gt).sum()) > 0
    assert np.isfinite(np.asarray(gt)).all()


def test_compact_k_exactness(tiny_batch):
    """Exact sky-ray compaction (r5): evaluating the field on only the
    hits-first-sorted first K rays must reproduce the full path — the
    forward bit-exactly (dropped rays have exactly-zero weights) and
    the param grads to reduction-order rounding."""
    world, data = tiny_batch
    # force a sky block so compaction has something to drop
    hm = np.asarray(data['hit_mask']).copy()
    hm[:, :8, :, :] = False
    data = dict(data)
    data['hit_mask'] = jnp.asarray(hm)

    model = SceneDreamerGenerator(cfg=TINY)
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key}, data, world.dims, key,
                        random_style=True)

    ray_hit = hm[..., 0]
    n_hit = int(ray_hit.reshape(ray_hit.shape[0], -1).sum(1).max())
    r_all = ray_hit.shape[1] * ray_hit.shape[2]
    k = n_hit + 4
    assert k < r_all, 'fixture must leave sky rays to drop'

    def fwd(p, ck):
        return model.apply(p, data, world.dims, key, random_style=True,
                           compact_k=ck)

    full = fwd(params, None)
    comp = fwd(params, k)
    np.testing.assert_array_equal(
        np.asarray(full['render']['weights']),
        np.asarray(comp['render']['weights']))
    np.testing.assert_array_equal(
        np.asarray(full['render']['net_out']),
        np.asarray(comp['render']['net_out']))
    np.testing.assert_allclose(np.asarray(full['fake_images']),
                               np.asarray(comp['fake_images']),
                               atol=1e-7)

    def loss(p, ck):
        return jnp.mean(fwd(p, ck)['fake_images'] ** 2)

    g_full = jax.grad(loss)(params, None)
    g_comp = jax.grad(loss)(params, k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-7),
        g_full, g_comp)

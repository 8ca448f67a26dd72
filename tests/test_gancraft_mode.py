"""Legacy GANcraft voxel-feature generator mode."""
import numpy as np
import jax
import jax.numpy as jnp

from scenedreamer_tpu.data.synthetic import make_batch, make_world
from scenedreamer_tpu.models.gancraft import GANcraftGenerator
from scenedreamer_tpu.models.generator import GeneratorConfig
from scenedreamer_tpu.ops.sp_trilinear import build_corner_lut

TINY = GeneratorConfig(
    style_dims=16, interm_style_dims=32, final_feat_dim=8,
    pad=2, num_blocks_early_stop=4, num_samples=6, mlp_hidden=32,
    style_enc_num_filters=8)


def test_gancraft_generator_forward_and_grads():
    world = make_world(size=64, seed=7, n_voronoi=20, boundary_detect=4)
    lut, n = build_corner_lut(world.voxel)
    batch = make_batch(world, batch_size=1, height=18, width=18,
                       max_samples=4, pad=TINY.pad,
                       include_gan_data=False)
    batch['height_field'] = jnp.asarray(
        world.height_field.transpose(0, 2, 3, 1))
    batch['semantic_field'] = jnp.asarray(
        world.semantic_field.transpose(0, 2, 3, 1))
    model = GANcraftGenerator(cfg=TINY, num_corners=n,
                              blk_feat_dim=48, pe_no_pe_feat_dim=40)
    key = jax.random.PRNGKey(0)
    extra = {'corner_lut': jnp.asarray(lut)}

    params = model.init({'params': key}, batch, world.dims, key,
                        random_style=True, field_extra=extra)
    assert 'blk_feats' in params['params']

    out = model.apply(params, batch, world.dims, key, random_style=True,
                      field_extra=extra)
    img = out['fake_images']
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()

    def loss(p):
        o = model.apply(p, batch, world.dims, key, random_style=True,
                        field_extra=extra)
        return jnp.mean(o['fake_images'] ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g['params']['blk_feats']).sum()) > 0, \
        'no gradient reached blk_feats'
    # the hash table must NOT receive gradient in this mode
    assert float(jnp.abs(g['params']['hash_table']).sum()) == 0.0


def _setup(height=18, width=18):
    world = make_world(size=64, seed=7, n_voronoi=20, boundary_detect=4)
    lut, n = build_corner_lut(world.voxel)
    batch = make_batch(world, batch_size=1, height=height, width=width,
                       max_samples=4, pad=TINY.pad,
                       include_gan_data=False)
    batch['height_field'] = jnp.asarray(
        world.height_field.transpose(0, 2, 3, 1))
    batch['semantic_field'] = jnp.asarray(
        world.semantic_field.transpose(0, 2, 3, 1))
    model = GANcraftGenerator(cfg=TINY, num_corners=n,
                              blk_feat_dim=48, pe_no_pe_feat_dim=40)
    extra = {'corner_lut': jnp.asarray(lut)}
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key}, batch, world.dims, key,
                        random_style=True, field_extra=extra)
    return model, params, batch, world, extra


def test_gancraft_generator_deterministic():
    """Same params/batch/key -> identical frames (sort-free legacy
    voxel path; `gancraft_base.py:429-586`)."""
    model, params, batch, world, extra = _setup()
    key = jax.random.PRNGKey(3)
    a = model.apply(params, batch, world.dims, key, random_style=True,
                    field_extra=extra)['fake_images']
    b = model.apply(params, batch, world.dims, key, random_style=True,
                    field_extra=extra)['fake_images']
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gancraft_generator_style_conditions_output():
    """Different style keys must change the rendered frame (the
    modulated-MLP + RenderCNN conditioning path)."""
    model, params, batch, world, extra = _setup()
    a = model.apply(params, batch, world.dims, jax.random.PRNGKey(1),
                    random_style=True, field_extra=extra)['fake_images']
    b = model.apply(params, batch, world.dims, jax.random.PRNGKey(2),
                    random_style=True, field_extra=extra)['fake_images']
    assert float(jnp.abs(a - b).max()) > 1e-4


def test_gancraft_generator_all_sky_rays_finite():
    """Rays that hit nothing (all-invalid intervals) must still render
    finite sky pixels — the mask analog of the reference's NaN-sentinel
    handling (`gancraft_base.py:536`, `scenedreamer.py:350-352`)."""
    model, params, batch, world, extra = _setup()
    batch = dict(batch)
    batch['hit_mask'] = jnp.zeros_like(batch['hit_mask'])
    batch['voxel_id'] = jnp.zeros_like(batch['voxel_id'])
    out = model.apply(params, batch, world.dims, jax.random.PRNGKey(0),
                      random_style=True, field_extra=extra)
    img = np.asarray(out['fake_images'])
    assert np.isfinite(img).all()

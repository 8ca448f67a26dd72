"""End-to-end golden-frame regression tests.

Every hot op is oracle/bit-exactness-tested in isolation, but the
composed renderer (DDA -> depth sampling -> hash encode -> RenderMLP ->
compositing -> RenderCNN) gets rewritten for performance every round
(xor-bake, separable corners, split-refine...). These tests pin the
COMPOSED output of the three render paths against committed fixtures so
silent numerical drift is caught before it ships — the reference's one
numerical-parity pattern (`imaginaire/model_utils/gancraft/voxlib/
positional_encoding.py:57-63`) promoted to pipeline scope
(`imaginaire/generators/scenedreamer.py:479-632`).

Fixtures: tests/fixtures/golden_frames.npz — two frames (terrain tour +
sky-heavy pose) of a tiny fixed-seed config on the 8-device CPU mesh.
Regenerate ONLY after an intentional numerical change:

    env -u PALLAS_AXON_POOL_IPS python tests/test_golden.py --regen

and justify the regeneration in the commit message.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scenedreamer_tpu.data.synthetic import make_batch, make_world
from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                               SceneDreamerGenerator)
from scenedreamer_tpu.render.pipeline import TiledRenderer

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'fixtures', 'golden_frames.npz')

TINY = GeneratorConfig(
    style_dims=16, interm_style_dims=32, final_feat_dim=8,
    pad=2, num_blocks_early_stop=4, num_samples=6,
    hash_num_levels=4, hash_level_dim=4, hash_log2_size=10,
    hash_desired_resolution=128, mlp_hidden=32, style_enc_num_filters=8)

KW = dict(num_samples=6, num_blocks_early_stop=4, pad=6,
          resolution_hw=(32, 48), fov=40.0)

# float32 image tolerance: a uint8 LSB in [-1, 1] is ~7.8e-3; 1e-3
# passes toolchain-level conv-rounding differences while catching any
# real numerical change in the composed pipeline
IMG_ATOL = 1e-3


def _build():
    world = make_world(size=64, seed=7, n_voronoi=20, boundary_detect=4)
    model = SceneDreamerGenerator(cfg=TINY)
    batch = make_batch(world, batch_size=1, height=20, width=20,
                       max_samples=4, pad=TINY.pad, seed=0,
                       include_gan_data=False)
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key}, batch, world.dims, key,
                        random_style=True)
    return model, params, world


def _poses(world):
    from scenedreamer_tpu.scene.camera import EvalCameraController
    tour = EvalCameraController(world, maxstep=4, pattern=0)[0]
    # low camera pitched up: pure-sky tiles exercise the sky fast path
    sky = (np.array([world.dims[0] * 0.5, 10.0, 10.0], np.float32),
           np.array([0.9, 0.3, 0.3], np.float32),
           np.array([1.0, 0.0, 0.0], np.float32),
           0.5 / np.tan(np.deg2rad(20.0)))
    return {'tour': tour, 'sky': sky}


def _render_all():
    """Render both poses through the three production paths."""
    from scenedreamer_tpu.parallel import mesh as pm
    model, params, world = _build()
    style = jax.random.normal(jax.random.PRNGKey(5),
                              (1, TINY.style_dims))
    r_split = TiledRenderer(model, params, world, tile_size=16, **KW)
    assert r_split.split_refine
    r_tile = TiledRenderer(model, params, world, tile_size=16,
                           split_refine=False, **KW)
    r_mesh = TiledRenderer(model, params, world, tile_size=16,
                           mesh=pm.make_mesh(), **KW)
    z = r_split.style_z(style)
    out = {}
    for pname, pose in _poses(world).items():
        img_sp, aux = r_split.frame(pose, z, return_aux=True)
        out[f'{pname}_split'] = np.asarray(img_sp)
        out[f'{pname}_split_depth'] = np.nan_to_num(
            np.asarray(aux['depth']), posinf=1e9)
        out[f'{pname}_tile'] = np.asarray(r_tile.frame(pose, z))
        out[f'{pname}_mesh'] = np.asarray(r_mesh.frame(pose, z))
    return out


@pytest.fixture(scope='module')
def rendered():
    return _render_all()


@pytest.fixture(scope='module')
def golden():
    if not os.path.exists(FIXTURE):
        pytest.fail(f'missing golden fixture {FIXTURE}; generate with '
                    'python tests/test_golden.py --regen')
    return dict(np.load(FIXTURE))


@pytest.mark.parametrize('pose', ['tour', 'sky'])
@pytest.mark.parametrize('path', ['split', 'tile', 'mesh'])
def test_golden_frame(rendered, golden, pose, path):
    key = f'{pose}_{path}'
    got = rendered[key]
    assert got.shape == golden[key].shape
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, golden[key], atol=IMG_ATOL,
                               err_msg=f'{key}: composed renderer '
                               'output drifted from the golden frame')


@pytest.mark.parametrize('pose', ['tour', 'sky'])
def test_golden_depth(rendered, golden, pose):
    key = f'{pose}_split_depth'
    np.testing.assert_allclose(rendered[key], golden[key], rtol=1e-5,
                               atol=1e-4)


def test_paths_mutually_consistent(rendered):
    """The three paths must agree with EACH OTHER (not only with their
    own fixtures): split-refine == mesh == padded-tile away from
    padded-tile seam rounding."""
    for pose in ('tour', 'sky'):
        np.testing.assert_allclose(rendered[f'{pose}_tile'],
                                   rendered[f'{pose}_mesh'], atol=2e-4)


if __name__ == '__main__':
    import sys
    if '--regen' in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_num_cpu_devices', 8)
        from jax._src import xla_bridge
        try:
            xla_bridge._clear_backends()
        except Exception:
            pass
        assert jax.devices()[0].platform == 'cpu'
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, **_render_all())
        print(f'wrote {FIXTURE}')
    else:
        print(__doc__)

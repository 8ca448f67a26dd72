"""Checkpoint converter: torch-key mapping round trip.

Builds a synthetic reference-style state dict (exact module/parameter
names and tensor layouts of the torch reference), converts it, and
checks the result loads into `SceneDreamerGenerator` with the same tree
structure as a fresh init and produces the expected forward output.
"""
import numpy as np
import jax
import jax.numpy as jnp

from scenedreamer_tpu.data.synthetic import make_batch, make_world
from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                               SceneDreamerGenerator)
from scenedreamer_tpu.utils import convert

TINY = GeneratorConfig(
    style_dims=16, interm_style_dims=32, final_feat_dim=8,
    pad=2, num_blocks_early_stop=4, num_samples=6,
    hash_num_levels=4, hash_level_dim=4, hash_log2_size=10,
    hash_desired_resolution=128, mlp_hidden=32, style_enc_num_filters=8)


def _torch_style_state_dict(params, rng):
    """Inverse-map our flax params into reference torch keys/layouts."""
    sd = {}
    p = params['params']
    sd['hash_encoder.embeddings'] = np.asarray(p['hash_table'])

    rn = p['render_net']
    for name, sub in rn.items():
        for pn, v in sub.items():
            v = np.asarray(v)
            key = f'render_net.{name}.{pn}'
            sd[key] = v
    we = p['world_encoder']
    for head in ('hconv_head', 'sconv_head'):
        sd[f'world_encoder.{head}.weight'] = \
            np.asarray(we[head]['kernel']).transpose(3, 2, 0, 1)
        sd[f'world_encoder.{head}.bias'] = np.asarray(we[head]['bias'])
    for i in range(1, 6):
        blk = we.get(f'block_{i}')
        if blk is None:
            break
        sd[f'world_encoder.conv_blocks.{i - 1}.layers.0.weight'] = \
            np.asarray(blk['Conv_0']['kernel']).transpose(3, 2, 0, 1)
        sd[f'world_encoder.conv_blocks.{i - 1}.layers.2.weight'] = \
            np.asarray(blk['Conv_1']['kernel']).transpose(3, 2, 0, 1)
    for fc in ('fc1', 'fc2'):
        sd[f'world_encoder.{fc}.weight'] = np.asarray(we[fc]['weight'])
        sd[f'world_encoder.{fc}.bias'] = np.asarray(we[fc]['bias'])

    for name, sub in p['sky_net'].items():
        sd[f'sky_net.{name}.weight'] = np.asarray(sub['weight'])
        if 'bias' in sub:
            sd[f'sky_net.{name}.bias'] = np.asarray(sub['bias'])
    for name, sub in p['style_net'].items():
        tk = 'style_net.fc_out' if name == 'fc_out' \
            else f'style_net.fc_layers.{name.split("_")[1]}'
        sd[tk + '.weight'] = np.asarray(sub['weight'])
        sd[tk + '.bias'] = np.asarray(sub['bias'])

    se = p['style_encoder']
    for i in range(1, 7):
        sd[f'style_encoder.layer{i}.layers.conv.weight'] = \
            np.asarray(se[f'layer{i}']['kernel']).transpose(3, 2, 0, 1)
        sd[f'style_encoder.layer{i}.layers.conv.bias'] = \
            np.asarray(se[f'layer{i}']['bias'])
    hw = 4
    for name in ('fc_mu', 'fc_var'):
        w = np.asarray(se[name]['weight'])          # [S, h*w*C]
        s_dim = w.shape[0]
        c = w.shape[1] // (hw * hw)
        w_t = w.reshape(s_dim, hw, hw, c).transpose(0, 3, 1, 2) \
               .reshape(s_dim, -1)
        sd[f'style_encoder.{name}.fc.weight'] = w_t
        sd[f'style_encoder.{name}.fc.bias'] = np.asarray(se[name]['bias'])

    dn = p['denoiser']
    sd['denoiser.fc_z_cond.weight'] = np.asarray(
        dn['fc_z_cond']['weight'])
    sd['denoiser.fc_z_cond.bias'] = np.asarray(dn['fc_z_cond']['bias'])
    for name in ('conv1', 'conv2a', 'conv2b', 'conv3a', 'conv3b',
                 'conv4a', 'conv4b', 'conv4'):
        sd[f'denoiser.{name}.weight'] = \
            np.asarray(dn[name]['kernel']).transpose(3, 2, 0, 1)
        if 'bias' in dn[name]:
            sd[f'denoiser.{name}.bias'] = np.asarray(dn[name]['bias'])
    # wrap like DDP to exercise prefix stripping
    return {'module.' + k: v for k, v in sd.items()}


def test_generator_converter_round_trip():
    world = make_world(size=64, seed=7, n_voronoi=20, boundary_detect=4)
    batch = make_batch(world, batch_size=1, height=34, width=34,
                       max_samples=4, pad=TINY.pad, seed=0)
    # StyleEncoder spatial size after 6 stride-2 convs from 256 = 4
    model = SceneDreamerGenerator(cfg=TINY)
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key}, batch, world.dims, key,
                        random_style=False)

    sd = _torch_style_state_dict(params, np.random.default_rng(0))
    converted = convert.convert_scenedreamer_generator(sd)

    # identical tree structure
    s1 = jax.tree_util.tree_structure(params)
    s2 = jax.tree_util.tree_structure(converted)
    assert s1 == s2, f'{s1}\n!=\n{s2}'

    # identical values -> identical forward
    out_a = model.apply(params, batch, world.dims, key,
                        random_style=False)
    out_b = model.apply(converted, batch, world.dims, key,
                        random_style=False)
    np.testing.assert_allclose(np.asarray(out_a['fake_images']),
                               np.asarray(out_b['fake_images']),
                               atol=1e-6)


def test_spectral_norm_folding():
    w = np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32)
    u, s, vt = np.linalg.svd(w, full_matrices=False)
    sd = {'lin.weight_orig': w, 'lin.weight_u': u[:, 0],
          'lin.weight_v': vt[0]}
    out = convert.fold_spectral_norm(sd)
    assert 'lin.weight' in out and 'lin.weight_orig' not in out
    np.testing.assert_allclose(np.linalg.svd(out['lin.weight'])[1][0],
                               1.0, rtol=1e-3)


def test_tree_asset_extraction():
    trees = [np.ones((3, 2, 2), np.int16), np.zeros((4, 3, 3), np.int64)]
    out = convert.extract_tree_assets({'assets': trees})
    assert len(out) == 2
    assert all(t.dtype == np.int32 for t in out)


def test_vgg19_converter_parity():
    """`convert_torch_vgg19` vs a torch forward over a state dict laid
    out exactly like `torchvision.models.vgg19().features` (the tensor
    the reference perceptual loss downloads,
    `imaginaire/losses/perceptual.py:16-150`): conv indices
    0,2,5,7,10,...,34 with MaxPool slots at 4/9/18/27. torchvision is
    not in this image, so the layout is constructed explicitly and the
    forward composed functionally -- same keys, same layouts."""
    import pytest
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    from scenedreamer_tpu.models import vgg

    rng = np.random.default_rng(1)
    sd = {}
    torch_layers = []
    idx, in_ch = 0, 3
    for name, ch, pool in vgg._VGG19_CFG:
        if pool:
            torch_layers.append(('pool', None))
            idx += 1
        w = (rng.normal(size=(ch, in_ch, 3, 3)) / np.sqrt(9 * in_ch))
        b = rng.normal(size=(ch,)) * 0.1
        sd[f'features.{idx}.weight'] = w.astype(np.float32)
        sd[f'features.{idx}.bias'] = b.astype(np.float32)
        torch_layers.append(('conv', (name, sd[f'features.{idx}.weight'],
                                      sd[f'features.{idx}.bias'])))
        idx += 2
        in_ch = ch
    # torchvision vgg19 features end at index 36 (final MaxPool); the
    # last conv must be 34 for the converter's index walk to be right.
    assert idx - 2 == 34

    x = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    taps = ('relu_1_1', 'relu_3_1', 'relu_4_1', 'relu_5_1')
    xn = np.asarray(vgg.imagenet_normalize(x))

    xt = torch.from_numpy(xn.transpose(0, 3, 1, 2))
    ref = {}
    with torch.no_grad():
        for kind, payload in torch_layers:
            if kind == 'pool':
                xt = F.max_pool2d(xt, 2, 2)
                continue
            name, w, b = payload
            xt = F.relu(F.conv2d(xt, torch.from_numpy(w),
                                 torch.from_numpy(b), padding=1))
            if name in taps:
                ref[name] = xt.numpy().transpose(0, 2, 3, 1)

    model = vgg.VGG19Features(layers=taps)
    params = convert.convert_vgg19(sd)
    ours = model.apply(params, jnp.asarray(xn))
    assert set(ours) == set(taps)
    for k in taps:
        np.testing.assert_allclose(np.asarray(ours[k]), ref[k],
                                   rtol=2e-4, atol=2e-4)

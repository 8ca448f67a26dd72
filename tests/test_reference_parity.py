"""Numerical parity vs the reference's pure-PyTorch implementations.

The reference's only self-check compares its CUDA PE kernel to a torch
formula at rtol/atol 1e-5 (`voxlib/positional_encoding.py:57-63`,
SURVEY.md §4); these tests extend that pattern: the reference's
CPU-runnable torch modules are executed directly (from /root/reference)
and compared against our jnp/flax equivalents with shared weights.

CUDA-only pieces (voxlib DDA, gridencoder) have no CPU reference here;
their contracts are covered by the analytic tests in test_ray_voxel /
test_hashgrid.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')
sys.path.insert(0, '/root/reference')

import jax
import jax.numpy as jnp

from scenedreamer_tpu.models.layers import (ConditionalHashGrid, RenderMLP)
from scenedreamer_tpu.ops.compositing import volume_rendering_relu
from scenedreamer_tpu.ops.pe import positional_encoding
from scenedreamer_tpu.train import losses as L


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_positional_encoding_parity():
    """vs `voxlib/positional_encoding.py:45-54` (torch formula)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 5, 3)).astype(np.float32)
    pe_stor = []
    for i in range(4):
        pe_stor.append(torch.sin(_t(x) * np.pi * 2 ** i))
        pe_stor.append(torch.cos(_t(x) * np.pi * 2 ** i))
    pe_stor.append(_t(x))
    ref = torch.cat(pe_stor, dim=-1).numpy()
    ours = np.asarray(positional_encoding(jnp.asarray(x), 4,
                                          incl_orig=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_volume_rendering_parity():
    """vs `mc_utils.volum_rendering_relu` (`mc_utils.py:154-161`)."""
    from imaginaire.model_utils.gancraft import mc_utils
    rng = np.random.default_rng(1)
    sigma = rng.normal(size=(2, 4, 4, 9, 1)).astype(np.float32)
    dists = rng.uniform(0.01, 0.5, (2, 4, 4, 9, 1)).astype(np.float32)
    ref = mc_utils.volum_rendering_relu(_t(sigma), _t(dists),
                                        dim=-2).numpy()
    ours = np.asarray(volume_rendering_relu(jnp.asarray(sigma),
                                            jnp.asarray(dists), axis=-2))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_sample_depth_parity_deterministic():
    """vs `mc_utils.sample_depth_batched` (`mc_utils.py:82-151`),
    deterministic mode, no box boundaries (the shipped train config)."""
    from imaginaire.model_utils.gancraft import mc_utils
    from scenedreamer_tpu.ops.sampling import sample_depth
    rng = np.random.default_rng(2)
    R, M, S = 6, 4, 9
    entry = np.sort(rng.uniform(0, 5, (R, M)), axis=-1)
    width = rng.uniform(0.1, 1.0, (R, M))
    nvalid = rng.integers(1, M + 1, (R,))
    depth = np.stack([entry, entry + width], -1).astype(np.float32)
    mask = np.arange(M)[None, :] < nvalid[:, None]
    # reference layout [N, 2, H, W, M, 1] with NaN sentinels
    d_ref = depth.copy()
    d_ref[~mask] = np.nan
    d_ref_t = _t(d_ref.transpose(2, 0, 1).reshape(2, R, 1, M, 1)[None])
    ref_depth, ref_dists, ref_idx = mc_utils.sample_depth_batched(
        d_ref_t, S + 1, deterministic=True, use_box_boundaries=False,
        sample_depth=3.0)
    ours_depth, ours_dists, ours_idx = sample_depth(
        jax.random.PRNGKey(0), jnp.asarray(depth), jnp.asarray(mask),
        S + 1, deterministic=True, use_box_boundaries=False,
        sample_depth_clip=3.0)
    np.testing.assert_allclose(
        np.asarray(ours_depth).reshape(R, S),
        ref_depth.numpy().reshape(R, S), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours_dists).reshape(R, S),
        ref_dists.numpy().reshape(R, S), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(ours_idx).reshape(R, S), ref_idx.numpy().reshape(R, S))


def test_nplus1_gan_loss_parity():
    """vs `model_utils/gancraft/loss.py:10-96`."""
    from imaginaire.model_utils.gancraft.loss import GANLoss
    rng = np.random.default_rng(3)
    B, H, W, C = 2, 6, 6, 13
    pred = rng.normal(size=(B, H, W, C)).astype(np.float32)
    lbl = jax.nn.one_hot(rng.integers(0, C - 1, (B, H, W)), C - 1,
                         dtype=jnp.float32)
    ref_loss = GANLoss()
    args_nchw = {'pred': _t(np.asarray(pred).transpose(0, 3, 1, 2)),
                 'label': _t(np.asarray(lbl).transpose(0, 3, 1, 2))}
    for t_real, dis_update in ((True, True), (False, True),
                               (True, False)):
        ref = ref_loss.loss(
            {k: v.clone() for k, v in args_nchw.items()}, t_real,
            dis_update=dis_update).item()
        ours = float(L.gan_loss([{'pred': jnp.asarray(pred),
                                  'label': lbl}], t_real, dis_update))
        assert ours == pytest.approx(ref, rel=1e-5), (t_real, dis_update)


def _copy_linear(flax_p, torch_mod):
    torch_mod.weight.data = _t(np.asarray(flax_p['weight']))
    if getattr(torch_mod, 'bias', None) is not None and 'bias' in flax_p:
        torch_mod.bias.data = _t(np.asarray(flax_p['bias']))


def test_lightning_mlp_parity():
    """Our RenderMLP vs the reference LightningMLP
    (`model_utils/layers.py:57-126`) with identical weights."""
    from imaginaire.model_utils.layers import LightningMLP
    rng = np.random.default_rng(4)
    N, CIN, S, MD, HID = 50, 24, 16, 12, 32
    x = rng.normal(size=(1, 5, 5, 2, CIN)).astype(np.float32)
    z = rng.normal(size=(1, S)).astype(np.float32)
    m = jax.nn.one_hot(rng.integers(0, MD, (1, 5, 5, 2)), MD,
                       dtype=jnp.float32)

    ours = RenderMLP(style_dim=S, viewdir_dim=0, mask_dim=MD,
                     out_channels_s=1, out_channels_c=3,
                     hidden_channels=HID, use_seg=True)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), None,
                       jnp.asarray(z), m)

    ref = LightningMLP(CIN, style_dim=S, viewdir_dim=0, mask_dim=MD,
                       out_channels_s=1, out_channels_c=3,
                       hidden_channels=HID, use_seg=True)
    p = params['params']
    for name in ('fc_1', 'fc_sigma', 'fc_out_c'):
        _copy_linear(p[name], getattr(ref, name))
    _copy_linear(p['fc_m_a'], ref.fc_m_a)
    for name in ('fc_2', 'fc_3', 'fc_4', 'fc_5', 'fc_6'):
        tm = getattr(ref, name)
        fp = p[name]
        tm.weight.data = _t(np.asarray(fp['weight']))
        tm.weight_alpha.data = _t(np.asarray(fp['weight_alpha']))
        tm.bias_alpha.data = _t(np.asarray(fp['bias_alpha']))
        tm.weight_beta.data = _t(np.asarray(fp['weight_beta']))
        tm.bias_beta.data = _t(np.asarray(fp['bias_beta']))

    with torch.no_grad():
        ref_s, ref_c = ref(_t(x), None, _t(z), _t(np.asarray(m)))
    our_s, our_c = ours.apply(params, jnp.asarray(x), None,
                              jnp.asarray(z), m)
    np.testing.assert_allclose(np.asarray(our_s), ref_s.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_c), ref_c.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_conditional_hashgrid_parity():
    """Our ConditionalHashGrid vs the reference world encoder
    (`model_utils/layers.py:25-55`) with identical weights."""
    from imaginaire.model_utils import layers as ref_layers
    rng = np.random.default_rng(5)
    S = 64
    height = rng.normal(size=(1, S, S, 1)).astype(np.float32)
    sem = rng.normal(size=(1, S, S, 11)).astype(np.float32)

    ours = ConditionalHashGrid(num_conv_blocks=3)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(height),
                       jnp.asarray(sem))
    ref = ref_layers.ConditionalHashGrid(num_conv_blocks=3)
    p = params['params']
    for head, tmod in (('hconv_head', ref.hconv_head),
                       ('sconv_head', ref.sconv_head)):
        tmod.weight.data = _t(
            np.asarray(p[head]['kernel']).transpose(3, 2, 0, 1))
        tmod.bias.data = _t(np.asarray(p[head]['bias']))
    for i, blk in enumerate(ref.conv_blocks):
        fp = p[f'block_{i + 1}']
        blk.layers[0].weight.data = _t(
            np.asarray(fp['Conv_0']['kernel']).transpose(3, 2, 0, 1))
        blk.layers[2].weight.data = _t(
            np.asarray(fp['Conv_1']['kernel']).transpose(3, 2, 0, 1))
    _copy_linear(p['fc1'], ref.fc1)
    _copy_linear(p['fc2'], ref.fc2)

    with torch.no_grad():
        ref_out = ref(_t(np.asarray(height).transpose(0, 3, 1, 2)),
                      _t(np.asarray(sem).transpose(0, 3, 1, 2)))
    our_out = ours.apply(params, jnp.asarray(height), jnp.asarray(sem))
    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def _import_ref_spade():
    """Import the reference SPADE generator with its CUDA-only /
    absent-dependency imports stubbed (upfirdn2d_cuda, albumentations,
    cv2 attrs, .cuda() on CPU)."""
    import types
    for stub in ('upfirdn2d_cuda', 'bias_act_cuda', 'albumentations',
                 'cv2'):
        if stub in sys.modules and not isinstance(
                sys.modules[stub], types.ModuleType):
            continue
        if stub == 'cv2':
            try:
                import cv2  # noqa: F401
                continue
            except ImportError:
                pass
        m = sys.modules.get(stub) or types.ModuleType(stub)
        if stub == 'albumentations':
            m.DualTransform = object
            m.BasicTransform = object
        if stub == 'cv2':
            m.setNumThreads = lambda *a: None
            m.ocl = types.SimpleNamespace(setUseOpenCL=lambda *a: None)
            m.INTER_NEAREST, m.INTER_LINEAR = 0, 1
            m.INTER_CUBIC, m.INTER_AREA = 2, 3
        sys.modules[stub] = m
    torch.Tensor.cuda = lambda self, *a, **k: self
    from imaginaire.generators import spade as ref_spade
    return ref_spade


def _ref_spade_generator(num_labels=12, style_dims=16, num_filters=8,
                         spade_filters=8, crop=512, seed=0):
    """Construct the reference torch SPADE Generator
    (`generators/spade.py:30-125`) with the landscape1m layout
    (`configs/landscape1m.yaml:57-76`) at reduced width, with
    randomized batch-norm running stats (frozen-eval oracle)."""
    import types

    def ns(**kw):
        return types.SimpleNamespace(**kw)

    class Aug:
        def __init__(self, **kw):
            self.__dict__.update(kw)

        def __getitem__(self, k):
            return self.__dict__[k]

    ref_spade = _import_ref_spade()
    gen_cfg = ns(output_multiplier=0.5, image_channels=3,
                 num_labels=num_labels, style_dims=style_dims,
                 num_filters=num_filters, kernel_size=3,
                 weight_norm_type='spectral',
                 use_posenc_in_input_layer=False,
                 global_adaptive_norm_type='sync_batch',
                 activation_norm_params=ns(
                     num_filters=spade_filters, kernel_size=5,
                     separate_projection=True,
                     activation_norm_type='sync_batch'),
                 style_enc=ns(num_filters=4, kernel_size=3))
    data_cfg = ns(train=ns(augmentations=Aug(
        random_crop_h_w=f'{crop},{crop}')))
    torch.manual_seed(seed)
    g = ref_spade.Generator(gen_cfg, data_cfg)
    # A random-weight SPADE net explodes in eval (multiplicative gammas
    # with identity running stats); a trained oracle's BN stats absorb
    # the scale. Emulate: cumulative-momentum BN + train-mode forwards
    # so running stats match real activations, then freeze.
    for mod in g.modules():
        if hasattr(mod, 'running_mean') and mod.running_mean is not None:
            mod.momentum = None
    gen = np.random.default_rng(seed)
    lbl = gen.integers(0, num_labels, (2, 64, 64))
    seg = np.eye(num_labels, dtype=np.float32)[lbl].transpose(0, 3, 1, 2)
    z = gen.normal(size=(2, style_dims)).astype(np.float32)
    g.train()
    with torch.no_grad():
        for _ in range(2):
            g.spade_generator({'label': _t(seg), 'z': _t(z)})
    g.eval()
    return g


def test_spade_generator_parity():
    """Our SPADE oracle vs the reference `generators/spade.py:228-508`
    with converted weights (spectral norm folded, BN stats mapped) —
    the VERDICT round-1 item: the pseudo-GT training signal must be
    numerically the reference's."""
    from scenedreamer_tpu.models.spade import SPADEWrapper
    from scenedreamer_tpu.utils.convert import convert_spade

    g = _ref_spade_generator()
    rng = np.random.default_rng(7)
    lbl = rng.integers(0, 12, (1, 128, 128))
    seg = np.eye(12, dtype=np.float32)[lbl]            # [1,128,128,12] NHWC
    z = rng.normal(size=(1, 16)).astype(np.float32)

    with torch.no_grad():
        ref_out = g.spade_generator(
            {'label': _t(seg.transpose(0, 3, 1, 2)), 'z': _t(z)}
        )['fake_images'].numpy()

    model = SPADEWrapper(num_labels=12, out_size=512, style_dims=16,
                         num_filters=8, spade_filters=8)
    variables = convert_spade(g.state_dict(), num_filters=8)
    out = model.apply(variables, {'label': jnp.asarray(seg),
                                  'z': jnp.asarray(z)})
    ours = np.asarray(out['fake_images']).transpose(0, 3, 1, 2)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


def test_spade_style_encoder_parity():
    """Our SPADE style encoder (VAE mu/logvar) vs the reference
    `generators/spade.py:511-571` with converted weights."""
    from scenedreamer_tpu.models.spade import SPADEWrapper
    from scenedreamer_tpu.utils.convert import convert_spade

    g = _ref_spade_generator(seed=1)
    rng = np.random.default_rng(9)
    img = rng.normal(size=(1, 256, 256, 3)).astype(np.float32)

    with torch.no_grad():
        mu_ref, logvar_ref, _ = g.style_encoder(
            _t(np.ascontiguousarray(img.transpose(0, 3, 1, 2))))

    model = SPADEWrapper(num_labels=12, out_size=512, style_dims=16,
                         num_filters=8, spade_filters=8,
                         style_enc_filters=4)
    variables = convert_spade(g.state_dict(), num_filters=8)

    def enc(v, x):
        return model.apply(v, x, rng=jax.random.PRNGKey(0),
                           method=lambda m, x, rng: m.style_encoder(
                               x, rng=rng))

    mu, logvar, _ = enc(variables, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(mu), mu_ref.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar), logvar_ref.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_partial_conv2d_parity():
    """Our PartialConv2d vs `layers/conv.py:1222-1305` with shared
    weights and an irregular mask."""
    _import_ref_spade()          # stubs CUDA-only imports
    from imaginaire.layers.conv import PartialConv2d as RefPC
    from scenedreamer_tpu.models.blocks import PartialConv2d

    rng = np.random.default_rng(21)
    x = rng.normal(size=(2, 12, 12, 5)).astype(np.float32)
    mask = (rng.random((2, 12, 12, 1)) > 0.4).astype(np.float32)

    ours = PartialConv2d(features=7, kernel_size=3)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(mask))
    ref = RefPC(5, 7, 3, padding=1, multi_channel=False,
                return_mask=True)
    k = np.asarray(variables['params']['conv']['kernel'])
    ref.weight.data = _t(np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
    ref.bias.data = _t(np.asarray(variables['params']['conv']['bias']))

    with torch.no_grad():
        ref_out, ref_mask = ref(
            _t(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
            mask_in=_t(np.ascontiguousarray(mask.transpose(0, 3, 1, 2))))
    out, m = ours.apply(variables, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref_out.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m).transpose(0, 3, 1, 2),
                               ref_mask.numpy(), atol=1e-6)


def test_hyper_conv2d_parity():
    """Our vmapped hyper_conv2d vs `layers/conv.py:806-888` (per-sample
    loop of F.conv2d)."""
    _import_ref_spade()
    from imaginaire.layers.conv import HyperConv2d as RefHC
    from scenedreamer_tpu.models.blocks import hyper_conv2d

    rng = np.random.default_rng(22)
    N, Cin, Cout, K = 3, 4, 6, 3
    x = rng.normal(size=(N, 10, 10, Cin)).astype(np.float32)
    w = rng.normal(size=(N, Cout, Cin, K, K)).astype(np.float32) * 0.2
    b = rng.normal(size=(N, Cout)).astype(np.float32)

    ref = RefHC(Cin, Cout, kernel_size=K, stride=1, padding=1, bias=True)
    with torch.no_grad():
        ref_out = ref(_t(np.ascontiguousarray(x.transpose(0, 3, 1, 2))),
                      conv_weights=(_t(w), _t(b)))
    ours = hyper_conv2d(jnp.asarray(x),
                        jnp.asarray(w.transpose(0, 3, 4, 2, 1)),
                        jnp.asarray(b), stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref_out.numpy(), rtol=1e-4, atol=1e-5)

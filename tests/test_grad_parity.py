"""Gradient parity vs the reference's torch autograd (BASELINE config 4:
"grad allclose vs reference").

jax.grad of our modules/losses is compared against torch .backward()
with SHARED weights — the backward-pass analog of the forward parity in
`test_reference_parity.py` (pattern:
`/root/reference/.../voxlib/positional_encoding.py:57-63`).
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')
sys.path.insert(0, '/root/reference')
sys.path.insert(0, '/root/repo/tests')

import jax
import jax.numpy as jnp

import test_reference_parity as trp
from scenedreamer_tpu.models.layers import ConditionalHashGrid, RenderMLP
from scenedreamer_tpu.ops.compositing import volume_rendering_relu
from scenedreamer_tpu.train import losses as L

_t = trp._t


def _torch_grads(mod):
    return {n: p.grad.detach().numpy() for n, p in mod.named_parameters()
            if p.grad is not None}


def test_render_mlp_grad_parity():
    """d loss / d params of RenderMLP vs the reference LightningMLP
    (`model_utils/layers.py:57-126`), shared weights, rtol 1e-4."""
    from imaginaire.model_utils.layers import LightningMLP
    rng = np.random.default_rng(11)
    CIN, S, MD, HID = 24, 16, 12, 32
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
        trp._copy_linear(p[name], getattr(ref, name))
    trp._copy_linear(p['fc_m_a'], ref.fc_m_a)
    for name in ('fc_2', 'fc_3', 'fc_4', 'fc_5', 'fc_6'):
        tm = getattr(ref, name)
        fp = p[name]
        for pn in ('weight', 'weight_alpha', 'bias_alpha', 'weight_beta',
                   'bias_beta'):
            getattr(tm, pn).data = _t(np.asarray(fp[pn]))

    def loss_j(prm):
        s, c = ours.apply({'params': prm}, jnp.asarray(x), None,
                          jnp.asarray(z), m)
        return jnp.sum(jnp.sin(s)) + jnp.sum(jnp.cos(c))

    gj = jax.grad(loss_j)(p)

    s_t, c_t = ref(_t(x), None, _t(z), _t(np.asarray(m)))
    (torch.sin(s_t).sum() + torch.cos(c_t).sum()).backward()
    gt = _torch_grads(ref)

    checked = 0
    for name, sub in gj.items():
        for pn, val in sub.items():
            tkey = f'{name}.{pn}'
            assert tkey in gt, tkey
            # rtol 2e-3: fp32 reduction-order noise on O(1e2)-term sums
            np.testing.assert_allclose(np.asarray(val), gt[tkey],
                                       rtol=2e-3, atol=1e-4,
                                       err_msg=tkey)
            checked += 1
    assert checked >= 20


def test_conditional_hashgrid_grad_parity():
    """World-encoder grads vs `model_utils/layers.py:25-55`."""
    from imaginaire.model_utils import layers as ref_layers
    rng = np.random.default_rng(12)
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
    trp._copy_linear(p['fc1'], ref.fc1)
    trp._copy_linear(p['fc2'], ref.fc2)

    def loss_j(prm):
        out = ours.apply({'params': prm}, jnp.asarray(height),
                         jnp.asarray(sem))
        return jnp.sum(out * jnp.asarray([1.0, -2.0]))

    gj = jax.grad(loss_j)(p)

    out_t = ref(_t(np.ascontiguousarray(height.transpose(0, 3, 1, 2))),
                _t(np.ascontiguousarray(sem.transpose(0, 3, 1, 2))))
    (out_t * _t(np.asarray([1.0, -2.0], np.float32))).sum().backward()
    gt = _torch_grads(ref)

    def chk(j_arr, tkey, conv=False):
        ref_g = gt[tkey]
        if conv:
            ref_g = ref_g.transpose(2, 3, 1, 0)
        np.testing.assert_allclose(np.asarray(j_arr), ref_g,
                                   rtol=1e-4, atol=1e-6, err_msg=tkey)

    chk(gj['hconv_head']['kernel'], 'hconv_head.weight', conv=True)
    chk(gj['sconv_head']['kernel'], 'sconv_head.weight', conv=True)
    chk(gj['hconv_head']['bias'], 'hconv_head.bias')
    for i, _ in enumerate(ref.conv_blocks):
        chk(gj[f'block_{i + 1}']['Conv_0']['kernel'],
            f'conv_blocks.{i}.layers.0.weight', conv=True)
        chk(gj[f'block_{i + 1}']['Conv_1']['kernel'],
            f'conv_blocks.{i}.layers.2.weight', conv=True)
    chk(gj['fc1']['weight'], 'fc1.weight')
    chk(gj['fc2']['weight'], 'fc2.weight')


def test_nplus1_gan_loss_grad_parity():
    """d loss / d pred of the N+1 GAN loss vs
    `model_utils/gancraft/loss.py:52-96`."""
    from imaginaire.model_utils.gancraft.loss import GANLoss
    rng = np.random.default_rng(13)
    B, H, W, C = 2, 6, 6, 13
    pred = rng.normal(size=(B, H, W, C)).astype(np.float32)
    lbl = np.asarray(jax.nn.one_hot(
        rng.integers(0, C - 1, (B, H, W)), C - 1, dtype=jnp.float32))
    ref_loss = GANLoss()
    for t_real, dis_update in ((True, True), (False, True),
                               (True, False)):
        pt = _t(np.ascontiguousarray(pred.transpose(0, 3, 1, 2)))
        pt.requires_grad_(True)
        ref = ref_loss.loss(
            {'pred': pt,
             'label': _t(np.ascontiguousarray(
                 lbl.transpose(0, 3, 1, 2)))}, t_real,
            dis_update=dis_update)
        ref.backward()
        ref_g = pt.grad.numpy().transpose(0, 2, 3, 1)

        gj = jax.grad(lambda q: L.gan_loss(
            [{'pred': q, 'label': jnp.asarray(lbl)}], t_real,
            dis_update))(jnp.asarray(pred))
        np.testing.assert_allclose(np.asarray(gj), ref_g, rtol=1e-4,
                                   atol=1e-6, err_msg=str((t_real,
                                                           dis_update)))


def test_kl_loss_grad_parity():
    """d KL / d (mu, logvar) vs `losses/kl.py:9-23`."""
    # import kl.py directly: the losses package __init__ pulls
    # torchvision (absent in this image) via perceptual.py
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'ref_kl', '/root/reference/imaginaire/losses/kl.py')
    ref_kl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_kl)
    GaussianKLLoss = ref_kl.GaussianKLLoss
    rng = np.random.default_rng(14)
    mu = rng.normal(size=(2, 16)).astype(np.float32)
    logvar = rng.normal(size=(2, 16)).astype(np.float32)
    mt, lt = _t(mu.copy()), _t(logvar.copy())
    mt.requires_grad_(True)
    lt.requires_grad_(True)
    GaussianKLLoss()(mt, lt).backward()

    gmu, glv = jax.grad(
        lambda m, lv: L.gaussian_kl_loss(m, lv), argnums=(0, 1))(
            jnp.asarray(mu), jnp.asarray(logvar))
    np.testing.assert_allclose(np.asarray(gmu), mt.grad.numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(glv), lt.grad.numpy(),
                               rtol=1e-5, atol=1e-7)


def test_volume_rendering_grad_parity():
    """d sum(weights * payload) / d sigma vs
    `mc_utils.volum_rendering_relu` (`mc_utils.py:154-161`)."""
    from imaginaire.model_utils.gancraft import mc_utils
    rng = np.random.default_rng(15)
    sigma = rng.normal(size=(2, 4, 4, 9, 1)).astype(np.float32)
    dists = rng.uniform(0.01, 0.5, (2, 4, 4, 9, 1)).astype(np.float32)
    payload = rng.normal(size=(2, 4, 4, 9, 1)).astype(np.float32)

    st = _t(sigma.copy())
    st.requires_grad_(True)
    wt = mc_utils.volum_rendering_relu(st, _t(dists), dim=-2)
    (wt * _t(payload)).sum().backward()

    gj = jax.grad(lambda s: jnp.sum(
        volume_rendering_relu(s, jnp.asarray(dists), axis=-2)
        * jnp.asarray(payload)))(jnp.asarray(sigma))
    np.testing.assert_allclose(np.asarray(gj), st.grad.numpy(),
                               rtol=1e-4, atol=1e-6)

"""Layer-library extension blocks: shapes + torch reference parity.

Parity cases run the reference's pure-torch layer classes on CPU
(`imaginaire/layers/{conv,activation_norm,nonlinearity}.py`) with
shared weights, following the reference's own allclose harness pattern
(`voxlib/positional_encoding.py:57-63`).
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scenedreamer_tpu.models import blocks_ext as bx

torch = pytest.importorskip('torch')
sys.path.insert(0, '/root/reference')


def _stub_cuda_third_party():
    for stub in ('upfirdn2d_cuda', 'bias_act_cuda'):
        if stub not in sys.modules:
            sys.modules[stub] = types.ModuleType(stub)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# shape / smoke coverage
# ---------------------------------------------------------------------------

def test_conv1d_conv3d_blocks():
    k = jax.random.PRNGKey(0)
    x1 = jnp.ones((2, 16, 4))
    m1 = bx.Conv1dBlock(8, activation_norm_type='instance')
    y1 = m1.apply(m1.init(k, x1), x1)
    assert y1.shape == (2, 16, 8)

    x3 = jnp.ones((2, 6, 6, 6, 4))
    m3 = bx.Conv3dBlock(8, stride=2)
    y3 = m3.apply(m3.init(k, x3), x3)
    assert y3.shape == (2, 3, 3, 3, 8)


def test_res1d_res3d_reslinear():
    k = jax.random.PRNGKey(1)
    x1 = jnp.ones((2, 16, 4))
    m = bx.Res1dBlock(8)
    assert m.apply(m.init(k, x1), x1).shape == (2, 16, 8)

    x3 = jnp.ones((1, 4, 4, 4, 4))
    m = bx.Res3dBlock(6)
    assert m.apply(m.init(k, x3), x3).shape == (1, 4, 4, 4, 6)

    xl = jnp.ones((3, 5))
    m = bx.ResLinearBlock(7)
    assert m.apply(m.init(k, xl), xl).shape == (3, 7)


def test_upres2d_block():
    k = jax.random.PRNGKey(2)
    x = jnp.ones((2, 8, 8, 4))
    for order, blur in (('CNACNA', False), ('NACNAC', True)):
        m = bx.UpRes2dBlock(6, order=order, blur=blur,
                            activation_norm_type='instance')
        y = m.apply(m.init(k, x), x)
        assert y.shape == (2, 16, 16, 6)
        assert np.isfinite(np.asarray(y)).all()


def test_deepres2d_block():
    k = jax.random.PRNGKey(3)
    x = jnp.ones((2, 8, 8, 8))
    m = bx.DeepRes2dBlock(8, stride=1)
    assert m.apply(m.init(k, x), x).shape == (2, 8, 8, 8)
    # downsample + channel growth via concat shortcut
    m = bx.DeepRes2dBlock(16, stride=2, blur=True)
    y = m.apply(m.init(k, x), x)
    assert y.shape == (2, 4, 4, 16)
    # channel shrink
    m = bx.DeepRes2dBlock(4, learn_shortcut=True)
    assert m.apply(m.init(k, x), x).shape == (2, 8, 8, 4)


def test_modulated_res2d_block():
    k = jax.random.PRNGKey(10)
    x = jnp.ones((2, 8, 8, 4))
    z = jnp.ones((2, 16))
    m = bx.ModulatedRes2dBlock(6)
    nk = jax.random.PRNGKey(11)
    p = m.init(k, x, z, noise_key=nk)
    # shortcut is a plain (unmodulated) conv: no style projection
    assert 'modulation' not in p['params']['conv_block_s']
    y = m.apply(p, x, z, noise_key=nk)
    assert y.shape == (2, 8, 8, 6)
    assert np.isfinite(np.asarray(y)).all()


def test_deepres_shortcut_has_no_activation():
    """Reference skip_nonlinearity defaults False
    (`residual_deep.py:131-156`): the concat shortcut is linear in x,
    so doubling a positive input doubles the shortcut output."""
    k = jax.random.PRNGKey(12)
    x = jnp.full((1, 4, 4, 8), -1.0)  # negative: leakyrelu would bend
    m = bx.DeepRes2dBlock(16, nonlinearity='relu',
                          activation_norm_type='none')
    p = m.init(k, x)
    # extract the shortcut contribution: out = xs_concat + h; compare
    # two amplitudes of a negative constant input through only the
    # shortcut conv params
    sp = {'params': {'conv': p['params']['conv_block_s']['conv']}}
    from scenedreamer_tpu.models.blocks import Conv2dBlock
    sconv = Conv2dBlock(8, kernel_size=1, nonlinearity='none',
                        order='C')
    y1 = sconv.apply(sp, x)
    y2 = sconv.apply(sp, 2.0 * x)
    np.testing.assert_allclose(np.asarray(y2),
                               2.0 * np.asarray(y1), rtol=1e-5)


def test_multiout_blocks():
    k = jax.random.PRNGKey(4)
    x = jnp.ones((2, 8, 8, 4))
    m = bx.MultiOutConv2dBlock(6, activation_norm_type='split_mean_std')
    y, aux = m.apply(m.init(k, x), x)
    assert y.shape == (2, 8, 8, 6) and aux.shape == (2, 1, 1, 12)

    m = bx.MultiOutRes2dBlock(6,
                              activation_norm_type='split_mean_std')
    y, a0, a1 = m.apply(m.init(k, x), x)
    assert y.shape == (2, 8, 8, 6)
    assert a0.shape == (2, 1, 1, 12) and a1.shape == (2, 1, 1, 12)


def test_partial_blocks_and_sequential():
    k = jax.random.PRNGKey(5)
    x = jnp.ones((1, 8, 8, 3))
    mask = jnp.zeros((1, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
    m = bx.PartialConv2dBlock(4)
    p = m.init(k, x, mask)
    y, m_out = m.apply(p, x, mask)
    assert y.shape == (1, 8, 8, 4) and m_out.shape == (1, 8, 8, 1)

    m = bx.PartialRes2dBlock(4)
    y, m_out = m.apply(m.init(k, x, mask), x, mask)
    assert y.shape == (1, 8, 8, 4)

    x3 = jnp.ones((1, 6, 6, 6, 2))
    mask3 = jnp.zeros((1, 6, 6, 6, 1)).at[:, 1:5, 1:5, 1:5].set(1.0)
    m = bx.PartialRes3dBlock(4)
    y, _ = m.apply(m.init(k, x3, mask3), x3, mask3)
    assert y.shape == (1, 6, 6, 6, 4)


def test_hyper_res2d_block():
    k = jax.random.PRNGKey(6)
    x = jnp.ones((2, 8, 8, 4))
    w0 = jnp.ones((2, 3, 3, 4, 6)) * 0.01
    w1 = jnp.ones((2, 3, 3, 6, 6)) * 0.01
    m = bx.HyperRes2dBlock(6)
    p = m.init(k, x, ((w0, None), (w1, None), None))
    y = m.apply(p, x, ((w0, None), (w1, None), None))
    assert y.shape == (2, 8, 8, 6)


def test_hyper_spade_norm():
    k = jax.random.PRNGKey(7)
    x = jnp.ones((2, 8, 8, 4))
    cond0 = jnp.ones((2, 16, 16, 5))
    cond1 = jnp.ones((2, 4, 4, 3))
    # hyper head weights: [N, kh, kw, cin, 2*features]
    w = jnp.full((2, 3, 3, 5, 8), 0.01)
    m = bx.HyperSpatiallyAdaptiveNorm(4, cond_dims=(5, 3))
    p = m.init(k, x, (cond0, cond1), norm_weights=(w, None))
    y = m.apply(p, x, (cond0, cond1), norm_weights=(w, None))
    assert y.shape == x.shape
    # masked pair + skipped None entry
    mask = jnp.ones((2, 16, 16, 1))
    y2 = m.apply(p, x, ((cond0, mask), None), norm_weights=(w, None))
    assert y2.shape == x.shape


def test_embeddings():
    k = jax.random.PRNGKey(8)
    ids = jnp.array([[1, 2], [3, 0]], jnp.int32)
    m = bx.EmbeddingBlock(5, 6, nonlinearity='relu')
    assert m.apply(m.init(k, ids), ids).shape == (2, 2, 6)

    lab = jnp.zeros((1, 4, 4, 1), jnp.int32)
    m = bx.Embedding2dBlock(5, 6)
    assert m.apply(m.init(k, lab), lab).shape == (1, 4, 4, 6)


def test_norm_zoo_shapes():
    k = jax.random.PRNGKey(9)
    x = jax.random.normal(k, (2, 6, 6, 4))
    for mod in (bx.ScaleNorm(), bx.PixelNorm(), bx.PixelLayerNorm(),
                bx.LayerNorm2d(4), bx.LayerNorm2d(4, channel_only=True)):
        y = mod.apply(mod.init(k, x), x)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_get_nonlinearity_types():
    x = jnp.linspace(-2, 2, 8)
    for t in ('relu', 'leakyrelu', 'scaled_leakyrelu', 'tanh',
              'sigmoid', 'softmax', 'fused_lrelu'):
        fn = bx.get_nonlinearity(t)
        assert np.isfinite(np.asarray(fn(x))).all()
    assert bx.get_nonlinearity('none') is None
    with pytest.raises(ValueError):
        bx.get_nonlinearity('nope')


# ---------------------------------------------------------------------------
# torch reference parity
# ---------------------------------------------------------------------------

def test_modulated_conv2d_parity():
    """vs `imaginaire/layers/conv.py:278-378` ModulatedConv2d."""
    _stub_cuda_third_party()
    from imaginaire.layers.conv import ModulatedConv2d as RefMod
    rng = np.random.default_rng(0)
    n, cin, cout, k, hw = 2, 5, 7, 3, 8
    x = rng.normal(size=(n, hw, hw, cin)).astype(np.float32)
    style = rng.normal(size=(n, cin)).astype(np.float32) + 1.0

    for demod, stride in ((True, 1), (False, 1), (True, 2),
                          (True, 0.5)):
        ref = RefMod(cin, cout, k, stride, k // 2, 1, 1, True, 'zeros',
                     demodulate=demod)
        ours = bx.ModulatedConv2d(cout, k, stride=stride,
                                  demodulate=demod)
        w = ref.weight.detach().numpy()          # [out, in, kh, kw]
        b = ref.bias.detach().numpy()
        params = {'params': {
            'weight': jnp.asarray(w.transpose(2, 3, 1, 0)),
            'bias': jnp.asarray(b)}}
        got = np.asarray(ours.apply(params, jnp.asarray(x),
                                    jnp.asarray(style)))
        with torch.no_grad():
            want = ref(_t(_nchw(x)).contiguous(), _t(style)).numpy()
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)


def test_partial_conv3d_parity():
    """vs `imaginaire/layers/conv.py:1307-1366` PartialConv3d."""
    _stub_cuda_third_party()
    from imaginaire.layers.conv import PartialConv3d as RefP3
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 6, 6, 3)).astype(np.float32)
    mask = (rng.random((1, 6, 6, 6, 1)) > 0.4).astype(np.float32)

    # the reference ctor hard-codes `.to('cuda')` on its mask kernel
    # (conv.py:1328); route that to CPU for the parity check.
    orig_to = torch.Tensor.to

    def _cpu_to(self, *args, **kwargs):
        if args and args[0] == 'cuda':
            return self
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = _cpu_to
    try:
        ref = RefP3(3, 4, 3, padding=1)
    finally:
        torch.Tensor.to = orig_to
    ours = bx.PartialConv3d(4, 3)
    w = ref.weight.detach().numpy()              # [out, in, kd, kh, kw]
    b = ref.bias.detach().numpy()
    params = {'params': {'conv': {
        'kernel': jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
        'bias': jnp.asarray(b)}}}
    got, got_mask = ours.apply(params, jnp.asarray(x),
                               jnp.asarray(mask))
    with torch.no_grad():
        want, want_mask = ref(
            _t(np.asarray(x).transpose(0, 4, 1, 2, 3)),
            mask_in=_t(np.asarray(mask).transpose(0, 4, 1, 2, 3)))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 2, 3, 4, 1),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_mask)[..., 0], want_mask.numpy()[:, 0],
        atol=1e-6)


def test_layernorm2d_parity():
    """vs `activation_norm.py:425-472` LayerNorm2d."""
    from imaginaire.layers.activation_norm import LayerNorm2d as RefLN
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 5, 6, 6)).astype(np.float32)
    for channel_only in (False, True):
        ref = RefLN(5, channel_only=channel_only)
        with torch.no_grad():
            ref.gamma.mul_(1.3).add_(0.1)
            ref.beta.add_(0.2)
            want = ref(_t(x)).numpy()
        ours = bx.LayerNorm2d(5, channel_only=channel_only)
        params = {'params': {
            'gamma': jnp.asarray(ref.gamma.detach().numpy()),
            'beta': jnp.asarray(ref.beta.detach().numpy())}}
        got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, rtol=1e-4, atol=1e-5)


def test_pixelnorm_scalenorm_parity():
    """vs `activation_norm.py:503-553` PixelNorm / ScaleNorm."""
    from imaginaire.layers.activation_norm import (PixelNorm as RefPN,
                                                   ScaleNorm as RefSN)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = RefPN()(_t(x)).numpy()
    ours = bx.PixelNorm()
    got = ours.apply({}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want, rtol=1e-5, atol=1e-6)

    ref_sn = RefSN(dim=-1)
    with torch.no_grad():
        want = ref_sn(_t(x)).numpy()
    ours = bx.ScaleNorm(axis=-1)
    p = {'params': {'scale': jnp.ones(())}}
    got = ours.apply(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-6)


def test_splitmeanstd_parity():
    """vs `activation_norm.py:508-522` SplitMeanStd."""
    from imaginaire.layers.activation_norm import SplitMeanStd as RefS
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 5, 5)).astype(np.float32)
    with torch.no_grad():
        want_x, want_aux = RefS(3)(_t(x))
    ours = bx.SplitMeanStd()
    got_x, got_aux = ours.apply({}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_x).transpose(0, 3, 1, 2),
                               want_x.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_aux).transpose(0, 3, 1, 2),
                               want_aux.numpy(), rtol=1e-4, atol=1e-5)


def test_scaled_leakyrelu_parity():
    """vs `nonlinearity.py:12-22` ScaledLeakyReLU."""
    from imaginaire.layers.nonlinearity import ScaledLeakyReLU as RefS
    x = np.linspace(-3, 3, 17, dtype=np.float32)
    with torch.no_grad():
        want = RefS()(_t(x)).numpy()
    got = np.asarray(bx.scaled_leaky_relu(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_embedding2d_parity():
    """vs `conv.py:1370-1380` Embedding2d."""
    _stub_cuda_third_party()
    from imaginaire.layers.conv import Embedding2d as RefE
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 6, (2, 1, 4, 4))
    ref = RefE(6, 7)
    with torch.no_grad():
        want = ref(_t(ids)).numpy()
    ours = bx.Embedding2d(6, 7)
    params = {'params': {'embed': {'embedding': jnp.asarray(
        ref.weight.detach().numpy())}}}
    got = ours.apply(params, jnp.asarray(ids.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want, rtol=1e-5, atol=1e-6)

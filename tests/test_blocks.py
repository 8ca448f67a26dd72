"""Layer library: upfirdn2d/Blur, bias_act, Conv/Linear/Res blocks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scenedreamer_tpu.models.blocks import (bias_act, Blur, BlurDownsample,
                                            BlurUpsample, Conv2dBlock,
                                            LinearBlock, Res2dBlock,
                                            Res2dBlockDown, setup_filter,
                                            upfirdn2d)


def test_bias_act_semantics():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    b = jnp.asarray([1.0])
    y = bias_act(x[:, None], b, act='lrelu')
    exp = jax.nn.leaky_relu(x + 1.0, 0.2) * np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(y[:, 0]), np.asarray(exp),
                               rtol=1e-6)
    y2 = bias_act(x, act='linear', clamp=1.0)
    assert float(y2.max()) == 1.0


def test_upfirdn_identity_with_delta():
    """A delta filter must reproduce the input exactly."""
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, 8, 8, 3)).astype(np.float32))
    f = np.zeros((1, 1), np.float32)
    f[0, 0] = 1.0
    y = upfirdn2d(x, f)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_blur_preserves_shape_and_mean():
    x = jnp.ones((1, 16, 16, 2))
    y = Blur().apply({}, x)
    assert y.shape == x.shape
    # interior of a constant image stays constant under a normalized FIR
    np.testing.assert_allclose(np.asarray(y[0, 4:-4, 4:-4]), 1.0,
                               rtol=1e-6)


def test_blur_up_down_shapes():
    x = jnp.ones((1, 16, 16, 2))
    up = BlurUpsample().apply({}, x)
    assert up.shape == (1, 32, 32, 2)
    down = BlurDownsample().apply({}, x)
    assert down.shape == (1, 8, 8, 2)


@pytest.mark.parametrize('order', ['CNA', 'NAC', 'ANC', 'CAN'])
def test_conv2dblock_orders(order):
    x = jnp.ones((1, 8, 8, 4))
    blk = Conv2dBlock(6, order=order, activation_norm_type='instance')
    vars_ = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(vars_, x)
    assert y.shape == (1, 8, 8, 6)
    assert np.isfinite(np.asarray(y)).all()


def test_conv2dblock_spectral():
    x = jnp.ones((2, 8, 8, 4))
    blk = Conv2dBlock(6, weight_norm_type='spectral')
    vars_ = blk.init(jax.random.PRNGKey(0), x)
    assert 'spectral_stats' in vars_
    y, mut = blk.apply(vars_, x, update_stats=True,
                       mutable=['spectral_stats'])
    assert y.shape == (2, 8, 8, 6)


def test_linear_and_res_blocks():
    x = jnp.ones((2, 10))
    lb = LinearBlock(5, nonlinearity='relu', order='CA')
    y = lb.apply(lb.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (2, 5)

    img = jnp.ones((1, 8, 8, 4))
    rb = Res2dBlock(8, order='NACNAC', activation_norm_type='instance')
    vars_ = rb.init(jax.random.PRNGKey(0), img)
    out = rb.apply(vars_, img)
    assert out.shape == (1, 8, 8, 8)
    assert 'conv_block_s' in vars_['params']   # learned shortcut

    rd = Res2dBlockDown(8)
    vars_ = rd.init(jax.random.PRNGKey(0), img)
    out = rd.apply(vars_, img)
    assert out.shape == (1, 4, 4, 8)


def test_setup_filter_normalized():
    f = setup_filter()
    assert f.shape == (4, 4)
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-6)


def test_apply_noise_equalized_nonlocal():
    from scenedreamer_tpu.models.blocks import (ApplyNoise,
                                                EqualizedDense,
                                                NonLocal2dBlock)
    x = jnp.ones((2, 8, 8, 4))
    an = ApplyNoise()
    v = an.init({'params': jax.random.PRNGKey(0),
                 'noise': jax.random.PRNGKey(1)}, x)
    # zero-init scale -> identity at init
    y = an.apply(v, x, rngs={'noise': jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))

    d = EqualizedDense(6, lr_mul=0.5)
    vd = d.init(jax.random.PRNGKey(0), jnp.ones((3, 4)))
    out = d.apply(vd, jnp.ones((3, 4)))
    assert out.shape == (3, 6) and np.isfinite(np.asarray(out)).all()

    nl = NonLocal2dBlock()
    vn = nl.init(jax.random.PRNGKey(0), x)
    # gamma zero-init -> identity at init
    np.testing.assert_allclose(np.asarray(nl.apply(vn, x)),
                               np.asarray(x), atol=1e-6)


def test_vit2dblock_variants():
    """ViT2dBlock (`layers/vit.py:14-170`): stride-2 blur-downsample,
    stride-0.5 transposed upsample, noise slot, clamp + output scale."""
    from scenedreamer_tpu.models.blocks import ViT2dBlock
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 8, 8, 4)).astype(np.float32))

    down = ViT2dBlock(6, stride=2, blur=True, apply_noise=True,
                      activation_norm_type='instance')
    v = down.init({'params': jax.random.PRNGKey(0),
                   'noise': jax.random.PRNGKey(1)}, x)
    y = down.apply(v, x, rngs={'noise': jax.random.PRNGKey(2)})
    assert y.shape == (2, 4, 4, 6)
    assert np.isfinite(np.asarray(y)).all()

    up = ViT2dBlock(3, stride=0.5, blur=True)
    vu = up.init(jax.random.PRNGKey(0), x)
    yu = up.apply(vu, x)
    # torch ConvTranspose2d(stride=2, padding=0) size: 2*in - 2 + k
    # (reference vit.py:157-161 asserts padding == 0)
    assert yu.shape == (2, 17, 17, 3)

    # max-clamp applies to the conv output, scale is learnable
    clamped = ViT2dBlock(3, clamp=0.0, output_scale=2.0,
                         nonlinearity='none')
    vc = clamped.init(jax.random.PRNGKey(0), x)
    yc = clamped.apply(vc, x)
    assert float(np.asarray(yc).max()) <= 0.0
    assert 'output_scale' in vc['params']['conv'] or \
        'output_scale' in vc['params']


def test_conv2dblock_weight_norm():
    """'weight' norm type (`weight_norm.py:246`): w = g*v/||v|| with
    g initialized to ||v|| — identity reparameterization at init,
    exactly torch nn.utils.weight_norm semantics."""
    import jax, numpy as np
    import jax.numpy as jnp
    from scenedreamer_tpu.models.blocks import Conv2dBlock
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, 8, 8, 3)).astype(np.float32))
    m = Conv2dBlock(4, weight_norm_type='weight', nonlinearity='none')
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(y)).all()

    # identity at init: g=||v|| cancels the normalization, so the
    # output equals a plain conv with kernel v
    v = p['params']['wn_v']
    g = p['params']['wn_g']
    np.testing.assert_allclose(
        np.asarray(g),
        np.sqrt(np.sum(np.asarray(v) ** 2, axis=(0, 1, 2))), rtol=1e-6)
    import jax.lax as lax
    y_plain = lax.conv_general_dilated(
        x, v, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_plain),
                               rtol=1e-4, atol=1e-5)

    import pytest
    m_bad = Conv2dBlock(4, weight_norm_type='nope')
    with pytest.raises(ValueError):
        m_bad.init(jax.random.PRNGKey(0), x)


def test_style_encoder_logvar_clamp():
    """logvar_clamp bounds fc_var's output (runaway guard, r5): inert
    for healthy magnitudes, active beyond the bound, and the clamp
    kills the outward gradient."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenedreamer_tpu.models.layers import StyleEncoder

    enc = StyleEncoder(style_dims=8, num_filters=4, logvar_clamp=4.0)
    x = jnp.ones((1, 64, 64, 3))
    v = enc.init({'params': jax.random.PRNGKey(0),
                  'style': jax.random.PRNGKey(1)}, x)
    mu, logvar, z = enc.apply(v, x, rngs={'style': jax.random.PRNGKey(2)})
    assert float(logvar.max()) <= 4.0 and float(logvar.min()) >= -10.0
    # blow up fc_var's bias -> clamp engages, grads outward are zero
    big = jax.tree_util.tree_map(lambda a: a, v)
    big['params']['fc_var']['bias'] = jnp.full_like(
        big['params']['fc_var']['bias'], 1e4)

    def kl(params):
        mu, lv, _ = enc.apply(params, x,
                              rngs={'style': jax.random.PRNGKey(2)})
        return jnp.sum(-0.5 * (1 + lv - mu ** 2 - jnp.exp(lv)))

    val = float(kl(big))
    assert np.isfinite(val) and val < 1e4   # e^4-bounded, not e^1e4
    g = jax.grad(kl)(big)
    assert float(jnp.abs(g['params']['fc_var']['bias']).max()) == 0.0

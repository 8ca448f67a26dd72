"""SPADE pseudo-GT oracle tests (reduced-width config for speed)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scenedreamer_tpu.models.spade import (SPADEGenerator, SPADEWrapper,
                                           SPADEStyleEncoder)


def _label(b, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return jax.nn.one_hot(rng.integers(0, c, (b, h, w)), c,
                          dtype=jnp.float32)


@pytest.mark.parametrize('out_size,in_hw', [(256, 64), (512, 128)])
def test_spade_generator_shapes(out_size, in_hw):
    model = SPADEGenerator(num_labels=8, out_size=out_size, num_filters=4,
                           style_dims=16)
    seg = _label(1, in_hw, in_hw, 8)
    z = jnp.zeros((1, 16))
    params = model.init(jax.random.PRNGKey(0), seg, z)
    out = model.apply(params, seg, z)
    assert out.shape == (1, in_hw, in_hw, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_spade_style_conditioning_changes_output():
    model = SPADEGenerator(num_labels=8, out_size=256, num_filters=4,
                           style_dims=16)
    seg = _label(1, 64, 64, 8)
    params = model.init(jax.random.PRNGKey(0), seg, jnp.zeros((1, 16)))
    o1 = model.apply(params, seg, jnp.zeros((1, 16)))
    o2 = model.apply(params, seg, jnp.ones((1, 16)) * 20.0)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 0


def test_spade_wrapper_paths():
    model = SPADEWrapper(num_labels=8, out_size=256, num_filters=4,
                         style_dims=16)
    seg = _label(2, 64, 64, 8)
    # init through the encoder path so style_encoder params exist
    data = {'label': seg, 'images': jnp.zeros((2, 64, 64, 3))}
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'style': jax.random.PRNGKey(1)}, data)
    data = {'label': seg}
    # random style
    out = model.apply(variables, data, random_style=True,
                      rngs={'style': jax.random.PRNGKey(2)})
    assert out['fake_images'].shape == (2, 64, 64, 3)
    assert out['mu'] is None
    # explicit z
    out_z = model.apply(variables, {'label': seg,
                                    'z': jnp.zeros((2, 16))})
    assert np.isfinite(np.asarray(out_z['fake_images'])).all()
    # encoded style (VAE path)
    imgs = jnp.zeros((2, 64, 64, 3))
    out_e = model.apply(variables, {'label': seg, 'images': imgs},
                        rngs={'style': jax.random.PRNGKey(3)})
    assert out_e['mu'].shape == (2, 16)
    assert out_e['logvar'].shape == (2, 16)


def test_spade_style_encoder_resizes():
    enc = SPADEStyleEncoder(style_dims=16, num_filters=4)
    x = jnp.zeros((1, 100, 180, 3))
    params = enc.init({'params': jax.random.PRNGKey(0),
                       'style': jax.random.PRNGKey(1)}, x)
    mu, logvar, z = enc.apply(params, x,
                              rngs={'style': jax.random.PRNGKey(2)})
    assert mu.shape == (1, 16) and z.shape == (1, 16)


def test_dual_adaptive_norm():
    """DualAdaptiveNorm (`activation_norm.py:266-331`): mixed spatial +
    vector conditions, None skipping, bias_only mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenedreamer_tpu.models.spade import DualAdaptiveNorm
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 8, 8, 6)).astype(np.float32))
    seg = jnp.ones((2, 4, 4, 3))   # spatial cond at a different HW
    z = jnp.ones((2, 5))
    m = DualAdaptiveNorm(6, is_spatial=(True, False))
    v = m.init(jax.random.PRNGKey(0), x, seg, z)
    y = m.apply(v, x, seg, z)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
    # None conditions are skipped -> pure instance norm output
    y_none = m.apply(v, x, None, None)
    assert np.isfinite(np.asarray(y_none)).all()
    mb = DualAdaptiveNorm(6, is_spatial=(False,), bias_only=True)
    vb = mb.init(jax.random.PRNGKey(0), x, z)
    yb = mb.apply(vb, x, z)
    assert yb.shape == x.shape

"""Standard GAN losses, multi-scale D, SPADE train losses."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scenedreamer_tpu.models.spade import SPADEWrapper
from scenedreamer_tpu.train import gan_losses as G


def test_gan_modes_directions():
    good = jnp.ones((2, 4, 4, 1)) * 3.0     # D says real
    bad = -good
    for mode in ('hinge', 'least_square', 'non_saturated',
                 'wasserstein'):
        # D update: real samples scored high => low loss
        l_hi = G.gan_loss(good, True, mode, dis_update=True)
        l_lo = G.gan_loss(bad, True, mode, dis_update=True)
        assert float(l_hi) < float(l_lo), mode
        # G update targets real
        g_hi = G.gan_loss(good, True, mode, dis_update=False)
        g_lo = G.gan_loss(bad, True, mode, dis_update=False)
        assert float(g_hi) < float(g_lo), mode


def test_gan_loss_topk():
    x = jnp.asarray([[10.0, -10.0, 10.0, 10.0]])
    full = G.gan_loss(x, True, 'hinge', dis_update=False)
    topk = G.gan_loss(x, True, 'hinge', dis_update=False,
                      topk_frac=0.5)
    # top-k keeps only the best-scored patches -> lower generator loss
    assert float(topk) < float(full)


def test_weighted_mse_and_infonce():
    x = jnp.ones((2, 3))
    y = jnp.zeros((2, 3))
    w = jnp.asarray([[1.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    assert float(G.weighted_mse_loss(x, y, w)) == pytest.approx(0.5)
    f = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)),
                    jnp.float32)
    self_nce = G.info_nce_loss(f, f)
    cross = G.info_nce_loss(f, jnp.roll(f, 1, axis=0))
    assert float(self_nce) < float(cross)


def test_multiscale_discriminator_shapes():
    d = G.MultiScaleDiscriminator(num_discriminators=2, num_filters=4,
                                  num_layers=3)
    img = jnp.zeros((1, 64, 64, 3))
    lbl = jnp.zeros((1, 64, 64, 8))
    vars_ = d.init(jax.random.PRNGKey(0), img, lbl)
    outs, feats = d.apply(vars_, img, lbl)
    assert len(outs) == 2 and len(feats) == 2
    assert outs[0].shape[1] > outs[1].shape[1]     # pyramid
    assert len(feats[0]) == 3


def test_spade_training_step_end_to_end():
    """One jitted G+D SPADE update with all losses."""
    import optax
    gen = SPADEWrapper(num_labels=8, out_size=256, num_filters=4,
                       style_dims=16)
    dis = G.MultiScaleDiscriminator(num_discriminators=2, num_filters=4,
                                    num_layers=3)
    rng = np.random.default_rng(0)
    lbl = jax.nn.one_hot(rng.integers(0, 8, (2, 64, 64)), 8,
                         dtype=jnp.float32)
    imgs = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3))
                       .astype(np.float32))
    batch = {'label': lbl, 'images': imgs}
    g_vars = gen.init({'params': jax.random.PRNGKey(0),
                       'style': jax.random.PRNGKey(1)}, batch)
    d_vars = dis.init(jax.random.PRNGKey(2), imgs, lbl)
    tx = optax.adam(1e-4)
    g_opt = tx.init(g_vars['params'])
    d_opt = tx.init(d_vars['params'])

    def dis_apply_factory(d_params):
        def dis_apply(images, label):
            return dis.apply(
                {'params': d_params,
                 'spectral_stats': d_vars.get('spectral_stats', {})},
                images, label)
        return dis_apply

    @jax.jit
    def train_step(g_params, d_params, g_opt, d_opt, key):
        g_variables = {'params': g_params,
                       'batch_stats': g_vars.get('batch_stats', {})}

        def d_loss(dp):
            out = gen.apply(g_variables, batch, rngs={'style': key})
            total, m = G.spade_dis_loss(dis_apply_factory(dp),
                                        out['fake_images'], batch)
            return total, m
        (dl, dm), dg = jax.value_and_grad(d_loss, has_aux=True)(d_params)
        du, d_opt = tx.update(dg, d_opt, d_params)
        d_params = optax.apply_updates(d_params, du)

        def g_loss(gp):
            out = gen.apply({'params': gp,
                             'batch_stats': g_vars.get('batch_stats',
                                                       {})},
                            batch, rngs={'style': key})
            total, m = G.spade_gen_loss(dis_apply_factory(d_params),
                                        out, batch)
            return total, m
        (gl, gm), gg = jax.value_and_grad(g_loss, has_aux=True)(g_params)
        gu, g_opt = tx.update(gg, g_opt, g_params)
        g_params = optax.apply_updates(g_params, gu)
        return g_params, d_params, g_opt, d_opt, {**dm, **gm}

    gp, dp, g_opt, d_opt, metrics = train_step(
        g_vars['params'], d_vars['params'], g_opt, d_opt,
        jax.random.PRNGKey(3))
    for k in ('dis/total', 'gen/total', 'gen/gan',
              'gen/feature_matching', 'gen/kl'):
        assert np.isfinite(float(metrics[k])), k
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a)
                                  - np.asarray(b)).max()),
        g_vars['params'], gp)
    assert max(jax.tree_util.tree_leaves(moved)) > 0

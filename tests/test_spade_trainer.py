"""SPADE oracle training (`configs/landscape1m.yaml` loop): trainer
step, EMA, trained->frozen layout conversion, CLI smoke."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scenedreamer_tpu.models.spade import SPADEWrapper
from scenedreamer_tpu.train import gan_losses as G
from scenedreamer_tpu.train.spade_trainer import SpadeTrainer
from scenedreamer_tpu.train.trainer import TrainerConfig
from scenedreamer_tpu.utils.convert import spade_frozen_from_trained

GEN_KW = dict(num_labels=8, out_size=256, num_filters=4, style_dims=16,
              spade_filters=4, style_enc_filters=4)


def _batch(rng, b=2, hw=64, labels=8):
    lbl = jax.nn.one_hot(rng.integers(0, labels, (b, hw, hw)), labels,
                         dtype=jnp.float32)
    imgs = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3))
                       .astype(np.float32))
    return {'label': lbl, 'images': imgs}


def _trainer(**kw):
    dis = G.MultiScaleDiscriminator(num_discriminators=2, num_filters=4,
                                    num_layers=3)
    defaults = dict(cfg=TrainerConfig(ema_beta=0.9999), ema_start=1,
                    loss_weights={'gan': 1.0, 'feature_matching': 10.0,
                                  'kl': 0.05})
    defaults.update(kw)
    return SpadeTrainer(GEN_KW, dis, **defaults)


def test_spade_trainer_step_updates_everything():
    """One SpadeTrainer step: finite losses, params AND batch-norm
    running stats AND EMA move (`landscape1m.yaml:8-24`)."""
    tr = _trainer()
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    stats0 = jax.tree_util.tree_map(np.asarray, state.g_stats)
    params0 = jax.tree_util.tree_map(np.asarray, state.g_params)
    for i in range(2):
        state, m = tr.train_step(state, batch, jax.random.PRNGKey(i + 1))
    assert all(np.isfinite(float(v)) for v in m.values())

    def max_delta(a, b):
        return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x, y: float(np.abs(np.asarray(x) - y).max()), a, b)))

    assert max_delta(state.g_params, params0) > 0
    assert max_delta(state.g_stats, stats0) > 0       # BN stats updated
    # EMA started (step >= ema_start) and lags params
    assert max_delta(state.g_ema, state.g_params) > 0
    out = tr.generate(state, {'label': batch['label']},
                      jax.random.PRNGKey(9))
    assert np.isfinite(np.asarray(out['fake_images'])).all()


def test_spade_frozen_from_trained_exact():
    """Trained (flax BatchNorm) variables folded into the frozen-oracle
    layout reproduce the eval-mode forward exactly — the freeze step
    between `cli.train_spade` and `cli.train --spade-checkpoint`
    (reference `trainers/gancraft.py:30-42`)."""
    tr = _trainer()
    rng = np.random.default_rng(1)
    batch = _batch(rng)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    state, _ = tr.train_step(state, batch, jax.random.PRNGKey(1))

    frozen_vars = spade_frozen_from_trained(
        jax.device_get(state.g_params), jax.device_get(state.g_stats))
    frozen = SPADEWrapper(**GEN_KW)    # bn_mode='frozen'
    z = jax.random.normal(jax.random.PRNGKey(5), (2, 16))
    out_f = frozen.apply(frozen_vars, {'label': batch['label'], 'z': z})
    out_e = tr.gen_eval.apply(
        {'params': state.g_params, 'batch_stats': state.g_stats},
        {'label': batch['label'], 'z': z})
    np.testing.assert_allclose(np.asarray(out_f['fake_images']),
                               np.asarray(out_e['fake_images']),
                               rtol=1e-6, atol=1e-6)


def test_train_spade_cli_smoke(tmp_path):
    """`cli.train_spade` end-to-end: tiny run trains, checkpoints, and
    the checkpoint is consumable by the frozen-oracle loader."""
    import cv2
    from scenedreamer_tpu.cli import train_spade
    root = tmp_path / 'data'
    (root / 'images').mkdir(parents=True)
    (root / 'seg_maps').mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        cv2.imwrite(str(root / 'images' / f'{i}.jpg'),
                    rng.integers(0, 255, (40, 40, 3), np.uint8))
        cv2.imwrite(str(root / 'seg_maps' / f'{i}.png'),
                    rng.integers(0, 12, (40, 40), np.uint8))
    train_spade.main([
        '--data-root', str(root), '--logdir', str(tmp_path / 'logs'),
        '--batch-size', '1', '--image-size', '32', '--out-size', '256',
        '--num-filters', '2', '--dis-filters', '2', '--style-dims', '8',
        '--spade-filters', '2', '--no-perceptual', '--max-iter', '1'])
    import glob
    ptr = glob.glob(str(tmp_path / 'logs' / '*' / 'checkpoints'
                        / 'latest_checkpoint.txt'))
    assert len(ptr) == 1
    import orbax.checkpoint as ocp
    import os
    ckpt_dir = os.path.dirname(ptr[0])
    with open(ptr[0]) as f:
        path = os.path.join(ckpt_dir, f.read().strip())
    restored = ocp.PyTreeCheckpointer().restore(path)
    assert 'g_params' in restored and 'g_stats' in restored
    fv = spade_frozen_from_trained(restored['g_params'],
                                   restored['g_stats'])
    assert 'params' in fv and 'batch_stats' in fv

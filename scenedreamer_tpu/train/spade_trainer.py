"""SPADE/GauGAN oracle trainer — the `configs/landscape1m.yaml` loop.

Capability parity with training the pseudo-GT oracle in the reference
(`train.py` + `imaginaire/trainers/spade.py` upstream; the shipped
snapshot carries the config + losses): hinge GAN against a multi-scale
patch discriminator, VGG19 perceptual, feature matching, VAE style KL,
EMA model average (`landscape1m.yaml:8-24`).

TPU-native: one jitted D+G update (optimizers inside), batch-norm
statistics in `batch_stats` updated through the G step (`bn_mode=
'train'`; under a GSPMD 'data'-sharded batch the stat reduction is
global = the reference's sync_batch), skip-on-nonfinite grads, EMA as
an in-jit lerp. Reuses the SceneDreamer trainer's clip/skip/update
helpers (`train/trainer.py`).
"""
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from scenedreamer_tpu.models.spade import SPADEWrapper
from scenedreamer_tpu.train import gan_losses as G
from scenedreamer_tpu.train.trainer import (_apply_update,
                                            _clip_and_validate,
                                            TrainerConfig)


@struct.dataclass
class SpadeTrainState:
    step: jnp.ndarray
    g_params: Any
    g_stats: Any               # batch-norm running statistics
    g_opt: Any
    d_params: Any
    d_stats: Any               # spectral-norm power-iteration vectors
    d_opt: Any
    g_ema: Optional[Any] = None


class SpadeTrainer:
    """Jitted train step for the SPADE oracle.

    gen_kwargs: SPADEWrapper fields (without bn_mode). The parameter
    tree is applied through a bn_mode='train' module (batch statistics)
    in BOTH updates — mirroring the reference's net_G train-mode
    forward: under no_grad for the D step (stat updates discarded) and
    under autograd for the G step (stat updates adopted)
    (`trainers/base.py:753-816,676-744`). bn_mode='eval' (running
    stats) is used only by `generate`.
    """

    def __init__(self, gen_kwargs, discriminator,
                 cfg: TrainerConfig = TrainerConfig(),
                 perceptual=None, g_tx=None, d_tx=None,
                 gan_mode='hinge',
                 loss_weights=G.SPADE_LOSS_WEIGHTS,
                 ema_start=1000):
        self.gen_train = SPADEWrapper(**gen_kwargs, bn_mode='train')
        self.gen_eval = SPADEWrapper(**gen_kwargs, bn_mode='eval')
        self.dis = discriminator
        self.cfg = cfg
        self.perceptual = perceptual
        self.gan_mode = gan_mode
        self.loss_weights = dict(loss_weights)
        self.ema_start = ema_start
        self.g_tx = g_tx if g_tx is not None else optax.adam(
            1e-4, b1=0.0, b2=0.999)
        self.d_tx = d_tx if d_tx is not None else optax.adam(
            4e-4, b1=0.0, b2=0.999)
        self._step_j = None

    # ------------------------------------------------------------------
    def init_state(self, key, sample_batch):
        kg, kd, ks = jax.random.split(key, 3)
        g_vars = self.gen_train.init({'params': kg, 'style': ks},
                                     sample_batch)
        d_vars = self.dis.init(kd, sample_batch['images'],
                               sample_batch['label'])
        g_params = g_vars['params']
        state = SpadeTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_stats=g_vars.get('batch_stats', {}),
            g_opt=self.g_tx.init(g_params),
            d_params=d_vars['params'],
            d_stats=d_vars.get('spectral_stats', {}),
            d_opt=self.d_tx.init(d_vars['params']),
            g_ema=(jax.tree_util.tree_map(jnp.copy, g_params)
                   if self.cfg.ema_beta > 0 else None))
        return state

    # ------------------------------------------------------------------
    def _dis_apply(self, d_params, d_stats, images, label,
                   update_stats=False):
        variables = {'params': d_params, 'spectral_stats': d_stats}
        if update_stats:
            (out, feat), mut = self.dis.apply(
                variables, images, label, update_stats=True,
                mutable=['spectral_stats'])
            return out, feat, mut['spectral_stats']
        out, feat = self.dis.apply(variables, images, label)
        return out, feat, d_stats

    def _train_step(self, state, batch, key):
        cfg = self.cfg
        kd, kg = jax.random.split(key)

        # ---- D update (`trainers/base.py:753-816`): G in train mode
        # (batch statistics, like the reference's no_grad train-mode
        # forward); the stat updates are discarded — only the G step
        # adopts them. Fake detached by spade_dis_loss's stop_gradient.
        g_out, _ = self.gen_train.apply(
            {'params': state.g_params, 'batch_stats': state.g_stats},
            batch, rngs={'style': kd}, mutable=['batch_stats'])

        def d_loss(dp):
            box = {}

            def dis_apply(images, label):
                out, feat, _ = self._dis_apply(dp, state.d_stats,
                                               images, label)
                return out, feat

            def dis_apply_real(images, label):
                # the real forward also advances the spectral-norm
                # power iteration (one D forward, no extra pass)
                out, feat, ns = self._dis_apply(dp, state.d_stats,
                                                images, label,
                                                update_stats=True)
                box['stats'] = ns
                return out, feat

            total, m = G.spade_dis_loss(
                dis_apply, g_out['fake_images'], batch,
                weights=self.loss_weights, gan_mode=self.gan_mode,
                dis_apply_real=dis_apply_real)
            return total, (m, box['stats'])

        (_, (dm, new_d_stats)), dg = jax.value_and_grad(
            d_loss, has_aux=True)(state.d_params)
        dg, d_ok, d_gnorm = _clip_and_validate(dg, cfg)
        d_params, d_opt = _apply_update(state.d_params, state.d_opt, dg,
                                        self.d_tx, d_ok)

        # ---- G update (`trainers/base.py:676-744`): train-mode BN,
        # batch_stats updated through the loss forward
        def g_loss(gp):
            out, mut = self.gen_train.apply(
                {'params': gp, 'batch_stats': state.g_stats}, batch,
                rngs={'style': kg}, mutable=['batch_stats'])

            def dis_apply(images, label):
                o, f, _ = self._dis_apply(d_params, new_d_stats,
                                          images, label)
                return o, f
            total, m = G.spade_gen_loss(
                dis_apply, out, batch, perceptual=self.perceptual,
                weights=self.loss_weights, gan_mode=self.gan_mode)
            return total, (m, mut['batch_stats'])

        (_, (gm, g_stats)), gg = jax.value_and_grad(
            g_loss, has_aux=True)(state.g_params)
        gg, g_ok, g_gnorm = _clip_and_validate(gg, cfg)
        g_params, g_opt = _apply_update(state.g_params, state.g_opt, gg,
                                        self.g_tx, g_ok)
        # only adopt new running stats on a valid step
        g_stats = jax.tree_util.tree_map(
            lambda n, o: jnp.where(g_ok, n, o), g_stats, state.g_stats)

        g_ema = state.g_ema
        if g_ema is not None:
            # `utils/model_average.py:35-80`: EMA after start_iteration
            beta = jnp.where(state.step >= self.ema_start,
                             cfg.ema_beta, 0.0)
            g_ema = jax.tree_util.tree_map(
                lambda e, p: e * beta + p * (1.0 - beta), g_ema,
                g_params)

        metrics = {**dm, **gm, 'dis/grad_norm': d_gnorm,
                   'gen/grad_norm': g_gnorm}
        return SpadeTrainState(
            step=state.step + 1, g_params=g_params, g_stats=g_stats,
            g_opt=g_opt, d_params=d_params, d_stats=new_d_stats,
            d_opt=d_opt, g_ema=g_ema), metrics

    def train_step(self, state, batch, key):
        if self._step_j is None:
            self._step_j = jax.jit(self._train_step, donate_argnums=0)
        return self._step_j(state, batch, key)

    # ------------------------------------------------------------------
    def generate(self, state, batch, key, use_ema=True):
        """Eval-mode forward (running stats), EMA params when kept."""
        params = state.g_ema if (use_ema and state.g_ema is not None) \
            else state.g_params
        return self.gen_eval.apply(
            {'params': params, 'batch_stats': state.g_stats}, batch,
            random_style='images' not in batch, rngs={'style': key})

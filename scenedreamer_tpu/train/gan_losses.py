"""Standard GAN losses + SPADE multi-scale patch discriminator +
SPADE train step — the second model family (GauGAN training,
`configs/landscape1m.yaml`).

Capability parity:
  * hinge / least_square / non_saturated / wasserstein GAN losses with
    optional top-k sample selection (`imaginaire/losses/gan.py:31-175`)
  * multi-scale patch discriminator (num_discriminators=2, kernel 4,
    nf 128 cap 512, 5 layers, spectral norm — `landscape1m.yaml:77-85`;
    the dataset class lives upstream in NVlabs/imaginaire like
    `imaginaire.discriminators.spade`, so the architecture here follows
    the pix2pixHD-style patch D that config describes)
  * WeightedMSE (`losses/weighted_mse.py`) and InfoNCE
    (`losses/info_nce.py`) criteria
  * SPADE trainer losses: gan=1.0 hinge + perceptual 10 + FM 10 +
    KL 0.05 (`landscape1m.yaml:28-33`), assembled in `spade_gen_loss` /
    `spade_dis_loss` for a jitted training step.
"""
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from scenedreamer_tpu.models.discriminator import SNConv
from scenedreamer_tpu.train.losses import (feature_matching_loss,
                                           gaussian_kl_loss)


# ---------------------------------------------------------------------------
# losses/gan.py
# ---------------------------------------------------------------------------

def _bce_logits(x, target):
    return jnp.mean(jnp.maximum(x, 0) - x * target
                    + jnp.log1p(jnp.exp(-jnp.abs(x))))


def gan_loss(dis_output, t_real, gan_mode='hinge', dis_update=True,
             topk_frac=1.0, separate_topk=False):
    """dis_output: logits tensor or list of per-scale logits."""
    if isinstance(dis_output, (list, tuple)):
        losses = [gan_loss(o, t_real, gan_mode, dis_update, topk_frac,
                           separate_topk) for o in dis_output]
        return jnp.mean(jnp.stack(losses))

    x = dis_output
    if not dis_update:
        assert t_real, 'generator loss must target real'
        if topk_frac < 1.0:
            flat = x.reshape(x.shape[0], -1) if separate_topk \
                else x.reshape(-1)
            k = max(1, math.ceil(topk_frac * flat.shape[-1]))
            x = jax.lax.top_k(flat, k)[0]

    if gan_mode in ('non_saturated', 'softplus'):
        return _bce_logits(x, 1.0 if t_real else 0.0)
    if gan_mode == 'least_square':
        return 0.5 * jnp.mean((x - (1.0 if t_real else 0.0)) ** 2)
    if gan_mode == 'hinge':
        if dis_update:
            if t_real:
                return -jnp.mean(jnp.minimum(x - 1.0, 0.0))
            return -jnp.mean(jnp.minimum(-x - 1.0, 0.0))
        return -jnp.mean(x)
    if gan_mode == 'wasserstein':
        return -jnp.mean(x) if t_real else jnp.mean(x)
    raise ValueError(f'unknown gan_mode {gan_mode}')


def weighted_mse_loss(x, y, weights):
    """`losses/weighted_mse.py`: per-element weighted MSE."""
    return jnp.mean(weights * (x - y) ** 2)


def info_nce_loss(feat_a, feat_b, temperature=0.07):
    """`losses/info_nce.py`: symmetric InfoNCE over feature batches
    [B, C] (single-direction variant is the a->b term)."""
    a = feat_a / jnp.linalg.norm(feat_a, axis=-1, keepdims=True)
    b = feat_b / jnp.linalg.norm(feat_b, axis=-1, keepdims=True)
    logits = (a @ b.T) / temperature
    labels = jnp.arange(a.shape[0])
    return jnp.mean(
        -jax.nn.log_softmax(logits, axis=-1)[labels, labels])


# ---------------------------------------------------------------------------
# Multi-scale patch discriminator (landscape1m.yaml:77-85)
# ---------------------------------------------------------------------------

class PatchDiscriminator(nn.Module):
    """pix2pixHD-style patch D: stride-2 conv stack, logits map."""
    num_filters: int = 128
    max_num_filters: int = 512
    num_layers: int = 5
    kernel_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, label, update_stats=False):
        x = jnp.concatenate([images, label], axis=-1)
        feats = []
        nf = self.num_filters
        for i in range(self.num_layers):
            stride = 2 if i < self.num_layers - 1 else 1
            x = SNConv(min(nf, self.max_num_filters),
                       kernel_size=self.kernel_size, stride=stride,
                       dtype=self.dtype, name=f'layer{i}')(
                x, update_stats)
            feats.append(x)
            nf *= 2
        logits = SNConv(1, kernel_size=self.kernel_size, act=False,
                        use_sn=False, dtype=self.dtype,
                        name='output')(x)
        return logits, feats


class MultiScaleDiscriminator(nn.Module):
    """num_discriminators patch Ds over a downsampling pyramid."""
    num_discriminators: int = 2
    num_filters: int = 128
    max_num_filters: int = 512
    num_layers: int = 5
    kernel_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, label, update_stats=False):
        outputs, features = [], []
        x, lbl = images, label
        for d in range(self.num_discriminators):
            logits, feats = PatchDiscriminator(
                num_filters=self.num_filters,
                max_num_filters=self.max_num_filters,
                num_layers=self.num_layers,
                kernel_size=self.kernel_size, dtype=self.dtype,
                name=f'dis{d}')(x, lbl, update_stats)
            outputs.append(logits)
            features.append(feats)
            if d + 1 < self.num_discriminators:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h // 2, w // 2, c),
                                     'linear')
                lbl = jax.image.resize(
                    lbl, (b, h // 2, w // 2, lbl.shape[-1]), 'nearest')
        return outputs, features


# ---------------------------------------------------------------------------
# SPADE training losses (landscape1m.yaml trainer)
# ---------------------------------------------------------------------------

SPADE_LOSS_WEIGHTS = {'gan': 1.0, 'perceptual': 10.0,
                      'feature_matching': 10.0, 'kl': 0.05}


def spade_gen_loss(dis_apply, g_out, batch, perceptual=None,
                   weights=SPADE_LOSS_WEIGHTS, gan_mode='hinge'):
    """Generator-side SPADE loss. dis_apply(images, label) ->
    (outputs, features)."""
    fake = g_out['fake_images']
    label = batch['label']
    out_f, feat_f = dis_apply(fake, label)
    out_r, feat_r = dis_apply(batch['images'], label)
    m = {}
    total = 0.0
    g = gan_loss(out_f, True, gan_mode, dis_update=False)
    m['gen/gan'] = g
    total += weights['gan'] * g
    if 'feature_matching' in weights:
        fm = jnp.mean(jnp.stack([
            feature_matching_loss(ff, fr)
            for ff, fr in zip(feat_f, feat_r)]))
        m['gen/feature_matching'] = fm
        total += weights['feature_matching'] * fm
    if 'perceptual' in weights and perceptual is not None:
        p = perceptual(fake, batch['images'])
        m['gen/perceptual'] = p
        total += weights['perceptual'] * p
    if 'kl' in weights and g_out.get('mu') is not None:
        kl = gaussian_kl_loss(g_out['mu'], g_out['logvar'])
        m['gen/kl'] = kl
        total += weights['kl'] * kl
    m['gen/total'] = total
    return total, m


def spade_dis_loss(dis_apply, fake_images, batch,
                   weights=SPADE_LOSS_WEIGHTS, gan_mode='hinge',
                   dis_apply_real=None):
    """`dis_apply_real` optionally substitutes the real-image forward —
    the trainer passes a stats-updating variant so the spectral-norm
    power iteration advances inside the loss (no extra D forward)."""
    label = batch['label']
    out_f, _ = dis_apply(jax.lax.stop_gradient(fake_images), label)
    out_r, _ = (dis_apply_real or dis_apply)(batch['images'], label)
    fake_l = gan_loss(out_f, False, gan_mode, dis_update=True)
    real_l = gan_loss(out_r, True, gan_mode, dis_update=True)
    total = weights['gan'] * (fake_l + real_l)
    return total, {'dis/fake': fake_l, 'dis/real': real_l,
                   'dis/total': total}

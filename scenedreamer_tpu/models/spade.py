"""SPADE / GauGAN generator — the frozen pseudo-ground-truth oracle.

Capability parity with the reference SPADE stack
(`imaginaire/generators/spade.py:228-571` SPADEGenerator + StyleEncoder,
`imaginaire/layers/activation_norm.py:20-263` AdaptiveNorm /
SpatiallyAdaptiveNorm, wired per `configs/landscape1m.yaml`):

  label one-hot [B, H, W, 184] -> nearest-downsampled 16x16 head ->
  SPADE residual blocks (order NACNAC, batch-norm + per-label conv MLP
  producing gamma/beta) interleaved with conditional-batch-norm conv
  blocks driven by the 2*style_dims style projection, nearest 2x
  upsampling ladder to 256/512/1024, multi-scale output taps summed
  before tanh(output_multiplier * .).

During SceneDreamer training this runs frozen in eval mode
(`trainers/gancraft.py:30-65`): batch norms use stored running
statistics and weights come converted from the released torch
checkpoint (spectral norm folded: W <- W / sigma(W)). Without a
checkpoint the randomly initialized oracle still exercises the full
pseudo-GT code path (shapes, masks, NaN guards) for tests/benchmarks.

TPU-native: NHWC, bf16-friendly convs, one jitted forward; the 184-ch
one-hot label tensor stays in HBM and every SPADE layer consumes the
same resized copy per resolution (resizes are nearest -> cheap gathers
XLA fuses).
"""
import functools
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from scenedreamer_tpu.models.discriminator import xavier_gain


def _nearest(x, size):
    """Nearest resize with torch `F.interpolate(mode='nearest')`
    semantics: src index = floor(dst * in/out) (NOT cell centers like
    `jax.image.resize`) — required for pixel-exact parity with the
    reference oracle (`generators/spade.py:440,490-505`). For integer
    upsampling both conventions are plain pixel repetition."""
    b, h, w, c = x.shape
    iy = jnp.floor(jnp.arange(size[0]) * (h / size[0])).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(size[1]) * (w / size[1])).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def leaky_relu(x):
    return jax.nn.leaky_relu(x, 0.2)


class FrozenBatchNorm(nn.Module):
    """Batch norm with stored running stats + affine scale/offset
    (`sync_batch` with affine=True per `generators/spade.py:90-93`;
    frozen-eval semantics). All four tensors live in `batch_stats`:
    converted from the torch checkpoint (weight->scale, bias->offset)
    or defaulting to identity for random-init use."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((self.features,)))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((self.features,)))
        scale = self.variable('batch_stats', 'scale',
                              lambda: jnp.ones((self.features,)))
        offset = self.variable('batch_stats', 'offset',
                               lambda: jnp.zeros((self.features,)))
        return (x - mean.value) * jax.lax.rsqrt(var.value + self.eps) \
            * scale.value + offset.value


def make_bn(features, bn_mode, name):
    """Batch norm by mode. 'frozen' = stored-stat FrozenBatchNorm (the
    oracle / checkpoint-conversion layout). 'train'/'eval' = flax
    BatchNorm (scale/bias trainable in `params`, running mean/var in
    `batch_stats`) for TRAINING the SPADE oracle (landscape1m.yaml):
    under GSPMD the batch-axis mean of a sharded array is a global
    reduction, so this IS the reference's sync_batch
    (`activation_norm.py` sync_batch_norm) with the collective emitted
    by the compiler; torch momentum 0.1 == flax momentum 0.9."""
    if bn_mode == 'frozen':
        return FrozenBatchNorm(features, name=name)
    return nn.BatchNorm(use_running_average=(bn_mode == 'eval'),
                        momentum=0.9, epsilon=1e-5, name=name)


class SpadeNorm(nn.Module):
    """SpatiallyAdaptiveNorm (`activation_norm.py:133-263`),
    separate_projection=True, num_filters=128, kernel 5
    (`landscape1m.yaml:70-74`)."""
    features: int
    num_filters: int = 128
    kernel_size: int = 5
    bn_mode: str = 'frozen'

    @nn.compact
    def __call__(self, x, seg):
        conv = functools.partial(nn.Conv, kernel_size=(self.kernel_size,
                                                       self.kernel_size),
                                 padding='SAME', kernel_init=xavier_gain())
        normed = make_bn(self.features, self.bn_mode, name='norm')(x)
        label = _nearest(seg, x.shape[1:3])
        hidden = jax.nn.relu(conv(self.num_filters, name='mlp')(label))
        gamma = conv(self.features, name='gamma')(hidden)
        beta = conv(self.features, name='beta')(hidden)
        return normed * (1.0 + gamma) + beta


class AdaptiveNorm(nn.Module):
    """Conditional batch norm from the style vector
    (`activation_norm.py:20-131`), separate projections."""
    features: int
    bn_mode: str = 'frozen'

    @nn.compact
    def __call__(self, x, z):
        normed = make_bn(self.features, self.bn_mode, name='norm')(x)
        gamma = nn.Dense(self.features, kernel_init=xavier_gain(),
                         name='fc_gamma')(z)
        beta = nn.Dense(self.features, kernel_init=xavier_gain(),
                        name='fc_beta')(z)
        return normed * (1.0 + gamma[:, None, None, :]) \
            + beta[:, None, None, :]


class DualAdaptiveNorm(nn.Module):
    """Normalize, then modulate by a LIST of conditions — spatial
    conditions through 1x1 convs, vector conditions through dense
    projections (`activation_norm.py:266-331` DualAdaptiveNorm; no
    shipped reference config instantiates it — library parity).

    cond_inputs: sequence matching `is_spatial`; None entries skipped.
    Spatial gammas/betas are bilinearly resized to x's HW.
    """
    features: int
    is_spatial: tuple = (False,)
    bias_only: bool = False
    norm_type: str = 'instance'

    @nn.compact
    def __call__(self, x, *cond_inputs):
        from scenedreamer_tpu.models.blocks import make_norm
        assert len(cond_inputs) == len(self.is_spatial)
        norm = make_norm(self.norm_type, self.features)
        out = norm(x) if norm is not None else x
        for i, (cond, spatial) in enumerate(
                zip(cond_inputs, self.is_spatial)):
            if cond is None:
                continue
            if spatial:
                gamma = nn.Conv(self.features, (1, 1),
                                kernel_init=xavier_gain(),
                                name=f'gamma_{i}')(cond)
                beta = nn.Conv(self.features, (1, 1),
                               kernel_init=xavier_gain(),
                               name=f'beta_{i}')(cond)
                if gamma.shape[1:3] != x.shape[1:3]:
                    gamma = jax.image.resize(
                        gamma, gamma.shape[:1] + x.shape[1:3]
                        + gamma.shape[3:], 'bilinear')
                    beta = jax.image.resize(
                        beta, beta.shape[:1] + x.shape[1:3]
                        + beta.shape[3:], 'bilinear')
            else:
                gamma = nn.Dense(self.features, kernel_init=xavier_gain(),
                                 name=f'gamma_{i}')(cond)[:, None, None, :]
                beta = nn.Dense(self.features, kernel_init=xavier_gain(),
                                name=f'beta_{i}')(cond)[:, None, None, :]
            out = out + beta if self.bias_only \
                else out * (1.0 + gamma) + beta
        return out


class SpadeRes2dBlock(nn.Module):
    """Res2dBlock order NACNAC with SPADE norms and learned shortcut
    (`generators/spade.py:272-282`, `layers/residual.py`)."""
    in_features: int
    out_features: int
    kernel_size: int = 3
    spade_filters: int = 128
    spade_kernel: int = 5
    bn_mode: str = 'frozen'

    @nn.compact
    def __call__(self, x, seg):
        conv = functools.partial(nn.Conv, kernel_size=(self.kernel_size,
                                                       self.kernel_size),
                                 padding='SAME', kernel_init=xavier_gain())
        norm = functools.partial(SpadeNorm, num_filters=self.spade_filters,
                                 kernel_size=self.spade_kernel,
                                 bn_mode=self.bn_mode)
        h = conv(self.out_features, name='conv0')(
            leaky_relu(norm(self.in_features, name='norm0')(x, seg)))
        h = conv(self.out_features, name='conv1')(
            leaky_relu(norm(self.out_features, name='norm1')(h, seg)))
        if self.in_features != self.out_features:
            x = nn.Conv(self.out_features, (1, 1), use_bias=False,
                        kernel_init=xavier_gain(), name='conv_s')(
                norm(self.in_features, name='norm_s')(x, seg))
        return h + x


class CBNConvBlock(nn.Module):
    """Conv2dBlock order NAC with adaptive norm
    (`generators/spade.py:306-316`)."""
    in_features: int
    out_features: int
    kernel_size: int = 3
    bn_mode: str = 'frozen'

    @nn.compact
    def __call__(self, x, z):
        x = leaky_relu(AdaptiveNorm(self.in_features,
                                    bn_mode=self.bn_mode,
                                    name='norm')(x, z))
        return nn.Conv(self.out_features,
                       (self.kernel_size, self.kernel_size),
                       padding='SAME', kernel_init=xavier_gain(),
                       name='conv')(x)


class SPADEGenerator(nn.Module):
    """Core SPADE ladder (`generators/spade.py:228-508`)."""
    num_labels: int = 184
    out_size: int = 512          # out_image_small_side_size
    image_channels: int = 3
    num_filters: int = 128
    kernel_size: int = 3
    style_dims: int = 256
    output_multiplier: float = 0.5
    spade_filters: int = 128     # activation_norm_params.num_filters
    spade_kernel: int = 5        # activation_norm_params.kernel_size
    bn_mode: str = 'frozen'

    @nn.compact
    def __call__(self, seg, z):
        """seg: [B, H, W, num_labels] one-hot; z: [B, style_dims]."""
        nf = self.num_filters
        base = {256: 16, 512: 32, 1024: 64}[self.out_size]
        res = functools.partial(SpadeRes2dBlock,
                                kernel_size=self.kernel_size,
                                spade_filters=self.spade_filters,
                                spade_kernel=self.spade_kernel,
                                bn_mode=self.bn_mode)
        cbn = functools.partial(CBNConvBlock,
                                kernel_size=self.kernel_size,
                                bn_mode=self.bn_mode)

        # style projection (`spade.py:284-291`, order CAN, relu)
        z = jax.nn.relu(nn.Dense(2 * self.style_dims,
                                 kernel_init=xavier_gain(),
                                 name='fc_0')(z))
        z = jax.nn.relu(nn.Dense(2 * self.style_dims,
                                 kernel_init=xavier_gain(),
                                 name='fc_1')(z))

        sy = math.floor(seg.shape[1] / base)
        sx = math.floor(seg.shape[2] / base)
        x = _nearest(seg, (sy, sx))
        x = leaky_relu(nn.Conv(8 * nf,
                               (self.kernel_size, self.kernel_size),
                               padding='SAME', kernel_init=xavier_gain(),
                               name='head_0')(x))
        x = cbn(8 * nf, 16 * nf, name='cbn_head_0')(x, z)
        x = res(16 * nf, 16 * nf, name='head_1')(x, seg)
        x = res(16 * nf, 16 * nf, name='head_2')(x, seg)
        x = _nearest(x, (2 * x.shape[1], 2 * x.shape[2]))

        x = res(16 * nf, 8 * nf, name='up_0a')(x, seg)
        x = cbn(8 * nf, 8 * nf, name='cbn_up_0a')(x, z)
        x = res(8 * nf, 8 * nf, name='up_0b')(x, seg)
        x = _nearest(x, (2 * x.shape[1], 2 * x.shape[2]))

        x = res(8 * nf, 4 * nf, name='up_1a')(x, seg)
        x = cbn(4 * nf, 4 * nf, name='cbn_up_1a')(x, z)
        x = res(4 * nf, 4 * nf, name='up_1b')(x, seg)
        x = _nearest(x, (2 * x.shape[1], 2 * x.shape[2]))

        x = res(4 * nf, 4 * nf, name='up_2a')(x, seg)
        x = cbn(4 * nf, 4 * nf, name='cbn_up_2a')(x, z)
        x = res(4 * nf, 2 * nf, name='up_2b')(x, seg)
        x = _nearest(x, (2 * x.shape[1], 2 * x.shape[2]))

        def out_conv(feat, ch_in, name):
            return nn.Conv(self.image_channels, (5, 5), padding='SAME',
                           kernel_init=xavier_gain(),
                           name=name)(leaky_relu(feat))

        if self.out_size == 256:
            x256 = out_conv(x, 2 * nf, 'conv_img256')
            return jnp.tanh(self.output_multiplier * x256)

        x256 = out_conv(x, 2 * nf, 'conv_img256')
        x = res(2 * nf, nf, name='up_3a')(x, seg)
        x = res(nf, nf, name='up_3b')(x, seg)
        x = _nearest(x, (2 * x.shape[1], 2 * x.shape[2]))
        x512 = out_conv(x, nf, 'conv_img512')
        if self.out_size == 512:
            x256 = _nearest(x256, x512.shape[1:3])
            return jnp.tanh(self.output_multiplier * (x256 + x512))

        x256 = _nearest(x256, (4 * x256.shape[1], 4 * x256.shape[2]))
        x512 = _nearest(x512, (2 * x512.shape[1], 2 * x512.shape[2]))
        x = res(nf, nf // 2, name='up_4a')(x, seg)
        x = res(nf // 2, nf // 2, name='up_4b')(x, seg)
        x = _nearest(x, (2 * x.shape[1], 2 * x.shape[2]))
        x1024 = out_conv(x, nf // 2, 'conv_img1024')
        return jnp.tanh(self.output_multiplier * (x256 + x512 + x1024))


class SPADEStyleEncoder(nn.Module):
    """VAE style encoder (`generators/spade.py:511-571`)."""
    style_dims: int = 256
    num_filters: int = 64

    @nn.compact
    def __call__(self, x, rng=None):
        if x.shape[1] != 256 or x.shape[2] != 256:
            x = jax.image.resize(x, (x.shape[0], 256, 256, x.shape[3]),
                                 'bilinear')
        nf = self.num_filters
        for i, ch in enumerate([nf, 2 * nf, 4 * nf, 8 * nf, 8 * nf,
                                8 * nf]):
            x = leaky_relu(nn.Conv(ch, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)),
                                   kernel_init=xavier_gain(),
                                   name=f'layer{i + 1}')(x))
        x = x.reshape(x.shape[0], -1)
        mu = nn.Dense(self.style_dims, kernel_init=xavier_gain(),
                      name='fc_mu')(x)
        logvar = nn.Dense(self.style_dims, kernel_init=xavier_gain(),
                          name='fc_var')(x)
        std = jnp.exp(0.5 * logvar)
        if rng is None:
            rng = self.make_rng('style')
        eps = jax.random.normal(rng, std.shape, std.dtype)
        return mu, logvar, mu + eps * std


class SPADEWrapper(nn.Module):
    """Top-level Generator (`generators/spade.py:30-162`): random style
    or encoded style -> SPADEGenerator."""
    num_labels: int = 184
    out_size: int = 512
    style_dims: int = 256
    num_filters: int = 128
    output_multiplier: float = 0.5
    spade_filters: int = 128
    spade_kernel: int = 5
    style_enc_filters: int = 64
    bn_mode: str = 'frozen'     # 'train'/'eval' for oracle TRAINING

    def setup(self):
        self.spade_generator = SPADEGenerator(
            num_labels=self.num_labels, out_size=self.out_size,
            style_dims=self.style_dims, num_filters=self.num_filters,
            output_multiplier=self.output_multiplier,
            spade_filters=self.spade_filters,
            spade_kernel=self.spade_kernel,
            bn_mode=self.bn_mode)
        self.style_encoder = SPADEStyleEncoder(
            style_dims=self.style_dims,
            num_filters=self.style_enc_filters)

    def __call__(self, data, random_style=False, rng=None):
        """data: {'label': [B,H,W,C] one-hot, optional 'images', 'z'}."""
        label = data['label']
        mu = logvar = None
        if 'z' in data:
            z = data['z']
        elif random_style or 'images' not in data:
            if rng is None:
                rng = self.make_rng('style')
            z = jax.random.normal(rng, (label.shape[0], self.style_dims))
        else:
            mu, logvar, z = self.style_encoder(data['images'], rng=rng)
        fake = self.spade_generator(label, z)
        return {'fake_images': fake, 'mu': mu, 'logvar': logvar}

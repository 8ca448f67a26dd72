"""FPSE-style N+1-label patch discriminator.

Capability parity with the reference discriminator
(`imaginaire/discriminators/gancraft.py:16-278`): a 5-level stride-2
encoder, FPN top-down pathway with 1x1 lateral connections and bilinear
2x upsampling, a stride-1 head, and a 1x1 output conv producing
`num_labels + 1` logits per patch (the +1 channel is the "fake" class).
Segmentation maps are resampled to the prediction grid with the
area+argmax `smooth_interp` (`gancraft.py:216-228`). All learnable convs
except the output layer use spectral normalization
(`configs/scenedreamer_train.yaml:159`).

TPU-native design: channels-last NHWC tensors, flax modules, spectral
norm via power iteration state in the `spectral_stats` variable
collection (updated only inside the discriminator update step, threaded
explicitly instead of torch's implicit pre-forward hook).
"""
import functools

import jax
import jax.numpy as jnp
from flax import linen as nn


def xavier_gain(gain=0.02):
    """xavier_normal_(gain) — the reference's global init
    (`configs/scenedreamer_train.yaml:23-25`, `utils/init_weight.py`)."""
    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 2:
            fan_in, fan_out = shape[1], shape[0]
        else:  # conv kernel [kh, kw, in, out]
            rf = 1
            for s in shape[:-2]:
                rf *= s
            fan_in, fan_out = shape[-2] * rf, shape[-1] * rf
        std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.normal(key, shape, dtype) * std
    return init


class SNConv(nn.Module):
    """Conv2d with spectral norm + optional leaky-relu (order 'CNA',
    reference `layers/conv.py` Conv2dBlock with activation_norm 'none')."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    act: bool = True
    use_sn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats=False):
        pad = (self.kernel_size - 1) // 2
        conv = nn.Conv(self.features,
                       (self.kernel_size, self.kernel_size),
                       strides=(self.stride, self.stride),
                       padding=((pad, pad), (pad, pad)),
                       kernel_init=xavier_gain(),
                       bias_init=nn.initializers.zeros, dtype=self.dtype)
        if self.use_sn:
            y = nn.SpectralNorm(conv, collection_name='spectral_stats')(
                x, update_stats=update_stats)
        else:
            y = conv(x)
        if self.act:
            y = jax.nn.leaky_relu(y, 0.2)
        return y


def smooth_interp(segmap, size):
    """Area-resample a one-hot segmentation map then re-binarize by argmax
    (`discriminators/gancraft.py:216-228`). segmap: [B, H, W, C] NHWC."""
    b, h, w, c = segmap.shape
    th, tw = size
    if h % th == 0 and w % tw == 0:
        fh, fw = h // th, w // tw
        x = segmap.reshape(b, th, fh, tw, fw, c).mean(axis=(2, 4))
    else:
        x = jax.image.resize(segmap, (b, th, tw, c), 'linear')
    idx = jnp.argmax(x, axis=-1)
    return jax.nn.one_hot(idx, c, dtype=segmap.dtype)


class FPSEDiscriminator(nn.Module):
    """Feature-pyramid patch discriminator (`gancraft.py:133-278`)."""
    num_labels: int = 12
    num_filters: int = 128
    kernel_size: int = 3
    smooth_resample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, segmaps, update_stats=False):
        """images [B, H, W, 3]; segmaps [B, H, W, num_labels] one-hot.
        Returns ([{'pred', 'label'}], features)."""
        nf = self.num_filters
        down = functools.partial(SNConv, kernel_size=self.kernel_size,
                                 stride=2, dtype=self.dtype)
        lat = functools.partial(SNConv, kernel_size=1, stride=1,
                                dtype=self.dtype)

        # bottom-up pathway
        feat11 = down(nf, name='enc1')(images, update_stats)        # /2
        feat12 = down(2 * nf, name='enc2')(feat11, update_stats)    # /4
        feat13 = down(4 * nf, name='enc3')(feat12, update_stats)    # /8
        feat14 = down(8 * nf, name='enc4')(feat13, update_stats)    # /16
        feat15 = down(8 * nf, name='enc5')(feat14, update_stats)    # /32

        def up_to(x, ref):
            # bilinear 2x in the reference (256-divisible inputs); resize
            # to the lateral's exact dims so odd sizes also compose
            b, _, _, c = x.shape
            return jax.image.resize(x, (b,) + ref.shape[1:3] + (c,),
                                    'bilinear')

        # top-down pathway + lateral connections
        feat25 = lat(4 * nf, name='lat5')(feat15, update_stats)
        feat24 = up_to(feat25, feat14) \
            + lat(4 * nf, name='lat4')(feat14, update_stats)
        feat23 = up_to(feat24, feat13) \
            + lat(4 * nf, name='lat3')(feat13, update_stats)
        feat22 = up_to(feat23, feat12) \
            + lat(4 * nf, name='lat2')(feat12, update_stats)

        feat32 = SNConv(2 * nf, kernel_size=self.kernel_size, stride=1,
                        dtype=self.dtype, name='final2')(feat22, update_stats)
        # plain 1x1 output conv, no SN / activation (`gancraft.py:200`);
        # logits always f32 so the N+1 log-softmax GAN loss stays full
        # precision under bf16 mixed-precision compute
        pred2 = SNConv(self.num_labels + 1, kernel_size=1, act=False,
                       use_sn=False, dtype=self.dtype,
                       name='output')(feat32).astype(jnp.float32)

        if self.smooth_resample:
            label_map = smooth_interp(segmaps, pred2.shape[1:3])
        else:
            label_map = jax.image.resize(
                segmaps, segmaps.shape[:1] + pred2.shape[1:3]
                + segmaps.shape[-1:], 'nearest')

        features = [feat11, feat12, feat13, feat14, feat15,
                    feat25, feat24, feat23, feat22]
        return [{'pred': pred2, 'label': label_map}], features


class GANcraftDiscriminator(nn.Module):
    """Top-level wrapper routing fake / real / pseudo-real branches
    (`discriminators/gancraft.py:73-130`). All inputs NHWC."""
    num_labels: int = 12
    num_filters: int = 128
    kernel_size: int = 3
    use_label: bool = True
    smooth_resample: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.fpse = FPSEDiscriminator(
            num_labels=self.num_labels if self.use_label else 2,
            num_filters=self.num_filters, kernel_size=self.kernel_size,
            smooth_resample=self.smooth_resample, dtype=self.dtype)

    def _labels_or_dummy(self, labels, images):
        if self.use_label:
            return labels
        dummy = jnp.zeros(images.shape[:3] + (2,), images.dtype)
        return dummy.at[..., 1].set(1.0)

    def __call__(self, data, net_G_output, incl_real=False,
                 incl_pseudo_real=False, update_stats=False):
        out = {}
        fake_images = net_G_output['fake_images']
        fake_labels = self._labels_or_dummy(data.get('fake_masks'),
                                            fake_images)
        out['fake_outputs'], out['fake_features'] = self.fpse(
            fake_images, fake_labels, update_stats)
        if incl_real:
            real_images = data['images']
            real_labels = self._labels_or_dummy(data.get('real_masks'),
                                                real_images)
            out['real_outputs'], out['real_features'] = self.fpse(
                real_images, real_labels, update_stats)
        if incl_pseudo_real:
            preal = data['pseudo_real_img']
            preal_labels = self._labels_or_dummy(data.get('fake_masks'),
                                                 preal)
            out['pseudo_real_outputs'], out['pseudo_real_features'] = \
                self.fpse(preal, preal_labels, update_stats)
        return out

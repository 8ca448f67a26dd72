"""Layer-library extension: the remaining imaginaire block variants.

Capability parity with the reference layer package beyond what
`models/blocks.py` covers (SURVEY.md §2.8 "1d/2d/3d/partial/hyper
variants", "up/down variants", "+hyper variant" norms):

  * `Conv1dBlock` / `Conv3dBlock` (`imaginaire/layers/conv.py:1370+,
    conv.py` Conv1dBlock/Conv3dBlock) and `Res1dBlock` / `Res3dBlock`
    (`imaginaire/layers/residual.py:367,532`)
  * `ResLinearBlock` (`residual.py:296`)
  * `UpRes2dBlock` (`residual.py:882-1010`) — upsample-in-the-middle
    residual block with blur or nearest upsampling
  * `DeepRes2dBlock` (`residual_deep.py:13-265`) — bottleneck residual
    with 1x1 in/out projections and channel-concat shortcut
  * `ModulatedConv2d(+Block,+Res2dBlock)` (`conv.py:278-378`,
    StyleGAN2 modulated convolution; also the conv-side analog of
    `weight_norm.py:17-69` WeightDemodulation)
  * `MultiOutConv2dBlock` / `MultiOutRes2dBlock`
    (`conv.py` _MultiOutBaseConvBlock, `residual.py:1284-1331`)
  * `PartialConv3d` + `PartialConv{2,3}dBlock` + `PartialRes{2,3}dBlock`
    + `partial_sequential` (`conv.py:910-1105,1307-1366`,
    `misc.py:33-48`)
  * `HyperRes2dBlock` (`residual.py:613-667`)
  * `HyperSpatiallyAdaptiveNorm` (`activation_norm.py:334-424`)
  * norm zoo: `LayerNorm2d`, `ScaleNorm`, `PixelNorm`, `PixelLayerNorm`,
    `SplitMeanStd` (`activation_norm.py:425-570`)
  * `Embedding2d`, `EmbeddingBlock`, `Embedding2dBlock`
    (`conv.py:440-486,1370-1380`)
  * `ScaledLeakyReLU` + `get_nonlinearity`
    (`layers/nonlinearity.py:12-67`)

TPU-native design notes:
  * Everything channel-last (NWC / NHWC / NDHWC) like the rest of the
    package; masks stay explicit tensors.
  * `ModulatedConv2d` avoids the reference's `groups=batch` reshaped
    convolution (a poor fit for XLA's conv tiling): modulating the
    weight input axis is algebraically identical to scaling the input
    activations, so we run ONE ordinary batched conv on the MXU and
    apply the demodulation factor to the output channels. Exact same
    numbers, no batch-grouped kernels.
  * Partial convs compute the mask-renormalization window with
    `lax.reduce_window` (fused by XLA) instead of a second convolution
    over a ones-kernel.
"""
import functools
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from scenedreamer_tpu.models.discriminator import xavier_gain
from scenedreamer_tpu.models.blocks import (
    ApplyNoise, Blur, BlurDownsample, BlurUpsample, bias_act, make_norm)


# ---------------------------------------------------------------------------
# nonlinearity factory (`layers/nonlinearity.py:12-67`)
# ---------------------------------------------------------------------------

def scaled_leaky_relu(x, negative_slope=0.2, scale=float(np.sqrt(2.0))):
    """`ScaledLeakyReLU` (`nonlinearity.py:12-22`)."""
    return jax.nn.leaky_relu(x, negative_slope) * scale


class ScaledLeakyReLU(nn.Module):
    negative_slope: float = 0.2
    scale: float = float(np.sqrt(2.0))

    def __call__(self, x):
        return scaled_leaky_relu(x, self.negative_slope, self.scale)


def get_nonlinearity(nonlinearity_type):
    """Return a callable activation or None
    (`nonlinearity.py:31-67` get_nonlinearity_layer; the 'fused*'
    prefix maps to `bias_act` which is what the CUDA fused kernel
    computes)."""
    t = nonlinearity_type or 'none'
    if t.startswith('fused_'):
        return functools.partial(bias_act, act=t[6:])
    if t == 'relu':
        return jax.nn.relu
    if t == 'leakyrelu':
        return lambda x: jax.nn.leaky_relu(x, 0.2)
    if t == 'scaled_leakyrelu':
        return scaled_leaky_relu
    if t == 'tanh':
        return jnp.tanh
    if t == 'sigmoid':
        return jax.nn.sigmoid
    if t.startswith('softmax'):
        # the reference's 'softmax,<dim>' dims are NCHW; translate to
        # channel-last: dim 1 (channel) -> -1, spatial dim d>1 -> d-1,
        # batch dim 0 stays 0.
        if ',' in t:
            d = int(t.split(',')[1])
            axis = {0: 0, 1: -1}.get(d, d - 1)
        else:
            axis = -1
        return lambda x: jax.nn.softmax(x, axis=axis)
    if t in ('none', ''):
        return None
    raise ValueError(f'unknown nonlinearity {t}')


# ---------------------------------------------------------------------------
# norm zoo (`activation_norm.py:425-570`)
# ---------------------------------------------------------------------------

class LayerNorm2d(nn.Module):
    """Per-sample layer norm with per-CHANNEL affine
    (`activation_norm.py:425-472`). channel_only normalizes over the
    channel axis only. Matches torch's unbiased std (ddof=1)."""
    features: int
    eps: float = 1e-5
    channel_only: bool = False
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        if self.channel_only:
            mean = jnp.mean(x, axis=-1, keepdims=True)
            std = jnp.std(x, axis=-1, keepdims=True, ddof=1)
        else:
            axes = tuple(range(1, x.ndim))
            mean = jnp.mean(x, axis=axes, keepdims=True)
            std = jnp.std(x, axis=axes, keepdims=True, ddof=1)
        y = (x - mean) / (std + self.eps)
        if self.affine:
            gamma = self.param('gamma', nn.initializers.ones,
                               (self.features,))
            beta = self.param('beta', nn.initializers.zeros,
                              (self.features,))
            y = y * gamma + beta
        return y


class ScaleNorm(nn.Module):
    """RMS scale norm (`activation_norm.py:525-553`); axis=-1 is the
    channel axis in our channel-last layout (= the reference's dim=1
    in NCHW)."""
    axis: int = -1
    learned_scale: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = (self.param('scale', nn.initializers.ones, ())
                 if self.learned_scale else 1.0)
        return x * scale * jax.lax.rsqrt(
            jnp.mean(x * x, axis=self.axis, keepdims=True) + self.eps)


class PixelNorm(ScaleNorm):
    """StyleGAN pixel norm (`activation_norm.py:503-505`): channel
    ScaleNorm with no learned scale."""
    axis: int = -1
    learned_scale: bool = False


class PixelLayerNorm(nn.Module):
    """Per-pixel LayerNorm over the channel axis
    (`activation_norm.py:555-563`) — in channel-last layout this is a
    plain flax LayerNorm."""
    use_affine: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(use_bias=self.use_affine,
                            use_scale=self.use_affine, name='norm')(x)


class SplitMeanStd(nn.Module):
    """Pass-through norm that also emits per-channel (mean, std) maps
    (`activation_norm.py:508-522`); std uses torch's unbiased variance.
    Returns (x, concat(mean, std)) — the aux output consumed by
    MultiOut blocks."""
    eps: float = 1e-5

    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True, ddof=1)
        std = jnp.sqrt(var + self.eps)
        return x, jnp.concatenate([mean, std], axis=-1)


# ---------------------------------------------------------------------------
# Conv1d / Conv3d blocks + 1d/3d residual blocks
# (`conv.py` Conv1dBlock/Conv3dBlock, `residual.py:367,532`)
# ---------------------------------------------------------------------------

class _ConvNdBlock(nn.Module):
    """Order-string conv block for rank-`spatial_rank` inputs, the
    N-d generalization of `blocks.Conv2dBlock`."""
    features: int
    spatial_rank: int = 2
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    weight_norm_type: str = 'none'
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    order: str = 'CNA'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats=False):
        r = self.spatial_rank
        pad = (self.kernel_size - 1) // 2
        conv = nn.Conv(self.features, (self.kernel_size,) * r,
                       strides=(self.stride,) * r,
                       padding=((pad, pad),) * r,
                       use_bias=self.use_bias, kernel_init=xavier_gain(),
                       dtype=self.dtype, name='conv')
        in_f = x.shape[-1]

        def apply_conv(h):
            if self.weight_norm_type == 'spectral':
                return nn.SpectralNorm(
                    conv, collection_name='spectral_stats')(
                    h, update_stats=update_stats)
            if self.weight_norm_type == 'weight':
                from scenedreamer_tpu.models.blocks import \
                    weight_norm_conv
                return weight_norm_conv(
                    self, h, self.features, (self.kernel_size,) * r,
                    self.stride, self.use_bias, dtype=self.dtype)
            if self.weight_norm_type not in ('none', '', None):
                raise ValueError(
                    f'unknown weight norm {self.weight_norm_type}')
            return conv(h)

        for i, op in enumerate(self.order.upper()):
            if op == 'C':
                x = apply_conv(x)
            elif op == 'N':
                pre_conv = 'C' not in self.order.upper()[:i]
                norm = make_norm(self.activation_norm_type,
                                 in_f if pre_conv else self.features)
                if norm is not None:
                    x = norm(x)
            elif op == 'A':
                fn = get_nonlinearity(self.nonlinearity)
                if fn is not None:
                    x = fn(x)
            else:
                raise ValueError(f'bad order char {op}')
        return x


class Conv1dBlock(_ConvNdBlock):
    """NWC order-string conv block (`conv.py` Conv1dBlock)."""
    spatial_rank: int = 1


class Conv3dBlock(_ConvNdBlock):
    """NDHWC order-string conv block (`conv.py` Conv3dBlock)."""
    spatial_rank: int = 3


class _ResNdBlock(nn.Module):
    """N-d residual block with learned shortcut
    (`residual.py` _BaseResBlock applied at ranks 1 and 3)."""
    features: int
    spatial_rank: int = 2
    kernel_size: int = 3
    weight_norm_type: str = 'none'
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    order: str = 'CNACNA'
    output_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats=False):
        half = len(self.order) // 2
        block = functools.partial(
            _ConvNdBlock, self.features, spatial_rank=self.spatial_rank,
            kernel_size=self.kernel_size,
            weight_norm_type=self.weight_norm_type,
            activation_norm_type=self.activation_norm_type,
            nonlinearity=self.nonlinearity, dtype=self.dtype)
        h = block(order=self.order[:half], name='conv_block_0')(
            x, update_stats)
        h = block(order=self.order[half:], name='conv_block_1')(
            h, update_stats)
        if x.shape[-1] != self.features:
            x = _ConvNdBlock(self.features,
                             spatial_rank=self.spatial_rank,
                             kernel_size=1, use_bias=False,
                             weight_norm_type=self.weight_norm_type,
                             nonlinearity='none', order='C',
                             dtype=self.dtype, name='conv_block_s')(
                x, update_stats)
        return self.output_scale * (h + x)


class Res1dBlock(_ResNdBlock):
    """`residual.py:367` Res1dBlock, NWC."""
    spatial_rank: int = 1


class Res3dBlock(_ResNdBlock):
    """`residual.py:532` Res3dBlock, NDHWC."""
    spatial_rank: int = 3


class ResLinearBlock(nn.Module):
    """Residual fully-connected block (`residual.py:296`)."""
    features: int
    nonlinearity: str = 'leakyrelu'
    output_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        fn = get_nonlinearity(self.nonlinearity)
        h = nn.Dense(self.features, kernel_init=xavier_gain(),
                     name='fc0')(x)
        if fn is not None:
            h = fn(h)
        h = nn.Dense(self.features, kernel_init=xavier_gain(),
                     name='fc1')(h)
        if fn is not None:
            h = fn(h)
        if x.shape[-1] != self.features:
            x = nn.Dense(self.features, use_bias=False,
                         kernel_init=xavier_gain(), name='fc_s')(x)
        return self.output_scale * (h + x)


# ---------------------------------------------------------------------------
# UpRes2dBlock (`residual.py:882-1010`)
# ---------------------------------------------------------------------------

def _nearest_up2(x):
    b, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :],
                            (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)


class UpRes2dBlock(nn.Module):
    """Residual block with 2x upsampling in the middle of the residual
    branch and before the shortcut (`residual.py:882-1010`): for
    'NACNAC' order the first block's norm+act run at input resolution,
    then upsample, then conv. blur=True swaps nearest-neighbor for the
    FIR BlurUpsample pair."""
    features: int
    kernel_size: int = 3
    weight_norm_type: str = 'none'
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    order: str = 'CNACNA'
    blur: bool = False
    output_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats=False):
        up = (BlurUpsample(name='blur_up') if self.blur else _nearest_up2)
        half = len(self.order) // 2
        block = functools.partial(
            _ConvNdBlock, self.features, kernel_size=self.kernel_size,
            weight_norm_type=self.weight_norm_type,
            activation_norm_type=self.activation_norm_type,
            nonlinearity=self.nonlinearity, dtype=self.dtype)

        # Shortcut: upsample, then 1x1 projection if channels change.
        xs = up(x)
        if x.shape[-1] != self.features:
            xs = _ConvNdBlock(self.features, kernel_size=1,
                              use_bias=False,
                              weight_norm_type=self.weight_norm_type,
                              nonlinearity='none', order='C',
                              dtype=self.dtype, name='conv_block_s')(
                xs, update_stats)

        first = self.order[:half].upper()
        if first == 'NAC':
            # norm+act at input res, upsample, then convolve
            # (residual.py:946-952).
            h = block(order='NA', name='conv_block_0_na')(x, update_stats)
            h = up(h)
            h = block(order='C', name='conv_block_0_c')(h, update_stats)
        else:
            h = block(order=first, name='conv_block_0')(x, update_stats)
            h = up(h)
        h = block(order=self.order[half:], name='conv_block_1')(
            h, update_stats)
        return self.output_scale * (xs + h)


# ---------------------------------------------------------------------------
# DeepRes2dBlock (`residual_deep.py:13-265`)
# ---------------------------------------------------------------------------

class DeepRes2dBlock(nn.Module):
    """Bottleneck residual block: 1x1-in -> kxk -> kxk -> 1x1-out with
    hidden = in/hidden_channel_ratio (`residual_deep.py:13-265`).
    stride 2 downsamples — the second (strided) residual conv gets the
    FIR blur like the reference's second_blur (`_get_stride_blur`),
    the shortcut goes through BlurDownsample/avg-pool + 1x1. When
    in < out without a learned shortcut, the shortcut concatenates a
    conv producing the missing channels (`residual_deep.py:144-156`).
    The shortcut conv carries no nonlinearity unless skip_nonlinearity
    (reference default False, `residual_deep.py:131-156`)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    weight_norm_type: str = 'none'
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    skip_nonlinearity: bool = False
    order: str = 'CNACNA'
    blur: bool = True
    learn_shortcut: bool = False
    hidden_channel_ratio: int = 4
    output_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats=False):
        from scenedreamer_tpu.models.blocks import Conv2dBlock
        in_f = x.shape[-1]
        hidden = max(1, in_f // self.hidden_channel_ratio)
        order = ('NACNAC' if self.order == 'pre_act' else self.order)
        half = len(order) // 2
        block = functools.partial(
            Conv2dBlock, weight_norm_type=self.weight_norm_type,
            activation_norm_type=self.activation_norm_type,
            nonlinearity=self.nonlinearity, dtype=self.dtype)

        h = block(hidden, kernel_size=1, order=order[:half],
                  name='conv_block_1x1_in')(x, update_stats)
        h = block(hidden, kernel_size=self.kernel_size,
                  order=order[:half], name='conv_block_0')(
            h, update_stats)
        h = block(hidden, kernel_size=self.kernel_size,
                  stride=self.stride, blur=self.blur,
                  order=order[half:], name='conv_block_1')(
            h, update_stats)
        h = block(self.features, kernel_size=1, order=order[:half],
                  name='conv_block_1x1_out')(h, update_stats)

        skip_nl = self.nonlinearity if self.skip_nonlinearity else 'none'
        sblock = functools.partial(
            block, kernel_size=1, nonlinearity=skip_nl,
            order=order[:half])
        xs = x
        if self.stride > 1:
            xs = (BlurDownsample(name='blur_down')(xs) if self.blur else
                  nn.avg_pool(xs, (2, 2), strides=(2, 2)))
        if self.learn_shortcut:
            xs = sblock(self.features, name='conv_block_s')(
                xs, update_stats)
        elif in_f < self.features:
            extra = sblock(self.features - in_f, name='conv_block_s')(
                xs, update_stats)
            xs = jnp.concatenate([xs, extra], axis=-1)
        elif in_f > self.features:
            xs = xs[..., :self.features]
        return self.output_scale * (xs + h)


# ---------------------------------------------------------------------------
# ModulatedConv2d (`conv.py:278-378`; conv analog of
# `weight_norm.py:17-69` WeightDemodulation)
# ---------------------------------------------------------------------------

class ModulatedConv2d(nn.Module):
    """StyleGAN2 modulated conv. style is the ALREADY-PROJECTED
    per-sample input-channel scale [N, Cin] (the reference keeps the
    style->Cin projection outside the module, `conv.py:316-318`).

    TPU formulation: conv(x, W * s) == conv(x * s, W) since the style
    scales the weight's input axis — so one ordinary batched conv on
    the MXU, then the per-(sample, out-channel) demodulation factor on
    the output. Bit-for-bit the reference math without `groups=batch`.
    """
    features: int
    kernel_size: int = 3
    stride: Any = 1            # 1 | 2 | 0.5 (transposed)
    use_bias: bool = True
    demodulate: bool = True
    eps: float = 1e-8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        k = self.kernel_size
        cin = x.shape[-1]
        w = self.param('weight', nn.initializers.normal(1.0),
                       (k, k, cin, self.features))     # HWIO
        xm = x * style[:, None, None, :]
        pad = (k - 1) // 2
        if self.stride == 0.5:
            # transpose_kernel=True + [H,W,out,in] layout reproduces
            # torch F.conv_transpose2d exactly (parity-tested at 5e-7)
            y = jax.lax.conv_transpose(
                xm, jnp.transpose(w, (0, 1, 3, 2)), strides=(2, 2),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                transpose_kernel=True)
        else:
            s = int(self.stride)
            y = jax.lax.conv_general_dilated(
                xm, w, (s, s), ((pad, pad), (pad, pad)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.demodulate:
            # demod[b, o] = rsqrt(sum_{hw,i} (W * s_b)^2) (conv.py:320-325)
            wsq = jnp.einsum('hwio,bi->bo', w * w, style * style)
            y = y * jax.lax.rsqrt(wsq + self.eps)[:, None, None, :]
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros,
                           (self.features,))
            y = y + b
        return y


class ModulatedConv2dBlock(nn.Module):
    """Order-string block around `ModulatedConv2d`
    (`conv.py` ModulatedConv2dBlock): the style vector is projected to
    Cin by an internal affine (reference wires a LinearBlock outside;
    the block form carries it)."""
    features: int
    kernel_size: int = 3
    stride: Any = 1
    demodulate: bool = True
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    apply_noise: bool = False
    order: str = 'CNA'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z, noise_key=None):
        for i, op in enumerate(self.order.upper()):
            if op == 'C':
                style = nn.Dense(x.shape[-1],
                                 kernel_init=xavier_gain(),
                                 bias_init=nn.initializers.ones,
                                 name='modulation')(z)
                x = ModulatedConv2d(self.features, self.kernel_size,
                                    stride=self.stride,
                                    demodulate=self.demodulate,
                                    dtype=self.dtype, name='conv')(
                    x, style)
                if self.apply_noise:
                    x = ApplyNoise(name='noise')(x, key=noise_key)
            elif op == 'N':
                norm = make_norm(self.activation_norm_type, x.shape[-1])
                if norm is not None:
                    x = norm(x)
            elif op == 'A':
                fn = get_nonlinearity(self.nonlinearity)
                if fn is not None:
                    x = fn(x)
        return x


class ModulatedRes2dBlock(nn.Module):
    """Residual pair of modulated conv blocks
    (`residual.py:276-330` ModulatedRes2dBlock). Only the residual
    pair is modulated — the learned shortcut is a plain unmodulated
    1x1 conv (the reference passes skip_block=Conv2dBlock); noise
    injection after each modulated conv is on by default like the
    reference's apply_noise=True."""
    features: int
    kernel_size: int = 3
    demodulate: bool = True
    nonlinearity: str = 'leakyrelu'
    apply_noise: bool = True
    order: str = 'CNACNA'
    output_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z, noise_key=None):
        from scenedreamer_tpu.models.blocks import Conv2dBlock
        half = len(self.order) // 2
        block = functools.partial(
            ModulatedConv2dBlock, self.features,
            kernel_size=self.kernel_size, demodulate=self.demodulate,
            nonlinearity=self.nonlinearity,
            apply_noise=self.apply_noise, dtype=self.dtype)
        h = block(order=self.order[:half], name='conv_block_0')(
            x, z, noise_key)
        h = block(order=self.order[half:], name='conv_block_1')(
            h, z, noise_key)
        if x.shape[-1] != self.features:
            x = Conv2dBlock(self.features, kernel_size=1,
                            nonlinearity='none', order='C',
                            dtype=self.dtype, name='conv_block_s')(x)
        return self.output_scale * (h + x)


# ---------------------------------------------------------------------------
# MultiOut blocks (`conv.py` _MultiOutBaseConvBlock,
# `residual.py:1284-1331`)
# ---------------------------------------------------------------------------

class MultiOutConv2dBlock(nn.Module):
    """Conv block whose norm step may emit an auxiliary output
    (`conv.py` MultiOutConv2dBlock). With
    activation_norm_type='split_mean_std' the aux is the per-channel
    (mean, std) map; otherwise aux is None."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    order: str = 'CNA'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats=False):
        pad = (self.kernel_size - 1) // 2
        conv = nn.Conv(self.features,
                       (self.kernel_size, self.kernel_size),
                       strides=(self.stride, self.stride),
                       padding=((pad, pad), (pad, pad)),
                       kernel_init=xavier_gain(), dtype=self.dtype,
                       name='conv')
        aux = None
        for op in self.order.upper():
            if op == 'C':
                x = conv(x)
            elif op == 'N':
                if self.activation_norm_type == 'split_mean_std':
                    x, aux = SplitMeanStd(name='norm')(x)
                else:
                    norm = make_norm(self.activation_norm_type,
                                     x.shape[-1])
                    if norm is not None:
                        x = norm(x)
            elif op == 'A':
                fn = get_nonlinearity(self.nonlinearity)
                if fn is not None:
                    x = fn(x)
        return x, aux


class MultiOutRes2dBlock(nn.Module):
    """Residual block returning (out, aux0, aux1)
    (`residual.py:1284-1331`)."""
    features: int
    kernel_size: int = 3
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    order: str = 'CNACNA'
    output_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats=False):
        half = len(self.order) // 2
        block = functools.partial(
            MultiOutConv2dBlock, self.features,
            kernel_size=self.kernel_size,
            activation_norm_type=self.activation_norm_type,
            nonlinearity=self.nonlinearity, dtype=self.dtype)
        h, aux0 = block(order=self.order[:half], name='conv_block_0')(
            x, update_stats)
        h, aux1 = block(order=self.order[half:], name='conv_block_1')(
            h, update_stats)
        if x.shape[-1] != self.features:
            x, _ = MultiOutConv2dBlock(
                self.features, kernel_size=1, nonlinearity='none',
                order='C', dtype=self.dtype, name='conv_block_s')(
                x, update_stats)
        return self.output_scale * (h + x), aux0, aux1


# ---------------------------------------------------------------------------
# Partial convolutions, rank 3 + block/residual/sequential forms
# (`conv.py:910-1105,1307-1366`, `misc.py:33-48`)
# ---------------------------------------------------------------------------

class PartialConv3d(nn.Module):
    """Partial 3D convolution (`conv.py:1307-1366`), NDHWC; same
    mask-window renormalization contract as `blocks.PartialConv2d`."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    multi_channel: bool = False
    return_mask: bool = True

    @nn.compact
    def __call__(self, x, mask_in=None):
        k = self.kernel_size
        pad = (k - 1) // 2
        conv = nn.Conv(self.features, (k, k, k),
                       strides=(self.stride,) * 3,
                       padding=((pad, pad),) * 3,
                       use_bias=self.use_bias, kernel_init=xavier_gain(),
                       name='conv')
        cin = x.shape[-1]
        if mask_in is None:
            mask = jnp.ones(x.shape[:4] + ((cin,) if self.multi_channel
                                           else (1,)), x.dtype)
        else:
            mask = mask_in
        win = jax.lax.reduce_window(
            mask, 0.0, jax.lax.add, (1, k, k, k, 1),
            (1,) + (self.stride,) * 3 + (1,),
            ((0, 0),) + ((pad, pad),) * 3 + ((0, 0),))
        if self.multi_channel:
            win = jnp.sum(win, axis=-1, keepdims=True)
            slide = float(cin * k ** 3)
        else:
            slide = float(k ** 3)
        mask_ratio = slide / (win + 1e-6)
        update_mask = jnp.clip(win, 0.0, 1.0)
        mask_ratio = mask_ratio * update_mask

        raw = conv(x * mask if mask_in is not None else x)
        if self.use_bias:
            b = self.variables['params']['conv']['bias']
            out = (raw - b) * mask_ratio + b
            out = out * update_mask
        else:
            out = raw * mask_ratio
        if self.return_mask:
            return out, update_mask
        return out


class _PartialConvNdBlock(nn.Module):
    """Order-string block over a partial conv; the mask threads
    through and is returned (`conv.py:910-1028` _BasePartialConvBlock)."""
    features: int
    spatial_rank: int = 2
    kernel_size: int = 3
    stride: int = 1
    multi_channel: bool = False
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    order: str = 'CNA'

    @nn.compact
    def __call__(self, x, mask_in=None):
        from scenedreamer_tpu.models.blocks import PartialConv2d
        cls = PartialConv2d if self.spatial_rank == 2 else PartialConv3d
        mask = mask_in
        for op in self.order.upper():
            if op == 'C':
                x, mask = cls(self.features, self.kernel_size,
                              stride=self.stride,
                              multi_channel=self.multi_channel,
                              name='conv')(x, mask)
            elif op == 'N':
                norm = make_norm(self.activation_norm_type, x.shape[-1])
                if norm is not None:
                    x = norm(x)
            elif op == 'A':
                fn = get_nonlinearity(self.nonlinearity)
                if fn is not None:
                    x = fn(x)
        return x, mask


class PartialConv2dBlock(_PartialConvNdBlock):
    spatial_rank: int = 2


class PartialConv3dBlock(_PartialConvNdBlock):
    spatial_rank: int = 3


class _PartialResNdBlock(nn.Module):
    """Residual partial-conv block (`residual.py` PartialRes2dBlock /
    PartialRes3dBlock): mask from the residual branch is returned."""
    features: int
    spatial_rank: int = 2
    kernel_size: int = 3
    multi_channel: bool = False
    nonlinearity: str = 'leakyrelu'
    order: str = 'CNACNA'

    @nn.compact
    def __call__(self, x, mask_in=None):
        half = len(self.order) // 2
        block = functools.partial(
            _PartialConvNdBlock, self.features,
            spatial_rank=self.spatial_rank,
            kernel_size=self.kernel_size,
            multi_channel=self.multi_channel,
            nonlinearity=self.nonlinearity)
        h, mask = block(order=self.order[:half], name='conv_block_0')(
            x, mask_in)
        h, mask = block(order=self.order[half:], name='conv_block_1')(
            h, mask)
        if x.shape[-1] != self.features:
            x, _ = _PartialConvNdBlock(
                self.features, spatial_rank=self.spatial_rank,
                kernel_size=1, nonlinearity='none', order='C',
                name='conv_block_s')(x, mask_in)
        return h + x, mask


class PartialRes2dBlock(_PartialResNdBlock):
    spatial_rank: int = 2


class PartialRes3dBlock(_PartialResNdBlock):
    spatial_rank: int = 3


def partial_sequential(modules, x, mask):
    """Chain partial-conv modules, threading (act, mask)
    (`misc.py:33-48` PartialSequential — the reference packs the mask
    as the input's last channel; we keep it an explicit operand)."""
    for m in modules:
        x, mask = m(x, mask)
    return x, mask


# ---------------------------------------------------------------------------
# Hyper residual block + hyper SPADE norm
# (`residual.py:613-667`, `activation_norm.py:334-424`)
# ---------------------------------------------------------------------------

class HyperRes2dBlock(nn.Module):
    """Residual pair of hyper conv blocks whose kernels arrive as call
    inputs (`residual.py:613-667`): conv_weights/biases are 3-tuples
    for (block_0, block_1, shortcut); None entries fall back to a
    plain parameterized conv block."""
    features: int
    kernel_size: int = 3
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    order: str = 'CNACNA'
    output_scale: float = 1.0

    @nn.compact
    def __call__(self, x, conv_weights=(None,) * 3):
        from scenedreamer_tpu.models.blocks import (Conv2dBlock,
                                                    HyperConv2dBlock)
        half = len(self.order) // 2

        def run(h, idx, order, name):
            w = conv_weights[idx] if idx < len(conv_weights) else None
            if w is None:
                return Conv2dBlock(
                    self.features, self.kernel_size,
                    activation_norm_type=self.activation_norm_type,
                    nonlinearity=self.nonlinearity, order=order,
                    name=name)(h)
            return HyperConv2dBlock(
                self.features, self.kernel_size,
                activation_norm_type=self.activation_norm_type,
                nonlinearity=self.nonlinearity, order=order,
                name=name)(h, conv_weights=w)

        h = run(x, 0, self.order[:half], 'conv_block_0')
        h = run(h, 1, self.order[half:], 'conv_block_1')
        if x.shape[-1] != self.features:
            x = run(x, 2, 'C', 'conv_block_s')
        return self.output_scale * (h + x)


class HyperSpatiallyAdaptiveNorm(nn.Module):
    """SPADE whose first conditional head may take hypernetwork conv
    weights (`activation_norm.py:334-424`). cond_inputs entries may be
    None (skipped) or (cond, mask) pairs — the mask zeroes gamma/beta
    where it is 1, after bilinear resize."""
    features: int
    cond_dims: Sequence[int]
    num_filters: int = 0
    kernel_size: int = 3
    is_hyper: bool = True

    @nn.compact
    def __call__(self, x, cond_inputs, norm_weights=None):
        from scenedreamer_tpu.models.blocks import Conv2dBlock
        from scenedreamer_tpu.models.blocks import _FrozenBatchNorm2d
        from scenedreamer_tpu.models import blocks as _blocks
        out = _FrozenBatchNorm2d(x.shape[-1], affine=False,
                                 name='norm')(x)
        size = x.shape[1:3]
        for i in range(len(self.cond_dims)):
            ci = cond_inputs[i] if i < len(cond_inputs) else None
            if ci is None:
                continue
            if isinstance(ci, (tuple, list)):
                cond, mask = ci
                mask = jax.image.resize(
                    mask, mask.shape[:1] + size + mask.shape[-1:],
                    'bilinear')
            else:
                cond, mask = ci, None
            label = jax.image.resize(
                cond, cond.shape[:1] + size + cond.shape[-1:], 'nearest')
            if self.is_hyper and i == 0:
                # hyper head: weights come from the caller
                # (activation_norm.py:379-380,414-416)
                w, b = (norm_weights if norm_weights is not None
                        else (None, None))
                affine = _blocks.hyper_conv2d(
                    label, w, b, padding=(self.kernel_size - 1) // 2)
            else:
                h = label
                if self.num_filters > 0:
                    h = Conv2dBlock(self.num_filters, self.kernel_size,
                                    nonlinearity='relu',
                                    name=f'mlp_{i}_0')(h)
                affine = Conv2dBlock(2 * self.features,
                                     self.kernel_size,
                                     nonlinearity='none',
                                     name=f'mlp_{i}_1')(h)
            gamma, beta = jnp.split(affine, 2, axis=-1)
            if mask is not None:
                gamma = gamma * (1.0 - mask)
                beta = beta * (1.0 - mask)
            out = out * (1.0 + gamma) + beta
        return out


# ---------------------------------------------------------------------------
# Embeddings (`conv.py:440-486,1370-1380`)
# ---------------------------------------------------------------------------

class Embedding2d(nn.Module):
    """Per-pixel label embedding: int map [N, H, W] or [N, H, W, 1]
    -> [N, H, W, features] (`conv.py:1370-1380`)."""
    num_classes: int
    features: int

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4:
            x = x[..., 0]
        return nn.Embed(self.num_classes, self.features,
                        name='embed')(x.astype(jnp.int32))


class EmbeddingBlock(nn.Module):
    """Order-string block whose 'C' is an embedding lookup over int
    ids (`conv.py:440-462`)."""
    num_classes: int
    features: int
    nonlinearity: str = 'none'
    order: str = 'CNA'

    @nn.compact
    def __call__(self, x):
        for op in self.order.upper():
            if op == 'C':
                x = nn.Embed(self.num_classes, self.features,
                             name='embed')(x.astype(jnp.int32))
            elif op == 'A':
                fn = get_nonlinearity(self.nonlinearity)
                if fn is not None:
                    x = fn(x)
        return x


class Embedding2dBlock(nn.Module):
    """`EmbeddingBlock` over 2-D label maps (`conv.py:464-486`)."""
    num_classes: int
    features: int
    nonlinearity: str = 'none'
    order: str = 'CNA'

    @nn.compact
    def __call__(self, x):
        for op in self.order.upper():
            if op == 'C':
                x = Embedding2d(self.num_classes, self.features,
                                name='embed2d')(x)
            elif op == 'A':
                fn = get_nonlinearity(self.nonlinearity)
                if fn is not None:
                    x = fn(x)
        return x

"""Composable layer library: order-string Conv/Linear/Res blocks,
up/fir/down resampling, fused bias+activation.

Capability parity with the reference layer library (SURVEY.md §2.8):
  * `Conv2dBlock` / `LinearBlock` with order strings ('CNA', 'NAC',
    'ANC', 'CAN', ...) over Conv/Norm/Activation
    (`imaginaire/layers/conv.py:16-140`)
  * `Res2dBlock` with learned shortcut and up/down variants
    (`imaginaire/layers/residual.py`)
  * activation norms: none / batch(frozen) / instance / layer / group
    (`imaginaire/layers/activation_norm.py` get_activation_norm_layer);
    SPADE + adaptive variants live in `models/spade.py`
  * weight norms: none / spectral / weight
    (`imaginaire/layers/weight_norm.py` get_weight_norm_layer); weight
    demodulation is `ModLinear` (`models/layers.py`) for linears and
    `ModulatedConv2d` (`models/blocks_ext.py`) for convs; equalized LR
    is `EqualizedDense` below
  * `upfirdn2d` / `Blur` / `BlurUpsample` / `BlurDownsample`
    (`imaginaire/third_party/upfirdn2d`, StyleGAN2 resampling)
  * `bias_act` (`imaginaire/third_party/bias_act`): on TPU the bias+act
    is a plain jnp expression — XLA fuses it into the producing matmul,
    which is exactly what the CUDA "fused" kernel hand-writes
  * flow-model ops channelnorm / correlation / resample2d
    (`third_party/{channelnorm,correlation,resample2d}`) — unused by
    any SceneDreamer model but provided TPU-natively in `ops/flow.py`
    for the full imaginaire layer surface.

TPU-native: everything is jnp/flax NHWC; the FIR resampling is a
depthwise conv XLA maps onto fused convolution hardware paths.
"""
import functools
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from scenedreamer_tpu.models.discriminator import xavier_gain


# ---------------------------------------------------------------------------
# bias_act (`third_party/bias_act/bias_act.py:12-39`)
# ---------------------------------------------------------------------------

_ACTS = {
    'linear': (lambda x: x, 1.0),
    'relu': (jax.nn.relu, np.sqrt(2.0)),
    'lrelu': (lambda x: jax.nn.leaky_relu(x, 0.2), np.sqrt(2.0)),
    'leakyrelu': (lambda x: jax.nn.leaky_relu(x, 0.2), 1.0),
    'tanh': (jnp.tanh, 1.0),
    'sigmoid': (jax.nn.sigmoid, 1.0),
    'elu': (jax.nn.elu, 1.0),
    'selu': (jax.nn.selu, 1.0),
    'softplus': (jax.nn.softplus, 1.0),
    'swish': (jax.nn.silu, np.sqrt(2.0)),
}


def bias_act(x, b=None, act='linear', gain=None, clamp=None):
    """Fused bias + activation + gain + clamp semantics
    (`bias_act.py:59-86` reference implementation)."""
    fn, def_gain = _ACTS[act]
    if b is not None:
        x = x + b.reshape((1,) * (x.ndim - 1) + (-1,))
    x = fn(x)
    g = def_gain if gain is None else gain
    if g != 1.0:
        x = x * g
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x


# ---------------------------------------------------------------------------
# upfirdn2d (`third_party/upfirdn2d/upfirdn2d.py`)
# ---------------------------------------------------------------------------

def setup_filter(f=None, normalize=True, gain=1.0, separable=None):
    """1D/2D FIR kernel -> normalized 2D filter (default [1,3,3,1])."""
    if f is None:
        f = [1.0, 3.0, 3.0, 1.0]
    f = np.asarray(f, np.float32)
    if f.ndim == 1:
        f = np.outer(f, f)
    if normalize:
        f = f / f.sum()
    return f * gain


def upfirdn2d(x, f, up=1, down=1, padding=0, gain=1.0):
    """Upsample (zero-stuff) -> FIR filter -> downsample, NHWC
    (contract of `upfirdn2d.py` with the CUDA kernel replaced by a
    depthwise conv)."""
    b, h, w, c = x.shape
    if isinstance(padding, int):
        padding = (padding, padding, padding, padding)  # l r t b
    px0, px1, py0, py1 = padding

    if up > 1:
        z = jnp.zeros((b, h, up, w, up, c), x.dtype)
        z = z.at[:, :, 0, :, 0, :].set(x)
        x = z.reshape(b, h * up, w * up, c)
    x = jnp.pad(x, ((0, 0), (max(py0, 0), max(py1, 0)),
                    (max(px0, 0), max(px1, 0)), (0, 0)))
    if min(px0, px1, py0, py1) < 0:
        x = x[:, max(-py0, 0):x.shape[1] - max(-py1, 0),
              max(-px0, 0):x.shape[2] - max(-px1, 0)]

    fh, fw = f.shape
    kern = jnp.asarray(f[::-1, ::-1] * (gain * (up ** 2)),
                       x.dtype)[..., None, None]          # [fh, fw, 1, 1]
    kern = jnp.tile(kern, (1, 1, 1, x.shape[-1]))
    y = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=x.shape[-1])
    if down > 1:
        y = y[:, ::down, ::down]
    return y


class Blur(nn.Module):
    """FIR blur, shape-preserving (`upfirdn2d.py` Blur module)."""
    kernel: Any = None

    @nn.compact
    def __call__(self, x):
        f = setup_filter(self.kernel)
        p = f.shape[0] - 1
        return upfirdn2d(x, f, padding=(p // 2, p - p // 2, p // 2,
                                        p - p // 2))


class BlurUpsample(nn.Module):
    kernel: Any = None

    @nn.compact
    def __call__(self, x):
        f = setup_filter(self.kernel)
        p = f.shape[0] - 2
        return upfirdn2d(x, f, up=2, gain=1.0,
                         padding=((p + 1) // 2 + 1, p // 2,
                                  (p + 1) // 2 + 1, p // 2))


class BlurDownsample(nn.Module):
    kernel: Any = None

    @nn.compact
    def __call__(self, x):
        f = setup_filter(self.kernel)
        p = f.shape[0] - 2
        return upfirdn2d(x, f, down=2,
                         padding=((p + 1) // 2, p // 2,
                                  (p + 1) // 2, p // 2))


# ---------------------------------------------------------------------------
# activation norms (`layers/activation_norm.py` get_activation_norm_layer)
# ---------------------------------------------------------------------------

class _FrozenBatchNorm2d(nn.Module):
    features: int
    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((self.features,)))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((self.features,)))
        y = (x - mean.value) * jax.lax.rsqrt(var.value + self.eps)
        if self.affine:
            scale = self.param('scale', nn.initializers.ones,
                               (self.features,))
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,))
            y = y * scale + bias
        return y


def weight_norm_conv(mod, x, features, kernel_shape, stride, use_bias,
                     dtype=jnp.float32):
    """Classic weight normalization w = g * v/||v||_per-out-channel
    (`weight_norm.py:246` get_weight_norm_layer 'weight'), matching
    torch's identity-at-init contract: g initializes to ||v|| so the
    normalized conv equals the plain conv at initialization (flax's
    nn.WeightNorm initializes scale to 1, which silently renormalizes
    the init — wrong dynamics and unconvertible checkpoints).

    kernel_shape: spatial dims tuple; works for any rank (NWC/NHWC/
    NDHWC)."""
    rank = len(kernel_shape)
    in_f = x.shape[-1]
    v = mod.param('wn_v', xavier_gain(),
                  kernel_shape + (in_f, features))
    norm_axes = tuple(range(rank + 1))           # all but the out axis
    g = mod.param('wn_g',
                  lambda key: jnp.sqrt(jnp.sum(v * v, axis=norm_axes)))
    w = v * (g * jax.lax.rsqrt(
        jnp.sum(v * v, axis=norm_axes) + 1e-12))
    pads = tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel_shape)
    specs = {1: ('NWC', 'WIO', 'NWC'), 2: ('NHWC', 'HWIO', 'NHWC'),
             3: ('NDHWC', 'DHWIO', 'NDHWC')}[rank]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (stride,) * rank, pads,
        dimension_numbers=specs)
    if use_bias:
        b = mod.param('wn_bias', nn.initializers.zeros, (features,))
        y = y + b.astype(dtype)
    return y


def make_norm(norm_type, features):
    """Norm factory; None for 'none'."""
    if norm_type in (None, 'none', ''):
        return None
    if norm_type in ('batch', 'sync_batch'):
        return _FrozenBatchNorm2d(features)
    if norm_type == 'instance':
        return nn.GroupNorm(num_groups=features, use_bias=False,
                            use_scale=False)
    if norm_type == 'layer':
        return nn.LayerNorm()
    if norm_type == 'layer_2d':
        return nn.LayerNorm(reduction_axes=(-3, -2, -1))
    if norm_type == 'group':
        return nn.GroupNorm(num_groups=min(32, features))
    raise ValueError(f'unknown activation norm {norm_type}')


# ---------------------------------------------------------------------------
# Conv2dBlock / LinearBlock / Res2dBlock (`layers/conv.py`, `residual.py`)
# ---------------------------------------------------------------------------

class Conv2dBlock(nn.Module):
    """Order-string composable conv block (`layers/conv.py:16-140`).

    order: permutation of C (conv), N (norm), A (activation); e.g.
    'CNA' (default), 'NAC' (pre-act), 'ANC'.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    weight_norm_type: str = 'none'       # 'none' | 'spectral'
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    order: str = 'CNA'
    blur: bool = False                   # pre-conv FIR blur
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats=False):
        pad = (self.kernel_size - 1) // 2
        conv = nn.Conv(self.features,
                       (self.kernel_size, self.kernel_size),
                       strides=(self.stride, self.stride),
                       padding=((pad, pad), (pad, pad)),
                       use_bias=self.use_bias,
                       kernel_init=xavier_gain(),
                       dtype=self.dtype, name='conv')
        in_f = x.shape[-1]

        def apply_conv(h):
            if self.blur and self.stride == 2:
                h = Blur(name='blur')(h)
            if self.weight_norm_type == 'spectral':
                return nn.SpectralNorm(
                    conv, collection_name='spectral_stats')(
                    h, update_stats=update_stats)
            if self.weight_norm_type == 'weight':
                return weight_norm_conv(
                    self, h, self.features, (self.kernel_size,) * 2,
                    self.stride, self.use_bias, dtype=self.dtype)
            if self.weight_norm_type not in ('none', '', None):
                # 'weight_demod' is the conditional ModulatedConv2d
                # (blocks_ext), 'equalized_lr' the EqualizedDense init.
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
                if self.nonlinearity not in (None, 'none', ''):
                    if self.nonlinearity.startswith('fused_'):
                        # StyleGAN fused path keeps its def_gain
                        x = bias_act(x, act=self.nonlinearity[6:])
                    else:
                        # torch get_nonlinearity_layer semantics: NO
                        # sqrt(2) gain on relu/lrelu
                        x = bias_act(x, act=self.nonlinearity,
                                     gain=1.0)
            else:
                raise ValueError(f'bad order char {op}')
        return x


class LinearBlock(nn.Module):
    """Order-string linear block (`layers/conv.py` LinearBlock)."""
    features: int
    use_bias: bool = True
    nonlinearity: str = 'none'
    order: str = 'CNA'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dense = nn.Dense(self.features, use_bias=self.use_bias,
                         kernel_init=xavier_gain(), dtype=self.dtype,
                         name='fc')
        for op in self.order.upper():
            if op == 'C':
                x = dense(x)
            elif op == 'A' and self.nonlinearity not in (None, 'none',
                                                         ''):
                if self.nonlinearity.startswith('fused_'):
                    x = bias_act(x, act=self.nonlinearity[6:])
                else:
                    # torch semantics: no sqrt(2) act gain
                    x = bias_act(x, act=self.nonlinearity, gain=1.0)
        return x


class Res2dBlock(nn.Module):
    """Residual conv block with learned shortcut
    (`layers/residual.py` Res2dBlock)."""
    features: int
    kernel_size: int = 3
    weight_norm_type: str = 'none'
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    order: str = 'CNACNA'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats=False):
        half = len(self.order) // 2
        block = functools.partial(
            Conv2dBlock, self.features, kernel_size=self.kernel_size,
            weight_norm_type=self.weight_norm_type,
            activation_norm_type=self.activation_norm_type,
            nonlinearity=self.nonlinearity, dtype=self.dtype)
        h = block(order=self.order[:half], name='conv_block_0')(
            x, update_stats)
        h = block(order=self.order[half:], name='conv_block_1')(
            h, update_stats)
        if x.shape[-1] != self.features:
            x = Conv2dBlock(self.features, kernel_size=1,
                            use_bias=False,
                            weight_norm_type=self.weight_norm_type,
                            nonlinearity='none', order='C',
                            dtype=self.dtype, name='conv_block_s')(
                x, update_stats)
        return h + x


class ApplyNoise(nn.Module):
    """Learned-scale additive noise (`layers/misc.py` ApplyNoise,
    StyleGAN-style)."""

    @nn.compact
    def __call__(self, x, key=None):
        scale = self.param('scale', nn.initializers.zeros, ())
        if key is None:
            key = self.make_rng('noise')
        noise = jax.random.normal(key, x.shape[:-1] + (1,), x.dtype)
        return x + scale * noise


def equalized_lr_init(lr_mul=1.0):
    """Equalized learning rate (`layers/weight_norm.py:76-185` ScaledLR):
    params stored at N(0, 1/lr_mul), rescaled at use time by
    he_std * lr_mul so the effective LR of every tensor matches."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) / lr_mul
    return init


class EqualizedDense(nn.Module):
    """Dense with runtime He rescale (equalized LR)."""
    features: int
    lr_mul: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param('weight', equalized_lr_init(self.lr_mul),
                       (self.features, x.shape[-1]))
        he = np.sqrt(2.0 / x.shape[-1]) * self.lr_mul
        y = jnp.einsum('...i,oi->...o', x, w * he)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros,
                           (self.features,))
            y = y + b * self.lr_mul
        return y


class NonLocal2dBlock(nn.Module):
    """Self-attention over spatial positions
    (`layers/non_local.py`, embedded-gaussian non-local block)."""
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inner = max(1, c // self.reduction)
        theta = nn.Conv(inner, (1, 1), name='theta')(x).reshape(b, -1,
                                                                inner)
        phi = nn.Conv(inner, (1, 1), name='phi')(x).reshape(b, -1, inner)
        gf = nn.Conv(inner, (1, 1), name='g')(x).reshape(b, -1, inner)
        attn = jax.nn.softmax(
            jnp.einsum('bnc,bmc->bnm', theta, phi)
            / np.sqrt(inner), axis=-1)
        y = jnp.einsum('bnm,bmc->bnc', attn, gf).reshape(b, h, w, inner)
        gamma = self.param('gamma', nn.initializers.zeros, ())
        return x + gamma * nn.Conv(c, (1, 1), name='out')(y)


class Res2dBlockDown(nn.Module):
    """Residual block with stride-2 (blur-)downsample
    (`layers/residual.py` DownRes2dBlock)."""
    features: int
    kernel_size: int = 3
    weight_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    blur: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats=False):
        h = Conv2dBlock(self.features, self.kernel_size,
                        weight_norm_type=self.weight_norm_type,
                        nonlinearity=self.nonlinearity, order='AC',
                        dtype=self.dtype, name='c0')(x, update_stats)
        h = Conv2dBlock(self.features, self.kernel_size, stride=2,
                        weight_norm_type=self.weight_norm_type,
                        nonlinearity=self.nonlinearity, order='AC',
                        blur=self.blur, dtype=self.dtype,
                        name='c1')(h, update_stats)
        xs = Conv2dBlock(self.features, 1, stride=2, use_bias=False,
                         weight_norm_type=self.weight_norm_type,
                         nonlinearity='none', order='C', blur=self.blur,
                         dtype=self.dtype, name='cs')(x, update_stats)
        return h + xs


class PartialConv2d(nn.Module):
    """Partial convolution (Liu et al. ECCV 2018;
    `layers/conv.py:1222-1305` PartialConv2d).

    NHWC. The mask-sum renormalization conv is a constant-weight
    depthwise/full conv XLA folds into one fused reduce; eps and
    bias handling match the reference exactly (eps 1e-6, bias added
    back outside the renormalization, output zeroed where the window
    saw no valid input).
    """
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
        conv = nn.Conv(self.features, (k, k),
                       strides=(self.stride, self.stride),
                       padding=((pad, pad), (pad, pad)),
                       use_bias=self.use_bias, kernel_init=xavier_gain(),
                       name='conv')
        cin = x.shape[-1]
        if mask_in is None:
            mask = jnp.ones(x.shape[:3] + ((cin,) if self.multi_channel
                                           else (1,)), x.dtype)
        else:
            mask = mask_in
        win = jax.lax.reduce_window(
            mask, 0.0, jax.lax.add, (1, k, k, 1),
            (1, self.stride, self.stride, 1),
            ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        if self.multi_channel:
            win = jnp.sum(win, axis=-1, keepdims=True)
            slide = float(cin * k * k)
        else:
            slide = float(k * k)
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


def hyper_conv2d(x, conv_weight, conv_bias=None, stride=1, padding=1,
                 dilation=1):
    """Per-sample-weight convolution (`layers/conv.py:806-888`
    HyperConv2d): weights come from a hypernetwork, one kernel per
    batch item.

    TPU-native: instead of the reference's per-sample Python loop of
    cuDNN calls, ONE vmapped `lax.conv_general_dilated` — XLA lowers it
    to a batched convolution on the MXU.

    Args:
        x: [N, H, W, Cin].
        conv_weight: [N, kh, kw, Cin, Cout] per-sample HWIO kernels.
        conv_bias: optional [N, Cout].
    Returns: [N, H', W', Cout].
    """
    if conv_weight is None:
        return x

    def one(xi, wi):
        return jax.lax.conv_general_dilated(
            xi[None], wi, (stride, stride),
            ((padding, padding), (padding, padding)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]

    out = jax.vmap(one)(x, conv_weight)
    if conv_bias is not None:
        out = out + conv_bias[:, None, None, :]
    return out


class HyperConv2dBlock(nn.Module):
    """Order-string block around `hyper_conv2d`
    (`layers/conv.py:694-804` _BaseHyperConvBlock / HyperConv2dBlock).
    The conv weights arrive as call inputs (hypernetwork outputs), so
    the block owns no kernel parameters — only the optional norm."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    order: str = 'CNA'

    @nn.compact
    def __call__(self, x, conv_weights=(None, None)):
        w, b = (conv_weights if isinstance(conv_weights, (tuple, list))
                else (conv_weights, None))
        for i, op in enumerate(self.order.upper()):
            if op == 'C':
                x = hyper_conv2d(x, w, b, stride=self.stride,
                                 padding=(self.kernel_size - 1) // 2)
            elif op == 'N':
                norm = make_norm(self.activation_norm_type, x.shape[-1])
                if norm is not None:
                    x = norm(x)
            elif op == 'A':
                if self.nonlinearity not in (None, 'none', ''):
                    if self.nonlinearity.startswith('fused_'):
                        x = bias_act(x, act=self.nonlinearity[6:])
                    else:
                        x = bias_act(x, act=self.nonlinearity, gain=1.0)
        return x


class ViT2dBlock(nn.Module):
    """StyleGAN-flavoured order-string block with blur + noise slots,
    fractional stride, learnable output scale and post-conv max-clamp
    (`layers/vit.py:14-170` ViT2dBlock — unused by every shipped
    reference config; implemented for layer-library parity).

    order: permutation of C (conv), N (norm), A (activation). Like the
    reference, 'B' (blur) and 'G' (noise) slots are spliced around C:
    stride 2 -> blur-then-conv (FIR antialias before downsample),
    stride 0.5 -> transposed-conv-then-blur, apply_noise -> learned
    noise right after conv. The linear (input_dim == 0) variant of the
    reference is `LinearBlock`.
    """
    features: int
    kernel_size: int = 3
    stride: float = 1
    use_bias: bool = True
    weight_norm_type: str = 'none'
    activation_norm_type: str = 'none'
    nonlinearity: str = 'leakyrelu'
    apply_noise: bool = False
    blur: bool = False
    order: str = 'CNA'
    clamp: Any = None            # conv output max-clamp (vit.py:143-144)
    output_scale: Any = None     # init for a learned post-conv scalar
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats=False, noise_key=None):
        order = self.order.upper()
        if self.apply_noise:
            order = order.replace('C', 'CG')
        if self.blur and self.stride == 2:
            order = order.replace('C', 'BC')
        elif self.blur and self.stride == 0.5:
            order = order.replace('C', 'CB')

        in_f = x.shape[-1]
        pad = (self.kernel_size - 1) // 2
        if self.stride == 0.5:
            # reference vit.py:157-161: fractional stride =
            # ConvTranspose2d(stride=2, padding=0) -> out 2*in-2+k
            # ('VALID' reproduces torch's padding=0 output size;
            # CLAUDE.md bans 'SAME' on strided convs for parity)
            conv = nn.ConvTranspose(
                self.features, (self.kernel_size, self.kernel_size),
                strides=(2, 2), padding='VALID', use_bias=self.use_bias,
                kernel_init=xavier_gain(), dtype=self.dtype, name='conv')
        else:
            s = int(self.stride)
            conv = nn.Conv(self.features,
                           (self.kernel_size, self.kernel_size),
                           strides=(s, s), padding=((pad, pad), (pad, pad)),
                           use_bias=self.use_bias, kernel_init=xavier_gain(),
                           dtype=self.dtype, name='conv')

        def apply_conv(h):
            if self.weight_norm_type == 'spectral':
                h = nn.SpectralNorm(
                    conv, collection_name='spectral_stats')(
                    h, update_stats=update_stats)
            else:
                h = conv(h)
            if self.clamp is not None:
                h = jnp.minimum(h, self.clamp)
            if self.output_scale is not None:
                scale = self.param(
                    'output_scale',
                    lambda k: jnp.asarray(self.output_scale, jnp.float32))
                h = h * scale
            return h

        for i, op in enumerate(order):
            if op == 'C':
                x = apply_conv(x)
            elif op == 'B':
                x = Blur(name='blur')(x)
            elif op == 'G':
                x = ApplyNoise(name='noise')(x, key=noise_key)
            elif op == 'N':
                pre_conv = 'C' not in order[:i]
                norm = make_norm(self.activation_norm_type,
                                 in_f if pre_conv else self.features)
                if norm is not None:
                    x = norm(x)
            elif op == 'A':
                if self.nonlinearity not in (None, 'none', ''):
                    if self.nonlinearity.startswith('fused_'):
                        x = bias_act(x, act=self.nonlinearity[6:])
                    else:
                        x = bias_act(x, act=self.nonlinearity, gain=1.0)
            else:
                raise ValueError(f'bad order char {op}')
        return x


class ConstantInput(nn.Module):
    """Learned constant input map (`layers/misc.py:51-76`; StyleGAN2
    head). Returns the constant broadcast to the batch size."""
    features: int
    size: int = 4

    @nn.compact
    def __call__(self, batch_size):
        const = self.param('const', nn.initializers.normal(1.0),
                           (1, self.size, self.size, self.features))
        return jnp.broadcast_to(
            const, (batch_size,) + const.shape[1:])

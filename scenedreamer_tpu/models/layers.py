"""Core flax building blocks: style-modulated linears and the neural-field
MLPs.

Capability parity with the reference model primitives:
  * ModLinear / AffineMod  (`imaginaire/model_utils/layers.py:128-271`,
    StyleGAN2-style modulation, output-side bias mode)
  * RenderMLP == LightningMLP  (`imaginaire/generators/gancraft_base.py:20-88`
    and `model_utils/layers.py:57-126`; numerically identical twins in the
    reference, one class here)
  * StyleMLP (`gancraft_base.py:91-126`), SKYMLP (`gancraft_base.py:129-169`)
  * ConditionalHashGrid world encoder (`model_utils/layers.py:25-55`)
  * RenderCNN (`gancraft_base.py:172-225`)

TPU-native design: all layers are flax.linen modules operating on
channels-last tensors. The per-sample MLP stack folds every pixel/sample
into one [B, N, C] batched matmul per layer so XLA tiles it straight onto
the MXU. A `dtype` attribute selects bf16 compute with f32 params.

Initialization matches the reference's effective scheme: the generator's
`custom_init` (`generators/scenedreamer.py:66-78`) overrides the global
xavier init with kaiming(leaky 0.2) x 0.5 for `.weight` tensors and zero
biases, while modulation weights keep their randn/sqrt(fan) init.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def kaiming_leaky_half(a=0.2, scale=0.5):
    """kaiming_normal_(a=0.2, leaky_relu) followed by *= 0.5."""
    gain = np.sqrt(2.0 / (1.0 + a * a))

    def init(key, shape, dtype=jnp.float32):
        # linear weight [out, in] or conv kernel [kh, kw, in, out]
        if len(shape) == 2:
            fan_in = shape[1]
        else:
            fan_in = int(np.prod(shape[:-1]))
        std = gain / np.sqrt(fan_in) * scale
        return jax.random.normal(key, shape, dtype) * std
    return init


def mod_weight_init(key, shape, dtype=jnp.float32):
    """randn / sqrt(style_features) (reference layers.py:143,212)."""
    return jax.random.normal(key, shape, dtype) / np.sqrt(shape[-1])


class Dense(nn.Module):
    """Linear layer with [out, in] weight layout and reference init."""
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param('weight', kaiming_leaky_half(),
                       (self.features, x.shape[-1]))
        y = jnp.einsum('...i,oi->...o', x.astype(self.dtype),
                       w.astype(self.dtype))
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class AffineMod(nn.Module):
    """x * alpha(z) + beta(z) (reference layers.py:128-181)."""
    mod_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        # x: [B, ..., I]; z: [B, S]
        in_f = x.shape[-1]
        s = z.shape[-1]
        wa = self.param('weight_alpha', mod_weight_init, (in_f, s))
        ba = self.param('bias_alpha', nn.initializers.ones, (in_f,))
        alpha = jnp.einsum('bs,is->bi', z, wa) + ba          # [B, I]
        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (in_f,)
        y = x * alpha.reshape(bshape).astype(self.dtype)
        if self.mod_bias:
            wb = self.param('weight_beta', mod_weight_init, (in_f, s))
            bb = self.param('bias_beta', nn.initializers.zeros, (in_f,))
            beta = jnp.einsum('bs,is->bi', z, wb) + bb
            y = y + beta.reshape(bshape).astype(self.dtype)
        return y


class ModLinear(nn.Module):
    """Style-modulated linear (reference layers.py:184-271).

    Per-batch weight w_b = W * alpha_b broadcast over the input axis;
    with output_mode the modulated bias beta_b is added on the output side.
    Evaluated as one batched matmul per call ([B, N, I] @ [B, I, O]).
    """
    features: int
    use_bias: bool = False
    mod_bias: bool = True
    output_mode: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        in_f = x.shape[-1]
        s = z.shape[-1]
        w = self.param('weight', kaiming_leaky_half(scale=1.0),
                       (self.features, in_f))
        wa = self.param('weight_alpha', mod_weight_init, (in_f, s))
        ba = self.param('bias_alpha', nn.initializers.ones, (in_f,))
        alpha = jnp.einsum('bs,is->bi', z, wa) + ba          # [B, I]

        beta = None
        if self.mod_bias:
            mod_dims = self.features if self.output_mode else in_f
            wb = self.param('weight_beta', mod_weight_init, (mod_dims, s))
            bb = self.param('bias_beta', nn.initializers.zeros, (mod_dims,))
            beta = jnp.einsum('bs,is->bi', z, wb) + bb

        prefix = x.shape[:-1]
        xb = x.reshape(x.shape[0], -1, in_f).astype(self.dtype)
        if self.mod_bias and not self.output_mode:
            xb = xb + beta[:, None].astype(self.dtype)
        w_mod = (w[None] * alpha[:, None, :]).astype(self.dtype)  # [B,O,I]
        y = jnp.einsum('bni,boi->bno', xb, w_mod,
                       preferred_element_type=self.dtype)
        b = jnp.zeros((), self.dtype)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros,
                           (self.features,)).astype(self.dtype)
        if self.mod_bias and self.output_mode:
            b = b + beta[:, None].astype(self.dtype)
        y = y + b
        return y.reshape(*prefix, self.features)


def leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


class RenderMLP(nn.Module):
    """Per-sample neural field: hash features (+seg +viewdir) + style ->
    (sigma, color feature). Reference `gancraft_base.py:20-88` /
    `LightningMLP`."""
    style_dim: int
    viewdir_dim: int
    mask_dim: int = 680
    out_channels_s: int = 1
    out_channels_c: int = 3
    hidden_channels: int = 256
    use_seg: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, raydir, z, m):
        """x: [B, ..., C_in]; raydir: [B, ..., 1, C_v] or None; z: [B, S];
        m: [B, ..., mask_dim]."""
        dense = functools.partial(Dense, dtype=self.dtype)
        mod = functools.partial(ModLinear, self.hidden_channels,
                                use_bias=False, mod_bias=True,
                                output_mode=True, dtype=self.dtype)
        f = dense(self.hidden_channels, name='fc_1')(x)
        if self.use_seg:
            f = f + dense(self.hidden_channels, use_bias=False,
                          name='fc_m_a')(m)
        f = leaky_relu(f)
        f = leaky_relu(mod(name='fc_2')(f, z))
        f = leaky_relu(mod(name='fc_3')(f, z))
        f = leaky_relu(mod(name='fc_4')(f, z))

        sigma = dense(self.out_channels_s, name='fc_sigma')(f)

        if self.viewdir_dim > 0:
            f = dense(self.hidden_channels, use_bias=False, name='fc_5')(f)
            f = f + dense(self.hidden_channels, use_bias=False,
                          name='fc_viewdir')(raydir)
            f = leaky_relu(AffineMod(name='mod_5', dtype=self.dtype)(f, z))
        else:
            f = leaky_relu(mod(name='fc_5')(f, z))
        f = leaky_relu(mod(name='fc_6')(f, z))
        c = dense(self.out_channels_c, name='fc_out_c')(f)
        return sigma, c


# Name used by the reference's hash-grid generator for the same math.
LightningMLP = RenderMLP


class StyleMLP(nn.Module):
    """Style code -> intermediate style (reference gancraft_base.py:91-126)."""
    out_dim: int
    hidden_channels: int = 256
    num_layers: int = 5
    normalize_input: bool = True
    output_act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        if self.normalize_input:
            z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True),
                                1e-12)
        for i in range(self.num_layers):
            z = leaky_relu(Dense(self.hidden_channels, dtype=self.dtype,
                                 name=f'fc_{i}')(z))
        z = Dense(self.out_dim, dtype=self.dtype, name='fc_out')(z)
        if self.output_act:
            z = leaky_relu(z)
        return z


class SKYMLP(nn.Module):
    """Ray direction embedding -> sky color feature
    (reference gancraft_base.py:129-169)."""
    style_dim: int
    out_channels_c: int = 3
    hidden_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        """x: [B, ..., C_pe]; z: [B, S]."""
        dense = functools.partial(Dense, dtype=self.dtype)
        zf = dense(self.hidden_channels, use_bias=False, name='fc_z_a')(z)
        zf = zf.reshape(zf.shape[0:1] + (1,) * (x.ndim - 2) + zf.shape[-1:])
        y = leaky_relu(dense(self.hidden_channels, name='fc1')(x) + zf)
        for i in (2, 3, 4, 5):
            y = leaky_relu(dense(self.hidden_channels, name=f'fc{i}')(y))
        return dense(self.out_channels_c, name='fc_out_c')(y)


class SRTConvBlock(nn.Module):
    """conv(s1)-relu-conv(s2)-relu (reference model_utils/layers.py:6-23)."""
    hdim: int
    odim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = functools.partial(nn.Conv, kernel_size=(3, 3), use_bias=False,
                                 padding=((1, 1), (1, 1)),
                                 kernel_init=kaiming_leaky_half(),
                                 dtype=self.dtype)
        x = jax.nn.relu(conv(self.hdim, strides=(1, 1))(x))
        x = jax.nn.relu(conv(self.odim, strides=(2, 2))(x))
        return x


class ConditionalHashGrid(nn.Module):
    """BEV height + semantic one-hot -> 2-d tanh scene code
    (reference model_utils/layers.py:25-55). Inputs are NHWC:
    height [B, S, S, 1], semantic [B, S, S, 11]."""
    num_conv_blocks: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, height, semantic):
        conv = functools.partial(nn.Conv, kernel_size=(3, 3),
                                 strides=(2, 2), padding=((1, 1), (1, 1)),
                                 kernel_init=kaiming_leaky_half(),
                                 bias_init=nn.initializers.zeros,
                                 dtype=self.dtype)
        h = leaky_relu(conv(8, name='hconv_head')(height))
        s = leaky_relu(conv(8, name='sconv_head')(semantic))
        joint = jnp.concatenate([h, s], axis=-1)
        cur = 16
        for i in range(1, self.num_conv_blocks):
            joint = leaky_relu(SRTConvBlock(hdim=cur, odim=2 * cur,
                                            dtype=self.dtype,
                                            name=f'block_{i}')(joint))
            cur *= 2
        pooled = jnp.mean(joint.reshape(joint.shape[0], -1, joint.shape[-1]),
                          axis=1)
        cond = leaky_relu(Dense(16, dtype=self.dtype, name='fc1')(pooled))
        return jnp.tanh(Dense(2, dtype=self.dtype, name='fc2')(cond))


class RenderCNN(nn.Module):
    """Style-modulated 2D refinement CNN over the composited feature map
    (reference gancraft_base.py:172-225). Input NHWC [B, H, W, C]."""
    hidden_channels: int = 256
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        conv = functools.partial(nn.Conv, kernel_init=kaiming_leaky_half(),
                                 bias_init=nn.initializers.zeros,
                                 dtype=self.dtype, padding='SAME')
        hc = self.hidden_channels
        zc = Dense(4 * hc, dtype=self.dtype, name='fc_z_cond')(z)
        a0, b0, a1, b1 = jnp.split(zc, 4, axis=-1)

        def modulate(h, w_, b_):
            return h * (w_[:, None, None, :] + 1.0) + b_[:, None, None, :]

        y = leaky_relu(conv(hc, (1, 1), name='conv1')(x))
        y = y + conv(hc, (3, 3), use_bias=False, name='conv2b')(
            leaky_relu(conv(hc, (3, 3), name='conv2a')(y)))
        y = leaky_relu(modulate(y, a0, b0))
        y = y + conv(hc, (3, 3), use_bias=False, name='conv3b')(
            leaky_relu(conv(hc, (3, 3), name='conv3a')(y)))
        y = leaky_relu(modulate(y, a1, b1))
        y = y + conv(hc, (1, 1), name='conv4b')(
            leaky_relu(conv(hc, (1, 1), name='conv4a')(y)))
        y = leaky_relu(y)
        return conv(self.out_channels, (1, 1), name='conv4')(y)


class StyleEncoder(nn.Module):
    """Image -> (mu, logvar, z) VAE-style encoder
    (reference gancraft_base.py:228-293). Input NHWC [B, 256, 256, 3];
    other sizes are bilinearly resized first."""
    style_dims: int = 128
    num_filters: int = 64
    kernel_size: int = 3
    no_vae: bool = False
    # Upper logvar bound (lower is fixed at -10). The healthy regime is
    # logvar ~ 0 +- 2, so +4 is inert there; it exists because Adam is
    # scale-invariant: a loss-flat runaway direction in fc_var (z is
    # re-normalized by StyleMLP, so the GAN/L2 terms cannot see |z|)
    # drifts as fast as the exploding KL gradient pushes back, and the
    # r5 campaign walked logvar into e^logvar overflow twice; a looser
    # +10 bound then deadlocked against skip_grad_norm (KL grads ~2e5
    # skip every update, so the pinned dims never recover). At +4 the
    # worst-case KL term AND its gradient stay small enough that
    # updates keep applying and the inward pull keeps fighting.
    # Asymmetric on purpose: very negative logvar (sharp posterior) is
    # legitimate VAE convergence and risks no overflow. 0 disables
    # (exact reference form, gancraft_base.py:287-293).
    logvar_clamp: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rng=None):
        if x.shape[1] != 256 or x.shape[2] != 256:
            x = jax.image.resize(x, (x.shape[0], 256, 256, x.shape[3]),
                                 'bilinear')
        pad = self.kernel_size // 2
        conv = functools.partial(nn.Conv,
                                 kernel_size=(self.kernel_size,
                                              self.kernel_size),
                                 strides=(2, 2),
                                 padding=((pad, pad), (pad, pad)),
                                 kernel_init=kaiming_leaky_half(),
                                 bias_init=nn.initializers.zeros,
                                 dtype=self.dtype)
        nf = self.num_filters
        for i, ch in enumerate([nf, 2 * nf, 4 * nf, 8 * nf, 8 * nf, 8 * nf]):
            x = leaky_relu(conv(ch, name=f'layer{i + 1}')(x))
        x = x.reshape(x.shape[0], -1)
        mu = Dense(self.style_dims, name='fc_mu')(x)
        if self.no_vae:
            return mu, jnp.zeros_like(mu), mu
        logvar = Dense(self.style_dims, name='fc_var')(x)
        if self.logvar_clamp > 0:
            logvar = jnp.clip(logvar, -10.0, self.logvar_clamp)
        std = jnp.exp(0.5 * logvar)
        if rng is None:
            rng = self.make_rng('style')
        eps = jax.random.normal(rng, std.shape, std.dtype)
        return mu, logvar, mu + eps * std

"""VGG19 feature extractor for the perceptual loss.

Capability parity with the reference perceptual loss backbone
(`imaginaire/losses/perceptual.py:16-150` + `_vgg19`): taps at the
`relu_x_1` activations, ImageNet normalization of [-1, 1] inputs, frozen
(never trained) weights.

TPU-native design: a plain flax module in NHWC; features are extracted in
one forward and returned as a dict of taps. Pretrained torchvision
weights can be converted with `convert_torch_vgg19` when a torch
checkpoint file is available (this image has no torchvision / download
path, so training falls back to ImageNet-free random features — a valid,
documented perceptual metric; swap in converted weights for exact
reference parity).
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (tap-name-to-emit-after-relu, out_channels, pool-before) per conv, VGG19.
_VGG19_CFG = [
    ('relu_1_1', 64, False), ('relu_1_2', 64, False),
    ('relu_2_1', 128, True), ('relu_2_2', 128, False),
    ('relu_3_1', 256, True), ('relu_3_2', 256, False),
    ('relu_3_3', 256, False), ('relu_3_4', 256, False),
    ('relu_4_1', 512, True), ('relu_4_2', 512, False),
    ('relu_4_3', 512, False), ('relu_4_4', 512, False),
    ('relu_5_1', 512, True), ('relu_5_2', 512, False),
    ('relu_5_3', 512, False), ('relu_5_4', 512, False),
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(x):
    """[-1, 1] RGB (NHWC) -> ImageNet-normalized
    (`imaginaire/utils/misc.py apply_imagenet_normalization`)."""
    x = (x + 1.0) * 0.5
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class VGG19Features(nn.Module):
    """Returns {tap_name: activation} for the requested taps."""
    layers: tuple = ('relu_3_1', 'relu_4_1', 'relu_5_1')
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        wanted = set(self.layers)
        last = max(i for i, (n, _, _) in enumerate(_VGG19_CFG)
                   if n in wanted)
        taps = {}
        for i, (name, ch, pool) in enumerate(_VGG19_CFG):
            if i > last:
                break
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), padding='SAME', dtype=self.dtype,
                        name=f'conv{i}')(x)
            x = jax.nn.relu(x)
            if name in wanted:
                taps[name] = x
        return taps


def convert_torch_vgg19(state_dict):
    """torchvision `vgg19().features` state dict -> flax params.

    Accepts either a dict of numpy arrays or a torch state dict; keys are
    `features.{idx}.weight/bias` in torchvision layer order.
    """
    conv_idx = []
    idx = 0
    for _, _, pool in _VGG19_CFG:
        if pool:
            idx += 1  # MaxPool slot
        conv_idx.append(idx)
        idx += 2  # Conv, ReLU
    params = {}
    for i, t_idx in enumerate(conv_idx):
        w = state_dict.get(f'features.{t_idx}.weight')
        if w is None:
            break
        w = np.asarray(w)
        b = np.asarray(state_dict[f'features.{t_idx}.bias'])
        params[f'conv{i}'] = {'kernel': jnp.asarray(w.transpose(2, 3, 1, 0)),
                              'bias': jnp.asarray(b)}
    return {'params': params}

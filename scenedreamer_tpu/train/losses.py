"""Loss functions for SceneDreamer GAN training.

Capability parity with the reference loss stack:
  * N+1-label semantic GAN loss (`imaginaire/model_utils/gancraft/loss.py:10-96`)
  * FeatureMatchingLoss (`imaginaire/losses/feature_matching.py:8-38`)
  * GaussianKLLoss (`imaginaire/losses/kl.py:9-23`)
  * PerceptualLoss vgg19 relu_{3,4,5}_1 w=[0.125,0.25,1.0], L1 criterion
    (`imaginaire/losses/perceptual.py:16-150`,
     `configs/scenedreamer_train.yaml:13-16`)
  * L2/L1 reconstruction vs the pseudo ground truth
    (`imaginaire/trainers/gancraft.py:113-118,194-197`)

All functions are pure and jit-safe; tensors are NHWC (channel axis -1
where the reference uses dim 1).
"""
import jax
import jax.numpy as jnp

from scenedreamer_tpu.models.vgg import VGG19Features, imagenet_normalize

# configs/scenedreamer_train.yaml:17-22
DEFAULT_LOSS_WEIGHTS = {
    'l2': 10.0,
    'gan': 0.5,
    'pseudo_gan': 0.5,
    'perceptual': 10.0,
    'kl': 0.05,
}

PERCEPTUAL_LAYERS = ('relu_3_1', 'relu_4_1', 'relu_5_1')
PERCEPTUAL_WEIGHTS = (0.125, 0.25, 1.0)


def _nplus1_loss(pred, label, t_real, dis_update):
    """Single-scale masked log-softmax GAN loss
    (`gancraft/loss.py:52-96`). pred [B,H,W,L+1]; label [B,H,W,L]."""
    # ignore label 0: zero both the label and the logit before softmax
    label = label.at[..., 0].set(0.0)
    pred = pred.at[..., 0].set(0.0)
    logp = jax.nn.log_softmax(pred, axis=-1)
    if dis_update and not t_real:
        loss = -logp[..., -1:]                      # fake channel
    else:
        loss = jnp.sum(-label * logp[..., :-1], axis=-1, keepdims=True)
    return jnp.mean(loss)


def gan_loss(outputs, t_real, dis_update=True):
    """List-of-scales wrapper (`gancraft/loss.py:24-50`).

    outputs: list of {'pred': [B,H,W,L+1], 'label': [B,H,W,L]}.
    """
    total = 0.0
    for o in outputs:
        total = total + _nplus1_loss(o['pred'], o['label'], t_real,
                                     dis_update)
    return total / len(outputs)


def feature_matching_loss(fake_features, real_features):
    """Mean L1 over discriminator feature lists
    (`losses/feature_matching.py:8-38`). Real features are detached."""
    total = 0.0
    n = 0
    for f, r in zip(fake_features, real_features):
        # f32 reduction even under bf16 mixed-precision D features
        diff = f.astype(jnp.float32) \
            - jax.lax.stop_gradient(r).astype(jnp.float32)
        total = total + jnp.mean(jnp.abs(diff))
        n += 1
    return total / max(n, 1)


def gaussian_kl_loss(mu, logvar):
    """-0.5 * sum(1 + logvar - mu^2 - e^logvar) (`losses/kl.py:9-23`;
    the reference sums over batch too — grad-parity tested)."""
    return -0.5 * jnp.sum(1.0 + logvar - mu ** 2 - jnp.exp(logvar))


def l2_loss(x, y):
    return jnp.mean((x - y) ** 2)


def l1_loss(x, y):
    return jnp.mean(jnp.abs(x - y))


class PerceptualLoss:
    """VGG19 multi-layer L1 perceptual distance.

    Holds frozen VGG19 params (converted torchvision weights when
    available; see `models/vgg.py`). Callable inside jit; params are
    closed over as constants of the jitted step.
    """

    def __init__(self, params=None, layers=PERCEPTUAL_LAYERS,
                 weights=PERCEPTUAL_WEIGHTS, rng_seed=0,
                 dtype=jnp.float32):
        self.model = VGG19Features(layers=tuple(layers), dtype=dtype)
        self.layers = tuple(layers)
        self.weights = tuple(weights)
        if params is None:
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            params = self.model.init(jax.random.PRNGKey(rng_seed), dummy)
        self.params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)

    def __call__(self, inp, target):
        inp = imagenet_normalize(inp)
        target = jax.lax.stop_gradient(imagenet_normalize(target))
        fi = self.model.apply(self.params, inp)
        ft = self.model.apply(self.params, target)
        loss = 0.0
        for layer, w in zip(self.layers, self.weights):
            # f32 reduction even when the VGG runs bf16 under amp
            diff = fi[layer].astype(jnp.float32) - jax.lax.stop_gradient(
                ft[layer]).astype(jnp.float32)
            loss = loss + w * jnp.mean(jnp.abs(diff))
        return loss

"""Optimizers and LR schedules.

Capability parity with the reference optimizer stack
(`imaginaire/utils/trainer.py:239-348`, `imaginaire/optimizers/`):
  * Adam with the reference hyperparameters (beta1=0, beta2=0.999,
    eps=1e-7; `configs/scenedreamer_train.yaml:36-41,62-67`)
  * per-submodule LR param groups (world_encoder 5e-4, rest 1e-4;
    `configs/scenedreamer_train.yaml:47-61`,
    `generators/gancraft_base.py:388-427`)
  * step / constant / linear LR policies (`utils/trainer.py:239-275`)
  * Fromage (`optimizers/fromage.py`) and Madam (`optimizers/madam.py`)
    as optax gradient transformations
  * RMSprop / SGD passthroughs

TPU-native design: everything is an `optax.GradientTransformation`; param
groups are expressed with `optax.multi_transform` keyed on the top-level
flax module name, so the whole update runs inside one jitted step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

# configs/scenedreamer_train.yaml:47-61 (our module names; hash_encoder is
# the raw hash_table param of the generator).
GEN_PARAM_GROUP_LR = {
    'world_encoder': 5e-4,
    'hash_table': 1e-4,
    'render_net': 1e-4,
    'sky_net': 1e-4,
    'style_net': 1e-4,
    'style_encoder': 1e-4,
    'denoiser': 1e-4,
}
GEN_BASE_LR = 1e-4
DIS_LR = 4e-4
ADAM_B1 = 0.0
ADAM_B2 = 0.999
ADAM_EPS = 1e-7


def make_schedule(policy=None, iters_per_epoch=1000):
    """LR multiplier schedule (`utils/trainer.py:239-275`).

    policy: dict like {'type': 'step', 'step_size': 400, 'gamma': 0.1,
    'iteration_mode': False}. Epoch-mode policies convert through
    `iters_per_epoch`.
    """
    if policy is None:
        policy = {'type': 'step', 'step_size': 400, 'gamma': 0.1,
                  'iteration_mode': False}
    ptype = policy.get('type', 'step')
    in_iters = policy.get('iteration_mode', False)
    unit = 1 if in_iters else iters_per_epoch

    if ptype == 'constant':
        return lambda step: 1.0
    if ptype == 'step':
        size = policy['step_size'] * unit
        gamma = policy['gamma']

        def sched(step):
            return gamma ** (step // size)
        return sched
    if ptype == 'linear':
        start = policy['decay_start'] * unit
        end = policy['decay_end'] * unit
        target = policy['decay_target']

        def sched(step):
            x = step
            frac = ((x - start) * target + end - x) / (end - start)
            return jnp.clip(frac, target, 1.0)
        return sched
    raise NotImplementedError(f'lr policy {ptype}')


def scale_by_fromage(eps=1e-12):
    """Fromage (arXiv:2002.03432; reference `optimizers/fromage.py`):
    step = lr * grad * |p|/|g| (per-tensor norms), then divide params by
    sqrt(1 + lr^2). Implemented as a transform whose output update
    includes the shrink term (requires params)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None, *, lr):
        def one(g, p):
            gn = jnp.linalg.norm(g)
            pn = jnp.linalg.norm(p)
            scaled = jnp.where((gn > 0) & (pn > 0), g * (pn / (gn + eps)), g)
            shrink = 1.0 / np.sqrt(1.0 + lr ** 2)
            # p_new = (p - lr*scaled) * shrink  ->  update = p_new - p
            return (p - lr * scaled) * shrink - p
        return jax.tree_util.tree_map(one, updates, params), state
    return init, update


def fromage(lr):
    init, update = scale_by_fromage()

    def _update(updates, state, params=None):
        return update(updates, state, params, lr=lr)
    return optax.GradientTransformation(init, _update)


def madam(lr, scale=3.0, g_bound=None):
    """Madam (arXiv:2006.14560; reference `optimizers/madam.py`):
    multiplicative update p *= exp(-lr * g_norm * sign(p)), clamped to
    scale * rms(p_init)."""

    def init(params):
        return {
            'max': jax.tree_util.tree_map(
                lambda p: scale * jnp.sqrt(jnp.mean(p * p)), params),
            'exp_avg_sq': jax.tree_util.tree_map(jnp.zeros_like, params),
            'step': jnp.zeros((), jnp.int32),
        }

    def update(updates, state, params=None):
        step = state['step'] + 1
        bias_c = 1.0 - 0.999 ** step.astype(jnp.float32)

        def one(g, v, p, pmax):
            v = 0.999 * v + 0.001 * g * g
            gn = g / jnp.sqrt(v / bias_c)
            gn = jnp.nan_to_num(gn)
            if g_bound is not None:
                gn = jnp.clip(gn, -g_bound, g_bound)
            newp = jnp.clip(p * jnp.exp(-lr * gn * jnp.sign(p)),
                            -pmax, pmax)
            return newp - p, v

        flat = jax.tree_util.tree_map(one, updates, state['exp_avg_sq'],
                                      params, state['max'],
                                      is_leaf=lambda x: isinstance(
                                          x, jnp.ndarray))
        upd = jax.tree_util.tree_map(lambda t: t[0], flat,
                                     is_leaf=lambda x: isinstance(x, tuple))
        vs = jax.tree_util.tree_map(lambda t: t[1], flat,
                                    is_leaf=lambda x: isinstance(x, tuple))
        return upd, {'max': state['max'], 'exp_avg_sq': vs, 'step': step}
    return optax.GradientTransformation(init, update)


def _adam(lr_mult_sched, base_lr):
    return optax.chain(
        optax.scale_by_adam(b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS),
        optax.scale_by_schedule(lambda s: lr_mult_sched(s)),
        optax.scale(-base_lr))


def make_optimizer(opt_type='adam', lr=GEN_BASE_LR, lr_policy=None,
                   iters_per_epoch=1000, momentum=0.9):
    """Single-group optimizer (`utils/trainer.py:297-348`)."""
    sched = make_schedule(lr_policy, iters_per_epoch)
    if opt_type == 'adam':
        return _adam(sched, lr)
    if opt_type == 'rmsprop':
        return optax.chain(optax.scale_by_rms(eps=1e-7),
                           optax.scale_by_schedule(sched), optax.scale(-lr))
    if opt_type == 'sgd':
        return optax.chain(optax.trace(decay=momentum) if momentum
                           else optax.identity(),
                           optax.scale_by_schedule(sched), optax.scale(-lr))
    if opt_type == 'fromage':
        return fromage(lr)
    if opt_type == 'madam':
        return madam(lr)
    raise NotImplementedError(f'optimizer {opt_type}')


def make_generator_optimizer(params, group_lrs=None, lr_policy=None,
                             iters_per_epoch=1000):
    """Per-submodule-LR Adam for the generator
    (`gancraft_base.py:388-427` + yaml param_groups).

    params: the generator param tree ({'params': {...}} or inner dict);
    group labels are the top-level module names.
    """
    group_lrs = dict(GEN_PARAM_GROUP_LR if group_lrs is None else group_lrs)
    inner = params.get('params', params)
    sched = make_schedule(lr_policy, iters_per_epoch)

    transforms = {'__base__': _adam(sched, GEN_BASE_LR)}
    for name, lr in group_lrs.items():
        transforms[name] = _adam(sched, lr)

    def label_tree(p):
        inner_p = p.get('params', p)
        labels = {}
        for top, sub in inner_p.items():
            lbl = top if top in group_lrs else '__base__'
            labels[top] = jax.tree_util.tree_map(lambda _: lbl, sub)
        if 'params' in p:
            return {'params': labels}
        return labels

    del inner
    return optax.multi_transform(transforms, label_tree)


def make_discriminator_optimizer(lr=DIS_LR, lr_policy=None,
                                 iters_per_epoch=1000):
    return make_optimizer('adam', lr, lr_policy, iters_per_epoch)

"""torch -> flax checkpoint converters for reference-weight parity.

Converts the reference's released checkpoints into this framework's
parameter trees:

  * `convert_scenedreamer_generator` — `scenedreamer_released.pt`
    `net_G` weights -> `SceneDreamerGenerator` params (key mapping
    documented inline; reference module definitions:
    `generators/scenedreamer.py:29-64`, `gancraft_base.py:91-293`,
    `model_utils/layers.py:6-271`, `gridencoder/grid.py:93-156`)
  * `extract_tree_assets` — the PCG tree voxel models shipped inside
    the released checkpoint (`scripts/pcg_cache.py:20,28`)
  * `convert_vgg19` — torchvision VGG19 features for the perceptual
    loss (delegates to `models/vgg.py`)

Layout rules:
  * torch Linear [out, in] == our `Dense` 'weight' — copied as-is
  * torch Conv2d [O, I, kh, kw] -> flax kernel [kh, kw, I, O]
  * ModLinear / AffineMod parameter names are identical by design
  * flatten boundaries (StyleEncoder fc_mu/fc_var) are re-permuted
    from torch's NCHW flatten to our NHWC flatten
  * spectral-norm wrapped weights are folded: W <- W / sigma(W)
    estimated from the stored u vector (or a power iteration)

Host-side numpy only; torch tensors are accepted but converted with
`np.asarray` (works for CPU torch without importing torch here).
"""
import numpy as np
import jax.numpy as jnp


def _np(t):
    try:
        return np.asarray(t)
    except Exception:          # torch tensor on non-cpu
        return t.detach().cpu().numpy()


def strip_prefixes(sd):
    """Remove DDP/EMA wrappers: 'module.', 'averaged_model.'."""
    out = {}
    for k, v in sd.items():
        for pre in ('module.', 'averaged_model.', 'model.'):
            while k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def fold_spectral_norm(sd):
    """Replace `w_orig`/`w_u`/`w_v` triplets with w_orig / sigma.

    Matches torch's eval-mode computation exactly (sigma = u . (W v)
    with the STORED u and v buffers, `torch.nn.utils.spectral_norm`
    `do_power_iteration=False` path); when v is absent, one power
    half-iteration recovers it from u."""
    out = dict(sd)
    for k in list(sd.keys()):
        if k.endswith('weight_orig'):
            base = k[:-len('_orig')]
            w = _np(sd[k]).astype(np.float64)
            u = _np(sd.get(base + '_u')) if base + '_u' in sd else None
            v = _np(sd.get(base + '_v')) if base + '_v' in sd else None
            mat = w.reshape(w.shape[0], -1)
            if u is None:
                u = np.random.default_rng(0).normal(size=mat.shape[0])
                u /= np.linalg.norm(u)
            if v is None:
                v = mat.T @ u
                v /= max(np.linalg.norm(v), 1e-12)
            sigma = float(u @ (mat @ v))
            # torch divides by sigma signed and unclamped; a barely-
            # iterated u/v pair can give a tiny or negative estimate
            if abs(sigma) < 1e-12:
                sigma = 1e-12 if sigma >= 0 else -1e-12
            out[base] = (w / sigma).astype(np.float32)
            out.pop(k, None)
            out.pop(base + '_u', None)
            out.pop(base + '_v', None)
    return out


def t2f_conv(w):
    """[O, I, kh, kw] -> [kh, kw, I, O]."""
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def t2f(w):
    return jnp.asarray(_np(w))


def _dense(sd, tk, bias=True):
    out = {'weight': t2f(sd[tk + '.weight'])}
    if bias and tk + '.bias' in sd:
        out['bias'] = t2f(sd[tk + '.bias'])
    return out


def _modlinear(sd, tk):
    out = {}
    for name in ('weight', 'weight_alpha', 'bias_alpha', 'weight_beta',
                 'bias_beta'):
        k = f'{tk}.{name}'
        if k in sd:
            out[name] = t2f(sd[k])
    return out


def _conv(sd, tk, bias=True):
    out = {'kernel': t2f_conv(sd[tk + '.weight'])}
    if bias and tk + '.bias' in sd:
        out['bias'] = t2f(sd[tk + '.bias'])
    return out


def convert_scenedreamer_generator(sd, style_enc_spatial=4):
    """Reference net_G state dict -> {'params': ...} for
    `SceneDreamerGenerator`."""
    sd = fold_spectral_norm(strip_prefixes(sd))
    p = {}

    # hash grid (gridencoder GridEncoder.embeddings, grid.py:133)
    p['hash_table'] = t2f(sd['hash_encoder.embeddings'])

    # RenderMLP / LightningMLP (model_utils/layers.py:57-126)
    rn = {}
    rn['fc_1'] = _dense(sd, 'render_net.fc_1')
    if 'render_net.fc_m_a.weight' in sd:
        rn['fc_m_a'] = _dense(sd, 'render_net.fc_m_a', bias=False)
    for i in (2, 3, 4, 6):
        rn[f'fc_{i}'] = _modlinear(sd, f'render_net.fc_{i}')
    if 'render_net.fc_viewdir.weight' in sd:
        rn['fc_5'] = _dense(sd, 'render_net.fc_5', bias=False)
        rn['fc_viewdir'] = _dense(sd, 'render_net.fc_viewdir',
                                  bias=False)
        rn['mod_5'] = _modlinear(sd, 'render_net.mod_5')
    else:
        rn['fc_5'] = _modlinear(sd, 'render_net.fc_5')
    rn['fc_sigma'] = _dense(sd, 'render_net.fc_sigma')
    rn['fc_out_c'] = _dense(sd, 'render_net.fc_out_c')
    p['render_net'] = rn

    # world encoder (model_utils/layers.py:25-55)
    we = {'hconv_head': _conv(sd, 'world_encoder.hconv_head'),
          'sconv_head': _conv(sd, 'world_encoder.sconv_head'),
          'fc1': _dense(sd, 'world_encoder.fc1'),
          'fc2': _dense(sd, 'world_encoder.fc2')}
    i = 0
    while f'world_encoder.conv_blocks.{i}.layers.0.weight' in sd:
        we[f'block_{i + 1}'] = {
            'Conv_0': _conv(sd, f'world_encoder.conv_blocks.{i}.layers.0',
                            bias=False),
            'Conv_1': _conv(sd, f'world_encoder.conv_blocks.{i}.layers.2',
                            bias=False),
        }
        i += 1
    p['world_encoder'] = we

    # sky net (gancraft_base.py:129-169)
    sky = {'fc_z_a': _dense(sd, 'sky_net.fc_z_a', bias=False),
           'fc_out_c': _dense(sd, 'sky_net.fc_out_c')}
    for i in (1, 2, 3, 4, 5):
        sky[f'fc{i}'] = _dense(sd, f'sky_net.fc{i}')
    p['sky_net'] = sky

    # style net (gancraft_base.py:91-126): fc_layers.i -> fc_i
    stn = {'fc_out': _dense(sd, 'style_net.fc_out')}
    i = 0
    while f'style_net.fc_layers.{i}.weight' in sd:
        stn[f'fc_{i}'] = _dense(sd, f'style_net.fc_layers.{i}')
        i += 1
    p['style_net'] = stn

    # style encoder (gancraft_base.py:228-293); NCHW->NHWC flatten fix
    if 'style_encoder.layer1.layers.conv.weight' in sd or \
            'style_encoder.layer1.weight' in sd:
        se = {}
        for i in range(1, 7):
            for cand in (f'style_encoder.layer{i}.layers.conv',
                         f'style_encoder.layer{i}'):
                if cand + '.weight' in sd:
                    se[f'layer{i}'] = _conv(sd, cand)
                    break
        for name in ('fc_mu', 'fc_var'):
            for cand in (f'style_encoder.{name}.fc',
                         f'style_encoder.{name}.layers.linear',
                         f'style_encoder.{name}'):
                if cand + '.weight' in sd:
                    w = _np(sd[cand + '.weight'])     # [S, C*h*w]
                    s_dim = w.shape[0]
                    hw = style_enc_spatial
                    c = w.shape[1] // (hw * hw)
                    w = w.reshape(s_dim, c, hw, hw) \
                         .transpose(0, 2, 3, 1).reshape(s_dim, -1)
                    entry = {'weight': jnp.asarray(w)}
                    if cand + '.bias' in sd:
                        entry['bias'] = t2f(sd[cand + '.bias'])
                    se[name] = entry
                    break
        p['style_encoder'] = se

    # denoiser RenderCNN (gancraft_base.py:172-225)
    dn = {'fc_z_cond': _dense(sd, 'denoiser.fc_z_cond')}
    for name in ('conv1', 'conv2a', 'conv2b', 'conv3a', 'conv3b',
                 'conv4a', 'conv4b', 'conv4'):
        dn[name] = _conv(sd, f'denoiser.{name}')
    p['denoiser'] = dn

    return {'params': p}


def _bn_stats(sd, tk):
    """torch (sync_)BatchNorm running stats + affine -> FrozenBatchNorm
    batch_stats (weight->scale, bias->offset)."""
    out = {'mean': t2f(sd[tk + '.running_mean']),
           'var': t2f(sd[tk + '.running_var'])}
    out['scale'] = t2f(sd[tk + '.weight']) if tk + '.weight' in sd \
        else jnp.ones_like(out['mean'])
    out['offset'] = t2f(sd[tk + '.bias']) if tk + '.bias' in sd \
        else jnp.zeros_like(out['mean'])
    return out


def _flax_dense(sd, tk, bias=True):
    """torch Linear [out, in] -> flax nn.Dense kernel [in, out]."""
    out = {'kernel': jnp.asarray(_np(sd[tk + '.weight']).T)}
    if bias and tk + '.bias' in sd:
        out['bias'] = t2f(sd[tk + '.bias'])
    return out


def convert_spade(sd, num_filters=128, style_enc_spatial=4):
    """Reference SPADE `net_G` state dict -> `SPADEWrapper` variables
    {'params': ..., 'batch_stats': ...}.

    Key mapping (reference `generators/spade.py:228-571`,
    `layers/activation_norm.py:130-263`, state-dict names verified by
    instantiating the torch module):

      * spectral norm folded first (W <- W / sigma) via `fold_spectral_norm`
      * `<blk>.layers.conv`                        -> conv kernel/bias
      * Res2dBlock `conv_block_{0,1,s}`            -> conv{0,1,s} + norm{0,1,_s}
      * SpatiallyAdaptiveNorm `mlps.0.0/gammas.0/betas.0 .layers.conv`
                                                   -> SpadeNorm mlp/gamma/beta
      * `*.norm.norm.{running_mean,running_var,weight,bias}`
                                                   -> batch_stats mean/var/scale/offset
      * AdaptiveNorm `fc_gamma/fc_beta.layers.conv` (LinearBlock)
                                                   -> Dense kernel (transposed)
      * StyleEncoder fc_mu/fc_var                  -> NCHW->NHWC flatten fix
    """
    sd = fold_spectral_norm(strip_prefixes(sd))
    p, bs = {}, {}

    def spade_norm(tk):
        """SpatiallyAdaptiveNorm -> (params, batch_stats)."""
        prm = {'mlp': _conv(sd, tk + '.mlps.0.0.layers.conv'),
               'gamma': _conv(sd, tk + '.gammas.0.layers.conv'),
               'beta': _conv(sd, tk + '.betas.0.layers.conv')}
        return prm, {'norm': _bn_stats(sd, tk + '.norm')}

    def res_block(tk):
        prm, stats = {}, {}
        for tsub, conv_name, norm_name in (
                ('conv_block_0', 'conv0', 'norm0'),
                ('conv_block_1', 'conv1', 'norm1'),
                ('conv_block_s', 'conv_s', 'norm_s')):
            ck = f'{tk}.{tsub}.layers.conv'
            if ck + '.weight' not in sd:
                continue
            prm[conv_name] = _conv(sd, ck)
            nprm, nstats = spade_norm(f'{tk}.{tsub}.layers.norm')
            prm[norm_name] = nprm
            stats[norm_name] = nstats
        return prm, stats

    def cbn_block(tk):
        prm = {'conv': _conv(sd, tk + '.layers.conv'),
               'norm': {
                   'fc_gamma': _flax_dense(sd,
                                           tk + '.layers.norm.fc_gamma'
                                           '.layers.conv'),
                   'fc_beta': _flax_dense(sd,
                                          tk + '.layers.norm.fc_beta'
                                          '.layers.conv')}}
        stats = {'norm': {'norm': _bn_stats(sd, tk + '.layers.norm.norm')}}
        return prm, stats

    g, gbs = {}, {}
    g['fc_0'] = _flax_dense(sd, 'spade_generator.fc_0.layers.conv')
    g['fc_1'] = _flax_dense(sd, 'spade_generator.fc_1.layers.conv')
    g['head_0'] = _conv(sd, 'spade_generator.head_0.layers.conv')
    for name in ('cbn_head_0', 'cbn_up_0a', 'cbn_up_1a', 'cbn_up_2a'):
        if f'spade_generator.{name}.layers.conv.weight' in sd:
            g[name], gbs[name] = cbn_block(f'spade_generator.{name}')
    for name in ('head_1', 'head_2', 'up_0a', 'up_0b', 'up_1a', 'up_1b',
                 'up_2a', 'up_2b', 'up_3a', 'up_3b', 'up_4a', 'up_4b'):
        if f'spade_generator.{name}.conv_block_0.layers.conv.weight' in sd:
            g[name], gbs[name] = res_block(f'spade_generator.{name}')
    for name in ('conv_img256', 'conv_img512', 'conv_img1024'):
        if f'spade_generator.{name}.layers.conv.weight' in sd:
            g[name] = _conv(sd, f'spade_generator.{name}.layers.conv')
    p['spade_generator'] = g
    bs['spade_generator'] = gbs

    if 'style_encoder.layer1.layers.conv.weight' in sd:
        se = {}
        for i in range(1, 7):
            se[f'layer{i}'] = _conv(sd, f'style_encoder.layer{i}'
                                    '.layers.conv')
        for name in ('fc_mu', 'fc_var'):
            tk = f'style_encoder.{name}.layers.conv'
            w = _np(sd[tk + '.weight'])               # [S, C*h*w] NCHW
            s_dim = w.shape[0]
            hw = style_enc_spatial
            c = w.shape[1] // (hw * hw)
            w = w.reshape(s_dim, c, hw, hw).transpose(0, 2, 3, 1) \
                 .reshape(s_dim, -1)
            se[name] = {'kernel': jnp.asarray(w.T),
                        'bias': t2f(sd[tk + '.bias'])}
        p['style_encoder'] = se

    return {'params': p, 'batch_stats': bs}


def extract_tree_assets(ckpt):
    """Released-checkpoint 'assets' -> list of [Y, X, Z] int32 tree
    voxel models (`scripts/pcg_cache.py:20,28`)."""
    assets = ckpt['assets'] if isinstance(ckpt, dict) else ckpt
    return [np.asarray(_np(a)).astype(np.int32) for a in assets]


def convert_vgg19(sd):
    from scenedreamer_tpu.models.vgg import convert_torch_vgg19
    return convert_torch_vgg19(
        {k: _np(v) for k, v in strip_prefixes(sd).items()})


def load_torch_checkpoint(path):
    """Load a torch .pt file to numpy-backed dicts (CPU)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    return ckpt


def spade_frozen_from_trained(params, batch_stats):
    """Trained-mode SPADE variables -> frozen-oracle layout.

    `cli/train_spade.py` trains with flax BatchNorm (scale/bias in
    `params`, running mean/var in `batch_stats`); the frozen oracle
    (`models/spade.py:FrozenBatchNorm`, the layout `convert_spade`
    emits and `cli/train.py --spade-checkpoint` consumes) keeps all
    four in `batch_stats` as mean/var/scale/offset. Eval math is
    identical (eps 1e-5), so the conversion is a pure tree reshuffle —
    the analog of the reference freezing its trained landscape1m SPADE
    (`trainers/gancraft.py:30-42`).
    """
    def walk(p, s):
        new_p, new_s = {}, {}
        for k in set(p) | set(s):
            pv, sv = p.get(k), s.get(k)
            if (isinstance(sv, dict) and set(sv) == {'mean', 'var'}
                    and isinstance(pv, dict)
                    and set(pv) == {'scale', 'bias'}):
                new_s[k] = {'mean': sv['mean'], 'var': sv['var'],
                            'scale': pv['scale'], 'offset': pv['bias']}
                continue
            if isinstance(pv, dict) or isinstance(sv, dict):
                sub_p, sub_s = walk(pv if isinstance(pv, dict) else {},
                                    sv if isinstance(sv, dict) else {})
                if sub_p:
                    new_p[k] = sub_p
                if sub_s:
                    new_s[k] = sub_s
            else:
                if pv is not None:
                    new_p[k] = pv
                if sv is not None:
                    new_s[k] = sv
        return new_p, new_s

    p, s = walk(dict(params), dict(batch_stats))
    return {'params': p, 'batch_stats': s}

"""GAN training engine: alternating discriminator/generator updates.

Capability parity with the reference training engine
(`imaginaire/trainers/base.py:676-816` gen_update/dis_update,
`imaginaire/trainers/gancraft.py:158-251` gen_forward/dis_forward):
  * dis step: frozen-G forward, N+1 GAN loss on (fake, real) and
    (fake, pseudo-real) pairs, weights gan=0.5 / pseudo_gan=0.5
  * gen step: GAN + PGAN (same fake-vs-real objective applied twice),
    optional FeatureMatching vs pseudo-real D features, Gaussian KL on
    the style VAE, VGG19 perceptual + L2 vs the pseudo ground truth
  * optional global-norm gradient clipping and skip-on-nonfinite
    (`trainers/base.py:702-733`)
  * EMA model averaging (`imaginaire/utils/model_average.py:35`,
    disabled by the shipped config `scenedreamer_train.yaml:9-10`)
  * orbax checkpoint save/load with a `latest_checkpoint.txt` pointer
    (`trainers/base.py:236-325,943-982`)

TPU-native design: each update is ONE jitted pure function
`(state, batch, key) -> (state, metrics)` — model forward, loss,
backward, optimizer update, and EMA all fuse into a single XLA
executable; no Python in the hot path. Spectral-norm power-iteration
state is threaded explicitly through the D update (the reference relies
on torch pre-forward hooks). Batches are expected NHWC, already
device-resident.
"""
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from scenedreamer_tpu.train import losses as L
from scenedreamer_tpu.train import optim


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    g_params: Any
    g_opt: Any
    d_params: Any
    d_stats: Any              # spectral norm power-iteration vectors
    d_opt: Any
    g_ema: Optional[Any] = None


@struct.dataclass
class TrainerConfig:
    loss_weights: Any = struct.field(
        pytree_node=False, default_factory=lambda: dict(
            L.DEFAULT_LOSS_WEIGHTS))
    use_feature_matching: bool = struct.field(pytree_node=False,
                                              default=False)
    grad_clip_norm: float = struct.field(pytree_node=False, default=0.0)
    # skip (not clip) any update whose global grad norm exceeds this —
    # the reference's `gen_opt.skip_grad` (`trainers/base.py:713-717`).
    # Catches FINITE explosions the nonfinite guard cannot (a style-VAE
    # logvar overflow produced a finite 3.3e7 G grad norm and NaN-locked
    # the r5 campaign at iter ~1350); 0 disables.
    skip_grad_norm: float = struct.field(pytree_node=False, default=0.0)
    skip_nonfinite_grads: bool = struct.field(pytree_node=False,
                                              default=True)
    ema_beta: float = struct.field(pytree_node=False, default=0.0)
    # DiffAugment policy for D inputs (reference `trainer.aug_policy`,
    # `trainers/base.py:87-88` + `utils/diff_aug.py:14-142`): comma
    # subset of {color, translation, cutout} applied to the image
    # tensors (fake/real/pseudo-real) before every D evaluation, fresh
    # draws per call, in BOTH the D and G updates. 'color' is
    # mask-alignment-safe for the conditional FPSE D; geometric
    # policies augment only the images (label maps pass through, as in
    # the reference). '' = off (the shipped default, config.py:123).
    aug_policy: str = struct.field(pytree_node=False, default='')


def _clip_and_validate(grads, cfg):
    """Optional global-norm clip + nonfinite-skip mask
    (`trainers/base.py:702-733`). Returns (grads, ok_scalar, gnorm)."""
    gnorm = optax.global_norm(grads)
    if cfg.grad_clip_norm > 0:
        scale = jnp.minimum(1.0, cfg.grad_clip_norm / (gnorm + 1e-6))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    ok = jnp.isfinite(gnorm)
    if cfg.skip_grad_norm > 0:
        ok = ok & (gnorm <= cfg.skip_grad_norm)
    if cfg.skip_nonfinite_grads:
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
    return grads, ok, gnorm


def _apply_update(params, opt_state, grads, tx, ok):
    updates, new_opt = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    # on skipped (nonfinite) steps keep params and optimizer state
    new_params = jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new_params, params)
    new_opt = jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o) if isinstance(n, jnp.ndarray)
        else n, new_opt, opt_state)
    return new_params, new_opt


class GANTrainer:
    """Builds jitted dis/gen steps around a generator + discriminator
    pair. The generator must follow `SceneDreamerGenerator`'s calling
    convention; the discriminator `GANcraftDiscriminator`'s."""

    def __init__(self, generator, discriminator, voxel_dims,
                 cfg: TrainerConfig = TrainerConfig(),
                 perceptual: Optional[L.PerceptualLoss] = None,
                 g_tx=None, d_tx=None, iters_per_epoch=1000,
                 mesh=None):
        self.gen = generator
        self.dis = discriminator
        self.voxel_dims = None if voxel_dims is None \
            else tuple(int(d) for d in voxel_dims)
        self.cfg = cfg
        self.perceptual = perceptual
        self.g_tx = g_tx
        self.d_tx = d_tx if d_tx is not None else \
            optim.make_discriminator_optimizer(
                iters_per_epoch=iters_per_epoch)
        self._iters_per_epoch = iters_per_epoch
        # jit caches keyed by the static compact_k value
        self._dis_step_j = {}
        self._gen_step_j = {}
        self._fused_step_j = {}
        self._shared_step_j = {}
        # when set, discriminator inputs are constrained to batch-only
        # sharding (see `_constrain_dis_inputs`)
        self.mesh = mesh

    # ------------------------------------------------------------------
    def _constrain_dis_inputs(self, batch, g_out):
        """Reshard discriminator inputs to P('data') (batch-only).

        The renderer shards image rows on the 'rays' mesh axis, but the
        FPSE discriminator downsamples 5x — deep layers have too few
        rows to shard, and GSPMD falls back to 'involuntary full
        rematerialization' on their gradient accumulations (the
        round-1 MULTICHIP log). One clean reshard of the [B, H, W, C]
        images at the D boundary replaces dozens of bad-layout
        conversions; the reference's analog is the DDP allreduce
        boundary (`utils/distributed.py:75-117`)."""
        if self.mesh is None or self.mesh.shape.get('rays', 1) == 1:
            return batch, g_out
        sh = NamedSharding(self.mesh, P('data'))
        n_data = self.mesh.shape['data']

        def c(x):
            if hasattr(x, 'ndim') and x.ndim >= 3 \
                    and x.shape[0] % n_data == 0:
                return jax.lax.with_sharding_constraint(x, sh)
            return x

        keys = ('images', 'pseudo_real_img', 'fake_masks', 'real_masks')
        batch = {**batch,
                 **{k: c(batch[k]) for k in keys if k in batch}}
        g_out = {**g_out, 'fake_images': c(g_out['fake_images'])}
        return batch, g_out

    # ------------------------------------------------------------------
    def _augment_dis_inputs(self, d_batch, g_out, key):
        """DiffAugment on the D's image inputs (TrainerConfig
        .aug_policy; reference `trainers/base.py:87-88` +
        `utils/diff_aug.py:14-142`). Label masks pass through."""
        if not self.cfg.aug_policy or key is None:
            return d_batch, g_out
        from scenedreamer_tpu.utils.diff_aug import apply_diff_aug
        ks = jax.random.split(key, 3)
        d_batch = dict(d_batch)
        for i, name in enumerate(('images', 'pseudo_real_img')):
            if name in d_batch:
                d_batch[name] = apply_diff_aug(
                    d_batch[name], ks[i], self.cfg.aug_policy)
        g_out = {**g_out,
                 'fake_images': apply_diff_aug(
                     g_out['fake_images'], ks[2], self.cfg.aug_policy)}
        return d_batch, g_out

    # ------------------------------------------------------------------
    def init_state(self, key, sample_batch):
        kg, kd = jax.random.split(key)
        g_vars = self.gen.init({'params': kg}, sample_batch,
                               self.voxel_dims, kg, random_style=False)
        fake = {'fake_images': sample_batch['pseudo_real_img']}
        d_vars = self.dis.init({'params': kd}, sample_batch, fake,
                               incl_real=False, incl_pseudo_real=False)
        d_params = d_vars['params']
        d_stats = d_vars.get('spectral_stats', {})
        if self.g_tx is None:
            self.g_tx = optim.make_generator_optimizer(
                g_vars['params'], iters_per_epoch=self._iters_per_epoch)
        ema = jax.tree_util.tree_map(jnp.copy, g_vars['params']) \
            if self.cfg.ema_beta > 0 else None
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_vars['params'], g_opt=self.g_tx.init(g_vars['params']),
            d_params=d_params, d_stats=d_stats,
            d_opt=self.d_tx.init(d_params), g_ema=ema)

    # ------------------------------------------------------------------
    def _gen_apply(self, g_params, batch, key, compact_k=None):
        return self.gen.apply({'params': g_params}, batch, self.voxel_dims,
                              key, random_style=False,
                              compact_k=compact_k)

    def _dis_apply(self, d_params, d_stats, batch, g_out, incl_real,
                   incl_pseudo_real, update_stats):
        variables = {'params': d_params, 'spectral_stats': d_stats}
        if update_stats:
            out, mut = self.dis.apply(
                variables, batch, g_out, incl_real=incl_real,
                incl_pseudo_real=incl_pseudo_real, update_stats=True,
                mutable=['spectral_stats'])
            return out, mut['spectral_stats']
        out = self.dis.apply(variables, batch, g_out, incl_real=incl_real,
                             incl_pseudo_real=incl_pseudo_real,
                             update_stats=False)
        return out, d_stats

    # ------------------------------------------------------------------
    def dis_step(self, state, batch, key, compact_k=None):
        """Discriminator update (`gancraft.py:206-251`), jit-compiled on
        first call with the state donated (in-place buffer reuse).
        `compact_k` (static): exact sky-ray compaction of the G
        forward (generator.render_pixels docstring); one cached
        executable per distinct value."""
        ck = compact_k
        import functools
        if ck not in self._dis_step_j:
            self._dis_step_j[ck] = jax.jit(
                functools.partial(self._dis_step, compact_k=ck),
                donate_argnums=0)
        return self._dis_step_j[ck](state, batch, key)

    def _dis_loss(self, d_params, d_stats, d_batch, g_out,
                  aug_key=None):
        """D loss assembly (`gancraft.py:206-251`), shared by the GSPMD
        and shard_map-DP paths."""
        d_batch, g_out = self._augment_dis_inputs(d_batch, g_out,
                                                  aug_key)
        w = self.cfg.loss_weights
        d_out, new_stats = self._dis_apply(
            d_params, d_stats, d_batch, g_out,
            incl_real='gan' in w, incl_pseudo_real='pseudo_gan' in w,
            update_stats=True)
        total = 0.0
        m = {}
        if 'gan' in w:
            fake_l = L.gan_loss(d_out['fake_outputs'], False, True)
            real_l = L.gan_loss(d_out['real_outputs'], True, True)
            m['dis/gan_fake'], m['dis/gan_real'] = fake_l, real_l
            total += w['gan'] * (fake_l + real_l)
        if 'pseudo_gan' in w:
            fake_l = L.gan_loss(d_out['fake_outputs'], False, True)
            preal_l = L.gan_loss(d_out['pseudo_real_outputs'], True,
                                 True)
            m['dis/pgan_fake'], m['dis/pgan_real'] = fake_l, preal_l
            total += w['pseudo_gan'] * (fake_l + preal_l)
        m['dis/total'] = total
        return total, (m, new_stats)

    def _mesh_dp(self, batch=None):
        """True when the 'data' axis has >1 groups — the generator's
        batch is then evaluated per-group under shard_map (see
        `_dp_shard_map`). When `batch` is given, additionally require
        the leading batch dim to divide the axis: shard_map rejects
        non-divisible axes at trace time, while the GSPMD fallback
        simply replicates (ADVICE r4 medium — batch 1 on a data=8 mesh
        must not crash)."""
        if self.mesh is None or self.mesh.shape.get('data', 1) <= 1:
            return False
        if batch is not None:
            b = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if b % self.mesh.shape['data'] != 0:
                return False
        return True

    def _dp_shard_map(self, per_group, n_sharded):
        """shard_map `per_group` with the 'data' mesh axis manual
        (first arguments replicated, the next `n_sharded` batch-dict
        args sharded on 'data') and 'rays' left to GSPMD.

        WHY: the generator evaluates batch>1 with `lax.map` over the
        batch (models/generator.py field_features — vmapping the hash
        level scan measured 5x slower), and a lax.map over an axis
        sharded on 'data' SERIALIZES the data groups: measured 24% DP
        efficiency on a 4-group CPU mesh. Under shard_map each group
        runs the fast per-group program concurrently and gradients
        pmean over 'data' — the explicit form of the reference's DDP
        allreduce (`utils/distributed.py:75-117`)."""
        from jax.sharding import PartitionSpec as P
        in_specs = (P(),) * 2 + (P('data'),) * n_sharded + (P(),)
        # check_vma off: the hashgrid custom_vjp's table cotangent is
        # group-varying until the explicit pmean, which the
        # varying-manual-axes checker cannot see through
        return jax.shard_map(per_group, mesh=self.mesh,
                             axis_names={'data'},
                             in_specs=in_specs, out_specs=P(),
                             check_vma=False)

    def _dis_step(self, state, batch, key, compact_k=None):
        if self._mesh_dp(batch):
            def per_group(d_params, ds_gp, batch, key):
                d_stats, g_params = ds_gp
                key = jax.random.fold_in(
                    key, jax.lax.axis_index('data'))
                g_out = self._gen_apply(g_params, batch, key,
                                        compact_k=compact_k)
                g_out = jax.lax.stop_gradient(
                    {'fake_images': g_out['fake_images']})
                (_, (m, new_stats)), grads = jax.value_and_grad(
                    self._dis_loss, has_aux=True)(
                        d_params, d_stats, batch, g_out,
                        jax.random.fold_in(key, 101))
                return jax.lax.pmean((grads, m, new_stats), 'data')

            grads, metrics, new_stats = self._dp_shard_map(
                per_group, 1)(state.d_params,
                              (state.d_stats, state.g_params),
                              batch, key)
        else:
            g_out = self._gen_apply(state.g_params, batch, key,
                                    compact_k=compact_k)
            g_out = jax.lax.stop_gradient(
                {'fake_images': g_out['fake_images']})
            d_batch, g_out = self._constrain_dis_inputs(batch, g_out)
            (_, (metrics, new_stats)), grads = jax.value_and_grad(
                self._dis_loss, has_aux=True)(
                    state.d_params, state.d_stats, d_batch, g_out,
                    jax.random.fold_in(key, 101))
        grads, ok, gnorm = _clip_and_validate(grads, self.cfg)
        metrics['dis/grad_norm'] = gnorm
        new_params, new_opt = _apply_update(state.d_params, state.d_opt,
                                            grads, self.d_tx, ok)
        return state.replace(d_params=new_params, d_opt=new_opt,
                             d_stats=new_stats), metrics

    # ------------------------------------------------------------------
    def gen_step(self, state, batch, key, compact_k=None):
        """Generator update (`gancraft.py:158-204`), jit-compiled on
        first call with the state donated."""
        import functools
        ck = compact_k
        if ck not in self._gen_step_j:
            self._gen_step_j[ck] = jax.jit(
                functools.partial(self._gen_step, compact_k=ck),
                donate_argnums=0)
        return self._gen_step_j[ck](state, batch, key)

    def _gen_loss(self, g_params, d_params, d_stats, batch, key,
                  constrain=True, compact_k=None):
        """G loss assembly (`gancraft.py:158-204`), shared by the GSPMD
        and shard_map-DP paths."""
        g_out = self._gen_apply(g_params, batch, key,
                                compact_k=compact_k)
        return self._gen_loss_from_out(g_out, d_params, d_stats, batch,
                                       constrain=constrain,
                                       aug_key=jax.random.fold_in(
                                           key, 102))

    def _gen_loss_from_out(self, g_out, d_params, d_stats, batch,
                           constrain=True, aug_key=None):
        """G loss given precomputed generator outputs — the tail shared
        by `_gen_loss` and the single-forward `train_step_shared`."""
        w = self.cfg.loss_weights
        incl_preal = self.cfg.use_feature_matching
        total = 0.0
        m = {}
        if 'gan' in w or 'pseudo_gan' in w:
            if constrain:
                d_batch, g_out_c = self._constrain_dis_inputs(batch,
                                                              g_out)
            else:
                d_batch, g_out_c = batch, g_out
            d_batch, g_out_c = self._augment_dis_inputs(
                d_batch, g_out_c, aug_key)
            d_out, _ = self._dis_apply(
                d_params, d_stats, d_batch, g_out_c,
                incl_real=False, incl_pseudo_real=incl_preal,
                update_stats=False)
            gl = L.gan_loss(d_out['fake_outputs'], True,
                            dis_update=False)
            if 'gan' in w:
                m['gen/gan'] = gl
                total += w['gan'] * gl
            if 'pseudo_gan' in w:
                m['gen/pgan'] = gl
                total += w['pseudo_gan'] * gl
            if incl_preal:
                fm = L.feature_matching_loss(
                    d_out['fake_features'],
                    d_out['pseudo_real_features'])
                m['gen/feature_matching'] = fm
                total += w.get('feature_matching', 10.0) * fm
        if 'kl' in w and g_out['mu'] is not None:
            kl = L.gaussian_kl_loss(g_out['mu'], g_out['logvar'])
            m['gen/kl'] = kl
            total += w['kl'] * kl
        if 'perceptual' in w and self.perceptual is not None:
            p = self.perceptual(g_out['fake_images'],
                                batch['pseudo_real_img'])
            m['gen/perceptual'] = p
            total += w['perceptual'] * p
        if 'l2' in w:
            l2 = L.l2_loss(g_out['fake_images'],
                           batch['pseudo_real_img'])
            m['gen/l2'] = l2
            total += w['l2'] * l2
        if 'l1' in w:
            l1 = L.l1_loss(g_out['fake_images'],
                           batch['pseudo_real_img'])
            m['gen/l1'] = l1
            total += w['l1'] * l1
        m['gen/total'] = total
        return total, m

    def _gen_step(self, state, batch, key, compact_k=None):
        if self._mesh_dp(batch):
            def per_group(g_params, aux, batch, key):
                d_params, d_stats = aux
                key = jax.random.fold_in(
                    key, jax.lax.axis_index('data'))
                (_, m), grads = jax.value_and_grad(
                    self._gen_loss, has_aux=True)(
                        g_params, d_params, d_stats, batch, key,
                        constrain=False, compact_k=compact_k)
                return jax.lax.pmean((grads, m), 'data')

            grads, metrics = self._dp_shard_map(per_group, 1)(
                state.g_params, (state.d_params, state.d_stats),
                batch, key)
        else:
            (_, metrics), grads = jax.value_and_grad(
                self._gen_loss, has_aux=True)(
                    state.g_params, state.d_params, state.d_stats,
                    batch, key, compact_k=compact_k)
        grads, ok, gnorm = _clip_and_validate(grads, self.cfg)
        metrics['gen/grad_norm'] = gnorm
        new_params, new_opt = _apply_update(state.g_params, state.g_opt,
                                            grads, self.g_tx, ok)
        ema = state.g_ema
        if ema is not None:
            b = self.cfg.ema_beta
            ema = jax.tree_util.tree_map(
                lambda e, p: b * e + (1.0 - b) * p, ema, new_params)
        return state.replace(step=state.step + 1, g_params=new_params,
                             g_opt=new_opt, g_ema=ema), metrics

    # ------------------------------------------------------------------
    def train_step(self, state, batch, key, compact_k=None):
        """One full iteration: D update then G update
        (`train.py:135-142` interleave)."""
        kd, kg = jax.random.split(key)
        state, dm = self.dis_step(state, batch, kd, compact_k=compact_k)
        state, gm = self.gen_step(state, batch, kg, compact_k=compact_k)
        return state, {**dm, **gm}

    # ------------------------------------------------------------------
    # Single-forward iteration (r5): render the generator ONCE per
    # iteration and reuse the saved vjp residuals for the G backward.
    # ------------------------------------------------------------------
    def _shared_fwd_outs(self, g_params, batch, key, compact_k=None):
        """Generator forward returning only the outputs that receive
        loss cotangents (fake image + style-VAE moments)."""
        g_out = self._gen_apply(g_params, batch, key,
                                compact_k=compact_k)
        return {'fake_images': g_out['fake_images'],
                'mu': g_out['mu'], 'logvar': g_out['logvar']}

    def _shared_core(self, g_params, d_params, d_stats, d_opt, batch,
                     key, dp, compact_k=None):
        """One D update + G gradients from a single generator forward.

        `fake, g_vjp = jax.vjp(render, g_params)` → D update on
        `stop_gradient(fake)` → G loss through the *updated* D →
        `g_vjp(cotangents)`. Exact GAN alternation semantics
        (`imaginaire/trainers/base.py:676-816` — the reference renders
        twice only because torch autograd separates the D/G graphs; in
        JAX the residuals can be shared). Returns
        (new_d_params, new_d_opt, new_stats, g_grads, metrics), with
        grads/metrics already pmean'd over 'data' when `dp`."""
        outs, g_vjp = jax.vjp(
            lambda gp: self._shared_fwd_outs(gp, batch, key,
                                             compact_k=compact_k),
            g_params)
        g_sg = {'fake_images': jax.lax.stop_gradient(outs['fake_images'])}
        if dp:
            d_batch = batch
        else:
            d_batch, g_sg = self._constrain_dis_inputs(batch, g_sg)
        (_, (dm, new_stats)), d_grads = jax.value_and_grad(
            self._dis_loss, has_aux=True)(
                d_params, d_stats, d_batch, g_sg,
                jax.random.fold_in(key, 101))
        if dp:
            d_grads, dm, new_stats = jax.lax.pmean(
                (d_grads, dm, new_stats), 'data')
        d_grads, d_ok, d_gnorm = _clip_and_validate(d_grads, self.cfg)
        dm['dis/grad_norm'] = d_gnorm
        new_d_params, new_d_opt = _apply_update(
            d_params, d_opt, d_grads, self.d_tx, d_ok)

        def g_tail(outs):
            return self._gen_loss_from_out(
                outs, new_d_params, new_stats, batch,
                constrain=not dp,
                aug_key=jax.random.fold_in(key, 102))

        (_, gm), outs_cot = jax.value_and_grad(
            g_tail, has_aux=True)(outs)
        (g_grads,) = g_vjp(outs_cot)
        if dp:
            g_grads, gm = jax.lax.pmean((g_grads, gm), 'data')
        return new_d_params, new_d_opt, new_stats, g_grads, {**dm, **gm}

    def _shared_step(self, state, batch, key, compact_k=None):
        if self._mesh_dp(batch):
            def per_group(g_params, aux, batch, key):
                d_params, d_stats, d_opt = aux
                key = jax.random.fold_in(
                    key, jax.lax.axis_index('data'))
                return self._shared_core(
                    g_params, d_params, d_stats, d_opt, batch, key,
                    dp=True, compact_k=compact_k)

            new_d_params, new_d_opt, new_stats, g_grads, metrics = \
                self._dp_shard_map(per_group, 1)(
                    state.g_params,
                    (state.d_params, state.d_stats, state.d_opt),
                    batch, key)
        else:
            new_d_params, new_d_opt, new_stats, g_grads, metrics = \
                self._shared_core(
                    state.g_params, state.d_params, state.d_stats,
                    state.d_opt, batch, key, dp=False,
                    compact_k=compact_k)
        g_grads, ok, gnorm = _clip_and_validate(g_grads, self.cfg)
        metrics['gen/grad_norm'] = gnorm
        new_g_params, new_g_opt = _apply_update(
            state.g_params, state.g_opt, g_grads, self.g_tx, ok)
        ema = state.g_ema
        if ema is not None:
            b = self.cfg.ema_beta
            ema = jax.tree_util.tree_map(
                lambda e, p: b * e + (1.0 - b) * p, ema, new_g_params)
        return state.replace(
            step=state.step + 1,
            g_params=new_g_params, g_opt=new_g_opt, g_ema=ema,
            d_params=new_d_params, d_opt=new_d_opt,
            d_stats=new_stats), metrics

    def train_step_shared(self, state, batch, key, compact_k=None):
        """One full iteration with a SINGLE generator forward (one XLA
        executable). Equivalent to calling `dis_step` then `gen_step`
        with the SAME render key (so both see the same fake) — tested
        equal to that two-forward reference in
        tests/test_train.py::test_shared_train_step_matches_two_forward.
        Eliminates the D-step's no-grad G forward (~20% of the full
        D+G step at flagship scale, r3 device profile)."""
        import functools
        ck = compact_k
        if ck not in self._shared_step_j:
            self._shared_step_j[ck] = jax.jit(
                functools.partial(self._shared_step, compact_k=ck),
                donate_argnums=0)
        return self._shared_step_j[ck](state, batch, key)

    def train_step_fused(self, state, batch, key, compact_k=None):
        """Same iteration as ONE executable: the D and G updates (the
        G update still sees the D params the D update just wrote)
        compile into a single XLA program — one dispatch instead of
        two per iteration, and the scheduler may overlap the D tail
        with the G head. Same math as `train_step` (tested)."""
        ck = compact_k
        if ck not in self._fused_step_j:
            def fused(state, batch, key):
                kd, kg = jax.random.split(key)
                state, dm = self._dis_step(state, batch, kd,
                                           compact_k=ck)
                state, gm = self._gen_step(state, batch, kg,
                                           compact_k=ck)
                return state, {**dm, **gm}
            self._fused_step_j[ck] = jax.jit(fused, donate_argnums=0)
        return self._fused_step_j[ck](state, batch, key)


# ---------------------------------------------------------------------------
# Checkpointing (`trainers/base.py:236-325,943-982`; orbax instead of
# torch.save, multi-host safe)
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir, state, step=None):
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step) if step is None else int(step)
    path = os.path.join(ckpt_dir, f'step_{step:08d}')
    ocp.PyTreeCheckpointer().save(path, jax.device_get(state), force=True)
    with open(os.path.join(ckpt_dir, 'latest_checkpoint.txt'), 'w') as f:
        f.write(os.path.basename(path) + '\n')
    return path


def latest_checkpoint(ckpt_dir):
    pointer = os.path.join(ckpt_dir, 'latest_checkpoint.txt')
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        name = f.read().strip()
    path = os.path.join(ckpt_dir, name)
    return path if os.path.exists(path) else None


def load_checkpoint(ckpt_dir, target_state=None):
    """Restore the latest checkpoint; when `target_state` holds sharded
    / replicated jax.Arrays (mesh training), each restored leaf is
    placed back with the target's sharding via
    `make_array_from_callback` (multi-host safe: every process reads
    the shared checkpoint and materializes only its addressable
    shards)."""
    import orbax.checkpoint as ocp
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return None
    host_target = None if target_state is None \
        else jax.device_get(target_state)
    restored = ocp.PyTreeCheckpointer().restore(path, item=host_target)
    if target_state is None:
        return restored
    import numpy as np

    def place(r, t):
        if isinstance(t, jax.Array) and hasattr(t, 'sharding'):
            arr = np.asarray(r, dtype=t.dtype)
            return jax.make_array_from_callback(
                arr.shape, t.sharding, lambda idx: arr[idx])
        return r

    return jax.tree_util.tree_map(place, restored, target_state)

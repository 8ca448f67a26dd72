"""Training CLI: full SceneDreamer GAN training loop.

Capability parity with `train.py:50-164` in the reference: config
loading, seeding, (multi-host) distributed init, dataloader/model/
trainer construction, epoch/iteration loop alternating D and G updates,
metric logging, image snapshots, checkpoint cadence, resume from
`latest_checkpoint.txt`.

The per-iteration flow mirrors `trainers/gancraft.py:139-156`: sample a
cached world + rejection-sampled cameras + SPADE pseudo-GT on host
(outside autograd), then run the jitted D+G train step on device.

Usage:
    python -m scenedreamer_tpu.cli.train --config configs/scenedreamer_train.yaml \
        --data-root data/lhq --terrain-cache data/terrain_cache \
        --logdir logs
"""
import argparse
import os
import time


def build_everything(cfg, args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenedreamer_tpu.data.paired_dataset import (AugmentConfig,
                                                      DataLoader,
                                                      PairedImageDataset)
    from scenedreamer_tpu.models.discriminator import GANcraftDiscriminator
    from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                                   SceneDreamerGenerator)
    from scenedreamer_tpu.models.spade import SPADEWrapper
    from scenedreamer_tpu.parallel import mesh as pm
    from scenedreamer_tpu.scene.voxel_world import WorldCache
    from scenedreamer_tpu.train import losses as L
    from scenedreamer_tpu.train import optim
    from scenedreamer_tpu.train.sampling import (CameraBatchSampler,
                                                 CameraSamplerConfig,
                                                 PseudoGTGenerator,
                                                 TrainingBatchBuilder)
    from scenedreamer_tpu.train.trainer import GANTrainer, TrainerConfig

    gen_cfg = cfg.get('gen', {})
    crop = tuple(gen_cfg.get('crop_size', (256, 256)))
    pad = int(gen_cfg.get('pad', 6))

    # `trainer.amp_config.enabled` (reference
    # `configs/scenedreamer_train.yaml:11-12`, GradScaler machinery in
    # `trainers/base.py:77-78`): on TPU, mixed precision = bf16 module
    # compute with f32 params/losses — no loss scaling needed (bf16
    # shares the f32 exponent range), and the trainer's
    # skip-on-nonfinite grad guard covers the overflow-retry analog.
    amp = bool(cfg.get('trainer', {}).get('amp_config', {})
               .get('enabled', False))
    model_dtype = jnp.bfloat16 if amp else jnp.float32

    gcfg = GeneratorConfig(
        dtype=model_dtype,
        style_dims=int(gen_cfg.get('style_dims', 128)),
        interm_style_dims=int(gen_cfg.get('interm_style_dims', 256)),
        final_feat_dim=int(gen_cfg.get('final_feat_dim', 64)),
        pad=pad,
        num_blocks_early_stop=int(gen_cfg.get('num_blocks_early_stop', 6)),
        num_samples=int(gen_cfg.get('num_samples', 24)),
        sample_depth=float(gen_cfg.get('sample_depth', 3.0)),
        raw_noise_std=float(gen_cfg.get('raw_noise_std', 0.0)),
        dists_scale=float(gen_cfg.get('dists_scale', 0.25)),
        # extensions over the reference yaml: expose the hash-grid / MLP
        # sizes (hard-coded at scenedreamer.py:51 upstream)
        hash_num_levels=int(gen_cfg.get('hash_num_levels', 16)),
        hash_level_dim=int(gen_cfg.get('hash_level_dim', 8)),
        hash_log2_size=int(gen_cfg.get('hash_log2_size', 19)),
        hash_desired_resolution=int(gen_cfg.get('hash_desired_resolution',
                                                2048)),
        hash_variant=str(gen_cfg.get('hash_variant', 'xor')),
        mlp_hidden=int(gen_cfg.get('mlp_hidden', 256)),
        style_enc_num_filters=int(
            gen_cfg.get('style_enc', {}).get('num_filters', 64)),
    )
    generator = SceneDreamerGenerator(cfg=gcfg)

    dis_cfg = cfg.get('dis', {})
    discriminator = GANcraftDiscriminator(
        num_labels=int(dis_cfg.get('num_labels', 12)),
        num_filters=int(dis_cfg.get('num_filters', 128)),
        smooth_resample=bool(dis_cfg.get('smooth_resample', True)),
        dtype=model_dtype)

    # dataset
    dataset = PairedImageDataset(
        args.data_root, dataset_type=args.dataset_type,
        augment=AugmentConfig(random_crop_h_w=crop))
    loader = DataLoader(dataset, batch_size=args.batch_size,
                        seed=args.seed,
                        process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        num_workers=int(cfg.get('data', {})
                                        .get('num_workers', 4)))

    # worlds
    world_cache = WorldCache(args.terrain_cache)

    spade_apply = _load_spade_oracle(args)
    sampler, pseudo_gt, builder = _build_sampler_and_pgt(
        cfg, args, spade_apply,
        num_blocks_early_stop=gcfg.num_blocks_early_stop)

    # losses / trainer
    lw = dict(cfg.get('trainer', {}).get('loss_weight',
                                         L.DEFAULT_LOSS_WEIGHTS))
    if not lw:
        # Config injects an empty loss_weight default (`config.py:86`);
        # an empty dict would train with a constant-zero objective
        lw = dict(L.DEFAULT_LOSS_WEIGHTS)
    perc_cfg = cfg.get('trainer', {}).get('perceptual_loss', None)
    perceptual = None
    if 'perceptual' in lw:
        kwargs = {}
        if perc_cfg:
            kwargs = dict(layers=tuple(perc_cfg['layers']),
                          weights=tuple(perc_cfg['weights']))
        perceptual = L.PerceptualLoss(dtype=model_dtype, **kwargs)
    ema_cfg = cfg.get('trainer', {}).get('model_average_config', {})
    ema_beta = 0.0
    if ema_cfg.get('enabled', False):
        if 'g_smooth_img' in ema_cfg:
            # half-life parameterization (`utils/trainer.py:158-167`):
            # beta = 0.5 ** (global_batch / g_smooth_img)
            import jax as _jax
            global_batch = args.batch_size * _jax.process_count()
            ema_beta = 0.5 ** (global_batch
                               / float(ema_cfg['g_smooth_img']))
        else:
            ema_beta = float(ema_cfg.get('beta', 0.9999))
    # grad clip/skip (reference `gen_opt.clip_grad_norm` +
    # `gen_opt.skip_grad`, `trainers/base.py:701-721`): trainer.*
    # keys take precedence, gen_opt.* accepted for reference-yaml
    # compatibility
    tcfg = cfg.get('trainer', {})
    gocfg = cfg.get('gen_opt', {})
    clip = float(tcfg.get('grad_clip_norm',
                          gocfg.get('clip_grad_norm', 0.0) or 0.0)
                 if not gocfg.get('skip_grad', False) else 0.0)
    skip_norm = float(tcfg.get(
        'skip_grad_norm',
        (gocfg.get('clip_grad_norm', 0.0) or 0.0)
        if gocfg.get('skip_grad', False) else 0.0))
    # optimizer LRs/schedules from yaml (`dis_opt.lr` etc,
    # `scenedreamer_train.yaml:36-73`; previously only the built-in
    # reference defaults were used)
    do = cfg.get('dis_opt', {})
    d_tx = optim.make_discriminator_optimizer(
        lr=float(do.get('lr', optim.DIS_LR)),
        lr_policy=dict(do['lr_policy']) if do.get('lr_policy') else None,
        iters_per_epoch=max(len(loader), 1))
    trainer = GANTrainer(
        generator, discriminator, voxel_dims=None,  # set per world
        cfg=TrainerConfig(
            loss_weights=lw,
            grad_clip_norm=clip,
            skip_grad_norm=skip_norm,
            aug_policy=str(tcfg.get('aug_policy', '') or ''),
            ema_beta=ema_beta),
        perceptual=perceptual, d_tx=d_tx,
        iters_per_epoch=max(len(loader), 1))
    if float(do.get('lr', optim.DIS_LR)) != optim.DIS_LR:
        print(f"[train] dis lr override: {do.get('lr')}")
    if clip or skip_norm:
        print(f'[train] grad guard: clip_norm={clip} '
              f'skip_norm={skip_norm}')
    return (generator, discriminator, loader, world_cache, builder,
            trainer, gcfg)


def _load_spade_oracle(args):
    """Build the frozen SPADE pseudo-GT oracle apply function (frozen;
    converted weights when provided). 184 labels: the pseudo-GT one-hot
    is 185-ch but the oracle consumes label[..., :-1] exactly like the
    reference (`trainers/gancraft.py:53`, trained landscape1m SPADE is
    184-label per `landscape1m.yaml`). `args` needs spade_checkpoint /
    spade_size / spade_res / spade_filters / spade_oracle_f32."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenedreamer_tpu.models.spade import SPADEWrapper

    sp_vars = None
    if args.spade_checkpoint:
        if args.spade_checkpoint.endswith(('.pt', '.pth')):
            # reference torch checkpoint (`trainers/gancraft.py:30-42`
            # loads the trained landscape1m SPADE as the oracle)
            from scenedreamer_tpu.utils.convert import (
                convert_spade, load_torch_checkpoint)
            ckpt = load_torch_checkpoint(args.spade_checkpoint)
            sd = ckpt.get('net_G', ckpt) if isinstance(ckpt, dict) \
                else ckpt
            sp_vars = convert_spade(sd, num_filters=args.spade_filters)
        else:
            import orbax.checkpoint as ocp
            from scenedreamer_tpu.train.trainer import latest_checkpoint
            path = args.spade_checkpoint
            if os.path.isdir(path) and not os.path.exists(
                    os.path.join(path, '_CHECKPOINT_METADATA')):
                # accept a train_spade run dir (pointer lives under
                # <run>/checkpoints/) or the checkpoints dir itself
                path = (latest_checkpoint(path)
                        or latest_checkpoint(os.path.join(path,
                                                          'checkpoints'))
                        or path)
            restored = ocp.PyTreeCheckpointer().restore(path)
            if isinstance(restored, dict) and 'g_params' in restored:
                # a cli.train_spade run: freeze the trained oracle
                # (EMA params when averaged; BN scale/bias folded into
                # the frozen stored-stat layout)
                from scenedreamer_tpu.utils.convert import (
                    spade_frozen_from_trained)
                g = restored.get('g_ema') or restored['g_params']
                sp_vars = spade_frozen_from_trained(
                    g, restored.get('g_stats', {}))
            else:
                sp_vars = restored
        k = np.asarray(sp_vars['params']['spade_generator']
                       ['head_0']['kernel'])
        if k.shape[2] != 184:
            raise SystemExit(
                f'--spade-checkpoint has a {k.shape[2]}-label oracle; '
                'this framework (like the reference, '
                'trainers/gancraft.py:53) feeds the trained 184-label '
                'SPADE with label[..., :-1]. Re-export the checkpoint '
                'at 184 labels.')
        print('[train] loaded SPADE oracle weights')

    # architecture knobs come from the CHECKPOINT when one is loaded
    # (a trained oracle may use any generator/norm widths — e.g.
    # train_spade --num-filters 32 --spade-filters 32 — and the CLI
    # flags only describe the default reference shape)
    nf, sf, sd = args.spade_filters, 128, 256
    if sp_vars is not None:
        pg = sp_vars['params']['spade_generator']
        nf = int(np.shape(pg['head_0']['kernel'])[3]) // 8
        sf = int(np.shape(pg['head_1']['norm0']['mlp']['kernel'])[3])
        sd = int(np.shape(pg['fc_0']['kernel'])[0])
    spade = SPADEWrapper(num_labels=184, out_size=args.spade_size,
                         num_filters=nf, spade_filters=sf,
                         style_dims=sd)
    if sp_vars is None:
        seg0 = np.zeros((1, args.spade_res, args.spade_res, 184),
                        np.float32)
        seg0[..., 0] = 1.0
        sp_vars = spade.init({'params': jax.random.PRNGKey(0),
                              'style': jax.random.PRNGKey(1)},
                             {'label': seg0}, random_style=True)
        print('[train] WARNING: SPADE oracle randomly initialized '
              '(provide --spade-checkpoint for real pseudo-GT)')

    oracle_bf16 = not args.spade_oracle_f32
    if oracle_bf16:
        # the reference evals its frozen oracle half-precision
        # unconditionally (`trainers/gancraft.py:41` calls `.half()`
        # whether or not AMP is on); the TPU analog of `.half()` is
        # casting the frozen weights to bf16 — jnp type promotion then
        # runs every conv in bf16 with no module changes. The builder
        # casts the image back to f32.
        sp_vars = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, sp_vars)

    def spade_apply(masks, key):
        masks = masks[..., :-1]    # 185 -> 184 (`gancraft.py:53`)
        if oracle_bf16:
            masks = masks.astype(jnp.bfloat16)
        return spade.apply(sp_vars, {'label': masks}, random_style=True,
                           rngs={'style': key})['fake_images']
    return spade_apply


def _build_sampler_and_pgt(cfg, args, spade_apply,
                           num_blocks_early_stop=6):
    """Camera sampler + pseudo-GT + batch builder from a config dict
    (shared by training and scripts/make_pseudo_gt_set.py)."""
    from scenedreamer_tpu.train.sampling import (CameraBatchSampler,
                                                 CameraSamplerConfig,
                                                 PseudoGTGenerator,
                                                 TrainingBatchBuilder)
    gen_cfg = cfg.get('gen', {})
    crop = tuple(gen_cfg.get('crop_size', (256, 256)))
    pad = int(gen_cfg.get('pad', 6))
    sampler = CameraBatchSampler(CameraSamplerConfig(
        cam_res=tuple(gen_cfg.get('cam_res', (360, 640))),
        crop_size=crop, pad=pad,
        num_blocks_early_stop=num_blocks_early_stop,
        camera_sampler_type=gen_cfg.get('camera_sampler_type',
                                        'traditional'),
        camera_rej_avg_depth=float(gen_cfg.get('camera_rej_avg_depth',
                                               2.0)),
        camera_min_entropy=float(gen_cfg.get('camera_min_entropy', 0.75)),
        label_smooth_dia=int(gen_cfg.get('label_smooth_dia', 11))))
    pseudo_gt = PseudoGTGenerator(
        spade_apply, pad=pad, spade_res=args.spade_res,
        use_label_smooth_pgt=bool(gen_cfg.get('use_label_smooth_pgt',
                                              True)),
        label_smooth_dia=int(gen_cfg.get('label_smooth_dia', 11)))
    builder = TrainingBatchBuilder(sampler, pseudo_gt)
    return sampler, pseudo_gt, builder


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--config', default=None)
    p.add_argument('--data-root', required=True)
    p.add_argument('--dataset-type', default='folder',
                   choices=['folder', 'lmdb'])
    p.add_argument('--terrain-cache', required=True)
    p.add_argument('--spade-checkpoint', default='')
    p.add_argument('--spade-size', type=int, default=512,
                   choices=[256, 512, 1024],
                   help='SPADE architecture variant (512 = reference)')
    p.add_argument('--spade-res', type=int, default=512,
                   help='resolution the oracle is evaluated at '
                        '(512 = reference)')
    p.add_argument('--spade-filters', type=int, default=128)
    p.add_argument('--world-switch-every', type=int, default=1,
                   help='resample the PCG world every N iterations '
                        '(1 = the reference per-iteration semantics, '
                        'scenedreamer.py:88)')
    p.add_argument('--spade-oracle-f32', action='store_true',
                   help='keep the frozen SPADE oracle in f32 (the '
                        'reference runs it half-precision always, '
                        'trainers/gancraft.py:41, so bf16 is the '
                        'default)')
    p.add_argument('--logdir', default='logs')
    p.add_argument('--batch-size', type=int, default=1)
    p.add_argument('--max-epoch', type=int, default=None)
    p.add_argument('--max-iter', type=int, default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--resume', action='store_true')
    p.add_argument('--two-forward', dest='shared_fwd',
                   action='store_false', default=True,
                   help='render the generator twice per iteration '
                        '(separate D/G forwards, the reference torch '
                        'shape); default is the r5 single-forward step '
                        '(train_step_shared: one render, vjp residuals '
                        'reused across the D and G updates — tested '
                        'equal to the two-forward alternation). Env '
                        'override: SCENEDREAMER_SHARED_FWD=0')
    p.add_argument('--mesh-rays', type=int, default=1,
                   help='size of the rays (image-row) mesh axis; '
                        'data axis = devices // rays')
    p.add_argument('--platform', default=None,
                   help="force a jax platform (e.g. 'cpu'); with cpu, "
                        'JAX_NUM_CPU_DEVICES controls the device count')
    p.add_argument('--profile', action='store_true',
                   help='export a device trace of iterations 2-4 to '
                        '<logdir>/trace (the per-iteration profiler + '
                        'Chrome trace of reference train.py:129-151; '
                        'post-compile window because tracing the XLA '
                        'compile itself is noise)')
    p.add_argument('--speed-benchmark', action='store_true',
                   help='per-phase wall timers with device sync '
                        '(trainers/base.py:876-940 speed_benchmark); '
                        'disables --prefetch so phases stay attributable')
    p.add_argument('--no-prefetch', dest='prefetch', action='store_false',
                   help='disable building batch i+1 on a worker thread '
                        'while the device trains on batch i (the r3 '
                        'speed_benchmark showed batch_build ~ as long '
                        'as the train step; prefetch overlaps the two '
                        'with identical batch/RNG semantics — a single '
                        'ordered worker keeps every rng/world call in '
                        'the serial order)')
    a = p.parse_args(argv)

    if a.platform:
        _force_platform(a.platform)
    import jax
    import numpy as np
    from scenedreamer_tpu.parallel.mesh import init_distributed
    from scenedreamer_tpu.utils.misc import enable_compilation_cache
    enable_compilation_cache()
    from scenedreamer_tpu.train.trainer import (load_checkpoint,
                                                save_checkpoint)
    from scenedreamer_tpu.utils.config import Config
    from scenedreamer_tpu.utils.meters import (MetricsWriter,
                                               make_logging_dir)

    init_distributed()
    cfg = Config(a.config)
    max_epoch = a.max_epoch or int(cfg.get('max_epoch', 400))
    logging_iter = int(cfg.get('logging_iter', 10))
    snapshot_save_iter = int(cfg.get('snapshot_save_iter', 10000))
    snapshot_save_epoch = int(cfg.get('snapshot_save_epoch', 5))
    image_save_iter = int(cfg.get('image_save_iter', 5000))

    # AutoResume parity (`train.py:152-158`): on SIGTERM/SIGINT save a
    # checkpoint before exiting so the run resumes with --resume.
    import signal
    stop_requested = {'flag': False}

    def _on_term(signum, frame):
        stop_requested['flag'] = True
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    (gen, dis, loader, world_cache, builder, trainer, gcfg) = \
        build_everything(cfg, a)

    # multi-device: ('data', 'rays') mesh, params replicated, batches
    # sharded; the DDP analog (`utils/trainer.py:205-236`)
    mesh = None
    if jax.device_count() > 1:
        from scenedreamer_tpu.parallel import mesh as pm
        mesh = pm.make_mesh(rays=a.mesh_rays)
        trainer.mesh = mesh
        print(f'[train] mesh {dict(mesh.shape)}')

    logdir = make_logging_dir(a.logdir, cfg.get('name', 'scenedreamer'))
    writer = MetricsWriter(logdir)
    ckpt_dir = os.path.join(logdir, 'checkpoints')
    print(f'[train] logging to {logdir}')

    # seed by rank (reference utils/trainer.py:20-33)
    rng = np.random.default_rng(a.seed + jax.process_index())
    key = jax.random.PRNGKey(a.seed + jax.process_index())

    # one world per batch element (reference: one per DDP rank).
    # WorldCache crops every world to the cache-wide height slab, so
    # voxel dims are static across swaps and the step never retraces.
    world = [world_cache.sample_world(rng=_RandomAdapter(rng))
             for _ in range(a.batch_size)]
    trainer.voxel_dims = tuple(int(d) for d in world[0].voxel.shape)

    from contextlib import nullcontext
    from scenedreamer_tpu.utils.profiling import PhaseTimer, host_sync
    timer = PhaseTimer() if a.speed_benchmark else None

    def _ph(name):
        return timer.phase(name) if timer else nullcontext({})

    profile_window = (2, 4) if a.profile else None
    trace_on = {'flag': False}

    def _stop_trace():
        if trace_on['flag']:
            jax.profiler.stop_trace()
            trace_on['flag'] = False
            print(f'[train] device trace written to '
                  f"{os.path.join(logdir, 'trace')}")

    state = None
    it = 0
    shared = a.shared_fwd and bool(int(os.environ.get(
        'SCENEDREAMER_SHARED_FWD', '1')))
    step_fn = trainer.train_step_shared if shared else trainer.train_step
    print(f"[train] iteration step: "
          f"{'single-forward (shared vjp)' if shared else 'two-forward'}")
    steps_run = 0   # iterations executed in THIS process (`it` jumps on
                    # resume, which would skip the profile window)
    pending_metrics = []

    def _flush_pending():
        # ONE batched D2H transfer for all deferred scalars (a float()
        # per scalar costs a full device round trip each — ~30 ms over
        # the axon tunnel)
        for m in jax.device_get(pending_metrics):
            for k, v in m.items():
                writer.meter(k).write(float(v))
        pending_metrics.clear()

    # batch prefetch: ONE ordered worker builds batch i+1 (world
    # resample + camera rejection + pseudo-GT) while the device runs
    # train_step(i). Sequencing is identical to the serial loop — the
    # worker executes jobs one at a time in submission order, so every
    # rng/world_cache call happens in the same order, and the PRNG keys
    # are pre-split on the main thread. jax jit dispatch is thread-safe;
    # the builder's small device programs ride the same in-order device
    # queue as the train step.
    use_prefetch = a.prefetch and not a.speed_benchmark
    executor = None
    if use_prefetch:
        from concurrent.futures import ThreadPoolExecutor
        executor = ThreadPoolExecutor(max_workers=1)

    def _build(data_np, it_now, k_batch):
        nonlocal world
        if it_now > 0 and it_now % max(1, a.world_switch_every) == 0:
            with _ph('world_sample'):
                world = [world_cache.sample_world(
                    rng=_RandomAdapter(rng))
                    for _ in range(a.batch_size)]
        data = {k: jax.numpy.asarray(v) for k, v in data_np.items()
                if k in ('images', 'label')}
        with _ph('batch_build') as box:
            batch = builder(data, world, rng, k_batch)
            box['out'] = batch
        if mesh is not None:
            batch = pm.shard_batch(mesh, batch)
        return batch

    def _next_keys():
        # exactly ONE split per iteration, always in serial order —
        # prefetching only moves WHEN a pair is drawn, never the order
        nonlocal key
        key, kb, ks = jax.random.split(key, 3)
        return kb, ks

    t0 = time.time()
    for epoch in range(max_epoch):
        loader.set_epoch(epoch)
        diter = iter(loader)
        nxt = next(diter, None)
        fut = None            # (future, k_step) for the prefetched batch
        while nxt is not None:
            data_np, nxt = nxt, next(diter, None)
            if profile_window and steps_run == profile_window[0] \
                    and not trace_on['flag']:
                jax.profiler.start_trace(os.path.join(logdir, 'trace'))
                trace_on['flag'] = True
            if fut is not None:
                pending, k_step = fut
                batch = pending.result()
                fut = None
            else:
                k_batch, k_step = _next_keys()
                batch = _build(data_np, it, k_batch)
            if executor is not None and nxt is not None:
                kb2, ks2 = _next_keys()
                fut = (executor.submit(_build, nxt, it + 1, kb2), ks2)
            if state is None:
                state = trainer.init_state(jax.random.PRNGKey(a.seed),
                                           batch)
                if mesh is not None:
                    state = pm.replicate(mesh, state)
                if a.resume:
                    resume_dir = _find_resume_dir(a.logdir, ckpt_dir)
                    restored = load_checkpoint(resume_dir, state) \
                        if resume_dir else None
                    if restored is not None:
                        state = restored
                        it = int(state.step)
                        print(f'[train] resumed at iteration {it} '
                              f'from {resume_dir}')
                        # reset_opt_{g,d}_on_resume
                        # (`trainers/gancraft.py:300-305`): fresh
                        # optimizer state, restored weights
                        tc = cfg.get('trainer', {})
                        if tc.get('reset_opt_g_on_resume', False):
                            state = state.replace(
                                g_opt=trainer.g_tx.init(state.g_params))
                            print('[train] reset opt_G state')
                        if tc.get('reset_opt_d_on_resume', False):
                            state = state.replace(
                                d_opt=trainer.d_tx.init(state.d_params))
                            print('[train] reset opt_D state')
            with _ph('train_step') as box:
                state, metrics = step_fn(state, batch, k_step)
                box['out'] = metrics
            if trace_on['flag'] and steps_run == profile_window[1]:
                host_sync(metrics)
                _stop_trace()
            it += 1
            steps_run += 1
            # metrics stay device arrays until the logging boundary: a
            # per-iteration float() blocks on the step, stalling the
            # host-numpy part of the next batch build (the camera
            # sampler's own device fetch still orders behind the step)
            pending_metrics.append(metrics)
            if it % logging_iter == 0:
                _flush_pending()
                dt = time.time() - t0
                writer.flush_meters(it)
                writer.scalar('perf/iters_per_s', logging_iter / dt, it)
                # cameras admitted past max_rejections must be visible
                # (the reference retries forever; we bound + count)
                writer.scalar('sampler/fallback_rate',
                              builder.sampler.fallback_rate, it)
                print(f'epoch {epoch} iter {it} '
                      f'({logging_iter / dt:.2f} it/s) '
                      f"G {float(metrics['gen/total']):.3f} "
                      f"D {float(metrics['dis/total']):.3f}")
                if timer is not None:
                    print('[speed_benchmark]\n' + timer.report())
                    for name, mean_s in timer.means().items():
                        writer.scalar(f'speed/{name}_ms', mean_s * 1e3,
                                      it)
                    # per-window means: the first window carries the
                    # XLA compile; later ones are steady-state
                    timer.reset()
                t0 = time.time()
            if it % snapshot_save_iter == 0:
                # ALL processes call: orbax checkpoint saves are
                # collective in multi-process mode (coordinated
                # barriers; primary writes) — master-only gating
                # deadlocks (tests/_multihost_worker.py exercises it)
                save_checkpoint(ckpt_dir, state)
            if it % image_save_iter == 0 and jax.process_index() == 0:
                _save_snapshot_images(writer, trainer, state, batch,
                                      k_step, it)
            if stop_requested['flag']:
                print('[train] termination requested - checkpointing')
                _stop_trace()
                _flush_pending()
                if state is not None:
                    save_checkpoint(ckpt_dir, state)
                writer.close()
                return
            if a.max_iter and it >= a.max_iter:
                break
        if a.max_iter and it >= a.max_iter:
            break
        if (epoch + 1) % snapshot_save_epoch == 0 \
                and state is not None:
            save_checkpoint(ckpt_dir, state)
    _stop_trace()
    _flush_pending()
    if state is not None:
        save_checkpoint(ckpt_dir, state)
        if jax.process_index() == 0:
            print(f'[train] done at iteration {it}; checkpoints in '
                  f'{ckpt_dir}')
    writer.close()


def _find_resume_dir(logdir_root, own_ckpt_dir):
    """Newest prior run with a checkpoint (each run gets a fresh
    date-uid dir, so resume searches sibling runs —
    `latest_checkpoint.txt` pointer per run, `trainers/base.py:262-270`)."""
    import glob
    candidates = sorted(
        glob.glob(os.path.join(logdir_root, '*', 'checkpoints',
                               'latest_checkpoint.txt')),
        key=os.path.getmtime, reverse=True)
    for c in candidates:
        d = os.path.dirname(c)
        if os.path.abspath(d) != os.path.abspath(own_ckpt_dir):
            return d
    return None


def _save_snapshot_images(writer, trainer, state, batch, key, it):
    """Periodic visualization strip: real | label | fake | pseudo-GT
    (`trainers/gancraft.py:253-286`)."""
    import numpy as np
    from scenedreamer_tpu.utils.visualization import (image_grid,
                                                      tensor2im,
                                                      tensor2label)
    out = trainer.gen.apply({'params': state.g_params}, batch,
                            trainer.voxel_dims, key, random_style=True)
    imgs = []
    if 'images' in batch:
        imgs.append(tensor2im(np.asarray(batch['images'][0])))
    if 'label' in batch:
        imgs.append(tensor2label(np.asarray(batch['label'][0])))
    fake = tensor2im(np.asarray(out['fake_images'][0]))
    imgs.append(fake)
    if 'pseudo_real_img' in batch:
        imgs.append(tensor2im(np.asarray(batch['pseudo_real_img'][0])))
    h = min(im.shape[0] for im in imgs)
    w = min(im.shape[1] for im in imgs)
    imgs = [im[:h, :w] for im in imgs]
    writer.image('train/snapshot', image_grid(imgs), it)


def _force_platform(platform):
    """Switch jax backends even when the container sitecustomize already
    imported jax with a default platform."""
    import os
    import jax
    from jax._src import xla_bridge
    jax.config.update('jax_platforms', platform)
    if platform == 'cpu':
        jax.config.update('jax_num_cpu_devices',
                          int(os.environ.get('JAX_NUM_CPU_DEVICES', 8)))
    try:
        xla_bridge._clear_backends()
    except Exception:
        pass


class _RandomAdapter:
    """numpy Generator -> `random.choice`-style interface used by
    WorldCache."""

    def __init__(self, rng):
        self.rng = rng

    def choice(self, seq):
        return seq[int(self.rng.integers(0, len(seq)))]


if __name__ == '__main__':
    main()

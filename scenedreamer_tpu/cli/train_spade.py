"""SPADE/GauGAN oracle training CLI — `configs/landscape1m.yaml`.

Capability parity with training the pseudo-GT oracle in the reference
(`train.py --config configs/landscape1m.yaml`; the snapshot ships the
config, generator, and losses — the SPADE trainer class lives in
upstream imaginaire): paired image+segmap data, hinge GAN vs a
multi-scale patch discriminator, VGG19 perceptual + feature matching +
VAE KL, EMA model average, checkpoint/resume.

The trained checkpoint plugs straight into SceneDreamer training as the
frozen pseudo-GT oracle (`cli/train.py --spade-checkpoint` accepts the
orbax directory this writes; `trainers/gancraft.py:30-65`).

Usage:
    python -m scenedreamer_tpu.cli.train_spade \
        --config configs/landscape1m.yaml --data-root data/lhq \
        --logdir logs
"""
import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--config', default='configs/landscape1m.yaml')
    p.add_argument('--data-root', required=True,
                   help="images/ + seg_maps/ folder, or LMDBs from "
                        'cli.build_db (--dataset-type lmdb)')
    p.add_argument('--dataset-type', default='folder',
                   choices=['folder', 'lmdb'])
    p.add_argument('--logdir', default='logs')
    p.add_argument('--batch-size', type=int, default=None,
                   help='default: data.train.batch_size from config')
    p.add_argument('--image-size', type=int, default=None,
                   help='training crop override (default: the '
                        "config's data.train.augmentations pipeline)")
    p.add_argument('--out-size', type=int, default=None,
                   choices=[256, 512, 1024],
                   help='generator output-tap ladder '
                        '(gen.out_image_small_side_size; independent '
                        'of the crop — the head downsamples by the '
                        'ladder base)')
    p.add_argument('--max-epoch', type=int, default=None)
    p.add_argument('--max-iter', type=int, default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--resume', action='store_true')
    p.add_argument('--no-perceptual', action='store_true',
                   help='drop the VGG19 term (CPU smoke runs)')
    p.add_argument('--num-filters', type=int, default=None,
                   help='override gen.num_filters (tiny CPU runs)')
    p.add_argument('--dis-filters', type=int, default=None)
    p.add_argument('--style-dims', type=int, default=None)
    p.add_argument('--spade-filters', type=int, default=None)
    p.add_argument('--style-enc-filters', type=int, default=None)
    p.add_argument('--platform', default=None)
    a = p.parse_args(argv)

    if a.platform:
        from scenedreamer_tpu.cli.train import _force_platform
        _force_platform(a.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from scenedreamer_tpu.data.paired_dataset import (AugmentConfig,
                                                      DataLoader,
                                                      PairedImageDataset)
    from scenedreamer_tpu.parallel.mesh import init_distributed
    from scenedreamer_tpu.train import gan_losses as G
    from scenedreamer_tpu.train import optim
    from scenedreamer_tpu.train.spade_trainer import SpadeTrainer
    from scenedreamer_tpu.train.trainer import (TrainerConfig,
                                                load_checkpoint,
                                                save_checkpoint)
    from scenedreamer_tpu.utils.config import Config
    from scenedreamer_tpu.utils.meters import (MetricsWriter,
                                               make_logging_dir)
    from scenedreamer_tpu.utils.misc import enable_compilation_cache
    enable_compilation_cache()

    init_distributed()
    cfg = Config(a.config)
    tcfg = cfg.get('trainer', {})
    gen_c = cfg.get('gen', {})
    dis_c = cfg.get('dis', {})
    max_epoch = a.max_epoch or int(cfg.get('max_epoch', 400))
    logging_iter = int(cfg.get('logging_iter', 100))
    snapshot_save_iter = int(cfg.get('snapshot_save_iter', 30000))
    image_save_iter = int(cfg.get('image_save_iter', 5000))

    # crop + augmentations: --image-size overrides; otherwise the
    # config's training pipeline (reference `landscape1m.yaml:111-133`)
    data_c = cfg.get('data', {})
    aug_ops = data_c.get('train', {}).get('augmentations')
    if a.image_size:
        crop = (a.image_size, a.image_size)
        augment = AugmentConfig(resize_smallest_side=a.image_size,
                                random_crop_h_w=crop)
    elif aug_ops:
        augment = {k: (tuple(v) if isinstance(v, (list, tuple)) else v)
                   for k, v in aug_ops.items()}
        rs = augment.get('resize_smallest_side')
        crop = tuple(augment.get('random_crop_h_w')
                     or augment.get('center_crop_h_w')
                     or augment.get('resize_h_w')
                     or ((rs, rs) if rs else (256, 256)))
    else:
        crop = (256, 256)
        augment = AugmentConfig(resize_smallest_side=crop[0],
                                random_crop_h_w=crop)
    image_size = int(min(crop))

    # reference ladder = min(crop_h, crop_w) (`spade.py:43`), snapped
    # down to the nearest implemented tap ladder
    default_out = [s for s in (256, 512, 1024)
                   if s <= max(image_size, 256)][-1]
    gen_kwargs = dict(
        num_labels=int(gen_c.get('num_labels', 184)),
        out_size=a.out_size or int(
            gen_c.get('out_image_small_side_size', default_out)),
        style_dims=a.style_dims or int(gen_c.get('style_dims', 256)),
        num_filters=a.num_filters or int(gen_c.get('num_filters', 128)),
        output_multiplier=float(gen_c.get('output_multiplier', 0.5)),
        spade_filters=a.spade_filters or int(
            gen_c.get('activation_norm_params', {})
            .get('num_filters', 128)),
        style_enc_filters=a.style_enc_filters or int(
            gen_c.get('style_enc', {}).get('num_filters', 64)))
    dis = G.MultiScaleDiscriminator(
        num_discriminators=int(dis_c.get('num_discriminators', 2)),
        num_filters=a.dis_filters or int(dis_c.get('num_filters', 128)),
        max_num_filters=int(dis_c.get('max_num_filters', 512)),
        num_layers=int(dis_c.get('num_layers', 5)),
        kernel_size=int(dis_c.get('kernel_size', 4)))

    dataset = PairedImageDataset(
        a.data_root, dataset_type=a.dataset_type, augment=augment,
        num_seg_classes=int(data_c.get('one_hot_num_classes', 183)))
    batch_size = a.batch_size or int(
        data_c.get('train', {}).get('batch_size', 4))
    loader = DataLoader(
        dataset, batch_size=batch_size, seed=a.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        num_workers=int(data_c.get('num_workers', 4)))
    iters_per_epoch = max(1, len(loader))

    perceptual = None
    pcfg = tcfg.get('perceptual_loss', {})
    if not a.no_perceptual and pcfg:
        from scenedreamer_tpu.train.losses import PerceptualLoss
        perceptual = PerceptualLoss(
            layers=tuple(pcfg.get('layers',
                                  ('relu_1_1', 'relu_2_1', 'relu_3_1',
                                   'relu_4_1', 'relu_5_1'))),
            weights=tuple(pcfg.get('weights',
                                   (0.03125, 0.0625, 0.125, 0.25, 1.0))))

    mac = tcfg.get('model_average_config', {})
    ema_beta = float(mac.get('beta', 0.9999)) \
        if mac.get('enabled', False) else 0.0
    weights = dict(tcfg.get('loss_weight', G.SPADE_LOSS_WEIGHTS))
    if perceptual is None:
        weights.pop('perceptual', None)

    def _tx(section, default_lr):
        o = cfg.get(section, {})
        return optim.make_optimizer(
            o.get('type', 'adam'), float(o.get('lr', default_lr)),
            o.get('lr_policy'), iters_per_epoch=iters_per_epoch)

    trainer = SpadeTrainer(
        gen_kwargs, dis,
        cfg=TrainerConfig(ema_beta=ema_beta),
        perceptual=perceptual,
        g_tx=_tx('gen_opt', 1e-4), d_tx=_tx('dis_opt', 4e-4),
        gan_mode=tcfg.get('gan_mode', 'hinge'), loss_weights=weights,
        ema_start=int(mac.get('start_iteration', 1000)))

    logdir = make_logging_dir(a.logdir, cfg.get('name', 'landscape1m'))
    writer = MetricsWriter(logdir)
    ckpt_dir = os.path.join(logdir, 'checkpoints')
    print(f'[train_spade] logging to {logdir} '
          f'({len(dataset)} items, {iters_per_epoch} it/epoch)')

    key = jax.random.PRNGKey(a.seed + jax.process_index())
    sample = {
        'images': jnp.zeros((batch_size, image_size, image_size,
                             3), jnp.float32),
        'label': jnp.zeros((batch_size, image_size, image_size,
                            gen_kwargs['num_labels']), jnp.float32)}
    state = trainer.init_state(key, sample)

    # multi-device: params replicated, batch sharded on 'data' — the
    # DDP analog; batch-norm statistics become global reductions (the
    # reference's sync_batch), proven equivalent in
    # `tests/test_parallel.py::test_spade_sync_bn_matches_single_device`
    place_batch = jnp.asarray
    if jax.device_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from scenedreamer_tpu.parallel import mesh as pm
        mesh = pm.make_mesh()
        if batch_size % mesh.shape['data'] == 0:
            sh = NamedSharding(mesh, P('data'))
            rep = NamedSharding(mesh, P())
            state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), state)
            place_batch = lambda x: jax.device_put(  # noqa: E731
                jnp.asarray(x), sh)
            print(f"[train_spade] mesh {dict(mesh.shape)} "
                  f"(batch sharded on 'data')")
        else:
            print(f'[train_spade] batch {batch_size} not divisible '
                  f"by {mesh.shape['data']} devices - single-device")
    it = 0
    if a.resume:
        from scenedreamer_tpu.cli.train import _find_resume_dir
        resume_dir = _find_resume_dir(a.logdir, ckpt_dir)
        restored = load_checkpoint(resume_dir, target_state=state) \
            if resume_dir else None
        if restored is not None:
            state = restored
            it = int(state.step)
            print(f'[train_spade] resumed at iteration {it} '
                  f'from {resume_dir}')

    # SIGTERM/SIGINT -> checkpoint and exit cleanly (AutoResume parity
    # with cli/train; `trainers/base.py:236-265` save-on-preemption)
    import signal
    stop_requested = {'flag': False}

    def _on_term(signum, frame):
        stop_requested['flag'] = True
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_term)
        except ValueError:          # non-main thread (tests)
            pass

    start_epoch = it // iters_per_epoch
    t0 = time.time()
    pending = []
    done = False
    for epoch in range(start_epoch, max_epoch):
        loader.set_epoch(epoch)
        for batch in loader:
            if stop_requested['flag']:
                print('[train_spade] termination requested - '
                      'checkpointing')
                done = True
                break
            batch = {'images': place_batch(batch['images']),
                     'label': place_batch(batch['label'])}
            key, sub = jax.random.split(key)
            state, metrics = trainer.train_step(state, batch, sub)
            it += 1
            pending.append((it, metrics))
            if it % logging_iter == 0:
                for step_i, m in pending:
                    for k, v in m.items():
                        writer.meter(k).write(float(v))
                    writer.flush_meters(step_i)
                pending.clear()
                g = float(metrics['gen/total'])
                d = float(metrics['dis/total'])
                print(f'[train_spade] it {it} epoch {epoch} '
                      f'G {g:.4f} D {d:.4f} '
                      f'({it / (time.time() - t0 + 1e-9):.3f} it/s)')
            # master-only saves (`@master_only`, `trainers/base.py:943`)
            if it % image_save_iter == 0 and jax.process_index() == 0:
                _save_snapshot(writer, trainer, state, batch, key, it)
            if it % snapshot_save_iter == 0 \
                    and jax.process_index() == 0:
                save_checkpoint(ckpt_dir, state)
            if a.max_iter and it >= a.max_iter:
                done = True
                break
        if done:
            break
    for step_i, m in pending:        # flush metrics buffered past the
        for k, v in m.items():       # last logging boundary
            writer.meter(k).write(float(v))
        writer.flush_meters(step_i)
    if jax.process_index() == 0:
        save_checkpoint(ckpt_dir, state)
    writer.close()
    print(f'[train_spade] done at iteration {it}; '
          f'checkpoints in {ckpt_dir}')


def _save_snapshot(writer, trainer, state, batch, key, it):
    """Visualization strip real | label | fake | fake(EMA)
    (`trainers/base.py:530-551` image logging cadence)."""
    import numpy as np
    from scenedreamer_tpu.utils.visualization import (image_grid,
                                                      tensor2im,
                                                      tensor2label)
    imgs = [tensor2im(np.asarray(batch['images'][0])),
            tensor2label(np.asarray(batch['label'][0]))]
    out = trainer.generate(state, batch, key, use_ema=False)
    imgs.append(tensor2im(np.asarray(out['fake_images'][0])))
    if state.g_ema is not None:
        ema = trainer.generate(state, batch, key, use_ema=True)
        imgs.append(tensor2im(np.asarray(ema['fake_images'][0])))
    h = min(im.shape[0] for im in imgs)
    w = min(im.shape[1] for im in imgs)
    writer.image('train/snapshot',
                 image_grid([im[:h, :w] for im in imgs]), it)


if __name__ == '__main__':
    main()

"""Render a generator fake-image set from a training checkpoint on the
SAME camera/world distribution the discriminator sees in training
(rejection-sampled cameras over cached PCG worlds -> generator crop
renders). Paired with scripts/make_pseudo_gt_set.py, this gives
matched real/fake sets for `cli.evaluate` FID/KID so snapshot scores
track training progress without trajectory-view bias
(`imaginaire/trainers/gancraft.py:158-204` gen_forward's fake_images).

Usage:
  python scripts/render_fake_set.py --checkpoint <ckpt-or-run-dir> \
      --terrain-cache /tmp/assets/terrain_cache --outdir /tmp/fake \
      --num-images 64 [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--checkpoint', required=True)
    p.add_argument('--terrain-cache', required=True)
    p.add_argument('--outdir', required=True)
    p.add_argument('--num-images', type=int, default=64)
    p.add_argument('--crop', type=int, default=256)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--config', default=None,
                   help='train yaml for the generator hyperparameters '
                        '(defaults = flagship GeneratorConfig)')
    p.add_argument('--platform', default=None)
    a = p.parse_args(argv)

    if a.platform:
        from scenedreamer_tpu.cli.train import _force_platform
        _force_platform(a.platform)
    import numpy as np
    import jax
    import jax.numpy as jnp
    import cv2

    import scenedreamer_tpu.cli.train as T
    from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                                   SceneDreamerGenerator)
    from scenedreamer_tpu.scene.voxel_world import WorldCache
    from scenedreamer_tpu.train.sampling import (CameraBatchSampler,
                                                 CameraSamplerConfig)
    from scenedreamer_tpu.utils.config import Config
    from scenedreamer_tpu.utils.misc import enable_compilation_cache
    enable_compilation_cache()

    cfg = Config(a.config)
    gen_cfg = cfg.get('gen', {})
    gcfg = GeneratorConfig(
        num_blocks_early_stop=int(gen_cfg.get('num_blocks_early_stop',
                                              6)),
        num_samples=int(gen_cfg.get('num_samples', 24)),
        pad=int(gen_cfg.get('pad', 6)),
        style_dims=int(gen_cfg.get('style_dims', 128)),
        interm_style_dims=int(gen_cfg.get('interm_style_dims', 256)),
        final_feat_dim=int(gen_cfg.get('final_feat_dim', 64)),
        hash_num_levels=int(gen_cfg.get('hash_num_levels', 16)),
        hash_level_dim=int(gen_cfg.get('hash_level_dim', 8)),
        hash_log2_size=int(gen_cfg.get('hash_log2_size', 19)),
        hash_desired_resolution=int(
            gen_cfg.get('hash_desired_resolution', 2048)),
        mlp_hidden=int(gen_cfg.get('mlp_hidden', 256)),
        style_enc_num_filters=int(
            gen_cfg.get('style_enc', {}).get('num_filters', 64)))
    model = SceneDreamerGenerator(cfg=gcfg)

    cache = WorldCache(a.terrain_cache)
    rng = np.random.default_rng(a.seed)
    world = cache.sample_world(rng=T._RandomAdapter(rng))

    from scenedreamer_tpu.cli.inference import load_generator_params
    key = jax.random.PRNGKey(a.seed)
    params = load_generator_params(a.checkpoint, model, world, gcfg,
                                   key)

    sampler = CameraBatchSampler(CameraSamplerConfig(
        cam_res=tuple(gen_cfg.get('cam_res', (360, 640))),
        crop_size=(a.crop, a.crop), pad=gcfg.pad,
        num_blocks_early_stop=gcfg.num_blocks_early_stop))

    # voxel dims are baked into the traced program: pin them to the
    # first world's and assert every resampled world matches (the
    # WorldCache slab invariant — ADVICE r4: fail loudly on a
    # mixed-dims cache instead of rendering with stale dims)
    traced_dims = tuple(int(d) for d in world.dims)

    @jax.jit
    def gen_fake(params, batch, key):
        out = model.apply(params, batch, traced_dims, key,
                          random_style=True)
        return out['fake_images']

    os.makedirs(a.outdir, exist_ok=True)
    n = 0
    while n < a.num_images:
        world = cache.sample_world(rng=T._RandomAdapter(rng))
        assert tuple(int(d) for d in world.dims) == traced_dims, \
            f'world dims {world.dims} != traced {traced_dims}'
        rays = sampler.sample(world, 1, rng)
        batch = dict(rays)
        batch['height_field'] = jnp.asarray(
            world.height_field.transpose(0, 2, 3, 1))
        batch['semantic_field'] = jnp.asarray(
            world.semantic_field.transpose(0, 2, 3, 1))
        key, sub = jax.random.split(key)
        img = np.asarray(gen_fake(params, batch, sub)[0])
        img8 = np.clip((img * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(a.outdir, f'{n:05d}.png'),
                    img8[..., ::-1])
        n += 1
        if n % 16 == 0:
            print(f'[fake] {n}/{a.num_images}')
    print(f'[fake] wrote {n} fake images to {a.outdir}')


if __name__ == '__main__':
    main()

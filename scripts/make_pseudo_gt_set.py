"""Generate a pseudo-ground-truth image set from a trained SPADE
oracle: sample rejection-passing cameras over cached PCG worlds, take
first-hit semantic labels, run the oracle — exactly the distribution
the GAN trains toward (`imaginaire/generators/scenedreamer.py:158-213`
get_pseudo_gt). The saved PNGs serve as the --real-dir for
`cli.evaluate` FID/KID scoring of training snapshots.

Usage:
  python scripts/make_pseudo_gt_set.py --spade-checkpoint <run-dir> \
      --terrain-cache /tmp/assets/terrain_cache --outdir /tmp/pgt \
      --num-images 128 [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--spade-checkpoint', required=True)
    p.add_argument('--terrain-cache', required=True)
    p.add_argument('--outdir', required=True)
    p.add_argument('--num-images', type=int, default=128)
    p.add_argument('--crop', type=int, default=256)
    p.add_argument('--spade-size', type=int, default=256)
    p.add_argument('--spade-res', type=int, default=256)
    p.add_argument('--spade-filters', type=int, default=32)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--platform', default=None)
    a = p.parse_args(argv)

    if a.platform:
        from scenedreamer_tpu.cli.train import _force_platform
        _force_platform(a.platform)
    import numpy as np
    import jax
    import cv2

    import scenedreamer_tpu.cli.train as T
    from scenedreamer_tpu.scene.voxel_world import WorldCache
    from scenedreamer_tpu.utils.config import Config
    from scenedreamer_tpu.utils.misc import enable_compilation_cache
    enable_compilation_cache()

    # reuse cli.train's oracle loader + sampler builder (the exact
    # contract training itself uses)
    class _A:
        spade_checkpoint = a.spade_checkpoint
        spade_size = a.spade_size
        spade_res = a.spade_res
        spade_filters = a.spade_filters
        spade_oracle_f32 = False

    cfg = Config(None)
    cfg.setdefault('gen', {})['crop_size'] = [a.crop, a.crop]
    spade_apply = T._load_spade_oracle(_A())
    _, _, builder = T._build_sampler_and_pgt(cfg, _A(), spade_apply)

    cache = WorldCache(a.terrain_cache)
    rng = np.random.default_rng(a.seed)

    os.makedirs(a.outdir, exist_ok=True)
    key = jax.random.PRNGKey(a.seed)
    n = 0
    while n < a.num_images:
        world = cache.sample_world(rng=T._RandomAdapter(rng))
        key, kb = jax.random.split(key)
        batch = builder({}, world, rng, kb)
        img = np.asarray(batch['pseudo_real_img'][0])
        img8 = np.clip((img * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(a.outdir, f'{n:05d}.png'),
                    img8[..., ::-1])
        n += 1
        if n % 16 == 0:
            print(f'[pgt] {n}/{a.num_images}')
    print(f'[pgt] wrote {n} pseudo-GT images to {a.outdir}')


if __name__ == '__main__':
    main()

"""Forward-only inference frame benchmark (reference default:
540x960 x 40 samples, tile 128 + pad 30, `scenedreamer_inference.yaml`).

Measures seconds/frame of TiledRenderer on the available device with the
flagship model. Timing forces a host fetch per CLAUDE.md.

Usage: python scripts/bench_infer.py [--samples 40] [--frames 2]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
from scenedreamer_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()



def main():
    p = argparse.ArgumentParser()
    p.add_argument('--samples', type=int, default=40)
    p.add_argument('--frames', type=int, default=2)
    p.add_argument('--scene', type=int, default=256)
    p.add_argument('--resolution', type=int, nargs=2, default=[540, 960])
    p.add_argument('--tile', type=int, default=128)
    p.add_argument('--amp', action='store_true',
                   help='bf16 module compute (serving mode)')
    p.add_argument('--no-split', action='store_true',
                   help='disable split-refine (A/B the padded-tile '
                        'loop)')
    p.add_argument('--field-tpb', type=int, default=None,
                   help='split-refine field tiles per dispatch '
                        '(default: SCENEDREAMER_FIELD_TPB or 1)')
    a = p.parse_args()

    from scenedreamer_tpu.data.synthetic import make_world
    from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                                   SceneDreamerGenerator)
    from scenedreamer_tpu.render.pipeline import TiledRenderer
    from scenedreamer_tpu.scene.camera import EvalCameraController
    from scenedreamer_tpu.data.synthetic import make_batch

    import jax.numpy as jnp
    cfg = GeneratorConfig(num_samples=a.samples,
                          dtype=jnp.bfloat16 if a.amp else jnp.float32)
    world = make_world(size=a.scene, seed=42)
    model = SceneDreamerGenerator(cfg=cfg)
    batch = make_batch(world, batch_size=1, height=40, width=40,
                       max_samples=cfg.num_blocks_early_stop, pad=cfg.pad,
                       seed=0, include_gan_data=False)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    params = model.init({'params': key}, batch, world.dims, key,
                        random_style=True)
    print(f'init {time.time()-t0:.1f}s', flush=True)

    r = TiledRenderer(model, params, world, num_samples=a.samples,
                      pad=30, tile_size=a.tile,
                      resolution_hw=tuple(a.resolution),
                      split_refine=False if a.no_split else None,
                      field_tiles_per_batch=a.field_tpb)
    if r.split_refine:
        print(f'split-refine ON (field tile {r._field_tile}, '
              f'{r.field_tiles_per_batch}/dispatch)', flush=True)
    style = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.style_dims))
    z = r.style_z(style)
    ctl = EvalCameraController(world, maxstep=max(a.frames, 2), pattern=0)

    t0 = time.time()
    img = r.frame(ctl[0], z)
    assert np.isfinite(img).all()
    print(f'first frame (incl. compile) {time.time()-t0:.1f}s',
          flush=True)
    times = []
    for i in range(a.frames):
        t0 = time.time()
        img = r.frame(ctl[min(i + 1, len(ctl) - 1)], z)
        _ = float(np.sum(img))
        times.append(time.time() - t0)
    spf = min(times)
    rays = a.resolution[0] * a.resolution[1]
    print(f'steady: {spf:.1f} s/frame ({rays / spf / 1e3:.1f}k rays/s) '
          f'at {a.resolution[0]}x{a.resolution[1]}x{a.samples}',
          flush=True)

    # pipelined throughput: frame i+1 dispatched before frame i's D2H
    # (the render_trajectory loop shape) — quantifies the depth-1
    # frame pipeline vs the serial s/frame above
    t0 = time.time()
    prev = None
    for i in range(a.frames):
        mat = r.frame_async(ctl[min(i + 1, len(ctl) - 1)], z)
        if prev is not None:
            _ = float(np.sum(prev()))
        prev = mat
    _ = float(np.sum(prev()))
    spf_p = (time.time() - t0) / a.frames
    print(f'pipelined: {spf_p:.1f} s/frame '
          f'({rays / spf_p / 1e3:.1f}k rays/s) over {a.frames} frames',
          flush=True)


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""BASELINE.json config-1 smoke: single PCG scene -> short trajectory.

Runs the full untrained pipeline end to end (terrain PCG -> voxel world
-> ray-voxel DDA -> hash-grid field -> sky -> compositing -> render CNN
-> PNG/mp4) at CPU-runnable sizes. Default arguments match BASELINE
config 1 (scene 1024, 270x480, 8 samples, 10 frames); pass smaller
values for a quick check.

    PYTHONPATH=. python scripts/smoke_render.py --scene-size 256 \
        --resolution 96 128 --frames 2 --platform cpu
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--outdir', default='smoke_out')
    p.add_argument('--seed', type=int, default=42)
    p.add_argument('--scene-size', type=int, default=1024)
    p.add_argument('--resolution', type=int, nargs=2, default=[270, 480])
    p.add_argument('--num-samples', type=int, default=8)
    p.add_argument('--frames', type=int, default=10)
    p.add_argument('--camera-mode', type=int, default=0)
    p.add_argument('--tile-size', type=int, default=128)
    p.add_argument('--platform', default=None)
    a = p.parse_args(argv)

    if a.platform:
        from scenedreamer_tpu.cli.train import _force_platform
        _force_platform(a.platform)

    import jax
    from scenedreamer_tpu.models.generator import (GeneratorConfig,
                                                   SceneDreamerGenerator)
    from scenedreamer_tpu.render.pipeline import render_trajectory
    from scenedreamer_tpu.scene.terrain import generate_terrain
    from scenedreamer_tpu.scene.voxel_world import build_voxel_world

    t0 = time.time()
    maps = generate_terrain(size=a.scene_size, seed=a.seed)
    world = build_voxel_world(maps.height_map, maps.semantic_map,
                              maps.tree_map, fill_depth=16, seed=a.seed)
    print(f'[smoke] world {world.dims} in {time.time() - t0:.1f}s')

    cfg = GeneratorConfig(num_samples=a.num_samples)
    model = SceneDreamerGenerator(cfg=cfg)
    from scenedreamer_tpu.data.synthetic import make_batch
    key = jax.random.PRNGKey(a.seed)
    b = make_batch(world, batch_size=1, height=20, width=20,
                   max_samples=cfg.num_blocks_early_stop, pad=cfg.pad,
                   include_gan_data=False)
    params = model.init({'params': key}, b, world.dims, key,
                        random_style=True)
    style = jax.random.normal(key, (1, cfg.style_dims))

    t0 = time.time()
    frames = render_trajectory(
        model, params, world, style, a.outdir,
        camera_mode=a.camera_mode, cam_maxstep=a.frames,
        num_samples=a.num_samples, num_blocks_early_stop=6,
        pad=6, tile_size=a.tile_size,
        resolution_hw=tuple(a.resolution), fps=10, seed=a.seed)
    dt = time.time() - t0
    rays = a.resolution[0] * a.resolution[1] * len(frames)
    print(f'[smoke] {len(frames)} frames in {dt:.1f}s '
          f'({rays / dt / 1e3:.1f}k rays/s) -> {a.outdir}/rgb_render')


if __name__ == '__main__':
    sys.exit(main())

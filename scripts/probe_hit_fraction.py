"""Probe: fraction of field sample points that are masked (no hit).

The tiled grad step pushes every sampled depth point through the hash
encode + RenderMLP, including points on rays that hit NOTHING (their
compositing weights are exactly zero — `sky_only_mask` — so their
field outputs never contribute and their grads are zero). If a large
fraction of points is masked, an exact compaction (sort by hit, run
the field on the first-K bucket, scatter back) would cut encode work
proportionally — the training-step analog of the inference sky-tile
fast path (`render/pipeline.py` sky_only).

Prints per-tile and whole-frame masked fractions for the headline
bench geometry (driven by the same BENCH_* env vars as bench.py and
the SAME tile picker, so the grid reported is the grid the benchmark
actually runs).

Usage: python scripts/probe_hit_fraction.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scenedreamer_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()

from bench import (FRAME_H, FRAME_W, PAD, MAX_INTERVALS as M, SCENE,
                   TILE_H, TILE_W)
from scenedreamer_tpu.data.synthetic import make_world
from scenedreamer_tpu.ops.ray_voxel import camera_rays, ray_voxel_intersection
from scenedreamer_tpu.scene import camera as cam


def main():
    world = make_world(size=SCENE, seed=42)
    cam_h, cam_w = FRAME_H + PAD, FRAME_W + PAD
    rng = np.random.default_rng(0)
    ori, d, up, _f = cam.rand_camera_pose_tour(world, rng)
    f = 0.5 / np.tan(0.5 * np.deg2rad(26.0))
    rd = camera_rays(jnp.asarray(d), jnp.asarray(up), f * (FRAME_W - 1),
                     ((cam_h - 1) / 2, (cam_w - 1) / 2), (cam_h, cam_w))
    vid, dep, hit = ray_voxel_intersection(
        jnp.asarray(world.voxel), jnp.asarray(ori), rd.reshape(-1, 3), M)
    hit = np.asarray(hit).reshape(cam_h, cam_w, M)
    any_hit = hit.any(-1)                      # ray has >=1 interval
    print(f'frame rays with no hit (pure sky): '
          f'{1.0 - any_hit.mean():.3f}')
    # per tile of the 2x4 exact grid (+pad)
    for y in range(0, FRAME_H, TILE_H):
        row = []
        for x in range(0, FRAME_W, TILE_W):
            t = any_hit[y:y + TILE_H + PAD, x:x + TILE_W + PAD]
            row.append(f'{1.0 - t.mean():.3f}')
        print(f'row y={y}: masked-ray fraction per tile: {row}')


if __name__ == '__main__':
    main()

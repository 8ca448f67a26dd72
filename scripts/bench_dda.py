"""Full-frame DDA benchmark: hierarchical empty-skip vs plain lockstep.

Times `ray_voxel_intersection`'s compiled chunk on the real device at
(a) the standard inference frame over a scene-256 world and (b) the
stress frame over a scene-2048 world (chunked dispatches). Timing
forces a host fetch per CLAUDE.md.

Usage: python scripts/bench_dda.py [--stress] [--skips 0 8]
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

import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--stress', action='store_true')
    p.add_argument('--skips', type=int, nargs='+', default=[0, 8])
    p.add_argument('--check', action='store_true',
                   help='also assert bit-equality across skips')
    p.add_argument('--wavefront', action='store_true')
    p.add_argument('--wave', type=int, default=256)
    p.add_argument('--depth', type=int, default=None,
                   help='chunks in flight (persistent wavefront); '
                        'default = production WAVEFRONT_DEPTH')
    p.add_argument('--compact-frac', type=float, default=0.5,
                   help='compact survivors when active fraction drops '
                        'below this (host-only decision; bucket '
                        'executables are shared across values)')
    a = p.parse_args()

    from scenedreamer_tpu.data.synthetic import make_world
    from scenedreamer_tpu.ops import ray_voxel as rv
    from scenedreamer_tpu.scene import camera as cam

    scene = 2048 if a.stress else 256
    h, w = (2160, 3840) if a.stress else (546, 966)
    world = make_world(size=scene, seed=42)
    print(f'world {world.dims} frame {h}x{w}', flush=True)
    rng = np.random.default_rng(0)
    ori, d, up, _f = cam.rand_camera_pose_tour(world, rng)
    f = 0.5 / np.tan(0.5 * np.deg2rad(26.0))
    rd = rv.camera_rays(jnp.asarray(d), jnp.asarray(up), f * (w - 1),
                        ((h - 1) / 2, (w - 1) / 2), (h, w)).reshape(-1, 3)
    vox = jnp.asarray(world.voxel)

    if a.wavefront:
        for skip in a.skips:
            def runw():
                r = rd.shape[0]
                c = rv.AUTO_CHUNK_RAYS
                pad = (-r) % c
                rdp2 = jnp.pad(rd, ((0, pad), (0, 0))).reshape(-1, c, 3)
                outs = rv._wavefront_interleaved(
                    vox, jnp.asarray(ori, jnp.float32),
                    [rdp2[i] for i in range(rdp2.shape[0])], 6,
                    wave=a.wave, empty_skip=skip, depth=a.depth,
                    compact_frac=a.compact_frac)
                # force completion (hits fetched once, at the end)
                hits = sum(float(jnp.sum(o[2])) for o in outs)
                return hits, outs[-1]
            t0 = time.time()
            hits, _ = runw()
            c = time.time() - t0
            t0 = time.time()
            hits, _ = runw()
            print(f'wavefront skip={skip} wave={a.wave} '
                  f'depth={a.depth or rv.WAVEFRONT_DEPTH} '
                  f'cfrac={a.compact_frac}: '
                  f'{time.time() - t0:7.2f} s/frame (compile+1st {c:.1f}s,'
                  f' hits {int(hits)})', flush=True)
        return

    outs = {}
    r = rd.shape[0]
    step = rv.AUTO_CHUNK_RAYS if r > rv.AUTO_CHUNK_THRESHOLD else r
    # pad like the production path so ONE executable covers all chunks
    rdp = jnp.pad(rd, ((0, (-r) % step), (0, 0)))
    for skip in a.skips:
        # (env/module knobs are read at import; skip is passed
        # explicitly to the jit below)

        def run():
            chunks = []
            occ = rv._occupancy_jit(vox) if skip else None
            for i in range(0, rdp.shape[0], step):
                vid, dep, hit = rv._ray_voxel_chunk_jit(
                    vox, jnp.asarray(ori, jnp.float32),
                    rdp[i:i + step], 6, empty_skip=skip, occ=occ)
                chunks.append((vid, dep, hit))
            # force completion
            tot = sum(float(jnp.sum(c[2])) for c in chunks)
            return tot, chunks

        t0 = time.time()
        hits, _ = run()
        compile_s = time.time() - t0
        t0 = time.time()
        hits, chunks = run()
        dt = time.time() - t0
        outs[skip] = chunks
        print(f'skip={skip}: {dt:7.2f} s/frame  (compile+1st {compile_s:.1f}s,'
              f' hits {int(hits)})', flush=True)
    if a.check and len(a.skips) > 1:
        base = outs[a.skips[0]]
        for skip in a.skips[1:]:
            for cb, cs in zip(base, outs[skip]):
                for x, y in zip(cb, cs):
                    np.testing.assert_array_equal(np.asarray(x),
                                                  np.asarray(y))
        print('bit-exact across skips: OK', flush=True)


if __name__ == '__main__':
    main()

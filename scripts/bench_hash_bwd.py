"""Micro-benchmark: folded hash-grid encode fwd+bwd at flagship scale.

Compares the dense-splat coarse-level backward (SCENEDREAMER_HASH_DENSE_SIDE)
against the all-sort backward on the real device. Timing rule per CLAUDE.md:
force a host sync via float(jnp.sum(...)), never trust block_until_ready
over the axon tunnel.

Usage: python scripts/bench_hash_bwd.py [N] [dense_side ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
from scenedreamer_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()

import jax.numpy as jnp

from scenedreamer_tpu.ops import hashgrid as hg


def run(n, dense_side, reps=3):
    hg.DENSE_BWD_MAX_SIDE = dense_side
    spec = hg.HashGridSpec.create(input_dim=5, num_levels=16, level_dim=8,
                                  log2_hashmap_size=19,
                                  desired_resolution=2048,
                                  hash_variant=os.environ.get(
                                      'SCENEDREAMER_HASH_VARIANT', 'xor'))
    table = hg.init_hashgrid_table(jax.random.PRNGKey(0), spec)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (n, 3),
                             minval=-0.8, maxval=0.8)
    scene = jnp.asarray([0.1, -0.3])

    @jax.jit
    def step(t, s):
        return jax.grad(lambda tt, ss: jnp.sum(
            hg.hashgrid_encode_folded(spec, tt, xyz, ss)), argnums=(0, 1))(
                t, s)

    t0 = time.time()
    gt, gs = step(table, scene)
    _ = float(jnp.sum(gt)) + float(jnp.sum(gs))
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        gt, gs = step(table, scene)
        _ = float(jnp.sum(gt)) + float(jnp.sum(gs))
        times.append(time.time() - t0)
    sides = [spec.level_resolution(lv)[0] + 1 for lv in range(16)]
    nd = 0
    while nd < 16 and sides[nd] <= dense_side:
        nd += 1
    print(f'dense_side={dense_side:4d} dense_levels={nd:2d} '
          f'compile={compile_s:6.1f}s best={min(times):7.3f}s '
          f'all={["%.3f" % t for t in times]}', flush=True)
    return min(times)


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 448900
    sides = [int(a) for a in sys.argv[2:]] or [0, 64]
    print(f'N={n} devices={jax.devices()}', flush=True)
    for s in sides:
        run(n, s)

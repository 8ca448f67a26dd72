"""In-context cost of the xor-bake inside the folded encode fwd+bwd:
the current path (blocked butterfly permutation by default;
SCENEDREAMER_XOR_BAKE=gather for the old form) vs a no-gather fake
bake (tl * sum(w)) whose delta bounds the bake's share. Flagship
spec, N=448900 (one 134x134x25 tile). See PERF.md "Blocked xor-bake".
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scenedreamer_tpu.ops import hashgrid as hg

N = 448900
spec = hg.HashGridSpec.create(input_dim=5, num_levels=16, level_dim=8,
                              log2_hashmap_size=19,
                              desired_resolution=2048)
table = hg.init_hashgrid_table(jax.random.PRNGKey(0), spec)
xyz = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-0.8,
                         maxval=0.8)
scene = jnp.asarray([0.1, -0.3])


def run(name, reps=4):
    @jax.jit
    def step(t, s):
        return jax.grad(lambda tt, ss: jnp.sum(
            hg.hashgrid_encode_folded(spec, tt, xyz, ss)),
            argnums=(0, 1))(t, s)

    gt, gs = step(table, scene)
    _ = float(jnp.sum(gt)) + float(jnp.sum(gs))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        gt, gs = step(table, scene)
        _ = float(jnp.sum(gt)) + float(jnp.sum(gs))
        ts.append(time.time() - t0)
    print(f'{name:24s} best={min(ts):6.3f}s all={["%.3f" % t for t in ts]}',
          flush=True)


print('devices:', jax.devices(), flush=True)
run('full (current bake path)')

# fake bake: no gathers, same blend arithmetic shape


@jax.custom_vjp
def fake_bake(tl, masks, w):
    return tl * jnp.sum(w)


def fake_fwd(tl, masks, w):
    return tl * jnp.sum(w), (tl, w)


def fake_bwd(res, g):
    tl, w = res
    return (g * jnp.sum(w), None,
            jnp.broadcast_to(jnp.sum(tl * g), w.shape).astype(w.dtype))


fake_bake.defvjp(fake_fwd, fake_bwd)
hg._xor_bake = fake_bake
run('fake bake (no gathers)')

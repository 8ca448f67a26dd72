"""Device-trace attribution of the flagship folded hash encode fwd+bwd.

Captures one steady-state encode gradient step under `jax.profiler`,
then parses the exported `trace.json.gz` and prints device time
aggregated by op, so 'where do the 0.x s go' is one command
(PERF.md headroom 6). SCENEDREAMER_HASH_VARIANT selects xor/paired.

Usage: python scripts/trace_encode.py [N] [logdir]
"""
import glob
import gzip
import json
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 448900
LOGDIR = sys.argv[2] if len(sys.argv) > 2 else '/tmp/trace_encode_out'


def main():
    spec = hg.HashGridSpec.create(
        input_dim=5, num_levels=16, level_dim=8, log2_hashmap_size=19,
        desired_resolution=2048,
        hash_variant=os.environ.get('SCENEDREAMER_HASH_VARIANT', 'xor'))
    table = hg.init_hashgrid_table(jax.random.PRNGKey(0), spec)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (N, 3),
                             minval=-0.8, maxval=0.8)
    scene = jnp.asarray([0.1, -0.3])

    @jax.jit
    def step(t, s):
        return jax.grad(lambda tt, ss: jnp.sum(
            hg.hashgrid_encode_folded(spec, tt, xyz, ss)),
            argnums=(0, 1))(t, s)

    def sync(out):
        gt, gs = out
        return float(jnp.sum(gt)) + float(jnp.sum(gs))

    @jax.jit
    def fwd(t, s):
        return jnp.sum(hg.hashgrid_encode_folded(spec, t, xyz, s))

    sync(step(table, scene))                   # compile
    float(fwd(table, scene))
    t0 = time.time()
    sync(step(table, scene))
    dt_fb = time.time() - t0
    t0 = time.time()
    float(fwd(table, scene))
    print(f'steady-state fwd+bwd {dt_fb:.3f}s fwd {time.time() - t0:.3f}s '
          f'(variant={spec.hash_variant})', flush=True)

    jax.profiler.start_trace(LOGDIR)
    sync(step(table, scene))
    jax.profiler.stop_trace()
    jax.profiler.start_trace(LOGDIR + '_fwd')
    float(fwd(table, scene))
    jax.profiler.stop_trace()

    files = sorted(glob.glob(LOGDIR + '/**/*.trace.json.gz',
                             recursive=True), key=os.path.getmtime)
    if not files:
        print('no trace.json.gz found under', LOGDIR)
        print('xplane files:', glob.glob(LOGDIR + '/**/*.xplane.pb',
                                         recursive=True))
        return
    with gzip.open(files[-1], 'rt') as f:
        trace = json.load(f)

    # aggregate complete events on device (TensorCore) tracks by name
    pid_names = {}
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
            pid_names[ev['pid']] = ev['args'].get('name', '')
    def aggregate(pid_filter):
        totals, total = {}, 0.0
        for ev in trace.get('traceEvents', []):
            if ev.get('ph') != 'X':
                continue
            if not pid_filter(pid_names.get(ev.get('pid'), '')):
                continue
            name = ev.get('name', '?')
            dur = ev.get('dur', 0) / 1e6                   # us -> s
            totals[name] = totals.get(name, 0.0) + dur
            total += dur
        return totals, total

    totals, device_total = aggregate(
        lambda p: 'TPU' in p or 'Device' in p or 'TensorCore' in p)
    if device_total == 0.0:                        # CPU run: host track
        totals, device_total = aggregate(lambda p: True)
    print(f'\ndevice op time (total {device_total:.3f}s, '
          f'double-counts nested spans):')
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:30]:
        print(f'  {dur * 1e3:9.2f} ms  {name[:90]}')


if __name__ == '__main__':
    main()

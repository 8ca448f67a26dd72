"""Worker for the 2-process CPU multi-host test (tests/test_multihost.py).

Each process: 2 local CPU devices -> 4 global. Exercises
`init_distributed` (env rendezvous, the reference `init_dist`
`utils/distributed.py:12-18` analog), `global_batch_from_local`
(DistributedSampler analog), cross-process meter reduction
(`utils/meters.py:76-149` analog), and the multi-process checkpoint
save path.
"""
import os
import sys

pid, port, tmp, repo = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                        sys.argv[4])
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
os.environ['JAX_COORDINATOR_ADDRESS'] = f'localhost:{port}'
os.environ['JAX_NUM_PROCESSES'] = '2'
os.environ['JAX_PROCESS_ID'] = str(pid)
os.environ['JAX_LOCAL_DEVICE_IDS'] = '0,1'
sys.path.insert(0, repo)

import numpy as np               # noqa: E402
import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402

from scenedreamer_tpu.parallel import mesh as pm            # noqa: E402

rank, world = pm.init_distributed()
assert rank == pid and world == 2, (rank, world)
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

mesh = pm.make_mesh()            # ('data', 'rays') = (4, 1)

# ---- global batch from per-process local shards --------------------
local = {'images': np.full((2, 4, 4, 3), 10.0 * pid, np.float32)
         + np.arange(2, dtype=np.float32).reshape(2, 1, 1, 1)}
gb = pm.global_batch_from_local(mesh, local)
assert gb['images'].shape[0] == 4
# global mean over items {0, 1, 10, 11} = 5.5 — proves the global
# array really carries both processes' shards
mean = float(jax.jit(jnp.mean)(gb['images']))
assert abs(mean - 5.5) < 1e-6, mean

# ---- per-group psum through shard_map (the DP grad-allreduce form) --
from jax.sharding import PartitionSpec as P                 # noqa: E402


def per_group(x):
    return jax.lax.pmean(jnp.mean(x), 'data')


pm_mean = float(jax.jit(jax.shard_map(
    per_group, mesh=mesh, in_specs=P('data'), out_specs=P()))(
        gb['images']))
assert abs(pm_mean - 5.5) < 1e-6, pm_mean

# ---- cross-process meter reduction ---------------------------------
from scenedreamer_tpu.utils.meters import MetricsWriter     # noqa: E402

w = MetricsWriter(os.path.join(tmp, f'log{pid}'),
                  use_tensorboard=False)
w.meter('loss').write(float(pid))        # 0 and 1 -> global mean 0.5
w.flush_meters(step=1)
w.close()

# ---- multi-process checkpoint save/load ----------------------------
from scenedreamer_tpu.train.trainer import (latest_checkpoint,  # noqa: E402
                                            load_checkpoint,
                                            save_checkpoint)

state = {'step': jnp.asarray(7, jnp.int32),
         'w': jnp.arange(8.0).reshape(2, 4)}


class _S:
    def __init__(self, t):
        self.tree = t

    @property
    def step(self):
        return self.tree['step']


jax.tree_util.register_pytree_node(
    _S, lambda s: ((s.tree,), None), lambda aux, c: _S(c[0]))

ckpt_dir = os.path.join(tmp, 'ckpt')
save_checkpoint(ckpt_dir, _S(state))     # ALL processes call (orbax
                                         # coordinates; primary writes)
assert latest_checkpoint(ckpt_dir) is not None
target = _S({'step': jnp.zeros((), jnp.int32),
             'w': jnp.zeros((2, 4))})
restored = load_checkpoint(ckpt_dir, target)
np.testing.assert_allclose(np.asarray(restored.tree['w']),
                           np.arange(8.0).reshape(2, 4))
assert int(restored.tree['step']) == 7

print(f'WORKER_OK {pid} mean={mean}', flush=True)

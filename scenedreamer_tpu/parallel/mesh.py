"""Device mesh + sharding rules for multi-chip training and rendering.

Capability parity with the reference's distributed layer
(`imaginaire/utils/distributed.py:12-117` NCCL DDP +
`utils/trainer.py:205-236` DistributedDataParallel wrap), rebuilt the
TPU way: instead of per-process NCCL allreduce hooks, we lay out a
`jax.sharding.Mesh` with two axes —

  * `data` — batch data parallelism (the reference's only parallel dim:
    DistributedSampler + DDP gradient allreduce).
  * `rays` — spatial ray/tile parallelism: rows of the pixel grid are
    sharded across chips. This is the TPU-native version of the
    reference's sequential tile loop at inference
    (`generators/scenedreamer.py:600-628`) — the "sequence parallel"
    axis of this workload (SURVEY §5). XLA GSPMD inserts the halo
    exchanges the render CNN needs at tile borders.

Parameters are replicated; batches are sharded `P('data', 'rays')` on
(batch, image-rows). Gradient allreduce is emitted by XLA inside the
jitted train step (psum over `data`) and overlapped with the backward
pass by the latency-hiding scheduler — no explicit collectives in model
code.

Multi-host: `jax.distributed.initialize()` + the same mesh over all
devices; `jax.make_array_from_process_local_data` builds the global
batch from host-local shards.

Reference pieces with no TPU analog (intentionally absent):
`utils/gpu_affinity.py` (NUMA pinning — the TPU runtime owns host
thread placement), `utils/cudnn.py` (cuDNN flags — XLA compilation is
deterministic given the same program/seed), and NCCL env plumbing
(`utils/distributed.py:20-27` L2-fetch tweaks — ICI collectives are
compiler-scheduled).
"""
import os
from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# batch keys that carry an image-row axis at dim 1 (shardable on 'rays')
_RAY_KEYS = ('voxel_id', 'depth', 'hit_mask', 'raydirs', 'images',
             'pseudo_real_img', 'fake_masks', 'real_masks')
# batch keys that are per-sample only (batch axis only)
_BATCH_ONLY_KEYS = ('cam_ori', 'height_field', 'semantic_field', 'z')


def make_mesh(data: Optional[int] = None, rays: int = 1, devices=None):
    """Build a ('data', 'rays') mesh over the available devices."""
    devices = list(jax.devices() if devices is None else devices)
    n = len(devices)
    if data is None:
        if n % rays:
            raise ValueError(f'{n} devices not divisible by rays={rays}')
        data = n // rays
    arr = mesh_utils.create_device_mesh((data, rays),
                                        devices=devices[:data * rays])
    return Mesh(arr, ('data', 'rays'))


def init_distributed():
    """Multi-host init (reference `init_dist` env:// rendezvous,
    `utils/distributed.py:12-18`). No-op when running single-process.

    Manual rendezvous via env vars (the torch.distributed.launch
    analog): JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES +
    JAX_PROCESS_ID (+ optional JAX_LOCAL_DEVICE_IDS, comma-separated).
    With only JAX_COORDINATOR_ADDRESS set, defers to jax's cluster
    auto-detection. Exercised by the 2-process CPU test
    (tests/test_multihost.py)."""
    addr = os.environ.get('JAX_COORDINATOR_ADDRESS')
    if addr:
        kw = {}
        if os.environ.get('JAX_NUM_PROCESSES'):
            kw = dict(
                coordinator_address=addr,
                num_processes=int(os.environ['JAX_NUM_PROCESSES']),
                process_id=int(os.environ['JAX_PROCESS_ID']))
            ids = os.environ.get('JAX_LOCAL_DEVICE_IDS')
            if ids:
                kw['local_device_ids'] = [int(x)
                                          for x in ids.split(',')]
        jax.distributed.initialize(**kw)
    return jax.process_index(), jax.process_count()


def batch_spec(key, shape, mesh=None, shard_rays=True):
    """PartitionSpec for one batch entry. Axes that do not divide the
    mesh extent evenly fall back to replication on that axis (XLA
    reshards on demand inside the step)."""
    ndim = len(shape)
    n_data = mesh.shape['data'] if mesh is not None else 1
    n_rays = mesh.shape.get('rays', 1) if mesh is not None else 1
    axes = [None] * ndim
    if ndim >= 1 and shape[0] % max(n_data, 1) == 0:
        axes[0] = 'data'
    if (shard_rays and ndim >= 2 and key not in _BATCH_ONLY_KEYS
            and shape[1] % max(n_rays, 1) == 0):
        axes[1] = 'rays'
    return P(*axes)


def shard_batch(mesh, batch, shard_rays=True):
    """Place a host batch dict onto the mesh with DP(+rays) sharding."""
    out = {}
    for k, v in batch.items():
        spec = batch_spec(k, np.shape(v), mesh, shard_rays)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate(mesh, tree):
    """Fully replicate a pytree (params / optimizer state) on the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, 'shape') else x,
        tree)


def global_batch_from_local(mesh, local_batch, shard_rays=False):
    """Multi-host: assemble a global jax.Array batch from each process's
    host-local shard (replaces DistributedSampler,
    `utils/dataset.py:53`). The global batch axis is the concatenation
    of the per-process local batches, so the PartitionSpec must be
    computed against the GLOBAL shape (local * process_count) — with
    the local shape, a per-process batch smaller than the 'data' axis
    silently fell back to replication and dropped the other processes'
    items (r5 multihost-test find)."""
    pc = jax.process_count()
    out = {}
    for k, v in local_batch.items():
        gshape = list(np.shape(v))
        if gshape:
            gshape[0] *= pc
        spec = batch_spec(k, tuple(gshape), mesh, shard_rays)
        if pc > 1 and spec and spec[0] is None:
            raise ValueError(
                f'global batch dim {gshape[0]} of {k!r} must divide '
                f"the 'data' axis ({mesh.shape['data']}) in "
                'multi-process mode')
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(v))
    return out

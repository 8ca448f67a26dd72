"""SceneDreamer-TPU: a TPU-native (JAX/XLA/Pallas) framework for unbounded
3D landscape scene generation from 2D image collections.

Re-designed from scratch for TPU hardware with the capabilities of
FrozenBurning/SceneDreamer (reference studied at /root/reference):
procedural terrain -> sparse voxel world -> ray-voxel intersection ->
hash-grid conditioned neural fields -> style-modulated rendering -> GAN
training, plus the surrounding training/data/distributed infrastructure.

Layering (see SURVEY.md section 7):
  ops/       jit/Pallas compute primitives (DDA, hash grid, compositing, ...)
  scene/     procedural generation, voxel worlds, cameras, label LUTs
  models/    flax modules (generator stack, discriminator, SPADE, VGG)
  render/    ray sampling + volume rendering + tiled inference pipeline
  train/     losses, train step, EMA, checkpointing, meters
  parallel/  mesh + sharding rules (data/ray parallelism over ICI)
  data/      paired image+segmap datasets, augmentation
  cli/       train / inference / terrain-gen / pcg-cache entry points
"""

__version__ = '0.1.0'

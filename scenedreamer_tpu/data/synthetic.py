"""Synthetic world + batch builders for tests, benchmarks and dry runs.

Mirrors the reference's training batch contract assembled by
`Generator._get_batch` + `sample_camera`
(`imaginaire/generators/scenedreamer.py:80-283`): per-sample random
camera, ray-voxel intersections, BEV world-encoder fields, plus (random
stand-ins for) the pseudo ground truth, real images, and reduced
segmentation masks. Real training replaces the stand-ins with SPADE
outputs and the LMDB photo dataset.
"""
import numpy as np
import jax
import jax.numpy as jnp

from scenedreamer_tpu.ops.ray_voxel import camera_rays, ray_voxel_intersection
from scenedreamer_tpu.scene import camera as cam
from scenedreamer_tpu.scene import terrain, voxel_world
from scenedreamer_tpu.scene.labels import get_label_translator


def make_world(size=128, seed=42, fill_depth=8, n_voronoi=40,
               relax_iters=2, boundary_detect=8):
    maps = terrain.generate_terrain(size=size, seed=seed,
                                    n_voronoi=n_voronoi,
                                    relax_iters=relax_iters)
    return voxel_world.build_voxel_world(
        maps.height_map, maps.semantic_map, maps.tree_map,
        fill_depth=fill_depth, seed=seed, boundary_detect=boundary_detect)


def make_batch(world, batch_size=2, height=34, width=34, max_samples=4,
               pad=2, num_labels=12, seed=0, include_gan_data=True,
               fov=26.0):
    """Build a full training batch (NHWC, device arrays)."""
    rng = np.random.default_rng(seed)
    cols = {k: [] for k in ('voxel_id', 'depth', 'hit_mask', 'raydirs',
                            'cam_ori')}
    f = 0.5 / np.tan(0.5 * np.deg2rad(fov))
    for _ in range(batch_size):
        ori, d, up, _f = cam.rand_camera_pose_tour(world, rng)
        rd = camera_rays(jnp.asarray(d), jnp.asarray(up), f * (width - 1),
                         ((height - 1) / 2, (width - 1) / 2),
                         (height, width))
        vid, dep, hit = ray_voxel_intersection(
            jnp.asarray(world.voxel), jnp.asarray(ori),
            rd.reshape(-1, 3), max_samples)
        cols['voxel_id'].append(vid.reshape(height, width, max_samples))
        cols['depth'].append(dep.reshape(height, width, max_samples, 2))
        cols['hit_mask'].append(hit.reshape(height, width, max_samples))
        cols['raydirs'].append(rd)
        cols['cam_ori'].append(jnp.asarray(ori))
    data = {k: jnp.stack(v) for k, v in cols.items()}
    data['height_field'] = jnp.asarray(np.repeat(
        world.height_field.transpose(0, 2, 3, 1), batch_size, 0))
    data['semantic_field'] = jnp.asarray(np.repeat(
        world.semantic_field.transpose(0, 2, 3, 1), batch_size, 0))
    if include_gan_data:
        crop_h, crop_w = height - pad, width - pad
        data['pseudo_real_img'] = jnp.asarray(rng.uniform(
            -1, 1, (batch_size, crop_h, crop_w, 3)).astype(np.float32))
        data['images'] = jnp.asarray(rng.uniform(
            -1, 1, (batch_size, crop_h, crop_w, 3)).astype(np.float32))
        # reduced-label masks from the actual first-hit voxel ids,
        # cropped like the images (reference scenedreamer.py:246-281)
        trans = get_label_translator()
        first_hit = np.asarray(data['voxel_id'][..., 0])
        reduced = np.asarray(trans.mc2reduced(
            jnp.asarray(first_hit), ign2dirt=True))
        p0, p1 = pad // 2, pad - pad // 2
        reduced = reduced[:, p0:height - p1, p0:width - p1]
        onehot = jax.nn.one_hot(reduced, num_labels, dtype=jnp.float32)
        data['fake_masks'] = onehot
        data['real_masks'] = onehot
    return data

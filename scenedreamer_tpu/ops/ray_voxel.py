"""Ray-voxel intersection by amortized DDA traversal, TPU-native.

Capability parity with the reference CUDA kernel
`voxlib/ray_voxel_intersection.cu` (Amanatides-Woo style traversal, one
thread per pixel, records the first `max_samples` non-empty voxel intervals
per ray). The grid layout is `[Y, X, Z]` int32 with id 0 = empty, image rows
indexed top-down, pixel centers at integer coordinates, and the camera basis
construction of `ray_voxel_intersection.cu:274-287`.

TPU-native design choices:
  * All rays advance in lockstep inside one `lax.while_loop`; each step is
    pure vector work (VPU) plus one gather from the HBM-resident grid.
    There is no data-dependent shape anywhere.
  * Rays are fast-forwarded to the grid AABB before the loop, so sky rays
    (the vast majority at the horizon) terminate in O(grid height) steps
    instead of marching to the far clip.
  * The loop exits early once every ray has either left the grid or
    collected `max_samples` intervals.
  * Missing intervals are explicit `hit_mask=False` entries (the reference
    uses NaN depth sentinels; masks compose with jit/grad).

Returns flat-ray arrays; `ray_voxel_intersection_perspective` reshapes to
the reference's [H, W, ...] layout.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp


def _normalize(v):
    return v / jnp.linalg.norm(v)


def camera_rays(cam_dir, cam_up, cam_f, cam_c, img_dims):
    """Per-pixel unit ray directions [H, W, 3].

    Basis and intrinsics follow `ray_voxel_intersection.cu:70-78,280-284`:
    fwd = normalize(dir); side = normalize(fwd x up); up2 = side x fwd;
    ndc = (c0 - row, col - c1); ray = up2*ndc0 + side*ndc1 + fwd*f.
    """
    h, w = img_dims
    fwd = _normalize(cam_dir)
    side = _normalize(jnp.cross(fwd, cam_up))
    up2 = _normalize(jnp.cross(side, fwd))
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    ndc0 = (cam_c[0] - rows)[:, None]            # [H, 1]
    ndc1 = (cols - cam_c[1])[None, :]            # [1, W]
    raydir = (up2[None, None] * ndc0[..., None]
              + side[None, None] * ndc1[..., None]
              + fwd[None, None] * cam_f)
    return raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)


def _aabb_enter_t(ori, dirs, dims):
    """Per-ray t at which it enters the grid AABB (0 if inside), and a
    hit-possible mask."""
    safe_dir = jnp.where(jnp.abs(dirs) < 1e-12,
                         jnp.where(dirs < 0, -1e-12, 1e-12), dirs)
    t_a = (0.0 - ori[None, :]) / safe_dir
    t_b = (dims[None, :] - ori[None, :]) / safe_dir
    t_near = jnp.max(jnp.minimum(t_a, t_b), axis=-1)
    t_far = jnp.min(jnp.maximum(t_a, t_b), axis=-1)
    # Rays parallel to an axis but outside its slab never hit.
    inside_slab = (ori[None, :] >= 0.0) & (ori[None, :] <= dims[None, :])
    parallel_miss = jnp.any((jnp.abs(dirs) < 1e-12) & ~inside_slab, axis=-1)
    possible = (t_far > jnp.maximum(t_near, 0.0)) & ~parallel_miss
    t0 = jnp.maximum(t_near - 1e-4, 0.0)
    return t0, possible


@functools.partial(jax.jit,
                   static_argnames=('max_samples', 'max_steps'))
def _ray_voxel_chunk_jit(voxel, cam_ori, raydirs, max_samples,
                         max_steps=None):
    return _ray_voxel_chunk(voxel, cam_ori, raydirs, max_samples,
                            max_steps)


AUTO_CHUNK_RAYS = 1 << 20        # rays per dispatch in 'auto' mode
AUTO_CHUNK_THRESHOLD = 2 << 20   # single-dispatch above this crashes


def ray_voxel_intersection(voxel, cam_ori, raydirs, max_samples,
                           max_steps=None, chunk='auto'):
    """Traverse the grid; record the first `max_samples` solid intervals.

    Args:
        voxel: [Y, X, Z] integer grid (any int dtype; int8 for
            SceneDreamer worlds), 0 = empty.
        cam_ori: [3] float ray origin (shared by all rays).
        raydirs: [R, 3] unit ray directions.
        max_samples: M, number of intervals to record per ray.
        max_steps: traversal step bound; defaults to Y+X+Z (the exact upper
            bound on plane crossings for a ray inside the grid).
        chunk: rays per dispatch. 'auto' (the default) = one dispatch
            for all rays up to AUTO_CHUNK_THRESHOLD rays, then
            AUTO_CHUNK_RAYS-sized dispatches. Measured on v5e the
            single dispatch wins at normal frames (1.2s vs 3.1s
            chunked at 546x966: sequential chunks lose more
            parallelism than coherent early exit gains). Chunking is
            REQUIRED for giant frames over giant grids: a 2160x3840
            frame (8.3M rays) over a [*, 2048, 2048] grid is one
            multi-minute XLA program that crashes/overruns the worker,
            while 1M-ray chunks as SEPARATE dispatches (one compiled
            executable reused) complete fine. Host-side loop, not
            lax.map — the point is bounding single-program runtime, not
            just memory. Pass None to force a single dispatch, or an
            int to force a chunk size.

    Returns:
        voxel_id: [R, M] int32 (0 where no hit).
        depth: [R, M, 2] float32 entry/exit t (0 where no hit).
        hit_mask: [R, M] bool.
    """
    if chunk == 'auto':
        chunk = AUTO_CHUNK_RAYS \
            if raydirs.shape[0] > AUTO_CHUNK_THRESHOLD else None
    if chunk is not None and raydirs.shape[0] > chunk:
        r = raydirs.shape[0]
        pad = (-r) % chunk
        rd = jnp.pad(raydirs, ((0, pad), (0, 0)))
        rd = rd.reshape(-1, chunk, 3)
        outs = [_ray_voxel_chunk_jit(voxel, cam_ori, rd[i],
                                     max_samples, max_steps)
                for i in range(rd.shape[0])]
        vid = jnp.concatenate([o[0] for o in outs], axis=0)
        dep = jnp.concatenate([o[1] for o in outs], axis=0)
        hit = jnp.concatenate([o[2] for o in outs], axis=0)
        return vid[:r], dep[:r], hit[:r]
    return _ray_voxel_chunk_jit(voxel, cam_ori, raydirs, max_samples,
                                max_steps)


def _ray_voxel_chunk(voxel, cam_ori, raydirs, max_samples,
                     max_steps=None):
    dims_i = voxel.shape
    if max_steps is None:
        max_steps = int(dims_i[0] + dims_i[1] + dims_i[2]) + 2
    dims = jnp.asarray(dims_i, jnp.float32)
    r = raydirs.shape[0]
    m = max_samples

    voxel_flat = voxel.reshape(-1)
    ori = cam_ori.astype(jnp.float32)
    dirs = raydirs.astype(jnp.float32)

    t0, possible = _aabb_enter_t(ori, dirs, dims)
    start = ori[None, :] + t0[:, None] * dirs
    pos = jnp.floor(start).astype(jnp.int32)                     # [R, 3]

    pos_step = jnp.where(dirs > 0, 1, -1).astype(jnp.int32)
    safe_dir = jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)

    def crossing_t(p):
        """t of next crossing for each axis given current voxel p."""
        target = jnp.where(dirs > 0, p.astype(jnp.float32) + 1.0,
                           p.astype(jnp.float32))
        t = (target - ori[None, :]) / safe_dir
        return jnp.where(jnp.abs(dirs) < 1e-12, jnp.inf, t)

    axis_t = crossing_t(pos)

    out_id = jnp.zeros((r, m), jnp.int32)
    out_t = jnp.zeros((r, m, 2), jnp.float32)
    cnt = jnp.zeros((r,), jnp.int32)
    active = possible

    slot_iota = jnp.arange(m, dtype=jnp.int32)[None, :]          # [1, M]

    def cond(state):
        step, active, *_ = state
        return (step < max_steps) & jnp.any(active)

    def body(state):
        step, active, pos, axis_t, cnt, out_id, out_t = state

        t0_, t1_, t2_ = axis_t[:, 0], axis_t[:, 1], axis_t[:, 2]
        sel0 = (t0_ <= t1_) & (t0_ <= t2_)
        sel1 = (~sel0) & (t1_ <= t2_)
        sel2 = (~sel0) & (~sel1)
        sel = jnp.stack([sel0, sel1, sel2], axis=-1)             # [R, 3]
        tnow = jnp.min(axis_t, axis=-1)                          # [R]

        new_pos = pos + jnp.where(sel, pos_step, 0)
        # quit: the stepped axis left the grid in the travel direction
        oob_dir = ((dirs > 0) & (new_pos >= jnp.asarray(dims_i)[None, :])) \
            | ((dirs <= 0) & (new_pos < 0))
        quit_ = jnp.any(sel & oob_dir, axis=-1)

        new_axis_t = jnp.where(sel, crossing_t(new_pos), axis_t)
        t_exit = jnp.min(new_axis_t, axis=-1)

        inb = jnp.all((new_pos >= 0)
                      & (new_pos < jnp.asarray(dims_i)[None, :]), axis=-1)
        flat = (new_pos[:, 0] * (dims_i[1] * dims_i[2])
                + new_pos[:, 1] * dims_i[2] + new_pos[:, 2])
        flat = jnp.clip(flat, 0, voxel_flat.shape[0] - 1)
        # gather in the grid's own (narrow) dtype — int8 grids move 4x
        # less HBM traffic than int32 — then widen for the outputs
        blk = jnp.where(inb, jnp.take(voxel_flat, flat, axis=0),
                        0).astype(jnp.int32)

        hit = active & (~quit_) & inb & (blk != 0)
        slot = hit[:, None] & (slot_iota == cnt[:, None])        # [R, M]
        out_id = jnp.where(slot, blk[:, None], out_id)
        out_t = jnp.where(slot[..., None],
                          jnp.stack([tnow, t_exit], -1)[:, None, :], out_t)
        cnt = cnt + hit.astype(jnp.int32)
        active = active & (~quit_) & (cnt < m)

        return step + 1, active, new_pos, new_axis_t, cnt, out_id, out_t

    state = (jnp.int32(0), active, pos, axis_t, cnt, out_id, out_t)
    _, _, _, _, cnt, out_id, out_t = jax.lax.while_loop(cond, body, state)

    hit_mask = slot_iota < cnt[:, None]
    return out_id, out_t, hit_mask


def ray_voxel_intersection_perspective(voxel, cam_ori, cam_dir, cam_up,
                                       cam_f, cam_c, img_dims, max_samples,
                                       max_steps=None):
    """Reference-layout convenience wrapper
    (`voxlib.ray_voxel_intersection_perspective`).

    Returns:
        voxel_id: [H, W, M, 1] int32
        depth: [2, H, W, M, 1] float32 (0 where miss; see hit_mask)
        raydirs: [H, W, 1, 3] float32
        hit_mask: [H, W, M] bool (extra vs reference, replaces NaNs)
    """
    h, w = img_dims
    raydirs = camera_rays(jnp.asarray(cam_dir, jnp.float32),
                          jnp.asarray(cam_up, jnp.float32),
                          cam_f, cam_c, img_dims)
    vid, dep, hit = ray_voxel_intersection(
        voxel, jnp.asarray(cam_ori, jnp.float32), raydirs.reshape(-1, 3),
        max_samples, max_steps)
    voxel_id = vid.reshape(h, w, max_samples, 1)
    depth = dep.reshape(h, w, max_samples, 2).transpose(3, 0, 1, 2)[..., None]
    return voxel_id, depth, raydirs.reshape(h, w, 1, 3), \
        hit.reshape(h, w, max_samples)

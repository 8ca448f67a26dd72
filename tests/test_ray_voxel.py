"""Ray-voxel DDA tests against an independent (slow, per-ray) numpy oracle."""
import numpy as np
import jax.numpy as jnp

from scenedreamer_tpu.ops.ray_voxel import (
    camera_rays, ray_voxel_intersection, ray_voxel_intersection_perspective)


def dda_oracle(voxel, ori, d, max_samples):
    """Scalar Amanatides-Woo traversal of one ray (numpy, trusted-slow)."""
    dims = voxel.shape
    pos = np.floor(ori).astype(np.int64)
    axis_t = np.empty(3)
    for i in range(3):
        if d[i] > 0:
            axis_t[i] = ((pos[i] + 1) - ori[i]) / d[i]
        elif d[i] < 0:
            axis_t[i] = (pos[i] - ori[i]) / d[i]
        else:
            axis_t[i] = np.inf
    hits = []
    for _ in range(10000):
        if len(hits) >= max_samples:
            break
        a = int(np.argmin(axis_t))
        tnow = axis_t[a]
        pos[a] += 1 if d[a] > 0 else -1
        if (d[a] > 0 and pos[a] >= dims[a]) or (d[a] <= 0 and pos[a] < 0):
            break
        if d[a] > 0:
            axis_t[a] = ((pos[a] + 1) - ori[a]) / d[a]
        else:
            axis_t[a] = (pos[a] - ori[a]) / d[a]
        if np.any(pos < 0) or np.any(pos >= dims):
            continue
        blk = voxel[tuple(pos)]
        if blk == 0:
            continue
        t2 = float(np.min(axis_t))
        hits.append((int(blk), float(tnow), t2))
    return hits


def test_dda_matches_oracle_random_grid(rng):
    voxel = (rng.random((12, 16, 14)) < 0.15).astype(np.int32) \
        * rng.integers(1, 600, (12, 16, 14)).astype(np.int32)
    ori = np.array([6.3, 8.1, 7.7], np.float32)
    m = 4
    dirs = rng.standard_normal((64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    vid, dep, hit = ray_voxel_intersection(
        jnp.asarray(voxel), jnp.asarray(ori), jnp.asarray(dirs), m)
    vid, dep, hit = np.asarray(vid), np.asarray(dep), np.asarray(hit)

    for ri in range(dirs.shape[0]):
        expected = dda_oracle(voxel, ori.astype(np.float64),
                              dirs[ri].astype(np.float64), m)
        n = int(hit[ri].sum())
        assert n == len(expected), (ri, n, len(expected))
        for k, (blk, t, t2) in enumerate(expected):
            assert vid[ri, k] == blk
            np.testing.assert_allclose(dep[ri, k, 0], t, rtol=2e-4,
                                       atol=2e-4)
            np.testing.assert_allclose(dep[ri, k, 1], t2, rtol=2e-4,
                                       atol=2e-4)
        # non-hits zeroed
        assert np.all(vid[ri, n:] == 0)


def test_dda_camera_outside_grid(rng):
    voxel = np.zeros((8, 8, 8), np.int32)
    voxel[2, :, :] = 5  # solid slab at y=2
    ori = np.array([20.0, 4.2, 4.7], np.float32)  # above the grid
    # straight down
    dirs = np.array([[-1.0, 0.0, 0.0],   # down -> hits slab
                     [1.0, 0.0, 0.0]],   # up -> miss
                    np.float32)
    vid, dep, hit = ray_voxel_intersection(
        jnp.asarray(voxel), jnp.asarray(ori), jnp.asarray(dirs), 2)
    assert hit[0, 0] and vid[0, 0] == 5
    np.testing.assert_allclose(np.asarray(dep)[0, 0, 0], 20.0 - 3.0,
                               atol=1e-3)
    assert not bool(np.asarray(hit)[1].any())


def test_camera_rays_geometry():
    # Looking along +x (world), up = +y
    d = camera_rays(jnp.asarray([0.0, 1.0, 0.0]),
                    jnp.asarray([1.0, 0.0, 0.0]),
                    10.0, (2.0, 3.0), (5, 7))
    d = np.asarray(d)
    assert d.shape == (5, 7, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    # center pixel looks along cam_dir
    np.testing.assert_allclose(d[2, 3], [0.0, 1.0, 0.0], atol=1e-6)
    # rows above center tilt towards +up (world x here, since up=[1,0,0])
    assert d[0, 3][0] > 0


def test_perspective_wrapper_shapes():
    voxel = np.zeros((8, 16, 16), np.int32)
    voxel[1] = 3
    vid, dep, raydirs, hit = ray_voxel_intersection_perspective(
        jnp.asarray(voxel), np.array([6.0, 8.0, 8.0], np.float32),
        np.array([-0.5, 1.0, 0.0], np.float32),
        np.array([1.0, 0.0, 0.0], np.float32),
        8.0, (3.5, 3.5), (8, 8), 4)
    assert vid.shape == (8, 8, 4, 1)
    assert dep.shape == (2, 8, 8, 4, 1)
    assert raydirs.shape == (8, 8, 1, 3)
    assert hit.shape == (8, 8, 4)
    assert bool(np.asarray(hit).any())


def test_chunked_dispatch_matches_single():
    """Host-chunked DDA (separate dispatches per chunk, the giant-frame
    path) must be bit-equal to the single-dispatch result."""
    import numpy as np
    import jax.numpy as jnp
    from scenedreamer_tpu.ops.ray_voxel import (camera_rays,
                                                ray_voxel_intersection)
    rng = np.random.default_rng(3)
    vox = (rng.random((24, 32, 32)) < 0.06).astype(np.int8) * 9
    rd = camera_rays(jnp.asarray([0.4, 0.5, 0.6]),
                     jnp.asarray([0.0, 1.0, 0.0]), 20.0,
                     (7.5, 9.5), (16, 20)).reshape(-1, 3)
    ori = jnp.asarray([4.0, 3.0, 2.0])
    ref = ray_voxel_intersection(jnp.asarray(vox), ori, rd, 4)
    chk = ray_voxel_intersection(jnp.asarray(vox), ori, rd, 4, chunk=37)
    for a, b in zip(ref, chk):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_empty_skip_bit_exact():
    """Hierarchical empty-space skipping returns BIT-identical outputs
    to the plain lockstep DDA: `crossing_t` is a stateless function of
    the integer voxel coordinate, and skipped voxels are provably empty
    (their coarse cell is empty), so the recorded intervals must match
    exactly — including entry/exit t floats."""
    from scenedreamer_tpu.ops import ray_voxel as rv
    rng = np.random.default_rng(7)
    # sparse world: a few solid voxels + a floor slab, lots of air
    dims = (48, 64, 56)
    vox = np.zeros(dims, np.int8)
    vox[:4] = 3                                        # ground slab
    solid = rng.integers(0, np.asarray(dims) - 1, (40, 3))
    vox[solid[:, 0], solid[:, 1], solid[:, 2]] = 5
    ori = jnp.asarray([30.0, -10.0, 20.0])
    th = rng.uniform(0, np.pi, 300)
    ph = rng.uniform(0, 2 * np.pi, 300)
    dirs = jnp.asarray(np.stack([np.cos(th), np.sin(th) * np.cos(ph),
                                 np.sin(th) * np.sin(ph)], -1),
                       jnp.float32)
    a = rv._ray_voxel_chunk_jit(jnp.asarray(vox), ori, dirs, 6,
                                empty_skip=0)
    b = rv._ray_voxel_chunk_jit(jnp.asarray(vox), ori, dirs, 6,
                                empty_skip=8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_wavefront_bit_exact():
    """Wavefront (wave re-dispatch + survivor compaction + sort-based
    reassembly) returns BIT-identical outputs to the monolithic loop."""
    from scenedreamer_tpu.ops import ray_voxel as rv
    rng = np.random.default_rng(11)
    dims = (40, 56, 48)
    vox = np.zeros(dims, np.int8)
    vox[:3] = 2
    solid = rng.integers(0, np.asarray(dims) - 1, (60, 3))
    vox[solid[:, 0], solid[:, 1], solid[:, 2]] = 7
    ori = jnp.asarray([25.0, -8.0, 12.0])
    th = rng.uniform(0, np.pi, 5000)
    ph = rng.uniform(0, 2 * np.pi, 5000)
    dirs = jnp.asarray(np.stack([np.cos(th), np.sin(th) * np.cos(ph),
                                 np.sin(th) * np.sin(ph)], -1),
                       jnp.float32)
    a = rv._ray_voxel_chunk_jit(jnp.asarray(vox), ori, dirs, 5)
    # tiny wave + low min_rows to force several compactions
    b = rv.ray_voxel_wavefront(jnp.asarray(vox), ori, dirs, 5,
                               wave=16, min_rows=256)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_wavefront_honors_max_steps():
    """An explicit max_steps binds at the same iteration in the
    wavefront path as in the monolithic loop (the last wave is
    clamped), so both paths return identical outputs even when the
    bound cuts traversal short."""
    from scenedreamer_tpu.ops import ray_voxel as rv
    rng = np.random.default_rng(3)
    dims = (32, 40, 36)
    vox = np.zeros(dims, np.int8)
    vox[:3] = 2
    solid = rng.integers(0, np.asarray(dims) - 1, (30, 3))
    vox[solid[:, 0], solid[:, 1], solid[:, 2]] = 4
    ori = jnp.asarray([20.0, -6.0, 10.0])
    th = rng.uniform(0, np.pi, 1500)
    ph = rng.uniform(0, 2 * np.pi, 1500)
    dirs = jnp.asarray(np.stack([np.cos(th), np.sin(th) * np.cos(ph),
                                 np.sin(th) * np.sin(ph)], -1),
                       jnp.float32)
    for bound in (7, 23):
        a = rv._ray_voxel_chunk_jit(jnp.asarray(vox), ori, dirs, 4,
                                    max_steps=bound)
        b = rv.ray_voxel_wavefront(jnp.asarray(vox), ori, dirs, 4,
                                   wave=5, min_rows=128,
                                   max_steps=bound)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

def test_wavefront_interleaved_matches_sequential():
    """The persistent (round-robin) multi-chunk wavefront driver returns
    BIT-identical outputs to running each chunk alone AND to the
    monolithic loop — interleaving only reorders dispatches of
    independent chunks, it changes no device program."""
    from scenedreamer_tpu.ops import ray_voxel as rv
    rng = np.random.default_rng(17)
    dims = (36, 44, 40)
    vox = np.zeros(dims, np.int8)
    vox[:3] = 2
    solid = rng.integers(0, np.asarray(dims) - 1, (50, 3))
    vox[solid[:, 0], solid[:, 1], solid[:, 2]] = 6
    ori = jnp.asarray([22.0, -7.0, 11.0])
    th = rng.uniform(0, np.pi, 3000)
    ph = rng.uniform(0, 2 * np.pi, 3000)
    dirs = np.stack([np.cos(th), np.sin(th) * np.cos(ph),
                     np.sin(th) * np.sin(ph)], -1).astype(np.float32)
    chunks = [jnp.asarray(dirs[i::3]) for i in range(3)]
    inter = rv._wavefront_interleaved(
        jnp.asarray(vox), ori, chunks, 5, wave=16, min_rows=256,
        depth=2)
    for ch, out in zip(chunks, inter):
        mono = rv._ray_voxel_chunk_jit(jnp.asarray(vox), ori, ch, 5)
        solo = rv.ray_voxel_wavefront(jnp.asarray(vox), ori, ch, 5,
                                      wave=16, min_rows=256)
        for x, y, z in zip(out, solo, mono):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
            np.testing.assert_array_equal(np.asarray(x), np.asarray(z))

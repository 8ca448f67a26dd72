"""Simplex noise tests: vectorized impl vs a scalar branch-table oracle."""
import numpy as np

from scenedreamer_tpu.scene import noise as nz


def scalar_simplex3(x, y, z):
    """Scalar simplex noise with the classic 6-branch traversal table."""
    F3, G3 = 1.0 / 3.0, 1.0 / 6.0
    s = (x + y + z) * F3
    i, j, k = int(np.floor(x + s)), int(np.floor(y + s)), int(np.floor(z + s))
    t = (i + j + k) * G3
    x0, y0, z0 = x - (i - t), y - (j - t), z - (k - t)
    if x0 >= y0:
        if y0 >= z0:
            i1, j1, k1, i2, j2, k2 = 1, 0, 0, 1, 1, 0
        elif x0 >= z0:
            i1, j1, k1, i2, j2, k2 = 1, 0, 0, 1, 0, 1
        else:
            i1, j1, k1, i2, j2, k2 = 0, 0, 1, 1, 0, 1
    else:
        if y0 < z0:
            i1, j1, k1, i2, j2, k2 = 0, 0, 1, 0, 1, 1
        elif x0 < z0:
            i1, j1, k1, i2, j2, k2 = 0, 1, 0, 0, 1, 1
        else:
            i1, j1, k1, i2, j2, k2 = 0, 1, 0, 1, 1, 0
    total = 0.0
    for (dx, dy, dz, oi, oj, ok) in (
            (x0, y0, z0, 0, 0, 0),
            (x0 - i1 + G3, y0 - j1 + G3, z0 - k1 + G3, i1, j1, k1),
            (x0 - i2 + 2 * G3, y0 - j2 + 2 * G3, z0 - k2 + 2 * G3,
             i2, j2, k2),
            (x0 - 1 + 3 * G3, y0 - 1 + 3 * G3, z0 - 1 + 3 * G3, 1, 1, 1)):
        tt = 0.6 - dx * dx - dy * dy - dz * dz
        if tt > 0:
            g = nz._GRAD3[nz._gindex(i + oi, j + oj, k + ok)]
            total += (tt ** 4) * (g[0] * dx + g[1] * dy + g[2] * dz)
    return 32.0 * total


def test_vectorized_matches_scalar(rng):
    pts = rng.uniform(-20, 20, (200, 3))
    vec = nz.simplex3(pts[:, 0], pts[:, 1], pts[:, 2])
    ref = np.array([scalar_simplex3(*p) for p in pts])
    np.testing.assert_allclose(vec, ref, rtol=1e-10, atol=1e-12)


def test_noise_map_statistics():
    m = nz.noise_map(128, 4, seed=7, octaves=6)
    assert m.shape == (128, 128)
    assert -1.01 <= m.min() and m.max() <= 1.01
    # roughly zero-centered, non-trivial variation
    assert abs(m.mean()) < 0.25
    assert m.std() > 0.05
    # different seeds decorrelate
    m2 = nz.noise_map(128, 4, seed=107, octaves=6)
    corr = np.corrcoef(m.ravel(), m2.ravel())[0, 1]
    assert abs(corr) < 0.3

"""Native C++ simplex kernel: availability, exactness vs numpy."""
import os

import numpy as np
import pytest

from scenedreamer_tpu.native import load_simplex
from scenedreamer_tpu.scene import noise


def test_native_builds():
    if os.environ.get('SCENEDREAMER_NO_NATIVE'):
        pytest.skip('native disabled by env')
    assert load_simplex() is not None, 'native simplex failed to build'


def test_native_matches_numpy_exactly():
    lib = load_simplex()
    if lib is None:
        pytest.skip('native unavailable')
    a = noise._noise_map_native(128, 128 / 32, 77.0, 4, 0.5, 2.0)
    ys, xs = np.mgrid[0:128, 0:128]
    b = noise.fbm3((xs + 0.1) / (128 / 32), ys / (128 / 32),
                   np.float64(77.0), octaves=4)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_fbm_points_api():
    lib = load_simplex()
    if lib is None:
        pytest.skip('native unavailable')
    import ctypes
    xs = np.linspace(0, 10, 97)
    ys = np.linspace(5, 6, 97)
    out = np.empty(97)
    perm = np.ascontiguousarray(noise._PERM, np.int64)
    lib.fbm3_points(
        97, xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), 3.0, 2,
        0.5, 2.0, perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    ref = noise.fbm3(xs, ys, 3.0, octaves=2)
    np.testing.assert_allclose(out, ref, atol=1e-12)
